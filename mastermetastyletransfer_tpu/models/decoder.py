"""CNN upsampling decoder (AdaIN-paper architecture): 9 reflect-padded 3x3
convs + ReLU with 3 nearest-neighbor 2x upsamples, 256ch -> RGB.

Reference: codes/decoder.py:23-55. TPU-native: NHWC end-to-end (the reference
permutes NHWC->NCHW before its decoder, codes/full_model.py:222 — on TPU we
stay NHWC), convs as XLA conv_general_dilated on the MXU with pad+ReLU fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import DecoderConfig
from mastermetastyletransfer_tpu.ops.conv import (
    init_conv, reflect_conv, upsample_conv_fused, upsample_nearest,
)


def _channel_plan(c: int):
    """(in_ch, out_ch, upsample_after) per conv, mirroring codes/decoder.py:23-55."""
    return [
        (c, c // 2, True),
        (c // 2, c // 2, False),
        (c // 2, c // 2, False),
        (c // 2, c // 2, False),
        (c // 2, c // 4, True),
        (c // 4, c // 4, False),
        (c // 4, c // 8, True),
        (c // 8, c // 8, False),
        (c // 8, 3, False),
    ]


def init_cnn_decoder(key, cfg: DecoderConfig) -> dict:
    plan = _channel_plan(cfg.channel_dim)
    keys = jax.random.split(key, len(plan))
    return {f"conv{i}": init_conv(k, ci, co, initializer=cfg.initializer)
            for i, (k, (ci, co, _)) in enumerate(zip(keys, plan))}


def cnn_decoder_apply(params: dict, x: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """NHWC features (B, H/8, W/8, C) -> RGB (B, H, W, 3). The final conv has
    no activation (reference: codes/decoder.py:54).

    With cfg.fuse_upsample, each upsample->pad->conv pair runs as one exact
    coarse-grid phase conv (ops/conv.py:upsample_conv_fused)."""
    plan = _channel_plan(cfg.channel_dim)
    n = len(plan)
    pending_up = False
    for i, (_, _, up) in enumerate(plan):
        relu = i < n - 1
        if pending_up:
            x = upsample_conv_fused(params[f"conv{i}"], x, relu=relu)
        else:
            x = reflect_conv(params[f"conv{i}"], x, relu=relu)
        if up and cfg.fuse_upsample:
            pending_up = True
        elif up:
            x = upsample_nearest(x, 2)
            pending_up = False
        else:
            pending_up = False
    return x
