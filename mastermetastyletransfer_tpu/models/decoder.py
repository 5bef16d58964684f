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
    init_conv, phase_conv3x3, phase_interleave, reflect_conv,
    upsample_conv_fused, upsample_nearest,
)
from mastermetastyletransfer_tpu.ops.precision import applies_matmul_mode


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


@applies_matmul_mode
def cnn_decoder_apply(params: dict, x: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """NHWC features (B, H/8, W/8, C) -> RGB (B, H, W, 3). The final conv has
    no activation (reference: codes/decoder.py:54).

    With cfg.fuse_upsample the decoder runs almost entirely in PHASE space
    (ops/conv.py): each upsample->pad->conv pair is one exact coarse-grid
    phase conv, and the plain convs that follow stay phase-packed (4C lanes
    at 1/4 the spatial area) until the next upsample boundary or the final
    RGB — the fine grid is only ever materialized at upsample boundaries and
    for the 3-channel output. All transforms are exact (parity-tested)."""
    plan = _channel_plan(cfg.channel_dim)
    n = len(plan)
    pending_up = False   # previous conv was marked upsample-after
    in_phase = False     # x is currently a phase tensor
    for i, (_, _, up) in enumerate(plan):
        relu = i < n - 1
        if not cfg.fuse_upsample or i >= cfg.phase_exit:
            if in_phase:
                x = phase_interleave(x)
                in_phase = False
            if pending_up:
                x = upsample_nearest(x, 2)
                pending_up = False
            x = reflect_conv(params[f"conv{i}"], x, relu=relu)
            if up:
                x = upsample_nearest(x, 2)
            continue
        if pending_up:
            x = upsample_conv_fused(params[f"conv{i}"], x, relu=relu,
                                    keep_phase=True,
                                    use_pallas=cfg.use_pallas,
                                    stencil=cfg.use_stencil_conv)
            in_phase = True
        elif in_phase:
            # leave phase space at upsample boundaries (the next up-conv
            # consumes a plain coarse grid) and for the final RGB
            leave = up or i == n - 1
            x = phase_conv3x3(params[f"conv{i}"], x, relu=relu,
                              interleave=leave,
                              use_pallas=cfg.use_pallas,
                              stencil=cfg.use_stencil_conv)
            in_phase = not leave
        else:
            x = reflect_conv(params[f"conv{i}"], x, relu=relu)
        pending_up = up
    return x
