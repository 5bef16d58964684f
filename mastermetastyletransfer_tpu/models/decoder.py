"""CNN upsampling decoder (AdaIN-paper architecture): 9 reflect-padded 3x3
convs + ReLU with 3 nearest-neighbor 2x upsamples, 256ch -> RGB.

Reference: codes/decoder.py:23-55. TPU-native: NHWC end-to-end (the reference
permutes NHWC->NCHW before its decoder, codes/full_model.py:222 — on TPU we
stay NHWC), convs as XLA conv_general_dilated on the MXU with pad+ReLU fused.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import DecoderConfig
from mastermetastyletransfer_tpu.ops.conv import (
    init_conv, l2_to_l1, phase2_conv3x3, phase_conv3x3, phase_interleave,
    phase_interleave2, reflect_conv, upsample_conv_fused, upsample_nearest,
)
from mastermetastyletransfer_tpu.ops.precision import applies_matmul_mode


def _p2chain_on() -> bool:
    """Padded-output chaining kill-switch (r4): default ON; set
    MMST_P2CHAIN=0 to A/B the per-conv _phase2_pad path."""
    return os.environ.get("MMST_P2CHAIN", "1") != "0"


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
def cnn_decoder_apply(params: dict, x: jnp.ndarray, cfg: DecoderConfig,
                      upto: int | None = None,
                      deterministic: bool = True) -> jnp.ndarray:
    """NHWC features (B, H/8, W/8, C) -> RGB (B, H, W, 3). The final conv has
    no activation (reference: codes/decoder.py:54).

    With cfg.fuse_upsample the decoder runs almost entirely in PHASE space
    (ops/conv.py): each upsample->pad->conv pair is one exact coarse-grid
    phase conv, and the plain convs that follow stay phase-packed (4C lanes
    at 1/4 the spatial area) until the next upsample boundary or the final
    RGB. With cfg.phase2_tail the LAST upsample enters a second phase level
    instead of leaving — the tail convs run at the pre-upsample grid with
    16x lanes and the full-res grid materializes exactly once, at the final
    interleave. All transforms are exact (parity-tested).

    upto: stop after conv `upto` and return the current (possibly phase)
    tensor — profiling hook (scripts/probe_decoder.py)."""
    plan = _channel_plan(cfg.channel_dim)
    n = len(plan)
    pending_up = False   # previous conv was marked upsample-after
    level = 0            # phase level of x: 0 plain, 1 (2x2), 2 (4x4)
    x_padded = False     # x carries a chained +1 phase-pad border
    for i, (_, _, up) in enumerate(plan):
        if upto is not None and i > upto:
            break
        relu = i < n - 1
        if not cfg.fuse_upsample or i >= cfg.phase_exit:
            if level == 2:
                x = phase_interleave2(x)
            elif level == 1:
                x = phase_interleave(x)
            level = 0
            if pending_up:
                x = upsample_nearest(x, 2)
                pending_up = False
            x = reflect_conv(params[f"conv{i}"], x, relu=relu)
            if up:
                x = upsample_nearest(x, 2)
            continue
        # does the NEXT conv consume this upsample inside phase-2 space?
        # (eval-only: the L2 tail's recompute-free backward measured -15%
        # on the train step — 126.8 vs 149.1 imgs/s, PERF.md r4 levers —
        # so training keeps the L1 tail; the transforms are exact either
        # way, so train/eval may differ in formulation.)
        phase2_next = (cfg.phase2_tail and deterministic and up and i + 1 < n
                       and i + 1 < cfg.phase_exit
                       and not any(u2 for _, _, u2 in plan[i + 1:]))
        # padded-output chaining (r4): each non-final phase2 tail conv can
        # emit its output WITH the +1 phase-pad border synthesized in the
        # stencil kernel, so the next conv skips its standalone _phase2_pad
        # (1.28 ms device per 512-lane pad — PERF.md r4 pad decomposition).
        stencil_on = cfg.use_pallas and cfg.use_stencil_conv
        chain = stencil_on and _p2chain_on()

        def consumes_pp(j):
            # conv j consumes a padded L2 tensor directly (stays in the
            # phase2 tail and is not the l2_to_l1 RGB variant)
            return (j < n and j < cfg.phase_exit
                    and not (j == n - 1 and cfg.rgb_tail == "l1"))

        if pending_up and level == 1:
            # last upsample -> L2 phase up-conv (phase2_tail path)
            emit = chain and consumes_pp(i + 1)
            x = phase2_conv3x3(params[f"conv{i}"], x, up=True, relu=relu,
                               use_pallas=stencil_on, emit_padded=emit)
            x_padded = emit
            level = 2
        elif pending_up:
            x = upsample_conv_fused(params[f"conv{i}"], x, relu=relu,
                                    keep_phase=True,
                                    use_pallas=cfg.use_pallas,
                                    stencil=cfg.use_stencil_conv)
            level = 1
        elif level == 1:
            # leave phase space at upsample boundaries (unless the next
            # up-conv consumes the phase tensor directly at L2) and for
            # the final RGB
            leave = (up and not phase2_next) or i == n - 1
            x = phase_conv3x3(params[f"conv{i}"], x, relu=relu,
                              interleave=leave,
                              use_pallas=cfg.use_pallas,
                              stencil=cfg.use_stencil_conv)
            level = 0 if leave else 1
        elif level == 2:
            leave = i == n - 1
            if leave and cfg.rgb_tail == "l1":
                # A/B'd SLOWER than the direct composed conv (bench 245.6
                # vs 258.2 — the downlevel relayout costs more than the
                # friendlier conv shape saves); kept as the A/B knob
                x = phase_conv3x3(params[f"conv{i}"], l2_to_l1(x),
                                  relu=relu, interleave=True,
                                  use_pallas=cfg.use_pallas,
                                  stencil=cfg.use_stencil_conv)
            else:
                emit = (not leave) and chain and consumes_pp(i + 1)
                x = phase2_conv3x3(params[f"conv{i}"], x, up=False,
                                   relu=relu, interleave=leave,
                                   use_pallas=stencil_on,
                                   gemm4=leave
                                   and cfg.rgb_tail == "l2gemm",
                                   k128=leave
                                   and cfg.rgb_tail == "l2k128",
                                   in_padded=x_padded,
                                   emit_padded=emit)
                x_padded = emit
            level = 0 if leave else 2
        else:
            x = reflect_conv(params[f"conv{i}"], x, relu=relu)
        pending_up = up
    return x
