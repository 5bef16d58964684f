"""Probe the f32 cost structure of the fused swin block kernel (r4).

Context: the compliant (<=1e-3 MAE) operating point needs >=3-pass-class
matmuls in EVERY stage (scripts/mixed_precision_bisect.py), and its
prefix profile puts swin at 74.8 ms of the 115.5 ms total — 3.6x its
bf16 cost, far beyond the 2x that pure f32 byte traffic would imply.
Suspects: the f32 VMEM budget collapse (_pick_bsub: quarter budget ->
BSUB 8->2 at C=128, 4->1 at C=256) and the 6-pass HIGHEST dots.

This probe times fused_window_block at the 512^2 swin shapes under:
  - bf16 (baseline)
  - f32 at the auto bsub (current behavior), ambient HIGHEST
  - f32 with FORCED bsub values (monkeypatched _pick_bsub) to find the
    real OOM boundary and whether bsub is what costs the 3.6x
  - f32 across target_rows (tile width), since the budget constraint is
    ~BSUB*TWN*C: smaller tiles could buy back image batching
  - f32 under ambient DEFAULT (1-pass, WRONG accuracy) — isolates the
    matmul-pass component from the memory/layout component.

CAUTION: tunnel microbench variance is +-80%; treat deltas as direction,
confirm keeps on the full bench (PERF.md rule).

Usage: python scripts/probe_f32_block.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.config import AttentionConfig
from mastermetastyletransfer_tpu.models.style_transformer import (
    init_style_swin_block,
)
from mastermetastyletransfer_tpu.ops import pallas_attention as pa
from mastermetastyletransfer_tpu.ops.windows import relative_position_bias


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2, rounds=3):
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_case(tag, dim, heads, tok_hw, win, bsz, dtype, *, force_bsub=None,
             target_rows=256, precision="highest"):
    nW = (tok_hw // win + (1 if tok_hw % win else 0)) ** 2
    n = win * win
    cfg = AttentionConfig(dim=dim, num_heads=heads, window_size=(win, win),
                          shift_size=(0, 0))
    p = init_style_swin_block(jax.random.PRNGKey(0), cfg, use_norm=True,
                              exclude_mlp=False, mlp_ratio=4.0)
    p = jax.tree_util.tree_map(lambda t: t.astype(dtype), p)
    x = jax.random.normal(jax.random.PRNGKey(1), (bsz, nW, n, dim), dtype)
    bias = relative_position_bias(
        p["attn"]["rel_bias_table"], win, win).astype(dtype)

    orig = pa._pick_bsub
    if force_bsub is not None:
        pa._pick_bsub = lambda b, c, twn, budget=0, itemsize=2: force_bsub
    try:
        def f(pa_, xx, bb, mlp, n2, n1):
            with jax.default_matmul_precision(precision):
                return pa.fused_window_block(pa_, xx, bb, None, heads, mlp,
                                             n2, n1, None,
                                             target_rows=target_rows)
        jf = jax.jit(f)
        dt = timeit(jf, p["attn"], x, bias, p["mlp"], p["norm2"], p["norm1"])
        print(json.dumps({"case": tag, "ms": round(dt * 1e3, 3),
                          "bsub": force_bsub or "auto",
                          "tr": target_rows, "dtype": str(dtype),
                          "precision": precision}), flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": str(e)[-300:],
                          "bsub": force_bsub or "auto", "tr": target_rows,
                          "dtype": str(dtype)}), flush=True)
        return None
    finally:
        pa._pick_bsub = orig


def main():
    f32, bf16 = jnp.float32, jnp.bfloat16
    # 512^2 geometry: stage-1 tokens 128x128 (C=128, 4 heads), stage-2
    # 64x64 (C=256, 8 heads); batch 16 = content+style concat of batch 8.
    for tag, dim, heads, tok, win, bsz in [("swin1", 128, 4, 128, 7, 16),
                                           ("swin2", 256, 8, 64, 7, 16)]:
        run_case(f"{tag}_bf16_auto", dim, heads, tok, win, bsz, bf16)
        run_case(f"{tag}_f32_auto", dim, heads, tok, win, bsz, f32)
        run_case(f"{tag}_f32_default_auto", dim, heads, tok, win, bsz, f32,
                 precision="default")
        for bs in (2, 4, 8):
            run_case(f"{tag}_f32_bsub{bs}", dim, heads, tok, win, bsz, f32,
                     force_bsub=bs)
        for tr in (64, 128, 512):
            run_case(f"{tag}_f32_tr{tr}", dim, heads, tok, win, bsz, f32,
                     target_rows=tr)
            run_case(f"{tag}_f32_tr{tr}_bsub4", dim, heads, tok, win, bsz,
                     f32, force_bsub=4, target_rows=tr)


if __name__ == "__main__":
    main()
