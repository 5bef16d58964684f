"""Quantify the swin inter-block window-geometry cost (VERDICT r3 task 2a).

The r2 claim: merge+roll+partition costs ~0.6 ms/direction and a
BlockSpec index_map fold was never probed. Before building a row-resident
kernel variant, measure the actual in-context prize at 512^2 shapes:

  A. kernel-only chain: 2 fused_window_block calls on a PRE-PARTITIONED
     (B, nW, N, C) array (no geometry between them — what a row-resident
     formulation would achieve if the in-kernel relayout were free).
  B. geometry chain: the real per-block pad/roll/partition ... merge/
     unroll sequence between the same 2 kernels (current swin stage).
  C. geometry ops alone (partition+merge+roll round trip), to sanity-check
     B - A decomposition.

B - A bounds the win of folding geometry into the kernels for ONE stage
(2 blocks = 1 unshifted + 1 shifted). The swin encoder runs 2 such stages;
the style transformer's windowed fast path already amortizes its
partition across k iterations.

CAUTION: tunnel variance +-80% on microbenchmarks; use rounds of full
pipelines and prefer the MEDIAN of several runs; confirm any keep on the
full bench (PERF.md rule).

Usage: python scripts/probe_geometry.py
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
from mastermetastyletransfer_tpu.ops.attention import (
    _win4, fused_self_attention_block,
)
from mastermetastyletransfer_tpu.ops.windows import (
    pad_to_windows, relative_position_bias, shift_attention_mask,
    valid_token_mask, window_merge, window_partition,
)


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2, rounds=5):
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def stage_case(tag, dim, heads, tok, win, bsz, dtype=jnp.bfloat16):
    cfg = AttentionConfig(dim=dim, num_heads=heads, window_size=(win, win),
                          shift_size=(win // 2, win // 2))
    p0 = init_style_swin_block(jax.random.PRNGKey(0), cfg, use_norm=True,
                               exclude_mlp=False, mlp_ratio=4.0)
    p1 = init_style_swin_block(jax.random.PRNGKey(1), cfg, use_norm=True,
                               exclude_mlp=False, mlp_ratio=4.0)
    for p in (p0, p1):
        for k in list(jax.tree_util.tree_leaves(p)):
            pass
    p0 = jax.tree_util.tree_map(lambda t: t.astype(dtype), p0)
    p1 = jax.tree_util.tree_map(lambda t: t.astype(dtype), p1)

    x = jax.random.normal(jax.random.PRNGKey(2), (bsz, tok, tok, dim), dtype)
    xp, pad_h, pad_w = pad_to_windows(x, win, win)
    nW = (pad_h // win) * (pad_w // win)
    n = win * win
    xw = window_partition(xp, win, win).reshape(bsz, nW, n, dim)

    bias = relative_position_bias(p0["attn"]["rel_bias_table"], win, win)
    sh = sw = win // 2
    smask = shift_attention_mask(pad_h, pad_w, win, win, sh, sw)
    pmask0 = valid_token_mask(tok, tok, pad_h, pad_w, win, win, 0, 0)
    pmask1 = valid_token_mask(tok, tok, pad_h, pad_w, win, win, sh, sw)

    def kern_only(xw_):
        # block 0 (unshifted mask-free) then block 1 with the shift mask,
        # but NO geometry between: the best case a row-resident kernel
        # could reach (same compute, zero relayout)
        y = pa.fused_window_block(p0["attn"], _win4(xw_.reshape(-1, n, dim), bsz),
                                  bias, None, heads, p0["mlp"], p0["norm2"],
                                  p0["norm1"], pmask0)
        y = y.reshape(-1, n, dim)
        y = pa.fused_window_block(p1["attn"], _win4(y, bsz), bias, smask,
                                  heads, p1["mlp"], p1["norm2"], p1["norm1"],
                                  pmask1)
        return y

    acfg0 = AttentionConfig(dim=dim, num_heads=heads, window_size=(win, win),
                            shift_size=(0, 0))
    acfg1 = cfg

    def geom_chain(x_):
        # the real current path: fused_self_attention_block does
        # pad -> (roll) -> partition -> kernel -> merge -> (unroll) -> crop
        y = fused_self_attention_block(p0, x_, acfg0, use_norm=True)
        y = fused_self_attention_block(p1, y, acfg1, use_norm=True)
        return y

    def geom_only(x_):
        # partition/merge/roll round trips alone (2 blocks' worth)
        xp_ = pad_to_windows(x_, win, win)[0]
        w0 = window_partition(xp_, win, win)
        m0 = window_merge(w0, bsz, pad_h, pad_w, win, win)
        r1 = jnp.roll(m0, shift=(-sh, -sw), axis=(1, 2))
        w1 = window_partition(r1, win, win)
        m1 = window_merge(w1, bsz, pad_h, pad_w, win, win)
        u1 = jnp.roll(m1, shift=(sh, sw), axis=(1, 2))
        return u1[:, :tok, :tok] * 1.0

    for name, fn, arg in [("kern_only", kern_only, xw),
                          ("geom_chain", geom_chain, x),
                          ("geom_only", geom_only, x)]:
        jf = jax.jit(fn)
        dt = timeit(jf, arg)
        print(json.dumps({"case": f"{tag}_{name}",
                          "ms": round(dt * 1e3, 3)}), flush=True)


def main():
    # 512^2 swin geometry: stage-1 tokens 128x128 (C=128, 4 heads),
    # stage-2 64x64 (C=256, 8 heads); batch 16 = content+style concat.
    stage_case("swin1", 128, 4, 128, 7, 16)
    stage_case("swin2", 256, 8, 64, 7, 16)


if __name__ == "__main__":
    main()
