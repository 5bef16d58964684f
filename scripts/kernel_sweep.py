"""Micro-benchmark: fused window-attention kernel layouts x tile sizes on the
real TPU, on the two hot shapes (swin stage-1 and the style transformer).

Compares the dense flattened (TW*N, TW*N) logits layout (round-1,
scripts/_pallas_v1.py) against the 3-D window-batched (TW, N, N) layout
(current ops/pallas_attention.py) across target_rows, for both the
whole-block kernel and the plain attention kernel.

    python scripts/kernel_sweep.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import mastermetastyletransfer_tpu.ops.pallas_attention as v2
from mastermetastyletransfer_tpu.ops.attention import init_window_attention
from mastermetastyletransfer_tpu.ops.mlp import init_mlp
from mastermetastyletransfer_tpu.ops.windows import (
    relative_position_bias, shift_attention_mask,
)
from mastermetastyletransfer_tpu.config import AttentionConfig


def _load_v1():
    """Round-1 kernel snapshot for the layout comparison. The snapshot was a
    local scratch file (never committed — its conclusion, 'dense flattened
    logits beat the 3-D window-batched layout', is recorded in the r2
    history and PERF.md); without it the sweep covers the CURRENT kernel
    only."""
    path = os.path.join(os.path.dirname(__file__), "_pallas_v1.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("pallas_v1", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20, warmup=2, rounds=3):
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
    return best * 1e3


def main():
    v1 = _load_v1()
    dt = jnp.bfloat16

    shapes = [
        # (name, B, grid_hw, C, heads, shifted)
        ("swin_s1", 16, 128, 128, 4, True),    # nW=19^2=361
        ("styletr", 8, 64, 256, 8, True),      # nW=10^2=100
    ]
    for name, b, hw, c, heads, shifted in shapes:
        wh = ww = 7
        pad = (wh - hw % wh) % wh
        ph = hw + pad
        nwh = ph // wh
        nw = nwh * nwh
        n = wh * ww
        cfg = AttentionConfig(dim=c, num_heads=heads)
        params = init_window_attention(jax.random.PRNGKey(0), cfg)
        params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
        mlp = jax.tree_util.tree_map(
            lambda x: x.astype(dt), init_mlp(jax.random.PRNGKey(1), c, 4 * c))
        norm2 = {"scale": jnp.ones((c,), dt), "bias": jnp.zeros((c,), dt)}
        bias = relative_position_bias(params["rel_bias_table"], wh, ww)
        mask = (shift_attention_mask(ph, ph, wh, ww, 3, 3)
                if shifted else None)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (b, nw, n, c), dt) * 0.1

        print(f"== {name}: B={b} nW={nw} N={n} C={c} H={heads}", file=sys.stderr)
        for target in (256, 512, 1024, 2048):
            variants = [("v2_3d", v2)]
            if v1 is not None:
                variants.insert(0, ("v1_dense", v1))
            for tag, mod in variants:
                try:
                    fn = jax.jit(lambda q, k, vv, t=target, m=mod:
                                 m.fused_window_attention(
                                     params, q, k, vv, bias, mask, heads,
                                     target_rows=t))
                    ms = timeit(fn, x, x, x)
                    fnb = jax.jit(lambda xx, t=target, m=mod:
                                  m.fused_window_block(
                                      params, xx, bias, mask, heads,
                                      mlp, norm2, target_rows=t))
                    ms_b = timeit(fnb, x)
                    print(json.dumps({"shape": name, "layout": tag,
                                      "target_rows": target,
                                      "attn_ms": round(ms, 3),
                                      "block_ms": round(ms_b, 3)}), flush=True)
                except Exception as e:
                    print(json.dumps({"shape": name, "layout": tag,
                                      "target_rows": target,
                                      "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
