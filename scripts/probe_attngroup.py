"""Probe: window-GROUPED attention core for the fused block kernels.

Hypothesis (r4 session 4): the stage-1 swin block (4.6 ms at batch 16) is
bound by the COUNT of tiny attention dots, not FLOPs. The row-resident
kernel's core runs per-window batched dot_generals — at 512^2 stage-1
that is (19 rows x 8 img-steps) x 4 heads x 2 dots, each batched over
nb=38 windows of (49,32)@(32,49): ~46k element-matmuls/block. Each such
pass is latency-bound (~K+M+array-drain cycles); stage-2 has ~1.8x fewer
and runs ~1.8x faster at equal FLOPs, which is exactly the dot-count
model.

Lever: pack g consecutive windows into ONE batched element with a
block-diagonal additive mask (-1e9 off-diagonal). Scores/probs become
(nb/g, g*49, g*49): g x redundant FLOPs (attention-core FLOPs are ~0.14
ms-equivalent at stage-1, so redundancy is nearly free) for a g x lower
dot count and deeper pv contractions (K: 49 -> g*49). Numerics are exact:
masked logits underflow to exp=0, row max never comes from a masked
column, so softmax and pv reproduce the ungrouped results.

This probe times an isolated whole-block kernel (LN -> qkv -> grouped
core -> proj -> +res -> LN -> MLP -> +res, same math as
pallas_attention._block_compute) at the swin stage-1 and stage-2 shapes
for g in {1, 2, 4, 7} and checks parity of every g against g=1.

RESULT (measured 2026-08-20, TPU v5lite): **CLOSED NEGATIVE.**
  stage1 g=1: 6.67 ms / g=2: 6.67 ms (exact parity, half the dots)
  g=4 / g=7 / stage2 g=2: remote compile helper exit 1 (the grouped
  (ng, g*49, g*49) f32 score/exp buffers blow scoped VMEM).
Grouping halves the dot COUNT but leaves total padded-M sublane
streaming unchanged (38 dots of M=49->56 vs 19 of M=98->104), and the
wash shows the core cost tracks streamed rows x K-depth, not dispatch
count. See probe_blockcost.py for the follow-up ablation that assigns
the per-step budget.

Usage:
  python scripts/probe_attngroup.py --interpret     # CPU parity only
  python scripts/probe_attngroup.py                 # device parity+timing
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.ops.precision import kdot
from mastermetastyletransfer_tpu.ops.pallas_mlp import _erf


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


def _ln(x, s, b, eps=1e-5):
    f = x.astype(jnp.float32)
    m = jnp.mean(f, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(f - m), axis=-1, keepdims=True)
    return (f - m) * jax.lax.rsqrt(v + eps) * s + b


def _kernel(x_ref, wqkv_ref, wp_ref, f1w_ref, f2w_ref, comb_ref, out_ref, *,
            heads: int, scale: float, bsub: int, tw: int, n: int, g: int):
    """Whole-block math with a g-grouped attention core. comb_ref holds the
    per-group (tw_p//g, H, g*n, g*n) bias+mask consts (block-diag bias,
    -1e9 off-diagonal; same combine the real kernel does with mask+bias)."""
    dt = x_ref.dtype
    c = x_ref.shape[-1]
    twp = -(-tw // g) * g
    x_raw = x_ref[0].reshape(bsub * tw * n, c)
    rows = x_raw.shape[0]

    ones = jnp.ones((1, c), dt)
    zeros = jnp.zeros((1, c), jnp.float32)
    ln = _ln(x_raw, ones, zeros).astype(dt)
    qkv = kdot(ln, wqkv_ref[:].astype(dt)).astype(dt)
    q3 = (qkv[:, :c] * scale).reshape(bsub, tw, n, c)
    k3 = qkv[:, c:2 * c].reshape(bsub, tw, n, c)
    v3 = qkv[:, 2 * c:].reshape(bsub, tw, n, c)
    if twp != tw:
        pad = jnp.zeros((bsub, twp - tw, n, c), dt)
        q3 = jnp.concatenate([q3, pad], axis=1)
        k3 = jnp.concatenate([k3, pad], axis=1)
        v3 = jnp.concatenate([v3, pad], axis=1)
    ng = bsub * twp // g
    qg = q3.reshape(ng, g * n, c)
    kg = k3.reshape(ng, g * n, c)
    vg = v3.reshape(ng, g * n, c)

    dh = c // heads
    o_heads = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        comb = comb_ref[:, h].astype(jnp.float32)      # (twp//g, gn, gn)
        if bsub > 1:
            comb = jnp.concatenate([comb] * bsub, axis=0)
        s = kdot(qg[..., sl], kg[..., sl], (((2,), (2,)), ((0,), (0,))))
        s = s + comb
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o = kdot(e.astype(dt), vg[..., sl], (((2,), (1,)), ((0,), (0,))))
        o_heads.append((o * recip).astype(dt))
    allo = jnp.concatenate(o_heads, axis=-1)           # (ng, g*n, c)
    allo = allo.reshape(bsub, twp, n, c)[:, :tw].reshape(rows, c)
    y = x_raw.astype(jnp.float32) + kdot(allo, wp_ref[:].astype(dt))

    h2 = _ln(y, ones, zeros).astype(dt)
    h2 = kdot(h2, f1w_ref[:].astype(dt))
    h2 = 0.5 * h2 * (1.0 + _erf(h2 * (0.5 ** 0.5)))
    h2 = kdot(h2.astype(dt), f2w_ref[:].astype(dt))
    out_ref[0] = (y + h2).reshape(bsub, tw * n, c).astype(dt)


def build(b, nt, tw, n, c, heads, bsub, g, interpret, seed=0):
    rng = np.random.RandomState(seed)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(nt, b, tw * n, c) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), dt)
    wp = jnp.asarray(rng.randn(c, c) / np.sqrt(c), dt)
    f1 = jnp.asarray(rng.randn(c, 4 * c) / np.sqrt(c), dt)
    f2 = jnp.asarray(rng.randn(4 * c, c) / np.sqrt(4 * c), dt)
    # per-window (n, n) "mask+bias" content, grouped block-diagonally
    base = rng.randn(tw, heads, n, n).astype(np.float32) * 0.02
    twp = -(-tw // g) * g
    gn = g * n
    comb = np.full((twp // g, heads, gn, gn), -1e9, np.float32)
    for w in range(twp):
        blk = base[w % tw]                              # pad groups reuse
        grp, j = divmod(w, g)
        comb[grp, :, j * n:(j + 1) * n, j * n:(j + 1) * n] = blk
    comb = jnp.asarray(comb, jnp.bfloat16)

    kern = functools.partial(_kernel, heads=heads, scale=(c // heads) ** -0.5,
                             bsub=bsub, tw=tw, n=n, g=g)
    grid = (nt, b // bsub)
    fn = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsub, tw * n, c), lambda t, i: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 4 * c), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, c), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twp // g, heads, gn, gn),
                         lambda t, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsub, tw * n, c),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, b, tw * n, c), dt),
        interpret=interpret,
    )
    return jax.jit(lambda: fn(x, wqkv, wp, f1, f2, comb))


def run_shape(name, b, nt, tw, n, c, heads, bsub, groups, interpret):
    print(f"== {name}: grid=({nt},{b//bsub}) tw={tw} n={n} C={c} "
          f"heads={heads} bsub={bsub}", flush=True)
    ref = None
    out = {}
    for g in groups:
        try:
            fn = build(b, nt, tw, n, c, heads, bsub, g, interpret)
            y = np.asarray(fn()).astype(np.float32)
        except Exception as e:
            print(f"  g={g}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        if ref is None:
            ref = y
            err = 0.0
        else:
            err = float(np.max(np.abs(y - ref)) /
                        (np.max(np.abs(ref)) + 1e-9))
        if interpret:
            print(f"  g={g}: parity rel-max-err {err:.2e}", flush=True)
        else:
            ms = timeit(fn) * 1e3
            dots = nt * (b // bsub) * heads * 2 * (bsub * (-(-tw // g)))
            print(f"  g={g}: {ms:7.2f} ms  rel-err {err:.2e}  "
                  f"core-dots/call {dots}", flush=True)
            out[g] = ms
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    groups = [1, 2, 4, 7] if not args.interpret else [1, 2, 4]
    # swin stage-1 at 512^2 batch 16 (pair mode): 133x133 grid, 19 window
    # rows of 19 windows; row kernel picks bsub=2 -> grid (19, 8)
    run_shape("stage1", 16, 19, 19, 49, 128, 4, 2, groups, args.interpret)
    if not args.interpret:
        # swin stage-2: 70x70 padded grid, 10 rows of 10 windows, C=256
        run_shape("stage2", 16, 10, 10, 49, 256, 8, 2, groups,
                  args.interpret)


if __name__ == "__main__":
    main()
