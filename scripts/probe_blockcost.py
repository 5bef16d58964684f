"""Ablation probe: where does a fused swin block's per-step time go?

probe_attngroup.py falsified the dot-count hypothesis (g=2 window
grouping halves the batched attention dots: 6.67 -> 6.67 ms — a wash).
The stage-1 block runs ~44 us/grid-step; this probe times the SAME
whole-block kernel with individual pieces ablated (exact math replaced
by a cheap placeholder of the same shape) so consecutive deltas assign
the per-step budget: LN1, qkv GEMM, attention dots, softmax
(max/exp/recip), head concat+proj, LN2, fc1, GELU(erf), fc2.

Ablations change numerics — timing only.

RESULT (stage-1: b=16, nt=tw=19, c=128, heads=4, bsub=2 -> 152 grid
steps; measured 2026-08-20, TPU v5lite, median of 5x10 iters):

  full 6.63 ms | no_ln1 6.57 | no_qkv 6.36 | no_attndots 4.89 |
  no_softmax 5.69 | no_proj 6.30 | no_ln2 7.00 | no_fc1 5.51 |
  no_gelu 6.28 | no_fc2 5.33 | attn_only 5.21 | mlp_only 5.18

Interpretation (subtract the ~1.7 ms per-call dispatch first):
  device full ~4.93 ms. attn_only/mlp_only give the clean split:
  whole-attention increment ~1.45 ms (29%), whole-MLP ~1.42 ms (29%),
  SHARED FLOOR ~2.06 ms (42%, ~13.6 us/step) = x read + reshape +
  one LN + f32 residual stream + bf16 cast + write. That floor is
  ~10x the HBM bound of its ~1 MB/step I/O -> the stage-1 block is
  bound by in-kernel data movement / VPU layout work, not by any
  single matmul or the softmax. Single-piece deltas are NON-ADDITIVE
  (removed work overlaps: sum of deltas 5.8 ms >> 4.93-floor) — do
  not read them as a budget; no_ln2's negative delta is scheduling
  noise. Consistent with probe_attngroup's wash: halving the dot
  count leaves the streamed-rows floor unchanged. Remaining levers
  at this shape would need to cut the shared floor itself (fewer,
  larger grid steps — blocked by the 16 MB scoped-VMEM budget, see
  PERF.md "budget-scale A/B CLOSED" — or cross-block fusion, which
  needs halo-dependent cross-step reads the grid cannot express).

Usage: python scripts/probe_blockcost.py [--stage2]
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


def _ln(x, eps=1e-5):
    f = x.astype(jnp.float32)
    m = jnp.mean(f, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(f - m), axis=-1, keepdims=True)
    return (f - m) * jax.lax.rsqrt(v + eps)


ABLATIONS = ("full", "no_ln1", "no_qkv", "no_attndots", "no_softmax",
             "no_proj", "no_ln2", "no_fc1", "no_gelu", "no_fc2",
             "attn_only", "mlp_only")


def _kernel(x_ref, wqkv_ref, wp_ref, f1w_ref, f2w_ref, comb_ref, out_ref, *,
            heads: int, scale: float, bsub: int, tw: int, n: int,
            drop: str):
    dt = x_ref.dtype
    c = x_ref.shape[-1]
    x_raw = x_ref[0].reshape(bsub * tw * n, c)
    rows = x_raw.shape[0]
    nb = bsub * tw
    dh = c // heads

    ln = x_raw if drop == "no_ln1" else _ln(x_raw).astype(dt)
    if drop == "no_qkv":
        qkv = jnp.concatenate([ln.astype(dt)] * 3, axis=-1)
    else:
        qkv = jnp.dot(ln.astype(dt), wqkv_ref[:].astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
    q3 = (qkv[:, :c] * scale).reshape(nb, n, c)
    k3 = qkv[:, c:2 * c].reshape(nb, n, c)
    v3 = qkv[:, 2 * c:].reshape(nb, n, c)

    if drop == "mlp_only":
        y = x_raw.astype(jnp.float32)
    else:
        o_heads = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            comb = comb_ref[:, h].astype(jnp.float32)
            if bsub > 1:
                comb = jnp.concatenate([comb] * bsub, axis=0)
            if drop == "no_attndots":
                o_heads.append(v3[..., sl])
                continue
            s = jax.lax.dot_general(q3[..., sl], k3[..., sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            if drop == "no_softmax":
                e = s + comb
                recip = 1.0
            else:
                s = s + comb
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(e.astype(dt), v3[..., sl],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o_heads.append((o * recip).astype(dt))
        allo = jnp.concatenate(o_heads, axis=-1).reshape(rows, c)
        if drop == "no_proj":
            acc = allo.astype(jnp.float32)
        else:
            acc = jnp.dot(allo.astype(dt), wp_ref[:].astype(dt),
                          preferred_element_type=jnp.float32)
        y = x_raw.astype(jnp.float32) + acc

    if drop == "attn_only":
        out_ref[0] = y.reshape(bsub, tw * n, c).astype(dt)
        return
    h2 = y if drop == "no_ln2" else _ln(y)
    if drop != "no_fc1":
        h2 = jnp.dot(h2.astype(dt), f1w_ref[:].astype(dt),
                     preferred_element_type=jnp.float32)
    else:
        h2 = jnp.concatenate([h2.astype(jnp.float32)] * 4, axis=-1)
    if drop != "no_gelu":
        h2 = 0.5 * h2 * (1.0 + _erf(h2 * (0.5 ** 0.5)))
    if drop == "no_fc2":
        h2 = h2[:, :c]
    else:
        h2 = jnp.dot(h2.astype(dt), f2w_ref[:].astype(dt),
                     preferred_element_type=jnp.float32)
    out_ref[0] = (y + h2).reshape(bsub, tw * n, c).astype(dt)


def build(b, nt, tw, n, c, heads, bsub, drop, seed=0):
    rng = np.random.RandomState(seed)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(nt, b, tw * n, c) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) / np.sqrt(c), dt)
    wp = jnp.asarray(rng.randn(c, c) / np.sqrt(c), dt)
    f1 = jnp.asarray(rng.randn(c, 4 * c) / np.sqrt(c), dt)
    f2 = jnp.asarray(rng.randn(4 * c, c) / np.sqrt(4 * c), dt)
    comb = jnp.asarray(rng.randn(tw, heads, n, n).astype(np.float32) * .02,
                       jnp.bfloat16)

    kern = functools.partial(_kernel, heads=heads, scale=(c // heads) ** -0.5,
                             bsub=bsub, tw=tw, n=n, drop=drop)
    fn = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
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
            pl.BlockSpec((tw, heads, n, n), lambda t, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsub, tw * n, c),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, b, tw * n, c), dt),
    )
    return jax.jit(lambda: fn(x, wqkv, wp, f1, f2, comb))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage2", action="store_true")
    args = ap.parse_args()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    if args.stage2:
        b, nt, tw, n, c, heads, bsub = 16, 10, 10, 49, 256, 8, 2
    else:
        b, nt, tw, n, c, heads, bsub = 16, 19, 19, 49, 128, 4, 2
    steps = nt * (b // bsub)
    base = None
    for drop in ABLATIONS:
        try:
            fn = build(b, nt, tw, n, c, heads, bsub, drop)
            ms = timeit(fn) * 1e3
        except Exception as e:
            print(f"  {drop:12s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        if base is None:
            base = ms
        print(f"  {drop:12s}: {ms:7.2f} ms  ({ms*1e3/steps:6.1f} us/step, "
              f"delta {base-ms:+6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
