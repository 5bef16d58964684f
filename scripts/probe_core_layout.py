"""Attention-core layout shootout on the swin stage-1 shape: given
pre-projected q/k/v tiles in VMEM, is logits+softmax+PV faster as
  A) per-image batched (BSUB, TWN, TWN) dense tiles (current: 5x softmax
     waste at TW=5, fat matmuls), or
  B) per-window batched (BSUB*TW, N, N) exact blocks (no waste, tiny
     matmuls)?

    python scripts/probe_core_layout.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, NT, BSUB = 16, 73, 4
TW, N, C, H = 5, 49, 128, 4
TWN = TW * N
DH = C // H


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20):
    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(name, fn, *args):
    try:
        dt = timeit(jax.jit(fn), *args) * 1e3
        print(json.dumps({"probe": name, "ms": round(dt, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False,
                          "error": str(e)[-160:]}), flush=True)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B // BSUB, NT, BSUB, TWN, C),
                          jnp.bfloat16)
    maskA = jax.random.normal(jax.random.PRNGKey(1), (NT, TWN, TWN),
                              jnp.bfloat16)

    # A: dense tiles, image-batched (current form)
    def kern_a(x_ref, m_ref, o_ref):
        f32 = jnp.float32
        q = x_ref[0, 0].reshape(BSUB * TWN, C)
        outs = []
        m = m_ref[0].astype(f32)
        q3 = q.reshape(BSUB, TWN, C)
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            s = jax.lax.dot_general(q3[..., sl], q3[..., sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=f32)
            s = s + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(e.astype(jnp.bfloat16), q3[..., sl],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=f32)
            outs.append((o * r).astype(jnp.bfloat16))
        o_ref[0, 0] = jnp.concatenate(outs, axis=-1).reshape(BSUB, TWN, C)

    def var_a(x, m):
        xs = pl.BlockSpec((1, 1, BSUB, TWN, C), lambda j, i: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        ms = pl.BlockSpec((1, TWN, TWN), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_a, grid=(NT, B // BSUB), in_specs=[xs, ms], out_specs=xs,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x, m)

    run("core_dense_imgbatched", var_a, x, maskA)

    # B: per-window batched, exact N x N blocks
    xw = jax.random.normal(jax.random.PRNGKey(0),
                           (B // BSUB, NT, BSUB * TW, N, C), jnp.bfloat16)
    maskB = jax.random.normal(jax.random.PRNGKey(1), (NT, TW, N, N),
                              jnp.bfloat16)

    def kern_b(x_ref, m_ref, o_ref):
        f32 = jnp.float32
        xq = x_ref[0, 0]                       # (BSUB*TW, N, C)
        outs = []
        m = m_ref[0].astype(f32)               # (TW, N, N)
        mt = jnp.concatenate([m] * BSUB, axis=0)
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            s = jax.lax.dot_general(xq[..., sl], xq[..., sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=f32)
            s = s + mt
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(e.astype(jnp.bfloat16), xq[..., sl],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=f32)
            outs.append((o * r).astype(jnp.bfloat16))
        o_ref[0, 0] = jnp.concatenate(outs, axis=-1)

    def var_b(x, m):
        xs = pl.BlockSpec((1, 1, BSUB * TW, N, C),
                          lambda j, i: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        ms = pl.BlockSpec((1, TW, N, N), lambda j, i: (j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_b, grid=(NT, B // BSUB), in_specs=[xs, ms], out_specs=xs,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x, m)

    run("core_window_batched", var_b, xw, maskB)


if __name__ == "__main__":
    main()


def probe_bf16_softmax():
    x = jax.random.normal(jax.random.PRNGKey(0), (B // BSUB, NT, BSUB, TWN, C),
                          jnp.bfloat16)
    maskA = jax.random.normal(jax.random.PRNGKey(1), (NT, TWN, TWN),
                              jnp.bfloat16)

    def kern_bf16(x_ref, m_ref, o_ref):
        bf = jnp.bfloat16
        q = x_ref[0, 0].reshape(BSUB * TWN, C)
        outs = []
        m = m_ref[0]
        q3 = q.reshape(BSUB, TWN, C)
        for h in range(H):
            sl = slice(h * DH, (h + 1) * DH)
            s = jax.lax.dot_general(q3[..., sl], q3[..., sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=bf)
            s = s + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            r = 1.0 / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(e, q3[..., sl],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            outs.append((o * r).astype(bf))
        o_ref[0, 0] = jnp.concatenate(outs, axis=-1).reshape(BSUB, TWN, C)

    def var(x, m):
        xs = pl.BlockSpec((1, 1, BSUB, TWN, C), lambda j, i: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        ms = pl.BlockSpec((1, TWN, TWN), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_bf16, grid=(NT, B // BSUB), in_specs=[xs, ms], out_specs=xs,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x, m)

    run("core_dense_bf16softmax", var, x, maskA)


probe_bf16_softmax()
