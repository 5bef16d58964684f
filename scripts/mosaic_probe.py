"""Probe which tensor shapes/ops Mosaic supports in-kernel on this TPU,
before committing to a kernel design (batched dot_general, 3Dx2D
contractions, sublane-split reshapes, lane concats).

    python scripts/mosaic_probe.py

Each probe compiles + runs a minimal kernel and prints ok/error + a
correctness check against XLA.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, T, C = 8, 245, 128          # images-per-step, tile rows, channels
H, DH = 4, 32


def run(name, kernel, inputs, out_shape, ref_fn):
    def const_spec(shape):
        return pl.BlockSpec(shape, lambda *a, _n=len(shape): (0,) * _n,
                            memory_space=pltpu.VMEM)

    specs = [const_spec(x.shape) for x in inputs]
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=specs,
            out_specs=const_spec(out_shape.shape),
            out_shape=out_shape,
        )
        got = jax.jit(f)(*inputs)
        want = ref_fn(*inputs)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        print(json.dumps({"probe": name, "ok": True, "max_err": err}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:220]
        print(json.dumps({"probe": name, "ok": False, "error": msg}),
              flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    w2 = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.05
    q3 = jax.random.normal(key, (B, T, DH), jnp.bfloat16)
    k3 = jax.random.normal(key, (B, T, DH), jnp.bfloat16)
    p3 = jax.random.normal(key, (B, T, T), jnp.bfloat16)

    # 1. 3D x 2D contraction (no batch dims): (B,T,C) @ (C,3C) -> (B,T,3C)
    def k_3d2d(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    run("dot_3d_x_2d", k_3d2d, [x3, w2],
        jax.ShapeDtypeStruct((B, T, 3 * C), jnp.bfloat16),
        lambda x, w: jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    # 2. batched logits: (B,T,dh) x (B,T,dh) -> (B,T,T), batch dim 0
    def k_batched(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    run("dot_batched_qkT", k_batched, [q3, k3],
        jax.ShapeDtypeStruct((B, T, T), jnp.bfloat16),
        lambda q, k: jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    # 3. batched PV: (B,T,T) x (B,T,dh) -> (B,T,dh)
    def k_batched_pv(p_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], v_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    run("dot_batched_pv", k_batched_pv, [p3, q3],
        jax.ShapeDtypeStruct((B, T, DH), jnp.bfloat16),
        lambda p, v: jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    # 4. sublane merge then split: (B,T,C) -> (B*T,C) -> (B,T,C)
    def k_splitmerge(x_ref, o_ref):
        flat = x_ref[:].reshape(B * T, C)
        o_ref[:] = (flat * 2).reshape(B, T, C)

    run("sublane_merge_split", k_splitmerge, [x3],
        jax.ShapeDtypeStruct((B, T, C), jnp.bfloat16),
        lambda x: x * 2)

    # 5. lane concat of 4 x 32 -> 128
    def k_laneconcat(q_ref, o_ref):
        parts = [q_ref[:][:, :, :] for _ in range(1)]
        del parts
        heads = [q_ref[:] for _ in range(4)]
        o_ref[:] = jnp.concatenate(heads, axis=-1)

    run("lane_concat_4x32", k_laneconcat, [q3],
        jax.ShapeDtypeStruct((B, T, 4 * DH), jnp.bfloat16),
        lambda q: jnp.concatenate([q] * 4, axis=-1))

    # 6. softmax over last dim of a 3-D f32 tensor
    def k_softmax3(p_ref, o_ref):
        s = p_ref[:].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)

    run("softmax_3d", k_softmax3, [p3],
        jax.ShapeDtypeStruct((B, T, T), jnp.bfloat16),
        lambda p: jax.nn.softmax(p.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16))

    # 7. static sublane slice at non-8-aligned offset from a 2-D value
    x2 = x3.reshape(B * T, C)

    def k_subslice(x_ref, o_ref):
        o_ref[:] = x_ref[:][T : 2 * T, :] * 2

    run("sublane_slice_245", k_subslice, [x2],
        jax.ShapeDtypeStruct((T, C), jnp.bfloat16),
        lambda x: x[T: 2 * T] * 2)


def op_floor():
    """Per-HLO floor inside one jit: time chains of N dependent small
    matmuls (unfusable) and report the slope."""
    import time

    a = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def f(a, w):
            x = a
            for _ in range(n):
                x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return x
        return f

    def sync(x):
        jax.device_get(x.ravel()[0])

    times = {}
    for n in (10, 60, 110):
        f = chain(n)
        sync(f(a, w))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = f(a, w)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        times[n] = best
        print(json.dumps({"probe": f"chain_{n}_matmuls",
                          "ms": round(best * 1e3, 4)}), flush=True)
    slope = (times[110] - times[10]) / 100
    print(json.dumps({"probe": "per_op_floor_us", "us": round(slope * 1e6, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
    op_floor()
