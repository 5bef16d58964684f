"""Probe Mosaic-acceptable formulations of the phase-align kernel.

    python scripts/probe_align.py
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 8, 256, 256, 32   # conv6 shape: big (B, H+1, W+1, 4C)


def ref_align(big):
    subs = [big[:, a:a + H, bb:bb + W, (2 * a + bb) * C:(2 * a + bb + 1) * C]
            for a in range(2) for bb in range(2)]
    return jnp.concatenate(subs, axis=-1)


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


def try_variant(name, fn, big, want):
    try:
        got = jax.jit(fn)(big)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        ms = timeit(jax.jit(fn), big) * 1e3
        print(json.dumps({"variant": name, "ok": True, "err": err,
                          "ms": round(ms, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "ok": False,
                          "error": str(e)[-220:]}), flush=True)


def main():
    big = jax.random.normal(jax.random.PRNGKey(0), (B, H + 1, W + 1, 4 * C),
                            jnp.bfloat16)
    want = jax.jit(ref_align)(big)
    ms_ref = timeit(jax.jit(ref_align), big) * 1e3
    print(json.dumps({"variant": "xla_chain", "ms": round(ms_ref, 3)}),
          flush=True)

    ht = 32
    nh = H // ht

    # A: current failing form (two-ref concat then slices)
    def kern_a(m_ref, h_ref, o_ref):
        x = jnp.concatenate([m_ref[0], h_ref[0]], axis=0)
        parts = []
        for a in range(2):
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                parts.append(x[a:a + ht, bb:bb + W, sl])
        o_ref[0] = jnp.concatenate(parts, axis=-1)

    def var_a(big):
        main = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        halo = pl.BlockSpec((1, 1, W + 1, 4 * C),
                            lambda i, j: (i, j * ht + ht, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, 4 * C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_a, grid=(B, nh), in_specs=[main, halo], out_specs=out,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), big.dtype),
        )(big, big)

    try_variant("A_two_ref_concat", var_a, big, want)

    # B: slices only, no sublane concat: read main & halo separately; build
    # the a=1 rows by separate slices and stitch via roll-free writes:
    # out = lane-concat of 4 parts, each built from slices of m/h values.
    def kern_b(m_ref, h_ref, o_ref):
        m = m_ref[0]                      # (ht, W+1, 4C)
        hh = h_ref[0]                     # (1, W+1, 4C)
        parts = []
        for a in range(2):
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                if a == 0:
                    v = m[:, bb:bb + W, sl]
                else:
                    top = m[1:ht, bb:bb + W, sl]
                    bot = hh[:, bb:bb + W, sl]
                    v = jnp.concatenate([top, bot], axis=0)
                parts.append(v)
        o_ref[0] = jnp.concatenate(parts, axis=-1)

    def var_b(big):
        main = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        halo = pl.BlockSpec((1, 1, W + 1, 4 * C),
                            lambda i, j: (i, j * ht + ht, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, 4 * C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_b, grid=(B, nh), in_specs=[main, halo], out_specs=out,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), big.dtype),
        )(big, big)

    try_variant("B_value_concats", var_b, big, want)

    # C: separate row-shifted INPUT ARRAYS prepared by XLA (contiguous row
    # slices), kernel does only lane/col slicing + lane concat.
    def kern_c(x0_ref, x1_ref, o_ref):
        x0 = x0_ref[0]
        x1 = x1_ref[0]
        parts = []
        for a in range(2):
            xa = x0 if a == 0 else x1
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                parts.append(xa[:, bb:bb + W, sl])
        o_ref[0] = jnp.concatenate(parts, axis=-1)

    def var_c(big):
        x0 = big[:, :H]
        x1 = big[:, 1:H + 1]
        spec = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, 4 * C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_c, grid=(B, nh), in_specs=[spec, spec], out_specs=out,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), big.dtype),
        )(x0, x1)

    try_variant("C_prerolled_inputs", var_c, big, want)

    # D: pltpu.roll the loaded block to build the a=1 rows (no concat on
    # sublanes): x_roll = roll(x, -1, axis=0) then rows 0..ht-1 valid.
    def kern_d(m_ref, h_ref, o_ref):
        m = m_ref[0]
        hh = h_ref[0]
        full = jnp.concatenate([m, hh], axis=0)       # (ht+1, W+1, 4C)
        x1 = pltpu.roll(full, -1, 0)
        parts = []
        for a in range(2):
            xa = full if a == 0 else x1
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                parts.append(xa[:ht, bb:bb + W, sl])
        o_ref[0] = jnp.concatenate(parts, axis=-1)

    def var_d(big):
        main = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        halo = pl.BlockSpec((1, 1, W + 1, 4 * C),
                            lambda i, j: (i, j * ht + ht, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, 4 * C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_d, grid=(B, nh), in_specs=[main, halo], out_specs=out,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), big.dtype),
        )(big, big)

    try_variant("D_pltpu_roll", var_d, big, want)


if __name__ == "__main__":
    main()


def extra():
    big = jax.random.normal(jax.random.PRNGKey(0), (B, H + 1, W + 1, 4 * C),
                            jnp.bfloat16)
    want = jax.jit(ref_align)(big)
    ht = 32
    nh = H // ht

    # E: lane-slice STORES (src lane offset == dst lane offset, no lane move)
    def kern_e(x0_ref, x1_ref, o_ref):
        for a in range(2):
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                xa = x0_ref[0] if a == 0 else x1_ref[0]
                o_ref[0, :, :, sl] = xa[:, bb:bb + W, sl]

    def var_e(big):
        x0 = big[:, :H]
        x1 = big[:, 1:H + 1]
        spec = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, 4 * C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern_e, grid=(B, nh), in_specs=[spec, spec], out_specs=out,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), big.dtype),
        )(x0, x1)

    try_variant("E_lane_slice_stores", var_e, big, want)

    # F: four separate 32-lane outputs + XLA concat outside
    def kern_f(x0_ref, x1_ref, o00, o01, o10, o11):
        outs = [o00, o01, o10, o11]
        for a in range(2):
            for bb in range(2):
                sl = slice((2 * a + bb) * C, (2 * a + bb + 1) * C)
                xa = x0_ref[0] if a == 0 else x1_ref[0]
                outs[2 * a + bb][0] = xa[:, bb:bb + W, sl]

    def var_f(big):
        x0 = big[:, :H]
        x1 = big[:, 1:H + 1]
        spec = pl.BlockSpec((1, ht, W + 1, 4 * C), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, ht, W, C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((B, H, W, C), big.dtype)
        parts = pl.pallas_call(
            kern_f, grid=(B, nh), in_specs=[spec, spec],
            out_specs=(out, out, out, out),
            out_shape=(oshape, oshape, oshape, oshape),
        )(x0, x1)
        return jnp.concatenate(parts, axis=-1)

    try_variant("F_four_outputs", var_f, big, want)


extra()
