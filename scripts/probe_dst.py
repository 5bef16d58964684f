"""Isolate the batched-backward Mosaic SIGSEGV contraction-by-contraction.

The full backward kernel at bsub>1 crashes the Mosaic compiler
(scripts/probe_bwd.py). This probe compiles MINIMAL pallas kernels, one per
contraction pattern the backward uses, at the train shapes, to find the
guilty pattern and test workarounds:

  ddt   : (B,M,K) x (B,N,K) -> (B,M,N)   contract last dims   (S = q k^T)
  ddn   : (B,M,K) x (B,K,N) -> (B,M,N)   rows x rows          (O = P v)
  dst   : (B,K,M) x (B,K,N) -> (B,M,N)   contract MIDDLE dims (dK = dS^T q)
  dst_unroll : per-image 2-D dots for the dst pattern (workaround A)
  dst_swap   : explicit swapaxes then ddn (workaround B)

    python scripts/probe_dst.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

f32 = jnp.float32


def _kern(a_ref, b_ref, o_ref, *, mode: str, bsub: int):
    a = a_ref[:]
    b = b_ref[:]
    if mode == "ddt":
        o = jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)
    elif mode == "ddn":
        o = jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
    elif mode == "dst":
        o = jax.lax.dot_general(a, b, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
    elif mode == "dst_unroll":
        o = jnp.stack([
            jax.lax.dot_general(a[i], b[i], (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
            for i in range(bsub)])
    elif mode == "dst_swap":
        at = jnp.swapaxes(a, 1, 2)
        o = jax.lax.dot_general(at, b, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
    else:
        raise ValueError(mode)
    o_ref[:] = o.astype(o_ref.dtype)


def run(name, mode, bsub, m, k, n, a_shape, b_shape):
    out_shape = (bsub, m, n)
    kern = functools.partial(_kern, mode=mode, bsub=bsub)
    spec = lambda s: pl.BlockSpec(s, lambda: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    try:
        fn = pl.pallas_call(
            kern,
            in_specs=[spec(a_shape), spec(b_shape)],
            out_specs=spec(out_shape),
            out_shape=jax.ShapeDtypeStruct(out_shape, f32),
            interpret="--interpret" in sys.argv,
        )
        a = jax.random.normal(jax.random.PRNGKey(0), a_shape, jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), b_shape, jnp.bfloat16)
        out = jax.jit(fn)(a, b)
        jax.device_get(out.ravel()[0])
        print(json.dumps({"probe": name, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False,
                          "error": str(e)[:200]}), flush=True)
        return False


def main():
    # train-step stage-1 shapes: TWN=245 (5 windows x 49), dh=32, bsub=4
    for bsub in (4, 8):
        twn, dh = 245, 32
        # S-like: (B,TWN,dh) x (B,TWN,dh) -> (B,TWN,TWN)
        run(f"ddt_b{bsub}", "ddt", bsub, twn, dh, twn,
            (bsub, twn, dh), (bsub, twn, dh))
        # O-like: (B,TWN,TWN) x (B,TWN,dh) -> (B,TWN,dh)
        run(f"ddn_b{bsub}", "ddn", bsub, twn, twn, dh,
            (bsub, twn, twn), (bsub, twn, dh))
        # dK-like middle-dim: (B,TWN,TWN) x (B,TWN,dh) -> (B,TWN,dh)
        run(f"dst_b{bsub}", "dst", bsub, twn, twn, dh,
            (bsub, twn, twn), (bsub, twn, dh))
        run(f"dst_unroll_b{bsub}", "dst_unroll", bsub, twn, twn, dh,
            (bsub, twn, twn), (bsub, twn, dh))
        run(f"dst_swap_b{bsub}", "dst_swap", bsub, twn, twn, dh,
            (bsub, twn, twn), (bsub, twn, dh))


if __name__ == "__main__":
    main()
