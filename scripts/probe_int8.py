"""Probe: is int8 worth anything at THIS model's GEMM shapes on v5e?

The int8 MXU path is nominally 2x bf16 throughput, but the model's hot
matmuls are row-tall and channel-narrow (M ~ 2k-40k, K/N in {128, 256,
512, 1024}); if those are latency/bandwidth-bound rather than MXU-bound,
int8 buys nothing. Three measurements:

  1. XLA jnp.dot int8 (int32 accumulate) vs bf16 at model shapes and at a
     big square control (8k^3) — 30-iteration scan inside one jit so the
     ~1.7 ms/call tunnel dispatch amortizes (CLAUDE.md device model).
  2. A minimal Pallas kernel doing an int8 dot — does Mosaic accept it on
     this toolchain at all?
  3. The same with per-channel dequant fused (int8 dot -> f32 scale mul),
     the shape a quantized projection kernel would actually use.

Decide from the RATIO (int8 time / bf16 time) per shape: if ~1.0 at the
model shapes, the int8 serving mode cannot move the headline and the
lever is closed with evidence.
"""

from __future__ import annotations

import functools
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

DISPATCH_MS = 1.7  # per-jit-call tunnel overhead, subtracted (CLAUDE.md)
ITERS = 30


def _time(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile+drain
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) * 1e3
    return max(ms - DISPATCH_MS, 1e-3) / ITERS


def _scan_dot(dtype, acc):
    @jax.jit
    def run(a, b):
        def body(c, _):
            y = jnp.dot(c, b, preferred_element_type=acc)
            # fold back to the input dtype so the loop carries a fixed type
            return y.astype(dtype)[:, : a.shape[1]], ()
        out, _ = jax.lax.scan(body, a, None, length=ITERS)
        return out
    return run


def xla_shapes():
    shapes = [
        ("ST proj (bsub*twn, 256, 256)", 1960, 256, 256),
        ("ST MLP fc1 (1960, 256, 1024)", 1960, 256, 1024),
        ("swin proj (1960, 128, 128)", 1960, 128, 128),
        ("full-img proj (32768, 256, 256)", 32768, 256, 256),
        ("control (4096, 4096, 4096)", 4096, 4096, 4096),
    ]
    print("== XLA dot: int8(int32 acc) vs bf16 ==")
    for name, m, k, n in shapes:
        a8 = jnp.asarray(np.random.randint(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(np.random.randint(-127, 127, (k, n)), jnp.int8)
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)
        t8 = _time(_scan_dot(jnp.int8, jnp.int32), a8, b8)
        tb = _time(_scan_dot(jnp.bfloat16, jnp.float32), abf, bbf)
        tf = 2 * m * k * n / 1e9  # GFLOP per dot
        print(f"{name:36s} int8 {t8:7.3f} ms ({tf/t8:6.1f} TF/s-eq)  "
              f"bf16 {tb:7.3f} ms ({tf/tb:6.1f} TF/s)  ratio {t8/tb:5.2f}")


def _pallas_int8_kernel(a_ref, b_ref, s_ref, o_ref, *, dequant):
    acc = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if dequant:
        o_ref[...] = acc.astype(jnp.float32) * s_ref[...]
    else:
        o_ref[...] = acc.astype(jnp.float32)


def pallas_probe(dequant: bool):
    m, k, n = 1960, 256, 256
    a8 = jnp.asarray(np.random.randint(-127, 127, (m, k)), jnp.int8)
    b8 = jnp.asarray(np.random.randint(-127, 127, (k, n)), jnp.int8)
    scale = jnp.full((1, n), 0.01, jnp.float32)
    kern = functools.partial(_pallas_int8_kernel, dequant=dequant)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )
    tag = "int8 dot + f32 dequant" if dequant else "int8 dot"
    try:
        out = jax.jit(f)(a8, b8, scale)
        v = jax.device_get(out.ravel()[0])
        print(f"Pallas {tag}: OK (out[0]={v})")
    except Exception as e:  # noqa: BLE001 - probe reports any toolchain reject
        print(f"Pallas {tag}: REJECTED -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    xla_shapes()
    print("== Mosaic int8 support ==")
    pallas_probe(dequant=False)
    pallas_probe(dequant=True)
