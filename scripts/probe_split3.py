"""Probe: 3-pass hi/lo split-GEMM inside Pallas vs f32 HIGHEST.

The accuracy-compliant (<=1e-3 MAE) operating point currently runs f32
everywhere with jax.default_matmul_precision("highest") — a 6-pass bf16
decomposition per matmul (goldens/operating_points.json: 72.4 imgs/s vs
233.9 for bf16+pallas). XLA's "high" precision is the 3-pass variant
(a_hi@b_hi + a_hi@b_lo + a_lo@b_hi) and measured 1.2e-4 rel MAE on the
full model — comfortably compliant — but Mosaic REJECTS precision=HIGH
in-kernel (r3 session log). This probe measures whether a MANUAL 3-pass
split written as three bf16 dots inside the kernel:

  a_hi = a.astype(bf16); a_lo = (a - a_hi).astype(bf16)   (same for b)
  y    = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi                (f32 accum)

(1) lowers in Mosaic at all, (2) beats the in-kernel f32 HIGHEST dot at
the model's hot shapes, and (3) lands in the expected ~1e-4 relative
error class (checked vs a float64 oracle).

Hardware truths this probe pinned (r3): Mosaic rejects precision=HIGH
BOTH explicit and ambient ("NotImplementedError: Unsupported dot
precision: HIGH"); HIGHEST and DEFAULT lower fine; split3 lowers fine
and lands at 4.4e-6 rel. The model's hot GEMM shapes run all modes
within +-25% (latency-bound), which is why the full-model split3
operating point is a wash vs HIGHEST (PERF.md lever table).

Timing: ITERS-deep fori_loop INSIDE one kernel so the ~1.7 ms tunnel
dispatch (CLAUDE.md device model) amortizes; per-dot ms is the
loop-body marginal cost. Microbench CAUTION applies — keep/revert is
decided from full bench.py / operating_points A/Bs only.
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

DISPATCH_MS = 1.7
ITERS = 30

f32 = jnp.float32
bf16 = jnp.bfloat16


def _time_call(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) * 1e3
    return max(ms - DISPATCH_MS, 1e-3) / ITERS


def _dot(a, b, precision=None):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32,
                               precision=precision)


def _split3(a, b):
    a_hi = a.astype(bf16)
    a_lo = (a - a_hi.astype(f32)).astype(bf16)
    b_hi = b.astype(bf16)
    b_lo = (b - b_hi.astype(f32)).astype(bf16)
    return (_dot(a_hi, b_hi) + _dot(a_hi, b_lo) + _dot(a_lo, b_hi))


def _kernel(a_ref, b_ref, o_ref, *, mode, k):
    a = a_ref[...]
    b = b_ref[...]

    def body(_, a):
        if mode == "bf16":
            y = _dot(a, b)
            return y[:, :k].astype(bf16)
        if mode == "f32_plain":
            y = _dot(a, b)
        elif mode == "f32_highest":
            y = _dot(a, b, precision=jax.lax.Precision.HIGHEST)
        elif mode == "f32_high":
            # explicit HIGH: r3 session 1 observed a Mosaic reject — kept in
            # the probe to pin down exactly what this toolchain accepts
            y = _dot(a, b, precision=jax.lax.Precision.HIGH)
        elif mode == "split3":
            y = _split3(a, b)
        else:
            raise ValueError(mode)
        return y[:, :k]

    a = jax.lax.fori_loop(0, ITERS, body, a)
    o_ref[...] = a


def pallas_mode(mode, m, k, n, a_np, b_np):
    dt = bf16 if mode == "bf16" else f32
    a = jnp.asarray(a_np, dt)
    b = jnp.asarray(b_np, dt)
    kern = functools.partial(_kernel, mode=mode, k=k)
    fn = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k), dt),
    ))
    try:
        ms = _time_call(fn, a, b)
        return ms, None
    except Exception as e:  # noqa: BLE001 - probe reports toolchain rejects
        return None, f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"


def accuracy(m=1024, k=256, n=256):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    oracle = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(oracle).mean()

    def rel(y):
        return float(np.abs(np.asarray(y, np.float64) - oracle).mean() / scale)

    ja, jb = jnp.asarray(a), jnp.asarray(b)
    print("== accuracy (rel MAE vs f64 oracle), XLA host ==")
    print(f"bf16 1-pass : {rel(_dot(ja.astype(bf16), jb.astype(bf16))):.3e}")
    print(f"split3      : {rel(_split3(ja, jb)):.3e}")
    print(f"xla high    : {rel(_dot(ja, jb, precision=jax.lax.Precision.HIGH)):.3e}")
    print(f"xla highest : {rel(_dot(ja, jb, precision=jax.lax.Precision.HIGHEST)):.3e}")


def main():
    print("devices:", jax.devices())
    accuracy()
    shapes = [
        ("ST proj   (1960, 256, 256)", 1960, 256, 256),
        ("ST MLP fc1 (1960, 256, 1024)", 1960, 256, 1024),
        ("proj tall  (8192, 256, 256)", 8192, 256, 256),
        ("control    (2048, 2048, 2048)", 2048, 2048, 2048),
    ]
    modes = ["bf16", "f32_plain", "f32_highest", "f32_high", "split3"]
    rng = np.random.default_rng(1)
    print(f"== Pallas in-kernel dot, per-iter ms over {ITERS}-deep loop ==")
    for name, m, k, n in shapes:
        a_np = rng.standard_normal((m, k)).astype(np.float32)
        b_np = rng.standard_normal((k, n)).astype(np.float32)
        gf = 2 * m * k * n / 1e9
        row = [f"{name:30s}"]
        for mode in modes:
            ms, err = pallas_mode(mode, m, k, n, a_np, b_np)
            if ms is None:
                row.append(f"{mode} REJECT({err})")
            else:
                row.append(f"{mode} {ms:7.3f}ms {gf/ms:6.1f}TF/s")
        print("  ".join(row))


if __name__ == "__main__":
    main()
