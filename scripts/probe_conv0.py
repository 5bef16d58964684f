"""Probe: the decoder's conv0 (plain 3x3 reflect conv, 256->128 @ 64^2,
batch 8) measures ~2.0 ms device — ~9 TF/s vs the 60-145 TF/s flat-GEMM
rate (PERF.md r4 per-conv profile). Candidate reformulations, all exact:

  xla_conv     — current reflect_conv (lax.conv_general_dilated)
  xla_9gemm    — reflect pad once, 9 shifted (B*H*W, Cin) @ (Cin, Co) dots
                 accumulated in f32 (XLA decides layout/fusion)
  xla_im2col   — reflect pad, concat the 9 taps on lanes, ONE
                 (B*H*W, 9*Cin) @ (9*Cin, Co) GEMM
  pallas       — row-resident stencil kernel (if built): 3 overlapping row
                 views, 9 accumulating in-kernel GEMMs, reflect pad in XLA

Usage: python scripts/probe_conv0.py [--batch 8] [--hw 64] [--cin 256]
       [--cout 128] [--iters 30]
"""

from __future__ import annotations

import argparse
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

from mastermetastyletransfer_tpu.ops.conv import reflect_conv


def sync(x):
    jax.device_get(x.ravel()[0])


def timeit(fn, *args, iters=30, warmup=3, rounds=5):
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


def xla_conv(params, x):
    return reflect_conv(params, x, relu=True)


def xla_9gemm(params, x):
    b, h, w, cin = x.shape
    k = params["kernel"].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = params["bias"].astype(jnp.float32)
    acc = jnp.zeros((b, h, w, k.shape[-1]), jnp.float32) + acc
    for ky in range(3):
        for kx in range(3):
            tap = xp[:, ky:ky + h, kx:kx + w, :]
            acc = acc + jnp.einsum(
                "bhwc,cd->bhwd", tap, k[ky, kx],
                preferred_element_type=jnp.float32)
    return jnp.maximum(acc, 0).astype(x.dtype)


def xla_im2col(params, x):
    b, h, w, cin = x.shape
    k = params["kernel"].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    taps = [xp[:, ky:ky + h, kx:kx + w, :]
            for ky in range(3) for kx in range(3)]
    big = jnp.concatenate(taps, axis=-1).reshape(b * h * w, 9 * cin)
    wk = k.reshape(9 * cin, -1)
    y = big @ wk + params["bias"].astype(x.dtype)
    return jnp.maximum(y, 0).reshape(b, h, w, -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--cin", type=int, default=256)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.batch, args.hw, args.hw, args.cin), dt)
    params = {
        "kernel": jax.random.normal(key, (3, 3, args.cin, args.cout),
                                    jnp.float32) * 0.05,
        "bias": jnp.zeros((args.cout,), jnp.float32),
    }

    flops = (2 * args.batch * args.hw * args.hw * 9
             * args.cin * args.cout)

    fns = {"xla_conv": xla_conv, "xla_9gemm": xla_9gemm,
           "xla_im2col": xla_im2col}
    try:
        from mastermetastyletransfer_tpu.ops.pallas_conv import (
            stencil_plain_conv,
        )
        fns["pallas"] = lambda p, x: stencil_plain_conv(
            p["kernel"], x, p["bias"], relu=True)
    except ImportError:
        pass

    ref = None
    for name, fn in fns.items():
        jf = jax.jit(fn)
        out = jf(params, x)
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        ms = timeit(jf, params, x, iters=args.iters) * 1e3
        dev = max(ms - 1.7, 1e-3)
        print(json.dumps({"impl": name, "ms": round(ms, 3),
                          "dev_ms_minus_dispatch": round(dev, 3),
                          "tf_s": round(flops / dev / 1e9, 1),
                          "max_abs_err_vs_conv": err}), flush=True)


if __name__ == "__main__":
    main()
