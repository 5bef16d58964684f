"""Probe: is the RGB-tail cost an MXU PASS-COUNT floor? Time standalone
(M, 512) @ (512, N) bf16 GEMMs at the tail's M = 8*129^2 = 133k for
N in {48, 128, 256, 512}: if time is ~flat in N (pass-bound: N<=128 is one
N-tile; K=512 is 4 K-tiles regardless), the composed conv8 cannot beat
~4*K_tiles*M_tiles passes no matter the formulation — closing the lever
class. Also the 4-tap accumulated variant at N=128 (the l2k128 kernel's
exact MXU work).

Usage: python scripts/probe_narrow_gemm.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    jax.device_get(x.ravel()[0])


def timeit(fn, *args, iters=20, warmup=3, rounds=5):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    m, k = 8 * 129 * 129, 512
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    for n in (48, 128, 256, 512):
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        f = jax.jit(lambda x, w: x @ w)
        ms = timeit(f, a, b) * 1e3
        dev = max(ms - 1.7, 1e-3)
        tf = 2 * m * k * n / dev / 1e9
        print(json.dumps({"case": f"gemm_n{n}", "ms": round(ms, 3),
                          "dev_ms": round(dev, 3), "tf_s": round(tf, 1)}),
              flush=True)
    # 4 accumulated taps at N=128 (l2k128's MXU work, shared input)
    ws = jax.random.normal(key, (4, k, 128), jnp.bfloat16)

    def tap4(x, ws):
        acc = None
        for t in range(4):
            y = jnp.dot(x, ws[t], preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.astype(jnp.bfloat16)

    f = jax.jit(tap4)
    ms = timeit(f, a, ws) * 1e3
    dev = max(ms - 1.7, 1e-3)
    print(json.dumps({"case": "tap4_n128", "ms": round(ms, 3),
                      "dev_ms": round(dev, 3),
                      "tf_s": round(4 * 2 * m * k * 128 / dev / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
