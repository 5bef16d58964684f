"""Decompose the RGB-tail cost (r4): probe_narrow_gemm showed the tail's
ENTIRE MXU work is ~0.8 ms device (4 accumulated (133k,512)@(512,128)
taps), yet every end-to-end formulation measures 5-7 ms isolated. Time the
pieces: _phase2_pad alone, tap GEMMs without spatial slicing (full-width,
wrong-but-shaped), the dx/dy tap slicing, align, interleave.

Usage: python scripts/probe_tail_pieces.py
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

from mastermetastyletransfer_tpu.ops import conv as C


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


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
    b, g, c = 8, 128, 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, g, g, 16 * c), jnp.bfloat16)
    p = C.init_conv(jax.random.PRNGKey(1), c, 3)
    p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
    k2_, bases = C._phase2_kernel(p["kernel"].astype(jnp.float32), False)
    k2_ = k2_.astype(jnp.bfloat16)
    w4 = jnp.zeros((2, 2, 512, 128), jnp.bfloat16).at[..., :48].set(k2_)

    def pad_only(xx):
        return C._phase2_pad(xx, 4, c, False)

    def pad_gemm_noslice(xx):
        pp = C._phase2_pad(xx, 4, c, False)
        rows = pp.reshape(b * 130 * 130, 512)
        acc = None
        for t in range(4):
            y = jnp.dot(rows, w4.reshape(4, 512, 128)[t],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.astype(jnp.bfloat16)

    def gemm_sliced(pp):
        # the v5 formulation from a PRE-padded input: isolates tap slicing
        acc = None
        for dy in range(2):
            for dx in range(2):
                tap = pp[:, dy:dy + 129, dx:dx + 129, :]
                t = jnp.einsum("bhwc,cd->bhwd", tap, k2_[dy, dx],
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc.astype(jnp.bfloat16)

    def align_only(big):
        return C._align2(big, g, g, 3, bases)

    def interleave_only(out):
        return C.phase_interleave2(out)

    pp = jax.jit(pad_only)(x)
    big = jax.jit(gemm_sliced)(pp)
    out = jax.jit(align_only)(big)

    for name, fn, arg in [("pad_only", pad_only, x),
                          ("pad+gemm_noslice", pad_gemm_noslice, x),
                          ("gemm_sliced(prepad)", gemm_sliced, pp),
                          ("align_only", align_only, big),
                          ("interleave_only", interleave_only, out)]:
        jf = jax.jit(fn)
        ms = timeit(jf, arg) * 1e3
        print(json.dumps({"case": name, "ms": round(ms, 3),
                          "dev_ms": round(max(ms - 1.7, 0.001), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
