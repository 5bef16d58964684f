"""Per-conv prefix profile of the CNN decoder (VERDICT r3 task 2b).

The decoder costs 9.1 ms of the 35.1 ms pair pipeline (512^2 batch 8
bf16), 41% of style-locked serving, and the stencil-GEMM v2 kernel wins
locked mode (+2%) but not pair mode — unexplained. This probe times
jitted PREFIXES of cnn_decoder_apply (conv 0..i) at the real decoder
input shape so consecutive differences give the true in-context cost of
each conv, under stencil ON and OFF.

Layer map at 512^2 (decoder input 64x64x256, batch 8):
  i=0 plain 256->128 @64^2; i=1 up-conv 128->128 (phase L1 @64^2);
  i=2,3 phase conv 128 @64^2; i=4 phase conv 128->64 + interleave
  (fine 128^2); i=5 up-conv 64->64 XLA (cin<128) -> phase @128^2;
  i=6 phase 64->32 + interleave (fine 256^2); i=7 up-conv 32->32 XLA
  -> phase @256^2; i=8 phase 32->3 XLA (c_out<32) + interleave (512^2).

Usage: python scripts/probe_decoder.py [--batch 8] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.config import DecoderConfig
from mastermetastyletransfer_tpu.models.decoder import (
    _channel_plan, cnn_decoder_apply, init_cnn_decoder,
)


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


def decoder_prefix(params, x, cfg: DecoderConfig, upto: int):
    """cnn_decoder_apply truncated after conv `upto` (inclusive)."""
    return cnn_decoder_apply(params, x, cfg, upto=upto)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--stencil", choices=["on", "off", "both"],
                    default="both")
    ap.add_argument("--phase2", action="store_true",
                    help="profile the double-phase tail decoder")
    args = ap.parse_args()

    g = args.size // 8
    x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, g, g, 256),
                          jnp.bfloat16)
    modes = {"on": [True], "off": [False],
             "both": [True, False]}[args.stencil]
    for stencil in modes:
        cfg = DecoderConfig(use_pallas=True, use_stencil_conv=stencil,
                            phase2_tail=args.phase2)
        params = init_cnn_decoder(jax.random.PRNGKey(1), cfg)
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), params)
        prev = 0.0
        for upto in range(9):
            f = jax.jit(lambda p, xx, u=upto, c=cfg: decoder_prefix(
                p, xx, c, u))
            dt = timeit(f, params, x) * 1e3
            print(json.dumps({"stencil": stencil, "phase2": args.phase2,
                              "prefix_conv": upto,
                              "ms": round(dt, 3),
                              "delta_ms": round(dt - prev, 3)}), flush=True)
            prev = dt


if __name__ == "__main__":
    main()
