"""Style-locked serving prefix profile (VERDICT r3 task 5 evidence).

Times jitted PREFIXES of the per-request locked pipeline — content swin ->
+ transformer decoder (from the precomputed style stream) -> + CNN decoder —
so consecutive deltas are true in-context stage costs. The style stream
itself is precomputed (content-independent, models.encode_style_stream) and
costs nothing per request.

    python scripts/profile_locked.py [--size 512] [--batch 8] [--k 1]
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

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
from mastermetastyletransfer_tpu.models.master import (
    encode_features, encode_style_stream,
)
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_transformer_apply_from_stream,
)


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20, warmup=3, rounds=3):
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    base = ModelConfig(compute_dtype=args.dtype)
    cfg = base.replace(
        swin=base.swin.replace(use_pallas=True),
        transformer=base.transformer.replace(use_pallas=True),
        decoder=base.decoder.replace(use_pallas=True))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    b, s = args.batch, args.size
    dt_ = jnp.dtype(args.dtype)
    content = jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 3), dt_)
    style = jax.random.uniform(jax.random.PRNGKey(2), (1, s, s, 3), dt_)

    stream = jax.jit(
        lambda p, st: encode_style_stream(p, st, cfg, k=args.k))(params, style)

    def p_swin(params, c, stream):
        return encode_features(params, c, cfg)

    def p_st(params, c, stream):
        fc = p_swin(params, c, stream)
        return style_transformer_apply_from_stream(
            params["style_transformer"], fc, stream, cfg.transformer)

    def p_full(params, c, stream):
        fcs = p_st(params, c, stream)
        return cnn_decoder_apply(params["decoder"], fcs, cfg.decoder)

    prev = 0.0
    for name, fn in (("content_swin", p_swin), ("+st_decoder", p_st),
                     ("+cnn_decoder", p_full)):
        dt = timeit(jax.jit(fn), params, content, stream) * 1e3
        print(json.dumps({"prefix": name, "ms": round(dt, 3),
                          "delta_ms": round(dt - prev, 3),
                          "batch": b, "size": s, "k": args.k}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
