"""True in-context stage costs: time jitted PREFIXES of the forward
pipeline; consecutive differences are what each stage really costs inside
the full jit (isolated per-stage jits pay their own dispatch + HBM round
trips and overstate).

    python scripts/profile_prefix.py [--size 512] [--batch 8]
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
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2, rounds=3):
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
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--matmul_mode", default="native",
                    choices=["native", "split3"],
                    help="split3 = the compliant 3-pass in-kernel mode "
                         "(sets ambient 'high' for the XLA parts)")
    ap.add_argument("--precision", default=None,
                    choices=["default", "high", "highest"],
                    help="ambient jax.default_matmul_precision (f32 points: "
                         "'highest' = the recorded f32+pallas point)")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false",
                    default=True, help="profile the XLA path")
    args = ap.parse_args()

    if args.matmul_mode == "split3":
        jax.config.update("jax_default_matmul_precision", "high")
    elif args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)

    base = ModelConfig(compute_dtype=args.dtype)
    cfg = base.replace(
        swin=base.swin.replace(use_pallas=args.pallas,
                               matmul_mode=args.matmul_mode),
        transformer=base.transformer.replace(use_pallas=args.pallas,
                                             matmul_mode=args.matmul_mode),
        decoder=base.decoder.replace(use_pallas=args.pallas,
                                     matmul_mode=args.matmul_mode))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    b, s = args.batch, args.size
    dt_ = jnp.dtype(args.dtype)
    content = jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 3), dt_)
    style = jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 3), dt_)

    def p_swin(params, c, st):
        both = jnp.concatenate([c, st], axis=0)
        return swin_backbone_apply(params["swin"], both, cfg.swin)

    def p_st(params, c, st):
        both = p_swin(params, c, st)
        fc, fs = both[:b], both[b:]
        return style_transformer_apply(params["style_transformer"], fc, fs,
                                       cfg.transformer, k=1)

    def p_full(params, c, st):
        fcs = p_st(params, c, st)
        return cnn_decoder_apply(params["decoder"], fcs, cfg.decoder)

    prev = 0.0
    for name, fn in (("swin", p_swin), ("swin+st", p_st),
                     ("swin+st+decoder", p_full)):
        dt = timeit(jax.jit(fn), params, content, style) * 1e3
        print(json.dumps({"prefix": name, "ms": round(dt, 3),
                          "delta_ms": round(dt - prev, 3)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
