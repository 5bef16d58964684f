"""k=3 (ZS-L3) budget assignment — VERDICT r4 task 7.

Times jitted PREFIXES of the k=3 pipeline at ITERATION granularity (the
same consecutive-delta methodology as profile_prefix.py — isolated stage
jits overstate by their own dispatch + HBM round trips):

  swin                       -> the shared front
  + stream encoder k=1..3    -> per-iteration ENCODER cost (the style-only
                                half: Key/Scale/Shift evolution,
                                reference codes/style_transformer.py:855-882)
  + full windowed ST k=1..3  -> per-iteration encoder+DECODER cost
                                (decoder = self-MHA + dual-V + modulation
                                + MLP, reference :1045-1125)
  + CNN decoder (k=3)        -> the tail

Usage: python scripts/probe_k3.py [--size 512] [--batch 8]
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


def _sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20, rounds=3):
    for _ in range(2):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from mastermetastyletransfer_tpu.config import ModelConfig
    from mastermetastyletransfer_tpu.models import init_master_model
    from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_stream_windowed, style_transformer_apply_windowed,
    )
    from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply

    base = ModelConfig(compute_dtype=args.dtype)
    cfg = base.replace(
        swin=base.swin.replace(use_pallas=True),
        transformer=base.transformer.replace(use_pallas=True),
        decoder=base.decoder.replace(use_pallas=True))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    b, s = args.batch, args.size
    dt_ = jnp.dtype(args.dtype)
    content = jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 3), dt_)
    style = jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 3), dt_)

    def p_swin(p, c, st):
        both = jnp.concatenate([c, st], axis=0)
        return swin_backbone_apply(p["swin"], both, cfg.swin)

    def mk_enc(k):
        def f(p, c, st):
            both = p_swin(p, c, st)
            fs = both[b:]
            return tuple(style_stream_windowed(
                p["style_transformer"], fs, cfg.transformer, k=k))
        return f

    def mk_full(k):
        def f(p, c, st):
            both = p_swin(p, c, st)
            fc, fs = both[:b], both[b:]
            return style_transformer_apply_windowed(
                p["style_transformer"], fc, fs, cfg.transformer, k=k)
        return f

    def p_all(p, c, st):
        fcs = mk_full(3)(p, c, st)
        return cnn_decoder_apply(p["decoder"], fcs, cfg.decoder)

    rows = [("swin", p_swin)]
    rows += [(f"swin+enc_k{k}", mk_enc(k)) for k in (1, 2, 3)]
    rows += [(f"swin+st_k{k}", mk_full(k)) for k in (1, 2, 3)]
    rows += [("swin+st_k3+decoder", p_all)]
    out = {}
    for name, fn in rows:
        ms = timeit(jax.jit(fn), params, content, style) * 1e3
        out[name] = ms
        print(json.dumps({"prefix": name, "ms": round(ms, 3)}), flush=True)

    enc1 = out["swin+enc_k1"] - out["swin"]
    enc_it = (out["swin+enc_k3"] - out["swin+enc_k1"]) / 2
    st_it = (out["swin+st_k3"] - out["swin+st_k1"]) / 2
    print(json.dumps({
        "encoder_iter1_ms": round(enc1, 3),
        "encoder_extra_iter_ms": round(enc_it, 3),
        "full_extra_iter_ms": round(st_it, 3),
        "decoder_extra_iter_ms": round(st_it - enc_it, 3),
        "cnn_decoder_ms": round(out["swin+st_k3+decoder"] - out["swin+st_k3"],
                                3),
    }))


if __name__ == "__main__":
    main()
