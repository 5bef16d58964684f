"""Per-stage TPU timing breakdown of the 512^2 forward (the evidence base for
kernel optimization — VERDICT round 1 asked for this before touching perf).

Times each stage in isolation with jitted closures and tunnel-safe syncs
(scalar device_get; block_until_ready does not block through the axon
tunnel), then sub-slices the style transformer and swin stages.

Run:  python scripts/profile_stages.py [--size 512] [--batch 8] [--no-pallas]
Emits one JSON line per measurement and a summary table to stderr.
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
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_decoder_apply, style_encoder_apply, style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.swin import (
    _block_cfg, patch_merging, style_swin_block_apply, swin_backbone_apply,
)
from mastermetastyletransfer_tpu.ops.norm import layer_norm


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


def report(name, seconds, batch):
    rec = {"stage": name, "ms": round(seconds * 1e3, 3),
           "ms_per_img": round(seconds * 1e3 / batch, 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--pallas", dest="pallas", action="store_true", default=True)
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    args = ap.parse_args()

    cfg = ModelConfig(compute_dtype=args.dtype)
    if args.pallas:
        cfg = cfg.replace(swin=cfg.swin.replace(use_pallas=True),
                          transformer=cfg.transformer.replace(use_pallas=True),
                          decoder=cfg.decoder.replace(use_pallas=True))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    dt = jnp.dtype(args.dtype)

    b, s = args.batch, args.size
    content = jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 3), dt)
    style = jax.random.uniform(jax.random.PRNGKey(2), (b, s, s, 3), dt)
    feat = jax.random.normal(jax.random.PRNGKey(3),
                             (b, s // 8, s // 8, 256), dt) * 0.5
    feat2 = jax.random.normal(jax.random.PRNGKey(4),
                              (b, s // 8, s // 8, 256), dt) * 0.5

    rows = []

    # ---- full forward --------------------------------------------------
    full = jax.jit(lambda p, c, st: master_apply(p, c, st, cfg, k=args.k))
    rows.append(report("full_forward", timeit(full, params, content, style), b))

    # ---- swin encoder (content+style = 2B batch, as master_apply runs it)
    both = jnp.concatenate([content, style], axis=0)
    swin = jax.jit(lambda p, x: swin_backbone_apply(p, x, cfg.swin))
    rows.append(report("swin_2B", timeit(swin, params["swin"], both), b))

    # swin sub-stages
    swin_cfg = cfg.swin

    @jax.jit
    def swin_embed(p, x):
        bb, hh, ww, cin = x.shape
        pe = p["patch_embed"]["conv"]
        e = pe["kernel"].shape[-1]
        patches = x.reshape(bb, hh // 4, 4, ww // 4, 4, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            bb, hh // 4, ww // 4, 16 * cin)
        wk = pe["kernel"].reshape(16 * cin, e).astype(patches.dtype)
        y = patches @ wk + pe["bias"].astype(patches.dtype)
        return layer_norm(y, p["patch_embed"]["norm"]["scale"],
                          p["patch_embed"]["norm"]["bias"])

    x1 = swin_embed(params["swin"], both)
    rows.append(report("swin_patch_embed_2B",
                       timeit(swin_embed, params["swin"], both), b))

    def stage_fn(stage):
        @jax.jit
        def run(p, x):
            if stage == 1:
                x = patch_merging(p["patch_merge"], x)
            for blk in range(swin_cfg.depths[stage]):
                acfg = _block_cfg(swin_cfg, stage, blk)
                x = style_swin_block_apply(
                    p[f"stage{stage}_block{blk}"], x, x, x, acfg,
                    use_norm=True, exclude_mlp=False, sd_prob=0.0,
                    calculating_key=True)
            return x
        return run

    st1 = stage_fn(0)
    rows.append(report("swin_stage1_2B", timeit(st1, params["swin"], x1), b))
    x2 = st1(params["swin"], x1)
    st2 = stage_fn(1)
    rows.append(report("swin_stage2_2B", timeit(st2, params["swin"], x2), b))

    # ---- style transformer ---------------------------------------------
    st_cfg = cfg.transformer
    st = jax.jit(lambda p, fc, fs: style_transformer_apply(
        p, fc, fs, st_cfg, k=args.k))
    rows.append(report("style_transformer",
                       timeit(st, params["style_transformer"], feat, feat2), b))

    enc = jax.jit(lambda p, fs: style_encoder_apply(p, fs, fs, fs, st_cfg))
    rows.append(report("style_encoder",
                       timeit(enc, params["style_transformer"]["encoder"],
                              feat2), b))

    dec = jax.jit(lambda p, fc, key, sc, sh: style_decoder_apply(
        p, fc, key, sc, sh, st_cfg))
    rows.append(report("style_decoder",
                       timeit(dec, params["style_transformer"]["decoder"],
                              feat, feat2, feat2, feat2), b))

    # ---- CNN decoder ----------------------------------------------------
    cd = jax.jit(lambda p, x: cnn_decoder_apply(p, x, cfg.decoder))
    rows.append(report("cnn_decoder", timeit(cd, params["decoder"], feat), b))

    total = rows[0]["ms"]
    print("\n== breakdown (batch %d, %d^2, %s, pallas=%s) ==" %
          (b, s, args.dtype, args.pallas), file=sys.stderr)
    for r in rows:
        print(f"  {r['stage']:24s} {r['ms']:9.3f} ms  "
              f"({100 * r['ms'] / total:5.1f}% of full)", file=sys.stderr)
    acct = sum(r["ms"] for r in rows if r["stage"] in
               ("swin_2B", "style_transformer", "cnn_decoder"))
    print(f"  {'sum(swin+st+cnn)':24s} {acct:9.3f} ms "
          f"({100 * acct / total:5.1f}% of full)", file=sys.stderr)


if __name__ == "__main__":
    main()
