"""Swin-internal prefix profile (r4): after the row-resident kernel the
swin encoder is ~18 ms of the 33 ms pair pipeline. Time jitted PREFIXES of
swin_backbone_apply's internal stages so consecutive deltas give the true
in-context cost of each: patch embed, stage-1 block 0/1, patch merging,
stage-2 block 0/1, final crop.

Usage: python scripts/probe_swin.py [--batch 16] [--size 512]
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

from mastermetastyletransfer_tpu.config import SwinConfig
from mastermetastyletransfer_tpu.models.swin import (
    _block_cfg, init_swin_backbone, patch_merging,
)
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_swin_block_apply,
)
from mastermetastyletransfer_tpu.ops.attention import _pallas_dim_ok
from mastermetastyletransfer_tpu.ops.norm import layer_norm
from mastermetastyletransfer_tpu.ops.windows import pad_to_windows


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2, rounds=5):
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


def swin_prefix(params, images, cfg: SwinConfig, upto: int):
    """Mirror of swin_backbone_apply's fast path with a stage counter:
    steps: 0 patch-embed+LN, 1 s1b0, 2 s1b1, 3 crop+merge, 4 s2b0, 5 s2b1,
    6 final crop."""
    b, h, w, cin = images.shape
    pe = params["patch_embed"]["conv"]
    e = pe["kernel"].shape[-1]
    if os.environ.get("PROBE_PE", "pallas") == "pallas":
        from mastermetastyletransfer_tpu.ops.pallas_conv import (
            pallas_patch_embed,
        )
        x = pallas_patch_embed(
            images, pe["kernel"], pe["bias"],
            params["patch_embed"]["norm"]["scale"],
            params["patch_embed"]["norm"]["bias"],
            interpret=jax.default_backend() != "tpu")
    else:
        patches = images.reshape(b, h // 4, 4, w // 4, 4, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 4, w // 4, 16 * cin)
        wk = pe["kernel"].reshape(16 * cin, e).astype(patches.dtype)
        x = patches @ wk + pe["bias"].astype(patches.dtype)
        x = layer_norm(x, params["patch_embed"]["norm"]["scale"],
                       params["patch_embed"]["norm"]["bias"])
    if upto == 0:
        return x
    wh, ww = cfg.window_size

    def block(x, stage, blk, vh, vw):
        acfg = _block_cfg(cfg, stage, blk)
        return style_swin_block_apply(
            params[f"stage{stage}_block{blk}"], x, x, x, acfg,
            use_norm=True, exclude_mlp=False, sd_prob=0.0,
            calculating_key=True, deterministic=True, rng=None,
            valid_hw=(vh, vw))

    # stage 1
    vh, vw = x.shape[1], x.shape[2]
    x, _, _ = pad_to_windows(x, wh, ww)
    x = block(x, 0, 0, vh, vw)
    if upto == 1:
        return x[:, :vh, :vw]
    x = block(x, 0, 1, vh, vw)
    if upto == 2:
        return x[:, :vh, :vw]
    x = patch_merging(params["patch_merge"], x[:, :vh, :vw])
    if upto == 3:
        return x
    # stage 2
    vh, vw = x.shape[1], x.shape[2]
    x, _, _ = pad_to_windows(x, wh, ww)
    x = block(x, 1, 0, vh, vw)
    if upto == 4:
        return x[:, :vh, :vw]
    x = block(x, 1, 1, vh, vw)
    return x[:, :vh, :vw]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    cfg = SwinConfig.for_variant("swin_B").replace(
        window_size=(7, 7), use_pallas=True)
    params = init_swin_backbone(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.size, args.size, 3), jnp.bfloat16)
    names = ["patch_embed+ln", "s1_block0", "s1_block1", "crop+merge",
             "s2_block0", "s2_block1(full)"]
    prev = 0.0
    for upto, name in enumerate(names):
        f = jax.jit(lambda p, xx, u=upto: swin_prefix(p, xx, cfg, u))
        dt = timeit(f, params, x) * 1e3
        print(json.dumps({"prefix": name, "ms": round(dt, 3),
                          "delta_ms": round(dt - prev, 3)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
