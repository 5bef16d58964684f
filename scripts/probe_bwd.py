"""Isolate the Mosaic SIGSEGV: compile the attention VJP kernels standalone
at the train shapes, with and without image batching (bsub).

    python scripts/probe_bwd.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import mastermetastyletransfer_tpu.ops.pallas_attention as pa
from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
    window_attention, window_attention_dual,
)
from mastermetastyletransfer_tpu.ops.attention import init_window_attention
from mastermetastyletransfer_tpu.config import AttentionConfig


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        sync(out)
        print(json.dumps({"probe": name, "ok": True}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False,
                          "error": str(e)[:160]}), flush=True)


def main(force_bsub=None):
    if force_bsub is not None:
        import mastermetastyletransfer_tpu.ops.pallas_attention_vjp as pav
        # tolerate the r3 budget/itemsize kwargs
        forced = lambda b, c, twn, **kw: min(force_bsub, b)
        pa._pick_bsub = forced
        pav._pick_bsub = forced
        # r4: the backward wrappers select bsub via _bwd_bsub (env);
        # route the forced value through it too.
        os.environ["MMST_BWD_BSUB"] = str(force_bsub)
    else:
        # r4: the backward bsub is env-selected (pallas_attention_vjp
        # _bwd_bsub); surface it in the probe labels.
        force_bsub = "env=" + os.environ.get("MMST_BWD_BSUB", "1")

    for tag, dim, heads, nw, b in [("swin1_train", 128, 4, 100, 16),
                                   ("st_train", 256, 8, 25, 8),
                                   ("swin1_1024", 128, 4, 1369, 2)]:
        cfg = AttentionConfig(dim=dim, num_heads=heads)
        p = init_window_attention(jax.random.PRNGKey(0), cfg)
        n = 49
        q = jax.random.normal(jax.random.PRNGKey(1), (b, nw, n, dim),
                              jnp.bfloat16) * 0.5
        bias = jax.random.normal(jax.random.PRNGKey(2), (heads, n, n),
                                 jnp.bfloat16) * 0.02

        def fwd(p, q, bias):
            return jnp.sum(window_attention(p, q, q, q, bias, None, heads))

        run(f"fwd_{tag}_bsub{force_bsub}",
            lambda p, q, bias: window_attention(p, q, q, q, bias, None,
                                                heads), p, q, bias)
        run(f"grad_{tag}_bsub{force_bsub}", jax.grad(fwd, argnums=1),
            p, q, bias)


if __name__ == "__main__":
    force = None
    if len(sys.argv) > 1:
        force = int(sys.argv[1])
    main(force)
