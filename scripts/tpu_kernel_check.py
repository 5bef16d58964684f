"""Compile + parity + timing check of the fused kernels on the real TPU at
bench shapes (the CPU suite runs interpret mode, which accepts ops Mosaic
may reject — this is the Mosaic gate).

    python scripts/tpu_kernel_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.config import AttentionConfig
from mastermetastyletransfer_tpu.models.style_transformer import (
    init_style_swin_block,
)
from mastermetastyletransfer_tpu.ops.attention import (
    fused_self_attention_block, shifted_window_attention,
    shifted_window_attention_two_v,
)
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_swin_block_apply,
)


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


def check(tag, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
    rel = err / scale
    print(json.dumps({"check": tag, "max_abs_err": round(err, 5),
                      "rel": round(rel, 6), "ok": rel < tol}), flush=True)


def main():
    for tag, dim, heads, hw, b, shift in [("swin1", 128, 4, 128, 16, (3, 3)),
                                          ("swin2", 256, 8, 64, 16, (3, 3)),
                                          ("st", 256, 8, 64, 8, (4, 4))]:
        cfg = AttentionConfig(dim=dim, num_heads=heads, window_size=(7, 7),
                              shift_size=shift, use_pallas=True)
        cfg_x = cfg.replace(use_pallas=False)
        p = init_style_swin_block(jax.random.PRNGKey(0), cfg, use_norm=True,
                                  exclude_mlp=False, mlp_ratio=4.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, dim),
                              jnp.bfloat16) * 0.5

        # whole-block fused kernel vs XLA composition
        f_pal = jax.jit(lambda p, x: fused_self_attention_block(
            p, x, cfg, use_norm=True))
        f_xla = jax.jit(lambda p, x: style_swin_block_apply(
            p, x, x, x, cfg_x, use_norm=True, exclude_mlp=False,
            sd_prob=0.0, calculating_key=True))
        got = f_pal(p, x)
        want = f_xla(p, x)
        check(f"block_{tag}", got, want, 0.05)
        dt_p = timeit(f_pal, p, x)
        dt_x = timeit(f_xla, p, x)
        print(json.dumps({"bench": f"block_{tag}",
                          "pallas_ms": round(dt_p * 1e3, 3),
                          "xla_ms": round(dt_x * 1e3, 3)}), flush=True)

        # plain fused attention (cross-attention form)
        g_pal = jax.jit(lambda p, q, k, v: shifted_window_attention(
            p, q, k, v, cfg))
        g_xla = jax.jit(lambda p, q, k, v: shifted_window_attention(
            p, q, k, v, cfg_x))
        q = x
        k = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.bfloat16) * 0.5
        v = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.bfloat16) * 0.5
        check(f"attn_{tag}", g_pal(p["attn"], q, k, v),
              g_xla(p["attn"], q, k, v), 0.05)
        print(json.dumps({"bench": f"attn_{tag}",
                          "pallas_ms": round(timeit(g_pal, p["attn"], q, k, v) * 1e3, 3),
                          "xla_ms": round(timeit(g_xla, p["attn"], q, k, v) * 1e3, 3)}),
              flush=True)

        if tag == "st":
            # two-V encoder fusion (one softmax, two value streams)
            h_pal = jax.jit(lambda p, qk, v1, v2:
                            shifted_window_attention_two_v(p, qk, qk, v1, v2, cfg))

            def two_xla(p, qk, v1, v2):
                a = shifted_window_attention(p, qk, qk, v1, cfg_x)
                bb = shifted_window_attention(p, qk, qk, v2, cfg_x)
                return a, bb

            h_xla = jax.jit(two_xla)
            o1, o2 = h_pal(p["attn"], q, k, v)
            w1, w2 = h_xla(p["attn"], q, k, v)
            check("twov_sigma", o1, w1, 0.05)
            check("twov_mu", o2, w2, 0.05)
            print(json.dumps({"bench": "twov",
                              "pallas_ms": round(timeit(h_pal, p["attn"], q, k, v) * 1e3, 3),
                              "xla_ms": round(timeit(h_xla, p["attn"], q, k, v) * 1e3, 3)}),
                  flush=True)


def check_bwd_mlp_vmem_edge():
    """Hardware-compile gate for the bwd MLP kernel at the exact shape that
    OOM'd scoped VMEM in r3 (rows 8192, C 256, hidden 1024, bf16): at the
    FORWARD row budget it scoped 16.12M/16M and fit only in SOME
    surrounding graphs (plain train compiled, fast_adaptation crashed);
    the bwd budget is now halved (pallas_mlp_vjp._run_bwd). Interpret mode
    cannot catch this class — only a real Mosaic compile does."""
    from mastermetastyletransfer_tpu.ops.pallas_mlp_vjp import ln_mlp_residual

    rows, c, hidden = 8192, 256, 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, c), jnp.bfloat16)
    mlp = {
        "fc1": {"kernel": jax.random.normal(jax.random.PRNGKey(1),
                                            (c, hidden)) * 0.02,
                "bias": jnp.zeros((hidden,))},
        "fc2": {"kernel": jax.random.normal(jax.random.PRNGKey(2),
                                            (hidden, c)) * 0.02,
                "bias": jnp.zeros((c,))},
    }
    norm = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def loss(mlp_p, xx):
        return jnp.sum(ln_mlp_residual(xx, mlp_p, norm).astype(jnp.float32))

    g = jax.jit(jax.grad(loss))(mlp, x)
    sync(g["fc1"]["kernel"])
    print(json.dumps({"check": "bwd_mlp_vmem_edge (8192x256->1024 bf16)",
                      "ok": True}), flush=True)


if __name__ == "__main__":
    main()
    check_bwd_mlp_vmem_edge()
