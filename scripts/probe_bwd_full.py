"""Full untruncated error for the failing swin-shape batched backward
(scripts/probe_bwd.py companion; r4 _tdot reformulation triage).

    MMST_BWD_BSUB=2 python scripts/probe_bwd_full.py [dim heads nw b]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import window_attention
from mastermetastyletransfer_tpu.ops.attention import init_window_attention
from mastermetastyletransfer_tpu.config import AttentionConfig


def main():
    dim, heads, nw, b = (int(a) for a in (sys.argv[1:5] or [128, 4, 100, 16]))
    cfg = AttentionConfig(dim=dim, num_heads=heads)
    p = init_window_attention(jax.random.PRNGKey(0), cfg)
    n = 49
    q = jax.random.normal(jax.random.PRNGKey(1), (b, nw, n, dim),
                          jnp.bfloat16) * 0.5
    bias = jax.random.normal(jax.random.PRNGKey(2), (heads, n, n),
                             jnp.bfloat16) * 0.02

    def fwd(p, q, bias):
        return jnp.sum(window_attention(p, q, q, q, bias, None, heads))

    try:
        g = jax.jit(jax.grad(fwd, argnums=1))(p, q, bias)
        jax.device_get(g.ravel()[0])
        print("OK")
    except Exception as e:  # noqa: BLE001
        print(str(e))


if __name__ == "__main__":
    main()
