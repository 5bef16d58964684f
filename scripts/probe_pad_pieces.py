"""Decompose the remaining `_phase2_pad` cost (r4 session 3).

probe_tail_pieces measured the fast (lane-permutation matmul) pad at
1.28 ms device on the decoder's (8,128,128,512) L2 tensor — still ~10x
its ~0.13 ms bandwidth bound, and it runs before all three phase2 tail
convs (conv6 at 256 lanes, conv7/conv8 at 512). This probe splits the
pad into its pieces to find which half (row pads + H-concat vs col pads
+ W-concat) carries the cost, sizing the padded-output-chaining lever
(emit the border in the stencil kernel so the NEXT conv skips the pad).

Usage: python scripts/probe_pad_pieces.py
"""
from __future__ import annotations

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
    jfn = jax.jit(fn)
    for _ in range(warmup):
        sync(jfn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jfn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    b, g, c, nph = 8, 128, 32, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, g, g, nph * nph * c), jnp.bfloat16)
    dt = x.dtype

    top, bot = C._phase2_pad_maps(g, nph, False)

    def border(xx, getter, maps, row_axis):
        acc = None
        for src, P in C._pad_perm(maps, nph, c, row_axis).items():
            t = getter(xx, src) @ jnp.asarray(P, dt)
            acc = t if acc is None else acc + t
        return acc

    def full(xx):
        return C._phase2_pad(xx, nph, c, False)

    def rows_only(xx):
        trow = border(xx, lambda t, s: t[:, s], top, True)
        brow = border(xx, lambda t, s: t[:, s], bot, True)
        return jnp.concatenate([trow[:, None], xx, brow[:, None]], axis=1)

    def cols_only(xx):
        tcol = border(xx, lambda t, s: t[:, :, s], top, False)
        bcol = border(xx, lambda t, s: t[:, :, s], bot, False)
        return jnp.concatenate([tcol[:, :, None], xx, bcol[:, :, None]],
                               axis=2)

    def hconcat_only(xx):
        r = xx[:, :1]
        return jnp.concatenate([r, xx, r], axis=1)

    def wconcat_only(xx):
        cc = xx[:, :, :1]
        return jnp.concatenate([cc, xx, cc], axis=2)

    def zeropad(xx):
        return jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def perms_only(xx):
        # the 4 border matmuls with no assembly (summed to one scalar chain)
        trow = border(xx, lambda t, s: t[:, s], top, True)
        brow = border(xx, lambda t, s: t[:, s], bot, True)
        tcol = border(xx, lambda t, s: t[:, :, s], top, False)
        bcol = border(xx, lambda t, s: t[:, :, s], bot, False)
        return trow + brow, tcol + bcol

    def copy_only(xx):
        return xx + jnp.bfloat16(1)

    names = [("full _phase2_pad", full), ("rows(perm)+Hconcat", rows_only),
             ("cols(perm)+Wconcat", cols_only), ("Hconcat only", hconcat_only),
             ("Wconcat only", wconcat_only), ("jnp.pad zeros", zeropad),
             ("4 border perms, no assembly", perms_only),
             ("elementwise copy (BW floor)", copy_only)]
    print(f"input {x.shape} {x.dtype}; times are per-call incl ~1.7ms "
          "dispatch — read DELTAS vs the copy floor")
    for nm, fn in names:
        print(f"  {nm:32s} {timeit(fn, x):7.2f} ms")


if __name__ == "__main__":
    main()
