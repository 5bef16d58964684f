"""Probe the BlockSpec index_map fold of the swin roll/partition geometry
(VERDICT r3 task 2a: "express roll/partition as block-index arithmetic").

Idea: the cyclic roll (reference codes/style_transformer.py:98-100) plus
window partition is a pure static relayout. A Pallas kernel whose grid
walks WINDOW-ROWS can read the padded (B, Hp, Wp, C) image directly via
wh single-row input operands whose index_map carries the roll:

    row_j(r) = (r*wh + j + shift_h) % Hp      # block-index arithmetic

and perform the W-direction roll + the row-major -> window-major
relayout entirely in VMEM. Three escalation stages are probed:

  1. express: does Mosaic accept (a) the same array passed wh times with
     mod index maps, (b) in-kernel sublane-offset W slices/concat (the W
     roll), (c) the (wh, ww, C) -> (wh*ww, C) strided-sublane merge?
     (correctness vs the jnp geometry, CPU interpret first, then device)
  2. relayout kernel: fused roll+partition as ONE pallas_call vs
     jnp.roll + window_partition (XLA relayout) — timing.
  3. merge kernel: the inverse (window-major -> rows + unroll) — timing.

If (2)+(3) beat XLA, they drop into ops/attention._prepare/_finalize with
no kernel changes; if Mosaic rejects the in-VMEM relayout, that is the
committed evidence the index_map fold is inexpressible today.

Usage:
  python scripts/probe_rowview.py --interpret   # CPU correctness
  python scripts/probe_rowview.py               # device correctness+timing
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.ops.windows import (
    window_merge, window_partition,
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


# --------------------------------------------------------------------------
# Stage 1+2: fused roll + window partition
# --------------------------------------------------------------------------

def _partition_kernel(*refs, wh: int, ww: int, wp: int, sw: int,
                      via_reshape: bool):
    row_refs, out_ref = refs[:-1], refs[-1]
    # (bsub, 1, Wp, C) x wh -> (bsub, wh, Wp, C)
    rows = jnp.concatenate([r[:, 0:1] if r.ndim == 4 else r
                            for r in row_refs], axis=1)
    if sw:
        rows = jnp.concatenate([rows[:, :, sw:], rows[:, :, :sw]], axis=2)
    bsub = rows.shape[0]
    c = rows.shape[-1]
    nww = wp // ww
    if via_reshape:
        # (bsub, wh, nww, ww, C): sublane split (lane dim untouched)
        r4 = rows.reshape(bsub, wh, nww, ww, c)
        # window-major via transpose of two sublane dims
        r4 = r4.transpose(0, 2, 1, 3, 4)
        out_ref[:, 0] = r4.reshape(bsub, nww, wh * ww, c)
    else:
        # per-window strided-sublane assembly
        for w in range(nww):
            blk = rows[:, :, w * ww:(w + 1) * ww, :]       # (bsub, wh, ww, C)
            out_ref[:, 0, w] = blk.reshape(bsub, wh * ww, c)


def pallas_roll_partition(x: jnp.ndarray, wh: int, ww: int, sh: int, sw: int,
                          *, via_reshape: bool, bsub: int = 1,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, Hp, Wp, C) -> (B, nW, wh*ww, C) with the (-sh, -sw) roll folded
    into the read index maps / in-kernel W concat."""
    b, hp, wp, c = x.shape
    nwh, nww = hp // wh, wp // ww

    # NOTE index_map returns BLOCK indices; with a 1-row block the H block
    # index IS the row index, so the roll is plain mod arithmetic.
    def make_spec(j):
        def imap(r, i, j=j):
            return (i, (r * wh + j + sh) % hp, 0, 0)
        return pl.BlockSpec((bsub, 1, wp, c), imap,
                            memory_space=pltpu.VMEM)

    in_specs = [make_spec(j) for j in range(wh)]
    out_spec = pl.BlockSpec((bsub, 1, nww, wh * ww, c),
                            lambda r, i: (i, r, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_partition_kernel, wh=wh, ww=ww, wp=wp, sw=sw,
                             via_reshape=via_reshape)
    out = pl.pallas_call(
        kern,
        grid=(nwh, b // bsub),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, nwh, nww, wh * ww, c), x.dtype),
        interpret=interpret,
    )(*([x] * wh))
    return out.reshape(b, nwh * nww, wh * ww, c)


def _merge_kernel(wa_ref, wb_ref, out_ref, *, wh: int, ww: int, sh: int,
                  sw: int, via_reshape: bool):
    # two window-row blocks (bsub, 1, nww, wh*ww, C) -> one 7-row output
    # block (bsub, wh, Wp, C) in UNROLLED coordinates: output row
    # r*wh + t sources rolled row (r*wh + t - sh) % Hp, i.e. the tail
    # sh... rows of window-row r-1 then the head wh-sh rows of window-row r.
    bsub = wa_ref.shape[0]
    nww = wa_ref.shape[2]
    c = wa_ref.shape[-1]

    def unpart(ref):
        if via_reshape:
            w5 = ref[:, 0].reshape(bsub, nww, wh, ww, c)
            return w5.transpose(0, 2, 1, 3, 4).reshape(bsub, wh, nww * ww, c)
        cols = []
        for w in range(nww):
            cols.append(ref[:, 0, w].reshape(bsub, wh, ww, c))
        return jnp.concatenate(cols, axis=2)

    if sh:
        rows_a = unpart(wa_ref)
        rows_b = unpart(wb_ref)
        rows = jnp.concatenate([rows_a[:, wh - sh:], rows_b[:, :wh - sh]],
                               axis=1)
    else:
        rows = unpart(wb_ref)
    if sw:
        rows = jnp.concatenate([rows[:, :, -sw:], rows[:, :, :-sw]], axis=2)
    out_ref[:] = rows


def pallas_merge_unroll(wins: jnp.ndarray, b: int, hp: int, wp: int,
                        wh: int, ww: int, sh: int, sw: int, *,
                        via_reshape: bool, bsub: int = 1,
                        interpret: bool = False) -> jnp.ndarray:
    """(B, nW, wh*ww, C) -> (B, Hp, Wp, C) with the (+sh, +sw) un-roll
    folded into the read index maps / in-kernel concat."""
    nwh, nww = hp // wh, wp // ww
    c = wins.shape[-1]
    w5 = wins.reshape(b, nwh, nww, wh * ww, c)
    spec_a = pl.BlockSpec((bsub, 1, nww, wh * ww, c),
                          lambda r, i: (i, (r - 1) % nwh, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((bsub, 1, nww, wh * ww, c),
                          lambda r, i: (i, r, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bsub, wh, wp, c), lambda r, i: (i, r, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_merge_kernel, wh=wh, ww=ww, sh=sh, sw=sw,
                             via_reshape=via_reshape)
    return pl.pallas_call(
        kern,
        grid=(nwh, b // bsub),
        in_specs=[spec_a, spec_b],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), wins.dtype),
        interpret=interpret,
    )(w5, w5)


def check_partition(tag, b, hp, wp, c, wh, ww, sh, sw, via_reshape,
                    interpret, dtype=jnp.bfloat16, time_it=True):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hp, wp, c), dtype)

    def ref(x_):
        r = jnp.roll(x_, shift=(-sh, -sw), axis=(1, 2)) if (sh or sw) else x_
        return window_partition(r, wh, ww).reshape(b, -1, wh * ww, c)

    try:
        f = jax.jit(functools.partial(
            pallas_roll_partition, wh=wh, ww=ww, sh=sh, sw=sw,
            via_reshape=via_reshape, interpret=interpret))
        got = f(x)
        want = jax.jit(ref)(x)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        row = {"case": tag, "ok": err == 0.0, "max_err": err}
        if time_it and not interpret:
            row["pallas_ms"] = round(timeit(f, x) * 1e3, 3)
            row["xla_ms"] = round(timeit(jax.jit(ref), x) * 1e3, 3)
        print(json.dumps(row), flush=True)
        return err == 0.0
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": str(e)[-400:]}), flush=True)
        return False


def check_merge(tag, b, hp, wp, c, wh, ww, sh, sw, via_reshape, interpret,
                dtype=jnp.bfloat16, time_it=True):
    nw = (hp // wh) * (wp // ww)
    wins = jax.random.normal(jax.random.PRNGKey(0), (b, nw, wh * ww, c),
                             dtype)

    def ref(w_):
        m = window_merge(w_.reshape(-1, wh * ww, c), b, hp, wp, wh, ww)
        return jnp.roll(m, shift=(sh, sw), axis=(1, 2)) if (sh or sw) else m

    try:
        f = jax.jit(functools.partial(
            pallas_merge_unroll, b=b, hp=hp, wp=wp, wh=wh, ww=ww, sh=sh,
            sw=sw, via_reshape=via_reshape, interpret=interpret))
        got = f(wins)
        want = jax.jit(ref)(wins)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        row = {"case": tag, "ok": err == 0.0, "max_err": err}
        if time_it and not interpret:
            row["pallas_ms"] = round(timeit(f, wins) * 1e3, 3)
            row["xla_ms"] = round(timeit(jax.jit(ref), wins) * 1e3, 3)
        print(json.dumps(row), flush=True)
        return err == 0.0
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": str(e)[-400:]}), flush=True)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    it = args.interpret

    # stage-1 at 512^2: Hp=Wp=133, C=128; stage-2: 70, C=256
    for tag, hp, c, wh in [("s1", 133, 128, 7), ("s2", 70, 256, 7)]:
        for shift, sh in [("noshift", 0), ("shift", 3)]:
            for via, vr in [("reshape", True), ("stores", False)]:
                check_partition(f"part_{tag}_{shift}_{via}",
                                16, hp, hp, c, wh, wh, sh, sh, vr, it)
                check_merge(f"merge_{tag}_{shift}_{via}",
                            16, hp, hp, c, wh, wh, sh, sh, vr, it)


if __name__ == "__main__":
    main()
