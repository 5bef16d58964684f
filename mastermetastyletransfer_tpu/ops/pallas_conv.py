"""Pallas phase-alignment kernel for the decoder's phase-space convs.

The phase-space conv pipeline (ops/conv.py) computes each conv as one XLA
VALID conv producing `big` (B, H+1, W+1, 4C'), then realigns phases:
out[..., (2a+b)C'] = big[:, a:a+H, b:b+W, (2a+b)C']. As XLA ops that's four
misaligned strided slices + a concat — ~2.8 ms device at 256^2x128 lanes
against a ~0.3 ms bandwidth bound (scripts/probe_align.py). This kernel does
the realignment in one pass.

Mosaic constraints that shaped it (probed, scripts/probe_align.py):
  * lane CONCAT of 32-lane slices taken at different lane offsets is
    unsupported ("offset mismatch on non-concat dimension") — but a
    lane-slice STORE whose source lane offset EQUALS its destination offset
    never moves lanes, so the kernel writes each phase group in place.
  * overlapping blocks are inexpressible, so the +1-row halo arrives as a
    second input view (big[:, 1:]) — an XLA row slice is contiguous/cheap,
    unlike the column/lane-strided ones.

Exact: same values as the slice+concat chain, different schedule.
Reference semantics: the phase algebra implements codes/decoder.py:23-55
upsample/conv pairs exactly (see ops/conv.py derivations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, x1_ref, out_ref, *, c_out: int):
    w = out_ref.shape[2]
    for a in range(2):
        xa = x0_ref[0] if a == 0 else x1_ref[0]      # (Ht, W+1, 4C)
        for b in range(2):
            sl = slice((2 * a + b) * c_out, (2 * a + b + 1) * c_out)
            out_ref[0, :, :, sl] = xa[:, b:b + w, sl]


def _pick_ht(h: int, wp: int, c4: int, itemsize: int) -> int:
    """Row-tile height budgeted against the 16MB scoped VMEM: Mosaic
    double-buffers the two input views and the output, so the block byte
    size (ht*wp*c4*itemsize) must stay ~<=1.2MB (cap 32 OOM'd at
    256^2x128 lanes bf16, 17.86M/16M; cap 16 OOM'd again at 512-wide rows,
    17.73M/16M). dtype-aware: f32 halves the row budget vs bf16."""
    cap = max(1, (1 << 20) // (wp * c4 * itemsize))
    for t in range(min(cap, h), 0, -1):
        if h % t == 0:
            return t
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def phase_align(big: jnp.ndarray, c_out: int,
                interpret: bool = False) -> jnp.ndarray:
    """(B, H+1, W+1, 4*c_out) VALID-conv output -> aligned phase tensor
    (B, H, W, 4*c_out). Requires c_out % 32 == 0 (lane-slice granularity);
    callers fall back to the XLA slice+concat chain otherwise.

    Differentiable: the align is a permutation whose phase lane groups are
    disjoint, so the backward is four pads (one per phase) concatenated
    along lanes — plain XLA (training-only cost)."""
    b, hp, wp, c4 = big.shape
    h, w = hp - 1, wp - 1
    assert c4 == 4 * c_out and c_out % 32 == 0
    ht = _pick_ht(h, wp, c4, jnp.dtype(big.dtype).itemsize)
    n_h = h // ht

    x0 = big[:, :h]
    x1 = big[:, 1:h + 1]
    spec = pl.BlockSpec((1, ht, wp, c4), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, ht, w, c4), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, c_out=c_out),
        grid=(b, n_h),
        in_specs=[spec, spec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c4), big.dtype),
        interpret=interpret,
    )(x0, x1)


def _phase_align_fwd(big, c_out, interpret):
    return phase_align(big, c_out, interpret), big.shape


def _phase_align_bwd(c_out, interpret, big_shape, g):
    b, hp, wp, c4 = big_shape
    h, w = hp - 1, wp - 1
    parts = []
    for a in range(2):
        for bb in range(2):
            sl = slice((2 * a + bb) * c_out, (2 * a + bb + 1) * c_out)
            parts.append(jnp.pad(g[..., sl],
                                 ((0, 0), (a, 1 - a), (bb, 1 - bb), (0, 0))))
    return (jnp.concatenate(parts, axis=-1),)


phase_align.defvjp(_phase_align_fwd, _phase_align_bwd)
