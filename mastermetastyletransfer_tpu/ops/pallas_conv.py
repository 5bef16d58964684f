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

from mastermetastyletransfer_tpu.ops.precision import kdot


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


# ---------------------------------------------------------------------------
# Stencil-GEMM phase conv (round 3): the whole phase-space conv — 2x2-tap
# conv + bias + ReLU + phase ALIGN — as one kernel of plain MXU GEMMs.
#
# Math: the XLA path computes big = VALID-2x2-conv(edge-padded input) then
# aligns out[i,j,(2a+b)C'] = big[i+a, j+b, (2a+b)C']. Substituting:
#   out(i,j,phase(a,b)) = sum_{dy,dx in 2x2} pp(i+a+dy, j+b+dx) @ K[dy,dx,:,phase]
# i.e. per output phase, 4 shifted-view GEMMs over the SAME padded input —
# same FLOPs as the 2x2 conv, no big tensor, no align pass, and the matmuls
# run at flat-GEMM rate instead of XLA-conv rate (~2-4x on this chip,
# PERF.md device model). Row-shift views arrive as three XLA row slices
# (overlapping blocks are inexpressible — same trick as phase_align);
# column shifts are in-kernel sublane slices (register ops).
# ---------------------------------------------------------------------------

def _stencil_kernel(xm_ref, xt_ref, w_ref, b_ref, out_ref, *,
                    c_out: int, relu: bool):
    """Input-RESIDENT stencil: the step's r rows arrive once (xm) plus a
    2-row halo tail (xt, the next two padded rows of the same array), and
    the 3 row-shifted views are in-VMEM slices of their concatenation —
    input HBM traffic is (r+2)/r of optimal instead of the 3x that the
    first (three-full-view) formulation paid (r3 A/B: -1..-2%)."""
    _, r, wp, cin = xm_ref.shape
    w = wp - 2
    rows = r * w
    dt = xm_ref.dtype
    f32 = jnp.float32
    comb = jnp.concatenate([xm_ref[0], xt_ref[0]], axis=0)  # (r+2, wp, cin)
    outs = []
    for a in range(2):
        for b in range(2):
            sl = slice((2 * a + b) * c_out, (2 * a + b + 1) * c_out)
            acc = None
            for dy in range(2):
                for dx in range(2):
                    v = comb[a + dy:a + dy + r,
                             b + dx:b + dx + w, :].reshape(rows, cin)
                    t = kdot(v, w_ref[dy, dx][:, sl].astype(dt))
                    acc = t if acc is None else acc + t
            outs.append(acc)
    y = jnp.concatenate(outs, axis=-1) + b_ref[0].astype(f32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(r, w, 4 * c_out).astype(out_ref.dtype)


def _pick_r(h: int, wp: int, cin: int, c4: int, itemsize: int,
            reserve: int = 0) -> int:
    """Row tile (EVEN, dividing h — the 2-row tail block index is
    (j*r+r)/2): one streamed input view + the f32 accumulators + the output
    block must fit scoped VMEM with double buffering. `reserve` shrinks the
    proxy budget for kernels that hold extra VMEM-resident operands (the
    padcols perm matrices), already scaled to the proxy's ~1/16 ratio."""
    cap = max(2, ((1 << 20) - reserve) // (wp * (cin * itemsize + 4 * c4)))
    for t in range(min(cap, h) - min(cap, h) % 2, 1, -2):
        if h % t == 0:
            return t
    return 2 if h % 2 == 0 else 1


def _stencil_xla_equiv(pp, pk, bias4, relu: bool, c_out: int):
    """XLA composition computing the same function (odd-height fallback)."""
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    big = jax.lax.conv_general_dilated(
        pp, pk.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    big = big + bias4.astype(big.dtype)
    if relu:
        big = jnp.maximum(big, 0)
    subs = [big[:, a:a + h, bb:bb + w,
                (2 * a + bb) * c_out:(2 * a + bb + 1) * c_out]
            for a in range(2) for bb in range(2)]
    return jnp.concatenate(subs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stencil_phase_conv(pp: jnp.ndarray, pk: jnp.ndarray, bias4: jnp.ndarray,
                       relu: bool = True,
                       interpret: bool = False) -> jnp.ndarray:
    """pp: (B, H+2, W+2, Cin) edge-padded input (phase or coarse tensor).
    pk: (2, 2, Cin, 4*C') phase-space / upsample-phase kernel.
    bias4: (4*C',) phase-tiled bias. Returns the ALIGNED phase tensor
    (B, H, W, 4*C'). Requires Cin % 128 == 0 and C' % 32 == 0.

    Backward is recompute-FREE (r3): align-transpose scatter + conv
    linear-transposes from the saved output's ReLU mask — see
    _stencil_bwd."""
    b, hp, wp, cin = pp.shape
    h, w = hp - 2, wp - 2
    c4 = pk.shape[-1]
    c_out = c4 // 4
    assert cin % 128 == 0 and c_out % 32 == 0, (cin, c_out)
    r = _pick_r(h, wp, cin, c4, jnp.dtype(pp.dtype).itemsize)
    if h % 2 or r % 2:
        # the tail-block trick needs even tiles; odd heights fall back to
        # the exact XLA composition
        return _stencil_xla_equiv(pp, pk, bias4, relu, c_out)
    # main stream: the step's r rows; tail stream: the NEXT 2 padded rows of
    # the same array ((j*r+r)/2 in 2-row blocks) — together rows
    # [j*r, j*r+r+2), the exact halo'd span, at ~(r+2)/r input traffic
    mspec = pl.BlockSpec((1, r, wp, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 2, wp, cin),
                         lambda i, j, r=r: (i, (j * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(pk.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, c4), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, r, w, c4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stencil_kernel, c_out=c_out, relu=relu),
        grid=(b, h // r),
        in_specs=[mspec, tspec, wspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c4), pp.dtype),
        interpret=interpret,
    )(pp, pp, pk, bias4.reshape(1, c4))


def _stencil_fwd(pp, pk, bias4, relu, interpret):
    y = stencil_phase_conv(pp, pk, bias4, relu, interpret)
    return y, (pp, pk, bias4, y)


def _stencil_bwd(relu, interpret, res, g):
    """Backward WITHOUT recomputing the forward (r3): conv+bias is linear,
    the align is a selection, and the ReLU mask is recoverable from the
    saved output (y > 0 — positions the align dropped carry zero cotangent,
    so their mask is irrelevant). g scatters through the align transpose
    into the pre-align grid, then d_pp/d_pk are pure conv transposes
    (jax.linear_transpose) and d_bias a reduction — the earlier version
    re-ran the entire XLA forward composition inside jax.vjp just to
    linearize, doubling the conv's forward cost in every training step."""
    pp, pk, bias4, y = res
    c4 = pk.shape[-1]
    c_out = c4 // 4
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    if relu:
        g = g * (y > 0).astype(g.dtype)
    # transpose of the align selection: scatter each phase's cotangent to
    # its shifted window of the (H+1, W+1) pre-align grid
    d_big = jnp.zeros((b, h + 1, w + 1, c4), g.dtype)
    for a in range(2):
        for bb in range(2):
            sl = slice((2 * a + bb) * c_out, (2 * a + bb + 1) * c_out)
            d_big = d_big.at[:, a:a + h, bb:bb + w, sl].set(g[..., sl])
    conv_pp = lambda t: jax.lax.conv_general_dilated(
        t, pk.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv_pk = lambda t: jax.lax.conv_general_dilated(
        pp, t.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    (d_pp,) = jax.linear_transpose(conv_pp, pp)(d_big.astype(pp.dtype))
    (d_pk,) = jax.linear_transpose(conv_pk, pk)(d_big.astype(pp.dtype))
    d_bias = d_big.astype(jnp.float32).sum((0, 1, 2)).astype(bias4.dtype)
    return d_pp, d_pk.astype(pk.dtype), d_bias


stencil_phase_conv.defvjp(_stencil_fwd, _stencil_bwd)


# ---------------------------------------------------------------------------
# Double-phase (L2) stencil conv (r4): same stencil-GEMM idea generalized to
# 16 output phase groups with per-group align offsets taken from a static
# base table (ops/conv.py:_phase2_kernel) instead of the (a, b) identity of
# the single-level align. Zero weight blocks (the composed L2 kernel is
# block-sparse: per output phase each axis uses ONE input phase per tap row)
# are skipped, so the kernel runs the EXACT tap GEMMs — 36 of the dense 64.
# Serves the decoder tail's up-conv (conv7: Cin=128, C'=32); the RGB conv's
# 3-lane groups are below the 32-lane slice granularity and stay on XLA.
# Reference semantics: codes/decoder.py:25-27 (last upsample + conv).
# ---------------------------------------------------------------------------

def _stencil2_accum(xm_ref, xt_ref, w_ref, b_ref, *,
                    c_out: int, relu: bool, bases, present):
    """Shared body of the phase2 stencil kernels: the 36 nonzero tap GEMMs
    of the composed (2,2,Cin,16C') kernel with align folded into the read
    offsets. Returns the f32 (r*w, 16*c_out) block."""
    _, r, wp, cin = xm_ref.shape
    w = wp - 2
    rows = r * w
    dt = xm_ref.dtype
    f32 = jnp.float32
    comb = jnp.concatenate([xm_ref[0], xt_ref[0]], axis=0)  # (r+2, wp, cin)
    outs = []
    for a in range(4):
        for b in range(4):
            sl = slice((4 * a + b) * c_out, (4 * a + b + 1) * c_out)
            acc = None
            for dy, dx in present[4 * a + b]:
                v = comb[bases[a] + dy:bases[a] + dy + r,
                         bases[b] + dx:bases[b] + dx + w, :].reshape(rows,
                                                                     cin)
                t = kdot(v, w_ref[dy, dx][:, sl].astype(dt))
                acc = t if acc is None else acc + t
            outs.append(acc)
    y = jnp.concatenate(outs, axis=-1) + b_ref[0].astype(f32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _stencil2_kernel(xm_ref, xt_ref, w_ref, b_ref, out_ref, *,
                     c_out: int, relu: bool, bases, present):
    _, r, wp, _ = xm_ref.shape
    w = wp - 2
    y = _stencil2_accum(xm_ref, xt_ref, w_ref, b_ref, c_out=c_out,
                        relu=relu, bases=bases, present=present)
    out_ref[0] = y.reshape(r, w, 16 * c_out).astype(out_ref.dtype)


def _stencil2_padcols_kernel(xm_ref, xt_ref, w_ref, b_ref, perm_ref, out_ref,
                             *, c_out: int, relu: bool, bases, present):
    """_stencil2_kernel + in-VMEM column-border synthesis: the output block
    is emitted (r, w+2, 16c') with [:, 0]/[:, w+1] holding the phase-pad
    columns the NEXT phase2 conv would otherwise build with _phase2_pad
    (ops/conv.py) — each border column is a pure lane permutation of 1-2
    output columns, applied as (r, C16) @ (C16, C16) 0/1 matmuls on the
    ALREADY-ROUNDED output values, so the pad is exact (every destination
    lane receives one 1.0 product)."""
    _, r, wp, _ = xm_ref.shape
    w = wp - 2
    c16 = 16 * c_out
    dt = out_ref.dtype
    y = _stencil2_accum(xm_ref, xt_ref, w_ref, b_ref, c_out=c_out,
                        relu=relu, bases=bases, present=present)
    y3 = y.reshape(r, w, c16).astype(dt)
    f32 = jnp.float32

    def pcol(srcs, p0, p1):
        # kdot, not jnp.dot: an ambient matmul precision 'high' (the split3
        # compliant point sets it for the XLA parts) must never reach a
        # Mosaic dot — Mosaic rejects HIGH (ops/precision.py docstring).
        # Caught live in r5: the float32-split3+pallas operating point
        # crashed here ("Unsupported dot precision: HIGH").
        a = kdot(y3[:, srcs[0]], perm_ref[p0].astype(dt))
        b = kdot(y3[:, srcs[1]], perm_ref[p1].astype(dt))
        return (a + b).astype(dt)

    lcol = pcol((0, 1), 0, 1)
    rcol = pcol((w - 1, w - 2), 2, 3)
    out_ref[0] = jnp.concatenate([lcol[:, None], y3, rcol[:, None]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def stencil_phase2_conv(pp: jnp.ndarray, pk: jnp.ndarray, bias16: jnp.ndarray,
                        bases, present, relu: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """pp: (B, H+2, W+2, Cin) custom-padded L1 phase input (ops/conv.py:
    _phase2_pad). pk: (2, 2, Cin, 16*C') composed L2 kernel. bias16:
    (16*C',). bases: per-output-phase align bases (len-4 tuple of 0/1).
    present: per output group (4a+b) the static tuple of (dy, dx) taps whose
    weight block is nonzero (the composed kernel is block-sparse — computed
    from the phase tap structure in ops/conv.py, NOT from values: pk is a
    tracer here). Returns the ALIGNED L2 phase tensor (B, H, W, 16*C').
    Requires Cin % 128 == 0 and C' % 32 == 0."""
    b, hp, wp, cin = pp.shape
    h, w = hp - 2, wp - 2
    c16 = pk.shape[-1]
    c_out = c16 // 16
    assert cin % 128 == 0 and c_out % 32 == 0, (cin, c_out)
    r = _pick_r(h, wp, cin, c16 // 4, jnp.dtype(pp.dtype).itemsize)
    if h % 2 or r % 2:
        return _stencil2_xla_equiv(pp, pk, bias16, bases, relu, c_out)
    mspec = pl.BlockSpec((1, r, wp, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 2, wp, cin),
                         lambda i, j, r=r: (i, (j * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(pk.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, c16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, r, w, c16), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stencil2_kernel, c_out=c_out, relu=relu,
                          bases=tuple(bases), present=tuple(present)),
        grid=(b, h // r),
        in_specs=[mspec, tspec, wspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c16), pp.dtype),
        interpret=interpret,
    )(pp, pp, pk, bias16.reshape(1, c16))


def _stencil2_xla_equiv(pp, pk, bias16, bases, relu: bool, c_out: int):
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    big = jax.lax.conv_general_dilated(
        pp, pk.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    big = big + bias16.astype(big.dtype)
    if relu:
        big = jnp.maximum(big, 0)
    subs = [big[:, bases[a]:bases[a] + h, bases[bb]:bases[bb] + w,
                (4 * a + bb) * c_out:(4 * a + bb + 1) * c_out]
            for a in range(4) for bb in range(4)]
    return jnp.concatenate(subs, axis=-1)


def _stencil2_fwd(pp, pk, bias16, bases, present, relu, interpret):
    y = stencil_phase2_conv(pp, pk, bias16, bases, present, relu, interpret)
    return y, (pp, pk, bias16, y)


def _stencil2_bwd(bases, present, relu, interpret, res, g):
    """Recompute-free backward (same structure as _stencil_bwd): ReLU mask
    from the saved output, generalized-align transpose scatter, then conv
    linear-transposes."""
    pp, pk, bias16, y = res
    c16 = pk.shape[-1]
    c_out = c16 // 16
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    if relu:
        g = g * (y > 0).astype(g.dtype)
    d_big = jnp.zeros((b, h + 1, w + 1, c16), g.dtype)
    for a in range(4):
        for bb in range(4):
            sl = slice((4 * a + bb) * c_out, (4 * a + bb + 1) * c_out)
            d_big = d_big.at[:, bases[a]:bases[a] + h,
                             bases[bb]:bases[bb] + w, sl].set(g[..., sl])
    conv_pp = lambda t: jax.lax.conv_general_dilated(
        t, pk.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv_pk = lambda t: jax.lax.conv_general_dilated(
        pp, t.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    (d_pp,) = jax.linear_transpose(conv_pp, pp)(d_big.astype(pp.dtype))
    (d_pk,) = jax.linear_transpose(conv_pk, pk)(d_big.astype(pp.dtype))
    d_bias = d_big.astype(jnp.float32).sum((0, 1, 2)).astype(bias16.dtype)
    return d_pp, d_pk.astype(pk.dtype), d_bias


stencil_phase2_conv.defvjp(_stencil2_fwd, _stencil2_bwd)


def stencil_phase2_conv_padcols(pp: jnp.ndarray, pk: jnp.ndarray,
                                bias16: jnp.ndarray, perms: jnp.ndarray,
                                bases, present, relu: bool = True,
                                interpret: bool = False) -> jnp.ndarray:
    """stencil_phase2_conv that also emits the output's phase-pad COLUMNS:
    returns (B, H, W+2, 16C') where [:, :, 0] / [:, :, -1] are the L2 pad
    columns ops/conv.py:_phase2_pad would build for the NEXT phase2 conv.
    perms: (4, 16C', 16C') static 0/1 lane-permutation matrices ordered
    [left@src-col0, left@src-col1, right@src-col W-1, right@src-col W-2]
    (ops/conv.py:_phase2_col_perms). The caller completes the pad with the
    two ROWS via one H-concat (_phase2_pad_rows — row and column phase
    relabelings commute, so corners come out exact). Eval-only: no VJP —
    the phase2 tail is gated on `deterministic` (models/decoder.py).

    Why: chaining padded outputs removes the standalone _phase2_pad of the
    next tail conv (1.28 ms device on the (8,128,128,512) L2 tensor even
    after the r4 lane-permutation rewrite — PERF.md)."""
    b, hp, wp, cin = pp.shape
    h, w = hp - 2, wp - 2
    c16 = pk.shape[-1]
    c_out = c16 // 16
    assert cin % 128 == 0 and c_out % 32 == 0, (cin, c_out)
    item = jnp.dtype(pp.dtype).itemsize
    r = _pick_r(h, wp, cin, c16 // 4, item,
                reserve=(4 * c16 * c16 * item) // 16)
    if h % 2 or r % 2:
        y = _stencil2_xla_equiv(pp, pk, bias16, bases, relu, c_out)
        pm = perms.astype(y.dtype)
        lcol = jnp.einsum("bhc,cd->bhd", y[:, :, 0], pm[0]) + \
            jnp.einsum("bhc,cd->bhd", y[:, :, 1], pm[1])
        rcol = jnp.einsum("bhc,cd->bhd", y[:, :, -1], pm[2]) + \
            jnp.einsum("bhc,cd->bhd", y[:, :, -2], pm[3])
        return jnp.concatenate(
            [lcol[:, :, None].astype(y.dtype), y,
             rcol[:, :, None].astype(y.dtype)], axis=2)
    mspec = pl.BlockSpec((1, r, wp, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 2, wp, cin),
                         lambda i, j, r=r: (i, (j * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(pk.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, c16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec(perms.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, r, w + 2, c16), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stencil2_padcols_kernel, c_out=c_out, relu=relu,
                          bases=tuple(bases), present=tuple(present)),
        grid=(b, h // r),
        in_specs=[mspec, tspec, wspec, bspec, pspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, h, w + 2, c16), pp.dtype),
        interpret=interpret,
    )(pp, pp, pk, bias16.reshape(1, c16), perms.astype(pp.dtype))


# ---------------------------------------------------------------------------
# L2 RGB tail kernel (r4): the decoder's final conv (C'=3) cannot use the
# group-sliced stencil (3-lane slices are below the 32-lane granularity) and
# XLA runs the composed (2,2,16C,48) conv at ~4 TF/s (scripts/probe_conv8.py:
# the conv alone is 6.2 ms isolated). This kernel computes the UNALIGNED
# 48-lane big tensor with four dense N=48 tap GEMMs, then performs the
# per-group align + phase interleave entirely in VMEM: group extraction by
# tiny (48, 3) selection MATMULS (lane moves via the MXU, never 3-lane
# slices), align by sublane shifts, interleave by the (now-supported)
# in-kernel transpose — and writes the fine RGB grid directly.
# Reference semantics: codes/decoder.py:54 (final conv, no activation).
# ---------------------------------------------------------------------------

def _rgb_kernel(xm_ref, xt_ref, w_ref, b_ref, e_ref, out_ref, *,
                bases, relu: bool):
    _, r, wp, cin = xm_ref.shape          # wp = W + 2
    w = wp - 2
    c48 = w_ref.shape[-1]
    c_out = c48 // 16
    dt = xm_ref.dtype
    f32 = jnp.float32
    comb = jnp.concatenate([xm_ref[0], xt_ref[0]], axis=0)  # (r+2, wp, cin)
    rb, wb = r + 1, w + 1
    acc = None
    for dy in range(2):
        for dx in range(2):
            v = comb[dy:dy + rb, dx:dx + wb, :].reshape(rb * wb, cin)
            t = kdot(v, w_ref[dy, dx].astype(dt))
            acc = t if acc is None else acc + t
    big = acc + b_ref[0].astype(f32)      # (rb*wb, 48)
    if relu:
        big = jnp.maximum(big, 0.0)
    big = big.reshape(rb, wb, c48).astype(dt)
    zs = []
    for a in range(4):
        for b in range(4):
            bs = big[bases[a]:bases[a] + r, bases[b]:bases[b] + w, :]
            z = kdot(bs.reshape(r * w, c48), e_ref[4 * a + b].astype(dt))
            zs.append(z.reshape(r, w, c_out))
    z = jnp.stack(zs).reshape(4, 4, r, w, c_out)
    z = z.transpose(2, 0, 3, 1, 4)        # (r, 4, w, 4, c')
    out_ref[0] = z.reshape(4 * r, 4 * w, c_out).astype(out_ref.dtype)


def stencil_phase2_rgb(pp: jnp.ndarray, pk: jnp.ndarray, bias16: jnp.ndarray,
                       bases, relu: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """pp: (B, H+2, W+2, 16C) custom-padded L2 input. pk: (2, 2, 16C, 16*C')
    composed kernel (C' = 3 for RGB). Returns the FINE grid
    (B, 4H, 4W, C') — align and interleave happen in-kernel."""
    b, hp, wp, cin = pp.shape
    h, w = hp - 2, wp - 2
    c48 = pk.shape[-1]
    c_out = c48 // 16
    assert cin % 128 == 0, cin
    # selection matrices: E[g] picks group g's C' columns of the 48-lane big
    import numpy as _np
    e = _np.zeros((16, c48, c_out), _np.float32)
    for g in range(16):
        e[g, g * c_out:(g + 1) * c_out] = _np.eye(c_out)
    e = jnp.asarray(e, pp.dtype)

    r = _pick_r(h, wp, cin, c48 * 4, jnp.dtype(pp.dtype).itemsize)
    if h % 2 or r % 2:
        big = jax.lax.conv_general_dilated(
            pp, pk.astype(pp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        big = big + bias16.astype(big.dtype)
        if relu:
            big = jnp.maximum(big, 0)
        subs = [big[:, bases[a]:bases[a] + h, bases[bb]:bases[bb] + w,
                    (4 * a + bb) * c_out:(4 * a + bb + 1) * c_out]
                for a in range(4) for bb in range(4)]
        out = jnp.concatenate(subs, axis=-1)
        return out.reshape(b, h, w, 4, 4, c_out).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, 4 * h, 4 * w, c_out)

    mspec = pl.BlockSpec((1, r, wp, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 2, wp, cin),
                         lambda i, j, r=r: (i, (j * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(pk.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, c48), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec(e.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 4 * r, 4 * w, c_out), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rgb_kernel, bases=tuple(bases), relu=relu),
        grid=(b, h // r),
        in_specs=[mspec, tspec, wspec, bspec, espec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, 4 * h, 4 * w, c_out), pp.dtype),
        interpret=interpret,
    )(pp, pp, pk, bias16.reshape(1, c48), e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stencil_phase2_rgb_vjp(pp, pk, bias16, bases, relu=False,
                           interpret=False):
    """Differentiable wrapper: forward = the RGB tail kernel; backward =
    un-interleave + generalized-align transpose scatter + conv linear
    transposes (recompute-free; conv8 has no ReLU by default)."""
    return stencil_phase2_rgb(pp, pk, bias16, bases, relu, interpret)


def _rgb_fwd(pp, pk, bias16, bases, relu, interpret):
    y = stencil_phase2_rgb_vjp(pp, pk, bias16, bases, relu, interpret)
    return y, (pp, pk, bias16, y)


def _rgb_bwd(bases, relu, interpret, res, g):
    pp, pk, bias16, y = res
    c48 = pk.shape[-1]
    c_out = c48 // 16
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    if relu:
        g = g * (y > 0).astype(g.dtype)
    # un-interleave the fine cotangent back to L2 groups
    g2 = g.reshape(b, h, 4, w, 4, c_out).transpose(0, 1, 3, 2, 4, 5)
    g2 = g2.reshape(b, h, w, c48)
    d_big = jnp.zeros((b, h + 1, w + 1, c48), g.dtype)
    for a in range(4):
        for bb in range(4):
            sl = slice((4 * a + bb) * c_out, (4 * a + bb + 1) * c_out)
            d_big = d_big.at[:, bases[a]:bases[a] + h,
                             bases[bb]:bases[bb] + w, sl].set(g2[..., sl])
    conv_pp = lambda t: jax.lax.conv_general_dilated(
        t, pk.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv_pk = lambda t: jax.lax.conv_general_dilated(
        pp, t.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    (d_pp,) = jax.linear_transpose(conv_pp, pp)(d_big.astype(pp.dtype))
    (d_pk,) = jax.linear_transpose(conv_pk, pk)(d_big.astype(pp.dtype))
    d_bias = d_big.astype(jnp.float32).sum((0, 1, 2)).astype(bias16.dtype)
    return d_pp, d_pk.astype(pk.dtype), d_bias


stencil_phase2_rgb_vjp.defvjp(_rgb_fwd, _rgb_bwd)


# ---------------------------------------------------------------------------
# L2 RGB tail kernel v2 (r4, "l2k128"): the first RGB kernel above lost its
# bench A/B (249 vs 258) to two costs this one removes — 16 narrow N=3
# selection GEMMs for the group align, and the 3-lane fine-grid OUTPUT write
# (tile-pads 3 lanes -> 128 on every store). v2 scatters the composed
# kernel's 16 x 3 output lanes into 16 x 8-lane slots (N = 128: the SAME MXU
# pass count — N<=128 is one N-tile either way), computes the unaligned big
# tensor with 4 dense tap GEMMs accumulated in f32 VMEM, and performs the
# generalized align as 4 shifted VPU mask-adds (each output lane's group
# needs exactly one of the 4 (base_a, base_b) spatial shifts — a static
# per-lane mask, no sub-32-lane slicing, no MXU). The fine 512^2 grid never
# exists in-kernel: the caller interleaves the returned (B, H, W, 16*8)
# aligned L2 tensor in XLA and slices lanes [:3].
# In-context target: conv8 = 4.1 ms of the 8.6 ms decoder
# (scripts/probe_decoder.py --phase2 deltas, PERF.md r4).
# Reference semantics: codes/decoder.py:54 (final conv, no activation).
# ---------------------------------------------------------------------------

def _rgb128_kernel(xm_ref, xt_ref, w_ref, b_ref, m_ref, out_ref, *,
                   relu: bool):
    _, r, wp, cin = xm_ref.shape          # wp = W + 2
    w = wp - 2
    dt = xm_ref.dtype
    f32 = jnp.float32
    comb = jnp.concatenate([xm_ref[0], xt_ref[0]], axis=0)  # (r+2, wp, cin)
    rb, wb = r + 1, w + 1
    acc = None
    for dy in range(2):
        for dx in range(2):
            v = comb[dy:dy + rb, dx:dx + wb, :].reshape(rb * wb, cin)
            t = kdot(v, w_ref[dy, dx].astype(dt))
            acc = t if acc is None else acc + t
    big = acc + b_ref[0].astype(f32)      # (rb*wb, 128)
    if relu:
        big = jnp.maximum(big, 0.0)
    big = big.reshape(rb, wb, 128)
    out = None
    for idx in range(4):
        ba, bb = idx // 2, idx % 2
        t = big[ba:ba + r, bb:bb + w, :] * m_ref[idx].astype(f32)
        out = t if out is None else out + t
    out_ref[0] = out.astype(out_ref.dtype)


def _rgb128_pick_r(h: int, wp: int, cin: int, itemsize: int) -> int:
    """Largest even divisor of h whose input view + f32 big + output block
    stay ~4 MB (Mosaic double-buffers in/out on top)."""
    best = 2 if h % 2 == 0 else 1
    for r in range(2, h + 1, 2):
        if h % r:
            continue
        need = ((r + 2) * wp * cin * itemsize
                + (r + 1) * (wp - 1) * 128 * 4
                + r * (wp - 2) * 128 * itemsize)
        if need <= (4 << 20):
            best = r
    return best


def stencil_phase2_rgb128(pp: jnp.ndarray, pk128: jnp.ndarray,
                          bias128: jnp.ndarray, bases,
                          relu: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """pp: (B, H+2, W+2, 16C) custom-padded L2 input. pk128:
    (2, 2, 16C, 128) composed kernel with group g's C'(=3) output lanes
    scattered to lanes [8g : 8g+C'] (rest zero). bias128: (128,) likewise.
    Returns the ALIGNED L2 phase tensor (B, H, W, 128) — group g's RGB in
    lanes [8g : 8g+3]; the caller interleaves and slices."""
    b, hp, wp, cin = pp.shape
    h, w = hp - 2, wp - 2
    assert cin % 128 == 0 and pk128.shape[-1] == 128, (cin, pk128.shape)
    import numpy as _np
    msk = _np.zeros((4, 1, 128), _np.float32)
    for g in range(16):
        a, bb_ = g // 4, g % 4
        idx = bases[a] * 2 + bases[bb_]
        msk[idx, 0, 8 * g:8 * g + 8] = 1.0
    msk = jnp.asarray(msk)

    r = _rgb128_pick_r(h, wp, cin, jnp.dtype(pp.dtype).itemsize)
    if h % 2 or r % 2:
        big = jax.lax.conv_general_dilated(
            pp, pk128.astype(pp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        big = big + bias128.astype(big.dtype)
        if relu:
            big = jnp.maximum(big, 0)
        out = sum(big[:, ba:ba + h, bb:bb + w, :]
                  * msk[ba * 2 + bb].astype(big.dtype)
                  for ba in range(2) for bb in range(2))
        return out.astype(pp.dtype)

    mspec = pl.BlockSpec((1, r, wp, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 2, wp, cin),
                         lambda i, j, r=r: (i, (j * r + r) // 2, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(pk128.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    mskspec = pl.BlockSpec(msk.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, r, w, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rgb128_kernel, relu=relu),
        grid=(b, h // r),
        in_specs=[mspec, tspec, wspec, bspec, mskspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), pp.dtype),
        interpret=interpret,
    )(pp, pp, pk128, bias128.reshape(1, 128), msk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stencil_phase2_rgb128_vjp(pp, pk128, bias128, bases, relu=False,
                              interpret=False):
    """Differentiable wrapper (the tail is eval-only in training, but parity
    tests grad it): backward = per-(base) mask scatter into the big
    cotangent + conv linear transposes, recompute-free."""
    return stencil_phase2_rgb128(pp, pk128, bias128, bases, relu, interpret)


def _rgb128_fwd(pp, pk128, bias128, bases, relu, interpret):
    y = stencil_phase2_rgb128_vjp(pp, pk128, bias128, bases, relu, interpret)
    return y, (pp, pk128, bias128, y)


def _rgb128_bwd(bases, relu, interpret, res, g):
    pp, pk128, bias128, y = res
    b, hp, wp, _ = pp.shape
    h, w = hp - 2, wp - 2
    if relu:
        g = g * (y > 0).astype(g.dtype)
    d_big = jnp.zeros((b, h + 1, w + 1, 128), g.dtype)
    for gi in range(16):
        a, bb_ = gi // 4, gi % 4
        sl = slice(8 * gi, 8 * gi + 8)
        d_big = d_big.at[:, bases[a]:bases[a] + h,
                         bases[bb_]:bases[bb_] + w, sl].set(g[..., sl])
    conv_pp = lambda t: jax.lax.conv_general_dilated(
        t, pk128.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv_pk = lambda t: jax.lax.conv_general_dilated(
        pp, t.astype(pp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    (d_pp,) = jax.linear_transpose(conv_pp, pp)(d_big.astype(pp.dtype))
    (d_pk,) = jax.linear_transpose(conv_pk, pk128)(d_big.astype(pp.dtype))
    d_bias = d_big.astype(jnp.float32).sum((0, 1, 2)).astype(bias128.dtype)
    return d_pp, d_pk.astype(pk128.dtype), d_bias


stencil_phase2_rgb128_vjp.defvjp(_rgb128_fwd, _rgb128_bwd)


# ---------------------------------------------------------------------------
# Patch-embed kernel (r4): torchvision's 4x4-stride-4 patch embed on TPU is
# a space-to-depth relayout of a 3-LANE image (125/128 lanes wasted in every
# physical tile) — XLA pays ~7 ms at (16, 512, 512, 3) (scripts/probe_swin.py
# prefix profile), 38% of the whole swin encoder. This kernel reads raw image
# rows and computes embed + LayerNorm in one pass: the 16 patch taps are
# sublane-split views dotted against (3, E) weight slices (K=3 pads to the
# MXU's K granule — trivial FLOPs), accumulated in f32.
# Reference semantics: torchvision swin patch embed (codes/utils.py:59-102).
# ---------------------------------------------------------------------------

def _patch_embed_kernel(x_ref, w_ref, b_ref, s_ref, sb_ref, out_ref, *,
                        ps: int, use_ln: bool, eps: float = 1e-5):
    _, rr, wpx, cin = x_ref.shape          # rr = ps*r image rows
    r = rr // ps
    wc = wpx // ps                          # coarse cols
    e = out_ref.shape[-1]
    dt = x_ref.dtype
    f32 = jnp.float32
    x5 = x_ref[0].reshape(r, ps, wc, ps, cin)
    acc = None
    for dy in range(ps):
        for dx in range(ps):
            v = x5[:, dy, :, dx, :].reshape(r * wc, cin)
            t = kdot(v, w_ref[dy * ps + dx].astype(dt))
            acc = t if acc is None else acc + t
    y = acc + b_ref[0].astype(f32)          # (r*wc, E) f32
    if use_ln:
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * s_ref[0].astype(f32) + sb_ref[0].astype(f32)
    out_ref[0] = y.reshape(r, wc, e).astype(out_ref.dtype)


def pallas_patch_embed(images: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, ln_scale=None, ln_bias=None, *,
                       interpret: bool = False) -> jnp.ndarray:
    """images (B, H, W, Cin) -> (B, H/ps, W/ps, E) patch embedding
    (+ fused LayerNorm when ln_scale is given). kernel: (ps, ps, Cin, E)
    conv weights (HWIO)."""
    b, h, w, cin = images.shape
    ps = kernel.shape[0]
    e = kernel.shape[-1]
    hc, wc = h // ps, w // ps
    wk = kernel.reshape(ps * ps, cin, e)

    # coarse row tile: the (..., cin) input block pads cin to 128 LANES in
    # VMEM (cin=3 -> 42x the nominal bytes), so budget with the padded
    # itemsize; keep the block ~<=1MB physical.
    cap = max(1, (1 << 20) // (ps * w * 128 *
                               jnp.dtype(images.dtype).itemsize))
    r = 1
    for t in range(min(cap, hc), 0, -1):
        if hc % t == 0:
            r = t
            break

    use_ln = ln_scale is not None
    s = (ln_scale if use_ln else jnp.ones((e,), images.dtype)).reshape(1, e)
    sb = (ln_bias if use_ln else jnp.zeros((e,), images.dtype)).reshape(1, e)

    xspec = pl.BlockSpec((1, ps * r, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wk.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, e), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, r, wc, e), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_patch_embed_kernel, ps=ps, use_ln=use_ln),
        grid=(b, hc // r),
        in_specs=[xspec, wspec, vspec, vspec, vspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, e), images.dtype),
        interpret=interpret,
    )(images, wk, bias.reshape(1, e), s, sb)
