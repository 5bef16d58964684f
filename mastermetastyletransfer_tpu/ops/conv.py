"""NHWC convolution / upsampling primitives for the CNN decoder and VGG loss.

Reflect-padded 3x3 convs + nearest 2x upsampling mirror the AdaIN decoder
stack (reference: codes/decoder.py:23-55). Kernels are HWIO (TPU-native
layout); conv runs on the MXU via lax.conv_general_dilated and XLA fuses the
pad + ReLU into it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


def init_conv(key, in_ch: int, out_ch: int, ksize: int = 3,
              initializer: str = "kaiming_normal_") -> dict:
    """Conv params with the reference's selectable initializers
    (reference: codes/decoder.py:58-73). fan_out mode, relu gain."""
    kkey, _ = jax.random.split(key)
    shape = (ksize, ksize, in_ch, out_ch)
    fan_out = ksize * ksize * out_ch
    fan_in = ksize * ksize * in_ch
    gain = 2.0 ** 0.5  # relu
    if initializer == "kaiming_normal_":
        std = gain / (fan_out ** 0.5)
        kernel = jax.random.normal(kkey, shape, jnp.float32) * std
    elif initializer == "kaiming_uniform_":
        bound = gain * (3.0 / fan_out) ** 0.5
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    elif initializer == "xavier_normal_":
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        kernel = jax.random.normal(kkey, shape, jnp.float32) * std
    elif initializer == "xavier_uniform_":
        bound = (6.0 / (fan_in + fan_out)) ** 0.5
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    elif initializer == "orthogonal_":
        flat = jax.random.normal(kkey, (fan_in, out_ch), jnp.float32)
        q, _ = jnp.linalg.qr(flat)
        kernel = q.reshape(ksize, ksize, in_ch, out_ch)
    elif initializer == "default":
        # torch Conv2d default: kaiming_uniform_(a=sqrt(5)) on fan_in,
        # which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound = (1.0 / fan_in) ** 0.5
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    else:
        raise ValueError(f"unknown initializer {initializer!r}")
    bias = jnp.zeros((out_ch,), jnp.float32)
    return {"kernel": kernel, "bias": bias}


def conv2d(params: dict, x: jnp.ndarray, *, stride: int = 1,
           padding="VALID") -> jnp.ndarray:
    # NOTE: no preferred_element_type — the TPU conv accumulates in fp32
    # internally regardless, and an explicit f32 output dtype breaks the
    # conv transpose rule under grad with bf16 operands (f32 cotangent vs
    # bf16 kernel dtype mismatch).
    y = lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["bias"].astype(y.dtype)


def reflect_conv(params: dict, x: jnp.ndarray, *, relu: bool = True) -> jnp.ndarray:
    """1px reflect pad -> 3x3 conv -> optional ReLU (reference: codes/decoder.py:24-25)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = conv2d(params, x)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (reference: codes/decoder.py:27)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def _phase_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Collapse a 3x3 kernel applied to a nearest-2x-upsampled map into four
    phase-dependent 2x2 kernels on the coarse grid.

    Derivation: fine output (2i+a, 2j+b) reads fine taps (2i+a+d, 2j+b+e),
    d,e in {-1,0,1}; nearest upsampling maps fine tap t to coarse t//2, so
    per phase each axis collapses to 2 coarse taps with summed weights:
    a=0 -> rows {W0 | W1+W2}, a=1 -> rows {W0+W1 | W2} (same along x).
    Returns (2, 2, C, 4*C_out) with phase p = 2a+b interleaved per C_out."""
    # axis collapse: per phase, 2 coarse taps with summed original weights
    ry = [
        [w[0], w[1] + w[2]],        # a = 0
        [w[0] + w[1], w[2]],        # a = 1
    ]
    phases = []
    for a in range(2):
        for b in range(2):
            taps = []
            for dy in range(2):
                row = ry[a][dy]     # (3, C, C') along kx
                rx = [
                    [row[0], row[1] + row[2]],
                    [row[0] + row[1], row[2]],
                ][b]
                taps.append(jnp.stack(rx))          # (2, C, C')
            phases.append(jnp.stack(taps))          # (2, 2, C, C')
    return jnp.concatenate(phases, axis=-1)         # (2, 2, C, 4*C')


def phase_interleave(p: jnp.ndarray) -> jnp.ndarray:
    """Phase tensor (B, H, W, 4*C) with channel order (2a+b)*C -> fine grid
    (B, 2H, 2W, C)."""
    b, h, w, c4 = p.shape
    c = c4 // 4
    x = p.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


# Per-axis tap maps for a fine 3x3 conv evaluated in phase space: for output
# phase a' and coarse window row dy (over an edge-padded input), the list of
# (input phase, original kernel tap) pairs that contribute.
_PHASE_TAPS = {
    (0, 0): [(1, 0)],
    (0, 1): [(0, 1), (1, 2)],
    (1, 0): [(0, 0), (1, 1)],
    (1, 1): [(0, 2)],
}


def _phase_space_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, C') fine-grid kernel -> (2, 2, 4C, 4C') phase-space kernel.

    Output phase (a', b') at coarse (i, j) reads fine taps
    (2i+a'+d, 2j+b'+e); fine index 2i+a'+d maps to coarse i+(a'+d)//2,
    phase (a'+d)%2 — a 2x2 coarse window over an edge-padded phase tensor
    (fine reflect-pad == coarse edge-pad on the touched phase channels)."""
    _, _, c, c_out = w.shape
    k = jnp.zeros((2, 2, 4 * c, 4 * c_out), w.dtype)
    for ap in range(2):
        for bp in range(2):
            out_sl = slice((2 * ap + bp) * c_out, (2 * ap + bp + 1) * c_out)
            for dy in range(2):
                for dx in range(2):
                    for pa, ty in _PHASE_TAPS[(ap, dy)]:
                        for pb, tx in _PHASE_TAPS[(bp, dx)]:
                            in_sl = slice((2 * pa + pb) * c,
                                          (2 * pa + pb + 1) * c)
                            k = k.at[dy, dx, in_sl, out_sl].add(w[ty, tx])
    return k


def _align(big: jnp.ndarray, h: int, w: int, c_out: int,
           use_pallas: bool) -> jnp.ndarray:
    """Phase realignment big (B, H+1, W+1, 4C') -> (B, H, W, 4C'):
    out[..., (2a+b)C'] = big[:, a:a+H, b:b+W, (2a+b)C']. One Pallas pass when
    enabled and lane-sliceable; XLA slices+concat otherwise (exact either
    way)."""
    if use_pallas and c_out % 32 == 0:
        from mastermetastyletransfer_tpu.ops.pallas_conv import phase_align
        interpret = jax.default_backend() != "tpu"
        return phase_align(big, c_out, interpret)
    subs = [big[:, a:a + h, bb:bb + w,
                (2 * a + bb) * c_out:(2 * a + bb + 1) * c_out]
            for a in range(2) for bb in range(2)]
    return jnp.concatenate(subs, axis=-1)


def _stencil_ok(cin: int, c_out: int, stencil: bool,
                use_pallas: bool) -> bool:
    """Mosaic gates for the stencil-GEMM conv: full-lane input tiles and
    32-granular output lane slices. DEFAULT ON (DecoderConfig.
    use_stencil_conv): the r3 input-resident rewrite (one streamed view +
    2-row tail; the first version's three full halo views tripled input
    HBM reads and measured -1..-2%) measures +2% on style-locked serving
    and a wash on the pair headline (PERF.md A/B table). Odd tile heights
    fall back to the exact XLA composition inside stencil_phase_conv.
    Gated on use_pallas too: --no-pallas must stay a true XLA-only
    kill-switch/baseline (r3 review finding)."""
    return (stencil and use_pallas
            and cin % 128 == 0 and c_out % 32 == 0)


def _stencil_call(pp, pk, bias, relu):
    import jax as _jax
    from mastermetastyletransfer_tpu.ops.pallas_conv import stencil_phase_conv
    interpret = _jax.default_backend() != "tpu"
    return stencil_phase_conv(pp, pk, jnp.tile(bias, 4), relu, interpret)


def phase_conv3x3(params: dict, p: jnp.ndarray, *, relu: bool = True,
                  interleave: bool = False,
                  use_pallas: bool = False,
                  stencil: bool = False) -> jnp.ndarray:
    """Exact fine-grid reflect-pad 3x3 conv computed on a PHASE tensor
    (B, H, W, 4C) without materializing the (2H, 2W, C) fine grid.

    The input stays lane-packed (4C channels instead of C at 4x the spatial
    area), which matters for the decoder tail where C is 32 and the fine
    grid is 512^2. Returns a phase tensor (B, H, W, 4*C_out), or the fine
    grid when `interleave`.

    With use_pallas (and Mosaic-compatible dims) the conv+bias+ReLU+align
    chain runs as ONE stencil-GEMM kernel (ops/pallas_conv.py)."""
    b, h, w, c4 = p.shape
    wk = params["kernel"]
    c_out = wk.shape[-1]
    pk = _phase_space_kernel(wk.astype(jnp.float32)).astype(p.dtype)
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    if _stencil_ok(c4, c_out, stencil, use_pallas):
        out = _stencil_call(pp, pk, params["bias"], relu)
        return phase_interleave(out) if interleave else out
    big = lax.conv_general_dilated(
        pp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, H+1, W+1, 4*C_out)
    big = big + jnp.tile(params["bias"], 4).astype(big.dtype)
    if relu:
        big = jnp.maximum(big, 0)
    out = _align(big, h, w, c_out, use_pallas)
    return phase_interleave(out) if interleave else out


# ---------------------------------------------------------------------------
# Double-phase (L2) tail (r4): the decoder's last three convs run where the
# fine grid is 256^2-512^2 at 32/3 channels — XLA convs at those lane counts
# measured 1.1-3.2 ms each (scripts/probe_decoder.py). Keeping the data in a
# SECOND phase level (spatial 128^2, lanes 16x) turns them into wide GEMM
# stencils: conv7 (up 256->512 + 3x3) consumes the L1 phase tensor directly,
# conv8 (3x3 at 512^2) runs entirely in L2 phase space; the 512^2x3 fine grid
# materializes exactly once, at the final interleave.
# Reference semantics: codes/decoder.py:23-55 (last upsample + convs 8/9).
# ---------------------------------------------------------------------------

def _phase2_axis_slots(a: int, up: bool):
    """Tap structure along one axis for output L2 phase a (fine row 4i+a).

    Returns (base, slots) where slots maps (dy in {0,1}, in_phase) -> list of
    original 3x3 tap indices (0..2), and `base` is the PADDED-input row offset
    of the 2-row window (input edge-padded by one coarse row): output (i, a)
    reads padded rows i+base+dy.

    up=True: the input is the L1 phase tensor of the pre-upsample coarse
    grid (phase pairs over the half-resolution grid); nearest-2x maps fine
    tap t=4i+a+d to half-grid row 2i + (a+d)//2, i.e. L1 row offset
    u=(a+d)//2 -> (coarse u//2, phase u%2).
    up=False: plain 3x3 at the fine grid; tap t -> (coarse (a+d)//4,
    phase (a+d)%4)."""
    slots: dict = {}
    deltas = []
    for d in (-1, 0, 1):
        t = a + d
        if up:
            u = t // 2
            delta, ph = u // 2, u % 2
        else:
            delta, ph = t // 4, t % 4
        deltas.append(delta)
        slots.setdefault((delta, ph), []).append(1 + d)
    base = min(deltas)
    assert max(deltas) - base <= 1, (a, up, deltas)
    # re-key by dy relative to the window base, shifted into padded coords
    out = {(delta - base, ph): taps for (delta, ph), taps in slots.items()}
    return base + 1, out


def _phase2_kernel(w: jnp.ndarray, up: bool):
    """Compose a (3,3,C,C') fine kernel into the L2 phase-space 2x2-tap
    kernel: (2, 2, nin^2*C, 16*C') with nin=2 (up: L1 phase input) or 4
    (plain: L2 phase input). Also returns the per-output-phase align bases
    (same list for rows and columns by symmetry)."""
    c, c_out = w.shape[2], w.shape[3]
    nin = 2 if up else 4
    k = jnp.zeros((2, 2, nin * nin * c, 16 * c_out), w.dtype)
    bases = []
    ax = [_phase2_axis_slots(a, up) for a in range(4)]
    for a in range(4):
        bases.append(ax[a][0])
    for a in range(4):
        _, rslots = ax[a]
        for b in range(4):
            _, cslots = ax[b]
            out_sl = slice((4 * a + b) * c_out, (4 * a + b + 1) * c_out)
            for (dy, pr), taps_r in rslots.items():
                for (dx, pc), taps_c in cslots.items():
                    in_sl = slice((nin * pr + pc) * c,
                                  (nin * pr + pc + 1) * c)
                    acc = None
                    for ty in taps_r:
                        for tx in taps_c:
                            t = w[ty, tx]
                            acc = t if acc is None else acc + t
                    k = k.at[dy, dx, in_sl, out_sl].add(acc)
    return k, bases


def _phase2_pad_maps(n: int, nph: int, up: bool):
    """Per pad-slot phase g: (source index into the n-long axis, source
    phase). Same maps as the reference construction below."""
    if up:
        return [(0, 0)] * nph, [(n - 1, 1)] * nph
    top = [((4 - g) // 4, (4 - g) % 4) for g in range(4)]
    bot = [(n - 1 - (1 if g == 3 else 0), (2 - g) % 4) for g in range(4)]
    return top, bot


def _pad_perm(maps, nph: int, c: int, row_axis: bool):
    """Static lane-permutation matrices for one pad row/col: dst slot-phase
    g keeps the OTHER axis' phase and the channel, swapping only this
    axis' phase to the source's. Returns {source index: (C16, C16) 0/1}."""
    import numpy as _np
    n2c = nph * nph * c
    out = {}
    for g, (src, tp) in enumerate(maps):
        P = out.setdefault(src, _np.zeros((n2c, n2c), _np.float32))
        for o in range(nph):
            if row_axis:
                d0, s0 = (g * nph + o) * c, (tp * nph + o) * c
            else:
                d0, s0 = (o * nph + g) * c, (o * nph + tp) * c
            P[s0:s0 + c, d0:d0 + c] = _np.eye(c)
    return out


def _phase2_pad(x: jnp.ndarray, nph: int, c: int, up: bool) -> jnp.ndarray:
    """Fast `_phase2_pad_ref` (r4): the take/stack/concat construction below
    lowers to strided lane-group gathers that cost 2.36 ms device on the
    decoder's (8,128,128,512) L2 tensor (scripts/probe_tail_pieces.py) —
    ~25x its bandwidth bound, and it runs in all three phase2 tail convs.
    Each pad row/col is a pure LANE PERMUTATION of 1-2 source rows/cols, so
    build it as (row @ P) with static 0/1 matrices — lane moves ride the
    MXU (exact: every destination lane receives exactly one 1.0 product)
    — and concatenate. Parity vs the reference construction in
    tests/test_ops.py."""
    b, h, w, c16 = x.shape
    dt = x.dtype

    def border(getter, maps, row_axis):
        acc = None
        for src, P in _pad_perm(maps, nph, c, row_axis).items():
            t = getter(src) @ jnp.asarray(P, dt)
            acc = t if acc is None else acc + t
        return acc

    top, bot = _phase2_pad_maps(h, nph, up)
    trow = border(lambda s: x[:, s], top, True)          # (b, w, C16)
    brow = border(lambda s: x[:, s], bot, True)
    if os.environ.get("MMST_P2PAD", "concat") == "set":
        # zero-pad + border dynamic-update-slices (A/B'd vs the concat
        # assembly: pair 273.5 vs 275.9, locked 418.8 vs 418.6 — concat
        # kept as default, this variant as the probe knob)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xp = xp.at[:, 0, 1:-1].set(trow).at[:, -1, 1:-1].set(brow)
        topc, botc = _phase2_pad_maps(w, nph, up)
        tcol = border(lambda s: xp[:, :, 1 + s], topc, False)
        bcol = border(lambda s: xp[:, :, 1 + s], botc, False)
        return xp.at[:, :, 0].set(tcol).at[:, :, -1].set(bcol)
    x = jnp.concatenate([trow[:, None], x, brow[:, None]], axis=1)
    topc, botc = _phase2_pad_maps(w, nph, up)
    tcol = border(lambda s: x[:, :, s], topc, False)     # (b, h+2, C16)
    bcol = border(lambda s: x[:, :, s], botc, False)
    return jnp.concatenate([tcol[:, :, None], x, bcol[:, :, None]], axis=2)


def _phase2_col_perms(nph: int, c: int, w: int, dtype) -> jnp.ndarray:
    """(4, C16, C16) 0/1 lane-permutation matrices for the in-kernel column
    borders of an emitted L2 output (up=False maps), ordered
    [left@src0, left@src1, right@src W-1, right@src W-2]
    (stencil_phase2_conv_padcols)."""
    import numpy as _np
    top, bot = _phase2_pad_maps(w, nph, False)
    pt = _pad_perm(top, nph, c, False)
    pb = _pad_perm(bot, nph, c, False)
    n2c = nph * nph * c
    z = _np.zeros((n2c, n2c), _np.float32)
    mats = [pt.get(0, z), pt.get(1, z), pb.get(w - 1, z), pb.get(w - 2, z)]
    return jnp.asarray(_np.stack(mats), dtype)


def _phase2_pad_rows(y: jnp.ndarray, nph: int, c: int) -> jnp.ndarray:
    """Add the two phase-pad ROWS to a column-padded L2 tensor
    (B, H, W+2, C16) -> (B, H+2, W+2, C16). Row borders are lane perms of
    rows 0/1 and H-1/H-2 of the COLUMN-PADDED tensor: row relabeling swaps
    the a-phase lane group and column relabeling the b-phase group, so the
    two commute and the corners match _phase2_pad's
    rows-then-columns order exactly (parity-tested in tests/test_ops.py)."""
    b, h, wp, _ = y.shape
    dt = y.dtype
    top, bot = _phase2_pad_maps(h, nph, False)

    def border(maps):
        acc = None
        for src, P in _pad_perm(maps, nph, c, True).items():
            t = y[:, src] @ jnp.asarray(P, dt)
            acc = t if acc is None else acc + t
        return acc

    trow, brow = border(top), border(bot)
    return jnp.concatenate([trow[:, None], y, brow[:, None]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _phase2_conv_emit(pp, k2, bias16, c_out, bases, present, relu,
                      interpret):
    """Stencil phase2 conv emitting the PADDED output (padded-output
    chaining): columns in-kernel (stencil_phase2_conv_padcols), rows via
    one H-concat. Differentiable so the exactness tests can grad the
    deterministic phase2 path: the pad is linear, so the backward
    transposes it onto the plain-output grad and reuses the stencil conv's
    recompute-free backward (pallas_conv._stencil2_bwd)."""
    from mastermetastyletransfer_tpu.ops.pallas_conv import (
        stencil_phase2_conv_padcols,
    )
    perms = _phase2_col_perms(4, c_out, pp.shape[2] - 2, pp.dtype)
    out = stencil_phase2_conv_padcols(pp, k2, bias16, perms, bases, present,
                                      relu, interpret)
    return _phase2_pad_rows(out, 4, c_out)


def _emit_fwd(pp, k2, bias16, c_out, bases, present, relu, interpret):
    padded = _phase2_conv_emit(pp, k2, bias16, c_out, bases, present, relu,
                               interpret)
    # the interior IS the plain output (pad exactness), so the stencil
    # backward's ReLU mask can come from the saved padded tensor
    return padded, (pp, k2, bias16, padded[:, 1:-1, 1:-1])


def _emit_bwd(c_out, bases, present, relu, interpret, res, g):
    from mastermetastyletransfer_tpu.ops.pallas_conv import _stencil2_bwd
    pp, k2, bias16, y = res
    (d_y,) = jax.linear_transpose(
        lambda t: _phase2_pad(t, 4, c_out, False), y)(g)
    return _stencil2_bwd(bases, present, relu, interpret,
                         (pp, k2, bias16, y), d_y)


_phase2_conv_emit.defvjp(_emit_fwd, _emit_bwd)


def _phase2_pad_ref(x: jnp.ndarray, nph: int, c: int, up: bool) -> jnp.ndarray:
    """Edge-pad one coarse row/col on each side of a phase tensor
    (B, H, W, nph^2*C) such that the padded values equal the FINE-grid
    reflect padding the reference applies (codes/decoder.py:24):

    up=True (L1 phase of a pre-upsample grid): fine reflect-pad of the
    upsampled map == replicate at the half grid; padded row -1 carries
    half rows {-2, -1} -> both clamp to half row 0 = (coarse 0, phase 0);
    padded row H carries half rows {2H, 2H+1} -> clamp to (H-1, phase 1).

    up=False (L2 phase of the fine grid itself): padded row -1 phase g is
    fine row g-4, reflect -> fine 4-g -> (coarse (4-g)//4, phase (4-g)%4);
    padded row H phase g is fine 4H+g, reflect -> fine 4H-2-g ->
    (coarse H-1-(g==3), phase (2-g)%4)."""
    b, h, w, _ = x.shape
    x6 = x.reshape(b, h, w, nph, nph, c)

    def pad_axis(x6, axis):
        # maps: list per slot phase -> (coarse index, source phase)
        if up:
            top = [(0, 0)] * nph
            bot = [(-1, 1)] * nph
        else:
            top = [((4 - g) // 4, (4 - g) % 4) for g in range(4)]
            bot = [(h - 1 - (1 if g == 3 else 0) - (h - 1),
                    (2 - g) % 4) for g in range(4)]
            # bot holds offsets relative to the last row (0 or -1)
        ph_axis = 3 if axis == 1 else 4
        sp_take = (lambda t, i: t[:, i]) if axis == 1 else \
                  (lambda t, i: t[:, :, i])

        tops, bots = [], []
        for g in range(nph):
            ti, tp = top[g]
            tops.append(jnp.take(sp_take(x6, ti), tp, axis=ph_axis - 1))
            bi, bp = bot[g]
            bots.append(jnp.take(sp_take(x6, (h if axis == 1 else w) - 1 + bi
                                         if not up else bi),
                                 bp, axis=ph_axis - 1))
        trow = jnp.stack(tops, axis=ph_axis - 1)
        brow = jnp.stack(bots, axis=ph_axis - 1)
        return jnp.concatenate(
            [jnp.expand_dims(trow, axis), x6, jnp.expand_dims(brow, axis)],
            axis=axis)

    x6 = pad_axis(x6, 1)
    x6 = pad_axis(x6, 2)
    hp, wp = x6.shape[1], x6.shape[2]
    return x6.reshape(b, hp, wp, nph * nph * c)


def _align2(big: jnp.ndarray, h: int, w: int, c_out: int,
            bases) -> jnp.ndarray:
    """Generalized phase align: big (B, H+1, W+1, 16*C') VALID-conv output
    -> (B, H, W, 16*C'); group (a, b) takes the window at
    (bases[a], bases[b])."""
    subs = [big[:, bases[a]:bases[a] + h, bases[b]:bases[b] + w,
                (4 * a + b) * c_out:(4 * a + b + 1) * c_out]
            for a in range(4) for b in range(4)]
    return jnp.concatenate(subs, axis=-1)


def phase_interleave2(p: jnp.ndarray) -> jnp.ndarray:
    """L2 phase tensor (B, H, W, 16*C) with group order (4a+b)*C -> fine
    grid (B, 4H, 4W, C)."""
    b, h, w, c16 = p.shape
    c = c16 // 16
    x = p.reshape(b, h, w, 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * h, 4 * w, c)


# kill-switch for the (measured-slower) RGB tail kernel; see phase2_conv3x3
_RGB_KERNEL_ON = False


def l2_to_l1(p: jnp.ndarray) -> jnp.ndarray:
    """L2 phase tensor (B, H, W, 16*C) -> L1 phase tensor of the same fine
    grid at half resolution (B, 2H, 2W, 4*C): fine row 4i + (2a1+a0) =
    2*(2i+a1) + a0, so L2 group (a, b) splits into coarse-half position
    (a1, b1) and L1 phase (a0, b0)."""
    b, h, w, c16 = p.shape
    c = c16 // 16
    x8 = p.reshape(b, h, w, 2, 2, 2, 2, c)      # (a1, a0, b1, b0)
    x8 = x8.transpose(0, 1, 3, 2, 5, 4, 6, 7)   # b, h, a1, w, b1, a0, b0, c
    return x8.reshape(b, 2 * h, 2 * w, 4 * c)


def phase2_conv3x3(params: dict, p: jnp.ndarray, *, up: bool,
                   relu: bool = True, interleave: bool = False,
                   use_pallas: bool = False,
                   gemm4: bool = False,
                   k128: bool = False,
                   in_padded: bool = False,
                   emit_padded: bool = False) -> jnp.ndarray:
    """Exact fine-grid [upsample-2x ->] reflect-pad -> 3x3 conv evaluated in
    DOUBLE phase space. p: L1 phase tensor (B, H, W, 4C) when up, else L2
    (B, H, W, 16C). Returns the L2 phase tensor (B, H, W, 16*C_out), or the
    (B, 4H, 4W, C_out) fine grid when `interleave`.

    in_padded: p already carries the +1 phase-pad border (a previous conv
    emitted it) — _phase2_pad is skipped. emit_padded: return the output
    WITH its own pad border, (B, H+2, W+2, 16*C_out): the stencil kernel
    synthesizes the columns in-VMEM (stencil_phase2_conv_padcols) and the
    rows are one H-concat; chained tail convs then skip the standalone pad
    entirely (PERF.md r4 pad decomposition)."""
    assert not (emit_padded and interleave)
    b, h, w, _ = p.shape
    if in_padded:
        h, w = h - 2, w - 2
    wk = params["kernel"]
    c_in, c_out = wk.shape[2], wk.shape[3]
    k2, bases = _phase2_kernel(wk.astype(jnp.float32), up)
    k2 = k2.astype(p.dtype)
    pp = p if in_padded else _phase2_pad(p, 2 if up else 4, c_in, up)
    if (use_pallas and not up and interleave and c_out < 32
            and pp.shape[-1] % 128 == 0 and _RGB_KERNEL_ON):
        # RGB tail kernel — conv + generalized align + interleave in one
        # program, sub-32-lane groups extracted with (48, C') selection
        # matmuls. MEASURED SLOWER than the XLA composition (8.5 vs 7.5 ms
        # isolated; bench 249 vs 258 — probe_conv8.py + r4 A/B), so OFF by
        # default; kept as the expressibility record and for re-probing on
        # future toolchains.
        from mastermetastyletransfer_tpu.ops.pallas_conv import (
            stencil_phase2_rgb_vjp,
        )
        interpret = jax.default_backend() != "tpu"
        return stencil_phase2_rgb_vjp(pp, k2, jnp.tile(params["bias"], 16),
                                      tuple(bases), relu, interpret)
    if (k128 and not up and interleave and c_out <= 8
            and pp.shape[-1] % 128 == 0):
        # r4 RGB tail kernel v2 ("l2k128"): 4 dense N=128 tap GEMMs with
        # the 16 x C' output lanes scattered to 8-lane slots, f32 VMEM
        # accumulation, align as 4 shifted lane-mask adds in-kernel; the
        # interleave runs here in XLA on the 8-lane groups and the fine
        # grid materializes once, already RGB-sliced.
        from mastermetastyletransfer_tpu.ops.pallas_conv import (
            stencil_phase2_rgb128_vjp,
        )
        cin = pp.shape[-1]
        kw = jnp.zeros((2, 2, cin, 16, 8), k2.dtype)
        kw = kw.at[..., :c_out].set(k2.reshape(2, 2, cin, 16, c_out))
        b128 = jnp.zeros((16, 8), jnp.float32)
        b128 = b128.at[:, :c_out].set(
            jnp.broadcast_to(params["bias"], (16, c_out)))
        interpret = jax.default_backend() != "tpu"
        out = stencil_phase2_rgb128_vjp(
            pp, kw.reshape(2, 2, cin, 128), b128.reshape(128).astype(p.dtype),
            tuple(bases), relu, interpret)
        x6 = out.reshape(b, h, w, 4, 4, 8)
        fine = x6.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * h, 4 * w, 8)
        return fine[..., :c_out]
    if use_pallas and c_out % 32 == 0 and (pp.shape[-1]) % 128 == 0:
        from mastermetastyletransfer_tpu.ops.pallas_conv import (
            stencil_phase2_conv,
        )
        # static block-sparsity of the composed kernel: per output phase
        # each axis uses ONE input phase per tap row -> 36 of 64 tap GEMMs
        ax = [_phase2_axis_slots(a, up) for a in range(4)]
        dys = [sorted({dy for (dy, _ph) in slots}) for _, slots in ax]
        present = tuple(tuple((dy, dx) for dy in dys[a] for dx in dys[b])
                        for a in range(4) for b in range(4))
        interpret = jax.default_backend() != "tpu"
        if emit_padded:
            return _phase2_conv_emit(pp, k2, jnp.tile(params["bias"], 16),
                                     c_out, tuple(bases), present, relu,
                                     interpret)
        out = stencil_phase2_conv(pp, k2, jnp.tile(params["bias"], 16),
                                  tuple(bases), present, relu, interpret)
    elif gemm4:
        # XLA's conv path measures ~7 TF/s at the RGB tail's narrow
        # (2,2,16C,16*3) composed kernel; 4 shifted GEMM accumulations of
        # the same math run ~10% faster end-to-end (scripts/probe_conv8.py
        # v5: 6.43 vs 6.91 ms isolated). f32 accumulation, exact vs the
        # conv up to bf16 summation order.
        hp, wp = pp.shape[1], pp.shape[2]
        acc = None
        for dy in range(2):
            for dx in range(2):
                tap = pp[:, dy:dy + hp - 1, dx:dx + wp - 1, :]
                t = jnp.einsum("bhwc,cd->bhwd", tap, k2[dy, dx],
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        big = acc + jnp.tile(params["bias"], 16).astype(jnp.float32)
        if relu:
            big = jnp.maximum(big, 0)
        big = big.astype(p.dtype)
        out = _align2(big, h, w, c_out, bases)
    else:
        big = lax.conv_general_dilated(
            pp, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        big = big + jnp.tile(params["bias"], 16).astype(big.dtype)
        if relu:
            big = jnp.maximum(big, 0)
        out = _align2(big, h, w, c_out, bases)
    if emit_padded:
        # non-stencil formulations pad the finished output the plain way
        return _phase2_pad(out, 4, c_out, False)
    return phase_interleave2(out) if interleave else out


def upsample_conv_fused(params: dict, x: jnp.ndarray, *,
                        relu: bool = True,
                        keep_phase: bool = False,
                        use_pallas: bool = False,
                        stencil: bool = False) -> jnp.ndarray:
    """Exact fusion of upsample_nearest(2) -> 1px reflect pad -> 3x3 conv
    [-> ReLU] as ONE 2x2 conv on the coarse grid + phase interleave.

    Boundary: reflect-pad of the upsampled map (up_pad[-1] = up[1] = x[0])
    equals replicate-pad on the coarse grid. 0.44x the FLOPs of the fine-grid
    conv and 4x the output-lane utilization for narrow channel counts — the
    decoder's three upsample->conv pairs are its most expensive layers
    (reference semantics: codes/decoder.py:25-27).
    """
    b, h, w, c = x.shape
    wk = params["kernel"]                    # (3, 3, C, C')
    c_out = wk.shape[-1]
    pk = _phase_kernel(wk.astype(jnp.float32)).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    if _stencil_ok(c, c_out, stencil, use_pallas):
        out = _stencil_call(xp, pk, params["bias"], relu)
        return out if keep_phase else phase_interleave(out)
    big = lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, H+1, W+1, 4*C')
    big = big + jnp.tile(params["bias"], 4).astype(big.dtype)
    if relu:
        big = jnp.maximum(big, 0)
    # phase p = 2a+b sits at coarse offset (a, b)
    out = _align(big, h, w, c_out, use_pallas)  # phase tensor (B, H, W, 4*C')
    return out if keep_phase else phase_interleave(out)
