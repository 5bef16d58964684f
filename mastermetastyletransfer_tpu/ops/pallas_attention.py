"""Fused Pallas TPU kernel for shifted-window attention.

Fuses Q/K/V projections + relative-position bias + shift mask + softmax +
value matmul (one or two value streams) + output projection in one
VMEM-resident pass (the BASELINE.json north-star kernel). The XLA op chain
(ops/attention.py) is the always-correct reference; this kernel is parity-
tested against it (tests/test_pallas.py) and enabled via
AttentionConfig.use_pallas.

Design (constraints from /opt/skills/guides/pallas_guide.md and Mosaic):
  * Grid = (nT, B/BSUB), image-group index fastest: program (j, i) handles
    window-tile j (TW windows, TWN = TW*N rows) of BSUB images at once —
    their rows stack along sublanes, so projections/MLP run as
    (BSUB*TWN, C) x (C, .) matmuls (the MXU is row-starved at TWN~245) while
    attention stays per-image (sublane slices). The per-tile mask/bias
    blocks keep a constant index across consecutive steps and stay
    VMEM-resident (the mask is the largest per-step input). Heads are an
    in-kernel unrolled loop over 32-lane slices (Mosaic supports vector lane
    slicing; it rejects lane-splitting reshapes and >1-batch-dim matmuls,
    which shaped this design). Softmax normalization is deferred past the
    value matmul (divide the (TWN, dh) product, not the (TWN, TWN) probs).
  * Two attention-core layouts (measured equal at the model level,
    scripts/probe_core_layout.py — both are at this formulation's floor):
    the single/dual attention kernels run DENSE (TWN, TWN) logits per image
    with a precomputed additive mask (-1e9 cross-window + shift regions;
    bias expanded block-diagonal), while the whole-BLOCK kernel runs a
    PER-WINDOW batched core ((BSUB*TW, N, N) logits — exactly the valid
    pairs, raw (nW, N, N) mask, resident (H, N, N) bias, no TWN^2 buffers,
    which frees VMEM for BSUB=8 image batching).
  * Heads' outputs concatenate along lanes and the output projection runs
    as ONE (rows, C) x (C, C) matmul.
  * Logits/softmax accumulate in fp32 regardless of input dtype.
  * The window count is padded to a tile multiple (padded windows see a
    zero mask diagonal -> uniform softmax over garbage, cropped on untile);
    at 512^2 stage-1 nW=361=19^2 whose only small divisor is 1, which would
    otherwise collapse tiles to 49-row dribbles.

Reference semantics: codes/style_transformer.py:37-169 (single V) and
:414-611 (dual V: one softmax, two value streams, shared output projection).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.ops.precision import kdot

_NEG = -1e9


def _pick_tile(n_windows: int, n_tokens: int, target_rows: int = 256) -> int:
    """Tile size with rows <= target_rows; prefers an exact divisor of the
    window count within 25% of the target, else pads (see module doc)."""
    t = max(1, target_rows // n_tokens)
    for d in range(t, max(t - t // 4, 1) - 1, -1):
        if n_windows % d == 0:
            return d
    return t


@functools.lru_cache(maxsize=None)
def _static_mask_big(mask_key, nt: int, tw: int, n: int, nw: int) -> np.ndarray:
    """(nT, TWN, TWN) additive mask: -1e9 on cross-window pairs, plus the
    shifted-phase region mask on the diagonal blocks. mask_key is a hashable
    tuple encoding of the (nW, N, N) shift mask (or None). Windows beyond nw
    are padding: their diagonal stays 0 so softmax is uniform (finite), and
    their output is dropped by the caller."""
    twn = tw * n
    big = np.full((nt, twn, twn), _NEG, np.float32)
    mask = None
    if mask_key is not None:
        mask = np.asarray(mask_key, np.float32).reshape(nw, n, n)
    for j in range(nt):
        for t in range(tw):
            w = j * tw + t
            sl = slice(t * n, (t + 1) * n)
            big[j, sl, sl] = 0.0 if (mask is None or w >= nw) else mask[w]
    return big


def _bias_big(bias: jnp.ndarray, tw: int) -> jnp.ndarray:
    """(H, N, N) -> (H, TWN, TWN) block-diagonal expansion (traced; the bias
    table is a learned parameter)."""
    h, n, _ = bias.shape
    eye = jnp.eye(tw, dtype=bias.dtype)
    big = jnp.einsum("hmn,tu->htmun", bias, eye)
    return big.reshape(h, tw * n, tw * n)


def _expand_mask(mask: Optional[jnp.ndarray], nt: int, tw: int, n: int,
                 nw: int) -> jnp.ndarray:
    """bfloat16: every mask value ({0, -100} region entries and the -1e9
    cross-window fill) is order-exact in bf16, and the (nT, TWN, TWN) mask is
    the largest per-step kernel input — half the bytes matters."""
    key = None
    if mask is not None:
        key = tuple(np.asarray(mask, np.float32).ravel().tolist())
    big = _static_mask_big(key, nt, tw, n, nw)
    # The downcast is only safe while distinct mask values stay distinct and
    # ordered in bf16 (today's {0, -100, -1e9} do; the additive levels only
    # gate softmax). A future finer-grained mask that collides under bf16
    # rounding fails here loudly instead of silently losing precision.
    uniq = np.unique(np.asarray(big, np.float32))
    as_bf16 = np.asarray(uniq, dtype=jnp.bfloat16).astype(np.float32)
    assert np.all(np.diff(as_bf16) > 0), (
        "shift-mask values collide under bfloat16 rounding")
    return jnp.asarray(big, dtype=jnp.bfloat16)


def _pad_windows(x: jnp.ndarray, nw_pad: int) -> jnp.ndarray:
    b, nw, n, c = x.shape
    if nw_pad == nw:
        return x
    return jnp.pad(x, ((0, 0), (0, nw_pad - nw), (0, 0), (0, 0)))


def _tiles(x: jnp.ndarray, nt: int) -> jnp.ndarray:
    """(B, nW_pad, N, C) -> (B, nT, TWN, C)."""
    b, nw, n, c = x.shape
    return x.reshape(b, nt, (nw // nt) * n, c)


def _untile(x: jnp.ndarray, nw: int, n: int) -> jnp.ndarray:
    """(B, nT, TWN, C) -> (B, nW, N, C), dropping padded windows."""
    b, nt, twn, c = x.shape
    return x.reshape(b, (nt * twn) // n, n, c)[:, :nw]


def _linw(p: dict, name: str):
    return p[name]["kernel"]


def _linb(p: dict, name: str, c: int, dtype):
    """Bias as a (1, C) row (TPU blocks want >=2D)."""
    b = p[name].get("bias")
    return jnp.zeros((1, c), dtype) if b is None else b.reshape(1, c)


def _attend_heads(q, k, vs, wp, bias, mask, heads: int, scale: float,
                  compute_dtype, bsub: int = 1):
    """Shared in-kernel attention. q/k: (BSUB*TWN, C) f32 — BSUB images'
    same-tile rows stacked along sublanes (attention never crosses the
    per-image TWN boundary); vs: tuple of (BSUB*TWN, C) f32 value matrices;
    wp: (C, C). Returns one (BSUB*TWN, C) f32 output per value stream.

    Head loop runs OUTER so the bias+mask combine is amortized over the
    BSUB images. Softmax normalization is deferred past the value matmul
    (o = (E V) / rowsum(E)) — one (TWN, dh) multiply instead of a (TWN, TWN)
    divide pass. Heads' outputs concatenate along lanes and the output
    projection runs as ONE (BSUB*TWN, C) x (C, C) matmul."""
    f32 = jnp.float32
    rows, c = q.shape
    twn = rows // bsub
    dh = c // heads
    qs = (q * scale).astype(compute_dtype)
    ks = k.astype(compute_dtype)
    vs = [v.astype(compute_dtype) for v in vs]
    if bsub > 1:
        # (BSUB*TWN, C) -> (BSUB, TWN, C): attention is per-image, so the
        # image axis becomes the ONE batch dim Mosaic allows in dot_general
        # (keeps the kernel body at `heads` unrolled iterations, not
        # heads*BSUB — the fully unrolled form crashes the Mosaic compiler
        # at TWN=245, BSUB=8).
        qs = qs.reshape(bsub, twn, c)
        ks = ks.reshape(bsub, twn, c)
        vs = [v.reshape(bsub, twn, c) for v in vs]
        bdims = (((2,), (2,)), ((0,), (0,)))           # qk^T, batch=image
        pvdims = (((2,), (1,)), ((0,), (0,)))          # P v, batch=image
    else:
        bdims = (((1,), (1,)), ((), ()))
        pvdims = (((1,), (0,)), ((), ()))
    o_heads = [[None] * heads for _ in vs]             # per stream
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        comb = bias[h].astype(f32) + mask              # (TWN, TWN)
        s = kdot(qs[..., sl], ks[..., sl], bdims)
        s = s + comb                                   # broadcasts over BSUB
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        ec = e.astype(compute_dtype)
        for v_i, v in enumerate(vs):
            o = kdot(ec, v[..., sl], pvdims)
            o_heads[v_i][h] = (o * recip).astype(compute_dtype)
    wp_c = wp.astype(compute_dtype)
    accs = []
    for v_i in range(len(vs)):
        allo = jnp.concatenate(o_heads[v_i], axis=-1)  # lanes: heads -> C
        if bsub > 1:
            allo = allo.reshape(rows, c)
        accs.append(kdot(allo, wp_c))
    return accs


def _flat(x_ref):
    """(BSUB, 1, TWN, C) block -> (BSUB*TWN, C) sublane-merged view."""
    bsub, _, twn, c = x_ref.shape
    return x_ref[:, 0].reshape(bsub * twn, c)


def _unflat(x, out_ref):
    bsub, _, twn, c = out_ref.shape
    out_ref[:, 0] = x.reshape(bsub, twn, c).astype(out_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
            bv_ref, wp_ref, bp_ref, bias_ref, mask_ref, out_ref, *,
            heads: int, scale: float, bsub: int):
    f32 = jnp.float32
    dt = q_ref.dtype

    # NOTE: weights are stored f32; cast to the compute dtype at load or the
    # mixed-dtype dot silently promotes to an f32 matmul (~1/8 MXU peak).
    def proj(x_ref, w_ref, b_ref):
        return kdot(_flat(x_ref), w_ref[:].astype(dt)) + b_ref[0].astype(f32)

    q = proj(q_ref, wq_ref, bq_ref)
    k = proj(k_ref, wk_ref, bk_ref)
    v = proj(v_ref, wv_ref, bv_ref)
    (acc,) = _attend_heads(q, k, (v,), wp_ref[:], bias_ref[:],
                           mask_ref[0].astype(f32), heads, scale, dt,
                           bsub=bsub)
    _unflat(acc + bp_ref[0].astype(f32), out_ref)


def _kernel_dual(q_ref, k_ref, vs_ref, vh_ref, ws_ref, bs_ref, wsh_ref,
                 bsh_ref, wp_ref, bp_ref, bias_ref, mask_ref,
                 sigma_ref, mu_ref, *, heads: int, scale: float, bsub: int):
    """Dual-value program: q and k arrive PRE-projected (the reference's q
    has no linear when use_q_proj=False, and K's optional instance norm uses
    whole-grid statistics — a cross-window reduce that lives outside the
    tile; codes/style_transformer.py:468, :520-530). One softmax feeds two
    value streams through the SHARED output projection."""
    f32 = jnp.float32
    dt = vs_ref.dtype

    def proj(x_ref, w_ref, b_ref):
        return kdot(_flat(x_ref), w_ref[:].astype(dt)) + b_ref[0].astype(f32)

    q = _flat(q_ref).astype(f32)
    k = _flat(k_ref).astype(f32)
    v_s = proj(vs_ref, ws_ref, bs_ref)
    v_h = proj(vh_ref, wsh_ref, bsh_ref)
    acc_s, acc_h = _attend_heads(q, k, (v_s, v_h), wp_ref[:], bias_ref[:],
                                 mask_ref[0].astype(f32), heads, scale, dt,
                                 bsub=bsub)
    bp = bp_ref[0].astype(f32)
    _unflat(acc_s + bp, sigma_ref)
    _unflat(acc_h + bp, mu_ref)


def _gelu_lowp(x):
    """GELU (exact-erf form, Abramowitz-Stegun 7.1.26 like pallas_mlp._erf)
    evaluated entirely in the input's own (low) precision. The erf sign
    select is eliminated algebraically — gelu(x) = 0.5*x*(1 + sign(x)*y(|z|))
    = 0.5*(x + |x|*y(|z|)) since x*sign(x) = |x| — because Mosaic's target
    rejects bf16 COMPARISONS ("Target does not support this comparison";
    probed on hardware r5: sign/where on bf16 fail, abs/exp/reciprocal
    lower fine) and an f32 sign view costs a full-size scoped-VMEM buffer
    (measured: +0.8M, enough to push the 512^2 rows kernel 16.82M/16M)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    az = jnp.abs(x) * (0.5 ** 0.5)
    t = 1.0 / (1.0 + p * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-az * az)
    return 0.5 * (x + jnp.abs(x) * y)


def _mlp_chunks() -> int:
    """MMST_MLP_CHUNKS (r5): hidden-dim chunking factor for the in-kernel
    MLP — see _block_compute. Exact at any value (fc2 partials accumulate
    in f32, GELU per-lane); >1 shrinks the peak f32 hidden scratch to
    enable larger bsub (pair with MMST_BSUB_BUDGET_SCALE)."""
    return int(os.environ.get("MMST_MLP_CHUNKS", "1"))


def _qkv_split() -> bool:
    """MMST_QKV_SPLIT=1 (r5): three C-wide projections instead of the one
    (C, 3C) fused GEMM — shrinks the peak f32 projection accumulator 3x
    (same math; lane slices of the same fused weight)."""
    return os.environ.get("MMST_QKV_SPLIT", "0") == "1"


def _hid_lowp(dt) -> bool:
    """bf16 MLP hidden buffer (r5, PERF.md 'Not taken' -> taken): compute
    the MLP hidden activations + GELU in bf16 instead of f32. The f32
    (rows, 4C) hidden buffer is the largest single scratch in the block
    kernels; halving it is what buys wider image tiles (bsub) / fewer grid
    steps — the named cure for the stage-1 per-step data-movement floor
    (probe_blockcost: 42% shared floor). Only ever applies to the bf16
    path (the f32 compliant point keeps f32 hidden exactly); numeric
    effect on the bf16 operating point measured in
    goldens/operating_points.json. MMST_HID_BF16=0 to A/B."""
    return dt == jnp.bfloat16 and os.environ.get("MMST_HID_BF16", "0") == "1"


def _pick_bsub(b: int, c: int, twn: int, budget: int = 131072,
               itemsize: int = 2) -> int:
    """Images per grid step: stack BSUB images' same-tile rows along
    sublanes so the in-kernel projections/MLP run as (BSUB*TWN, C) matmuls
    (up to 8x wider M than per-image tiles — the MXU is row-starved at
    TWN~245). Budgeted against the ~16MB VMEM: the block kernel's f32
    row-buffers (qkv 3C + MLP hidden 4C + residual) OOM just past
    BSUB*TWN*C ~ 128k elements (measured: 16.74M/16M at 8*245*128). Must
    divide B so no image padding is needed.

    Budgets are calibrated for bf16 (2-byte) streams; pass the input
    itemsize so f32 inputs shrink the element budget. The scaling is
    QUADRATIC in itemsize: f32 doubles the streamed blocks AND runs the
    whole f32 scratch set against the same 16M limit (measured r3: the
    fused encoder at the bf16 budget scoped 26.6M/16M; the block kernel
    at a linear half-budget still scoped 21.8M/16M; quarter-budget
    fits). f32 is the parity/compat path, so the conservative bsub is
    fine.

    MMST_BSUB_BUDGET_SCALE (float, probe knob): scales every kernel's
    element budget — the r4 high-res sweep lever (budgets were calibrated
    at 512^2 batch 8). ops/vmem.budget_scale composes on top (trace-time
    scaling for callers that embed the model in heavier graphs, e.g. the
    lambda-sweep vmap)."""
    from mastermetastyletransfer_tpu.ops.vmem import budget_scale
    scale = float(os.environ.get("MMST_BSUB_BUDGET_SCALE", "1"))
    scale *= budget_scale()
    if scale != 1.0:
        budget = int(budget * scale)
    cap = min(8, max(1, (budget * 4 // (itemsize * itemsize)) // (c * twn)))
    for d in range(min(cap, b), 0, -1):
        if b % d == 0:
            return d
    return 1


def _specs(twn, c, heads, bsub: int = 1):
    """Block specs under the (nT, B/BSUB) grid: the tile index j is
    program_id(0) (slow) and the image-group index i is program_id(1)
    (fast), so the per-tile mask block index stays CONSTANT across
    consecutive grid steps and Mosaic keeps it VMEM-resident instead of
    re-streaming ~TWN^2 bytes per step."""
    win = pl.BlockSpec((bsub, 1, twn, c), lambda j, i: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    wmat = pl.BlockSpec((c, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    wvec = pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    rbias = pl.BlockSpec((heads, twn, twn), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, twn, twn), lambda j, i: (j, 0, 0),
                        memory_space=pltpu.VMEM)
    return win, wmat, wvec, rbias, mask


def _geometry(nw: int, n: int, target_rows: int):
    tw = _pick_tile(nw, n, target_rows)
    nw_pad = ((nw + tw - 1) // tw) * tw
    nt = nw_pad // tw
    return tw, nw_pad, nt, tw * n


def fused_window_attention(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, bias: jnp.ndarray,
                           mask: Optional[jnp.ndarray], heads: int, *,
                           target_rows: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (B, nW, N, C) window-partitioned inputs. bias: (heads, N, N).
    mask: (nW, N, N) numpy shift mask or None. Returns (B, nW, N, C)."""
    b, nw, n, c = q.shape
    tw, nw_pad, nt, twn = _geometry(nw, n, target_rows)

    q4, k4, v4 = (_tiles(_pad_windows(x, nw_pad), nt) for x in (q, k, v))
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    bsub = _pick_bsub(b, c, twn, itemsize=q.dtype.itemsize)
    win, wmat, wvec, rbias, mspec = _specs(twn, c, heads, bsub)
    kern = functools.partial(_kernel, heads=heads, scale=(c // heads) ** -0.5,
                             bsub=bsub)
    out = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win, win, win,
                  wmat, wvec, wmat, wvec, wmat, wvec, wmat, wvec,
                  rbias, mspec],
        out_specs=win,
        out_shape=jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype),
        interpret=interpret,
    )(q4, k4, v4,
      _linw(params, "wq"), _linb(params, "wq", c, q.dtype),
      _linw(params, "wk"), _linb(params, "wk", c, q.dtype),
      _linw(params, "wv"), _linb(params, "wv", c, q.dtype),
      _linw(params, "proj"), _linb(params, "proj", c, q.dtype),
      bias_b, mask_b)
    return _untile(out, nw, n)


def fused_window_attention_dual(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                                v_scale: jnp.ndarray, v_shift: jnp.ndarray,
                                bias: jnp.ndarray,
                                mask: Optional[jnp.ndarray], heads: int, *,
                                target_rows: int = 256,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-value variant: q and k arrive PRE-projected (and instance-normed
    per the reference's placement); returns (sigma, mu), both (B, nW, N, C)."""
    b, nw, n, c = q.shape
    tw, nw_pad, nt, twn = _geometry(nw, n, target_rows)

    q4, k4, vs4, vh4 = (_tiles(_pad_windows(x, nw_pad), nt)
                        for x in (q, k, v_scale, v_shift))
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    # The dual kernel holds two value streams and two output accumulators
    # (6 row-streams vs the single kernel's 4), so its VMEM headroom is
    # ~2/3 of the single kernel's — scale the row budget accordingly.
    bsub = _pick_bsub(b, c, twn, budget=(131072 * 2) // 3,
                      itemsize=q.dtype.itemsize)
    win, wmat, wvec, rbias, mspec = _specs(twn, c, heads, bsub)
    kern = functools.partial(_kernel_dual, heads=heads,
                             scale=(c // heads) ** -0.5, bsub=bsub)
    out_shape = jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype)
    sigma, mu = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win, win, win, win,
                  wmat, wvec, wmat, wvec, wmat, wvec,
                  rbias, mspec],
        out_specs=(win, win),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(q4, k4, vs4, vh4,
      _linw(params, "wv_scale"), _linb(params, "wv_scale", c, q.dtype),
      _linw(params, "wv_shift"), _linb(params, "wv_shift", c, q.dtype),
      _linw(params, "proj"), _linb(params, "proj", c, q.dtype),
      bias_b, mask_b)
    return _untile(sigma, nw, n), _untile(mu, nw, n)


def _block_compute(x_raw, mask_block, pm_block,
                   wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                   n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                   f1w_ref, f1b_ref, f2w_ref, f2b_ref, *,
                   heads: int, scale: float, use_norm1: bool,
                   use_padmask: bool, use_norm2: bool, bsub: int,
                   tw: int, n: int, eps: float = 1e-5):
    """Whole-block math on window-major rows (shared by the per-window-tile
    and row-resident kernels): norm1 -> QKV proj -> per-window batched
    attention core -> +res -> [norm2 ->] MLP -> +res. x_raw (bsub*tw*n, C),
    mask_block (tw, n, n), pm_block (tw*n, 1) or None."""
    from mastermetastyletransfer_tpu.ops.pallas_mlp import _erf

    f32 = jnp.float32
    dt = x_raw.dtype
    c = x_raw.shape[-1]
    rows = bsub * tw * n
    nb = bsub * tw
    dh = c // heads

    if use_norm1:
        xf = x_raw.astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (xf - mean) * jax.lax.rsqrt(var + eps)
        ln = ln * n1s_ref[0].astype(f32) + n1b_ref[0].astype(f32)
        ln = ln.astype(dt)
    else:
        ln = x_raw
    if use_padmask:
        pm = pm_block.astype(dt)
        if bsub > 1:
            pm = jnp.concatenate([pm] * bsub, axis=0)
        ln = ln * pm
    if _qkv_split():
        # Three C-wide projections instead of one 3C GEMM: peak f32
        # accumulator drops from (rows, 3C) to (rows, C) — a VMEM-for-
        # width trade that buys larger bsub (r5; see _pick_bsub scale
        # sweep). Same math (lane slices of the fused weight).
        def prj(lo):
            p = kdot(ln, wqkv_ref[:, lo:lo + c].astype(dt)) \
                + bqkv_ref[0, lo:lo + c].astype(f32)
            return p.astype(dt)
        q3 = (prj(0) * scale).reshape(nb, n, c)
        k3 = prj(c).reshape(nb, n, c)
        v3 = prj(2 * c).reshape(nb, n, c)
    else:
        qkv = kdot(ln, wqkv_ref[:].astype(dt)) + bqkv_ref[0].astype(f32)
        qkv = qkv.astype(dt)
        q3 = (qkv[:, :c] * scale).reshape(nb, n, c)
        k3 = qkv[:, c:2 * c].reshape(nb, n, c)
        v3 = qkv[:, 2 * c:].reshape(nb, n, c)

    m = mask_block.astype(f32)                     # (TW, N, N)
    mt = jnp.concatenate([m] * bsub, axis=0) if bsub > 1 else m

    o_heads = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        comb = mt + bias_ref[h].astype(f32)        # broadcast (N,N) over NB
        s = kdot(q3[..., sl], k3[..., sl],
                 (((2,), (2,)), ((0,), (0,))))
        s = s + comb
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o = kdot(e.astype(dt), v3[..., sl],
                 (((2,), (1,)), ((0,), (0,))))
        o_heads.append((o * recip).astype(dt))
    allo = jnp.concatenate(o_heads, axis=-1).reshape(rows, c)
    acc = kdot(allo, wp_ref[:].astype(dt))
    y = x_raw.astype(f32) + acc + bp_ref[0].astype(f32)

    h2 = y
    if use_norm2:
        mean = jnp.mean(h2, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h2 - mean), axis=-1, keepdims=True)
        h2 = (h2 - mean) * jax.lax.rsqrt(var + eps)
        h2 = h2 * n2s_ref[0].astype(f32) + n2b_ref[0].astype(f32)
    hidden = f1w_ref.shape[1]
    chunks = _mlp_chunks()
    if chunks > 1 and hidden % chunks == 0 and not _hid_lowp(dt):
        # Hidden-dimension chunking (r5): evaluate fc1/GELU/fc2 over
        # hidden/chunks lanes at a time, accumulating fc2's partials. Peak
        # f32 hidden scratch drops chunks-fold (the (rows, 4C) buffer is
        # the largest single scratch) at identical math and FLOPs — the
        # VMEM-for-bsub trade the stage-1 per-step floor needs (every
        # per-op attack on the floor closed negative; only fewer/larger
        # independent steps remain — PERF.md r4/r5 lever tables).
        hc = hidden // chunks
        h2dt = h2.astype(dt)
        acc = None
        for ci in range(chunks):
            lo = ci * hc
            hp_ = kdot(h2dt, f1w_ref[:, lo:lo + hc].astype(dt)) \
                + f1b_ref[0, lo:lo + hc].astype(f32)
            hp_ = 0.5 * hp_ * (1.0 + _erf(hp_ * (0.5 ** 0.5)))
            part = kdot(hp_.astype(dt), f2w_ref[lo:lo + hc].astype(dt))
            acc = part if acc is None else acc + part
        h2 = acc + f2b_ref[0].astype(f32)
    elif _hid_lowp(dt):
        hb = (kdot(h2.astype(dt), f1w_ref[:].astype(dt))
              + f1b_ref[0].astype(f32)).astype(dt)
        hb = _gelu_lowp(hb)
        h2 = kdot(hb.astype(dt), f2w_ref[:].astype(dt)) + f2b_ref[0].astype(f32)
    else:
        h2 = kdot(h2.astype(dt), f1w_ref[:].astype(dt)) + f1b_ref[0].astype(f32)
        h2 = 0.5 * h2 * (1.0 + _erf(h2 * (0.5 ** 0.5)))
        h2 = kdot(h2.astype(dt), f2w_ref[:].astype(dt)) + f2b_ref[0].astype(f32)
    return y + h2


def _kernel_block_pw(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                     bias_ref, mask_ref,
                     n1s_ref, n1b_ref, pm_ref,
                     n2s_ref, n2b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                     out_ref, *, heads: int, scale: float, use_norm1: bool,
                     use_padmask: bool, use_norm2: bool, bsub: int):
    """Whole transformer block with a PER-WINDOW batched attention core:
    x block (BSUB, 1, TW, N, C); logits/softmax run as (BSUB*TW, N, N)
    batched blocks — exactly the valid window pairs, no TWN^2 dense tile,
    no block-diagonal mask/bias expansion (bias stays (H, N, N) resident,
    mask is the raw (nW_pad, N, N) shift mask sliced per tile). The freed
    VMEM doubles BSUB, widening the projection/MLP GEMMs."""
    _, _, tw, n, c = x_ref.shape
    x_raw = x_ref[:, 0].reshape(bsub * tw * n, c)
    pm = pm_ref[0].reshape(tw * n, 1) if use_padmask else None
    y = _block_compute(x_raw, mask_ref[0], pm,
                       wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                       n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                       f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                       heads=heads, scale=scale, use_norm1=use_norm1,
                       use_padmask=use_padmask, use_norm2=use_norm2,
                       bsub=bsub, tw=tw, n=n)
    out_ref[:, 0] = y.reshape(bsub, tw, n, c).astype(out_ref.dtype)


def _kernel_block_rows(*refs, heads: int, scale: float, use_norm1: bool,
                       use_padmask: bool, use_norm2: bool, bsub: int,
                       wh: int, ww: int, sw: int):
    """Row-resident whole-block kernel (r4): the grid walks WINDOW-ROWS of
    the padded (B, Hp, Wp, C) image; the cyclic-roll + window-partition
    geometry (reference codes/style_transformer.py:98-111) never touches
    HBM. The H-direction roll rides the wh single-row input operands'
    index maps ((r*wh + j + sh) % Hp — block-index arithmetic); the
    W-direction roll and the row-major -> window-major relayout are in-VMEM
    concat/transpose (probed supported + exact: scripts/probe_rowview.py).
    Output is written back as wh plain rows in the ROLLED frame; the caller
    un-rolls once per shifted block (one XLA roll instead of
    merge+unroll+partition round trips)."""
    row_refs = refs[:wh]
    (wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref, mask_ref,
     n1s_ref, n1b_ref, pm_ref, n2s_ref, n2b_ref,
     f1w_ref, f1b_ref, f2w_ref, f2b_ref, out_ref) = refs[wh:]

    c = row_refs[0].shape[-1]
    wp = row_refs[0].shape[2]
    nww = wp // ww
    n = wh * ww

    rows = jnp.concatenate([r[:, 0:1] for r in row_refs], axis=1)
    if sw:
        rows = jnp.concatenate([rows[:, :, sw:], rows[:, :, :sw]], axis=2)
    x4 = rows.reshape(bsub, wh, nww, ww, c).transpose(0, 2, 1, 3, 4)
    x_raw = x4.reshape(bsub * nww * n, c)
    pm = pm_ref[0].reshape(nww * n, 1) if use_padmask else None
    y = _block_compute(x_raw, mask_ref[0], pm,
                       wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                       n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                       f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                       heads=heads, scale=scale, use_norm1=use_norm1,
                       use_padmask=use_padmask, use_norm2=use_norm2,
                       bsub=bsub, tw=nww, n=n)
    y4 = y.reshape(bsub, nww, wh, ww, c).transpose(0, 2, 1, 3, 4)
    out_ref[:] = y4.reshape(bsub, wh, wp, c).astype(out_ref.dtype)


def _rows_block_step(rows, sw, bsub, wh, ww, mask_block, pm, w_refs, *,
                     heads, scale, use_norm1, use_padmask, use_norm2):
    """One whole transformer block on a (bsub, wh, Wp, C) row band: W-roll
    (in-VMEM) -> row-major->window-major relayout -> _block_compute ->
    inverse relayout. Shared by the single-block rows kernel and the r5
    two-blocks-one-program kernel."""
    (wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
     n1s_ref, n1b_ref, n2s_ref, n2b_ref,
     f1w_ref, f1b_ref, f2w_ref, f2b_ref) = w_refs
    c = rows.shape[-1]
    wp = rows.shape[2]
    nww = wp // ww
    n = wh * ww
    if sw:
        rows = jnp.concatenate([rows[:, :, sw:], rows[:, :, :sw]], axis=2)
    x4 = rows.reshape(bsub, wh, nww, ww, c).transpose(0, 2, 1, 3, 4)
    x_raw = x4.reshape(bsub * nww * n, c)
    y = _block_compute(x_raw, mask_block, pm,
                       wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                       n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                       f1w_ref, f1b_ref, f2w_ref, f2b_ref,
                       heads=heads, scale=scale, use_norm1=use_norm1,
                       use_padmask=use_padmask, use_norm2=use_norm2,
                       bsub=bsub, tw=nww, n=n)
    y4 = y.reshape(bsub, nww, wh, ww, c).transpose(0, 2, 1, 3, 4)
    return y4.reshape(bsub, wh, wp, c)


def _kernel_block_pair_rows(*refs, heads: int, scale: float, use_norm: bool,
                            use_padmask: bool, bsub: int, wh: int, ww: int,
                            sh: int, sw: int, nwh: int):
    """Two consecutive swin blocks (unshifted block0 -> shifted block1) in
    ONE program with a one-window-row software pipeline (r5, VERDICT r4
    task 1c): the grid's fast axis walks r = 0..nwh; step r computes
    block0's window-row r and block1's window-row r-1 — block1(r-1) needs
    block0 rows [(r-1)*wh+sh, r*wh+sh), i.e. the tail of the previous
    step's block0 row (prev_ref scratch) plus the first sh rows of this
    step's (y0_ref). block0's output NEVER touches HBM, and the cyclic
    wrap (block1's last row needs block0 row 0's first sh rows —
    reference roll semantics codes/style_transformer.py:98-100) is served
    from the first_ref scratch captured at r=0. Scratch persists across
    the sequential grid; the batch axis is the SLOW grid dim so each
    image-group's pipeline runs to completion before the next."""
    row_refs = refs[:wh]
    (wqkv0, bqkv0, wp0, bp0, bias0, n10s, n10b, pm0_ref, n20s, n20b,
     f10w, f10b, f20w, f20b,
     wqkv1, bqkv1, wp1, bp1, bias1, mask1_ref, n11s, n11b, pm1_ref,
     n21s, n21b, f11w, f11b, f21w, f21b,
     out_ref, y0_ref, prev_ref, first_ref) = refs[wh:]
    r = pl.program_id(1)
    c = row_refs[0].shape[-1]
    wp = row_refs[0].shape[2]
    nww = wp // ww
    n = wh * ww
    zero_mask = jnp.zeros((nww, n, n), jnp.float32)
    w0 = (wqkv0, bqkv0, wp0, bp0, bias0, n10s, n10b, n20s, n20b,
          f10w, f10b, f20w, f20b)
    w1 = (wqkv1, bqkv1, wp1, bp1, bias1, n11s, n11b, n21s, n21b,
          f11w, f11b, f21w, f21b)

    @pl.when(r < nwh)
    def _():
        rows = jnp.concatenate([rr[:, 0:1] for rr in row_refs], axis=1)
        pm0 = pm0_ref[0].reshape(nww * n, 1) if use_padmask else None
        y0 = _rows_block_step(rows, 0, bsub, wh, ww, zero_mask, pm0, w0,
                              heads=heads, scale=scale, use_norm1=use_norm,
                              use_padmask=use_padmask, use_norm2=use_norm)
        y0_ref[:] = y0.astype(y0_ref.dtype)

        @pl.when(r == 0)
        def _():
            first_ref[:] = y0[:, :sh].astype(first_ref.dtype)

    @pl.when(r >= 1)
    def _():
        head = jnp.where(r >= nwh, first_ref[:], y0_ref[:, :sh])
        rows1 = jnp.concatenate([prev_ref[:, sh:], head], axis=1)
        pm1 = pm1_ref[0].reshape(nww * n, 1) if use_padmask else None
        y1 = _rows_block_step(rows1, sw, bsub, wh, ww, mask1_ref[0], pm1,
                              w1, heads=heads, scale=scale,
                              use_norm1=use_norm, use_padmask=use_padmask,
                              use_norm2=use_norm)
        out_ref[:] = y1.astype(out_ref.dtype)

    @pl.when(r < nwh)
    def _():
        prev_ref[:] = y0_ref[:]


def fused_window_block_pair_rows(params0: dict, params1: dict,
                                 x: jnp.ndarray,
                                 bias0: jnp.ndarray, bias1: jnp.ndarray,
                                 mask1: Optional[np.ndarray], heads: int,
                                 mlp0: dict, mlp1: dict,
                                 norms0: Tuple[Optional[dict], Optional[dict]],
                                 norms1: Tuple[Optional[dict], Optional[dict]],
                                 padmask0: Optional[np.ndarray],
                                 padmask1: Optional[np.ndarray], *,
                                 window: Tuple[int, int] = (7, 7),
                                 shift: Tuple[int, int] = (0, 0),
                                 interpret: bool = False) -> jnp.ndarray:
    """block1(block0(x)) for a swin stage's (W-MSA, SW-MSA) pair in one
    Pallas program — block0's output stays in VMEM scratch (one window-row
    pipeline lag), eliminating its HBM write + re-read AND halving the
    per-step shared data-movement floor the r4 probes pinned at 42% of the
    block cost (PERF.md probe_blockcost). x: (B, Hp, Wp, C) padded;
    returns block1's output in the ROLLED frame (callers un-roll by
    +shift, exactly like fused_window_block_rows for the shifted block).
    norms{0,1} = (norm1, norm2) per block; use_norm is all-or-nothing
    (the swin backbone always has both)."""
    b, hp, wp, c = x.shape
    wh, ww = window
    sh, sw = shift
    assert hp % wh == 0 and wp % ww == 0, (hp, wp, window)
    assert 0 < sh < wh and 0 < sw < ww, (shift, window)
    nwh, nww = hp // wh, wp // ww
    n = wh * ww
    twn = nww * n

    # the step holds TWO blocks' live compute buffers + the pipeline
    # scratch; budget at half the single-block kernel's by default
    # (MMST_PAIR_BUDGET: the r5 A/B knob — at 131072 the 512^2 stage-1
    # pair runs bsub=1 and measured -8% vs sequential blocks at bsub=2;
    # raising it retries wider tiles against the scoped-VMEM ceiling)
    pair_budget = int(os.environ.get("MMST_PAIR_BUDGET", "131072"))
    bsub = _pick_bsub(b, c, twn, budget=pair_budget,
                      itemsize=x.dtype.itemsize)

    if mask1 is None:
        mask_r = jnp.zeros((nwh, nww, n, n), jnp.bfloat16)
    elif isinstance(mask1, np.ndarray):
        mask_r = jnp.asarray(
            np.asarray(mask1, np.float32).reshape(nwh, nww, n, n),
            jnp.bfloat16)
    else:
        mask_r = mask1.astype(jnp.bfloat16).reshape(nwh, nww, n, n)

    def pm3_of(padmask):
        if padmask is None:
            return None
        if isinstance(padmask, np.ndarray):
            if float(np.min(padmask)) >= 1.0:
                return None
            return jnp.asarray(
                np.asarray(padmask, np.float32).reshape(nwh, nww * n, 1))
        return padmask.astype(jnp.float32).reshape(nwh, nww * n, 1)

    pm0 = pm3_of(padmask0)
    pm1 = pm3_of(padmask1)
    use_padmask = pm0 is not None or pm1 is not None
    if use_padmask:
        if pm0 is None:
            pm0 = jnp.ones((nwh, twn, 1), jnp.float32)
        if pm1 is None:
            pm1 = jnp.ones((nwh, twn, 1), jnp.float32)
    else:
        pm0 = pm1 = jnp.zeros((nwh, twn, 1), jnp.float32)

    def block_weights(params, mlp_params, norms):
        norm1, norm2 = norms
        w1, b1, w2, b2, hidden = _mlp_weights(mlp_params, c, x.dtype)
        ones = jnp.ones((1, c), x.dtype)
        zeros = jnp.zeros((1, c), x.dtype)
        n1s = norm1["scale"].reshape(1, c) if norm1 else ones
        n1b = norm1["bias"].reshape(1, c) if norm1 else zeros
        n2s = norm2["scale"].reshape(1, c) if norm2 else ones
        n2b = norm2["bias"].reshape(1, c) if norm2 else zeros
        wqkv = jnp.concatenate([_linw(params, "wq"), _linw(params, "wk"),
                                _linw(params, "wv")], axis=1)
        bqkv = jnp.concatenate([_linb(params, "wq", c, x.dtype),
                                _linb(params, "wk", c, x.dtype),
                                _linb(params, "wv", c, x.dtype)], axis=1)
        return (wqkv, bqkv, _linw(params, "proj"),
                _linb(params, "proj", c, x.dtype),
                n1s, n1b, n2s, n2b, w1, b1, w2, b2, hidden)

    (wqkv0, bqkv0, wpj0, bpj0, n10s, n10b, n20s, n20b,
     f10w, f10b, f20w, f20b, hidden) = block_weights(params0, mlp0, norms0)
    (wqkv1, bqkv1, wpj1, bpj1, n11s, n11b, n21s, n21b,
     f11w, f11b, f21w, f21b, _) = block_weights(params1, mlp1, norms1)

    def row_spec(j):
        def imap(i, r, j=j):
            return (i, (r % nwh) * wh + j, 0, 0)
        return pl.BlockSpec((bsub, 1, wp, c), imap,
                            memory_space=pltpu.VMEM)

    def cmap(*shape_dims):
        return lambda i, r: (0,) * shape_dims[0]

    wmat = pl.BlockSpec((c, c), cmap(2), memory_space=pltpu.VMEM)
    wvec = pl.BlockSpec((1, c), cmap(2), memory_space=pltpu.VMEM)
    w3mat = pl.BlockSpec((c, 3 * c), cmap(2), memory_space=pltpu.VMEM)
    w3vec = pl.BlockSpec((1, 3 * c), cmap(2), memory_space=pltpu.VMEM)
    hmat = pl.BlockSpec((c, hidden), cmap(2), memory_space=pltpu.VMEM)
    hmat_t = pl.BlockSpec((hidden, c), cmap(2), memory_space=pltpu.VMEM)
    hvec = pl.BlockSpec((1, hidden), cmap(2), memory_space=pltpu.VMEM)
    rbias = pl.BlockSpec((heads, n, n), cmap(3), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, nww, n, n),
                         lambda i, r: ((r - 1) % nwh, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    pm0spec = pl.BlockSpec((1, twn, 1), lambda i, r: (r % nwh, 0, 0),
                           memory_space=pltpu.VMEM)
    pm1spec = pl.BlockSpec((1, twn, 1), lambda i, r: ((r - 1) % nwh, 0, 0),
                           memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bsub, wh, wp, c),
                         lambda i, r: (i, (r - 1) % nwh, 0, 0),
                         memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel_block_pair_rows, heads=heads,
                             scale=(c // heads) ** -0.5,
                             use_norm=norms0[0] is not None,
                             use_padmask=use_padmask,
                             bsub=bsub, wh=wh, ww=ww, sh=sh, sw=sw, nwh=nwh)
    return pl.pallas_call(
        kern,
        grid=(b // bsub, nwh + 1),
        in_specs=[row_spec(j) for j in range(wh)] + [
            w3mat, w3vec, wmat, wvec, rbias,
            wvec, wvec, pm0spec, wvec, wvec, hmat, hvec, hmat_t, wvec,
            w3mat, w3vec, wmat, wvec, rbias, mspec,
            wvec, wvec, pm1spec, wvec, wvec, hmat, hvec, hmat_t, wvec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bsub, wh, wp, c), x.dtype),
            pltpu.VMEM((bsub, wh, wp, c), x.dtype),
            pltpu.VMEM((bsub, sh, wp, c), x.dtype),
        ],
        interpret=interpret,
    )(*([x] * wh),
      wqkv0, bqkv0, wpj0, bpj0, bias0,
      n10s, n10b, pm0, n20s, n20b, f10w, f10b, f20w, f20b,
      wqkv1, bqkv1, wpj1, bpj1, bias1, mask_r,
      n11s, n11b, pm1, n21s, n21b, f11w, f11b, f21w, f21b)


def fused_window_block_rows(params: dict, x: jnp.ndarray,
                            bias: jnp.ndarray, mask: Optional[jnp.ndarray],
                            heads: int, mlp_params: dict,
                            norm2: Optional[dict],
                            norm1: Optional[dict] = None,
                            padmask: Optional[np.ndarray] = None, *,
                            window: Tuple[int, int] = (7, 7),
                            shift: Tuple[int, int] = (0, 0),
                            interpret: bool = False) -> jnp.ndarray:
    """Row-resident fused transformer block: x (B, Hp, Wp, C) already padded
    to window multiples -> same-shape output in the ROLLED frame (callers
    apply jnp.roll(+sh, +sw) once for shifted blocks; unshifted blocks come
    back in the plain frame). Replaces the pad/roll/partition ...
    merge/unroll XLA geometry around fused_window_block.

    mask: raw (nW, N, N) shift mask or None; padmask: (nW, N) validity or
    None — both in the window order of the ROLLED grid (same arrays the
    per-window-tile path uses)."""
    b, hp, wp, c = x.shape
    wh, ww = window
    sh, sw = shift
    assert hp % wh == 0 and wp % ww == 0, (hp, wp, window)
    nwh, nww = hp // wh, wp // ww
    n = wh * ww
    twn = nww * n

    bsub = _pick_bsub(b, c, twn, budget=262144, itemsize=x.dtype.itemsize)

    # mask / padmask: numpy constants on the single-device path, TRACED
    # per-device slabs on the band-owned shard_map path (r5) — the latter
    # cannot be value-inspected, so validity is assumed when traced.
    if mask is None:
        mask_r = jnp.zeros((nwh, nww, n, n), jnp.bfloat16)
    elif isinstance(mask, np.ndarray):
        mask_r = jnp.asarray(
            np.asarray(mask, np.float32).reshape(nwh, nww, n, n),
            jnp.bfloat16)
    else:
        mask_r = mask.astype(jnp.bfloat16).reshape(nwh, nww, n, n)
    if padmask is None:
        use_padmask = False
    elif isinstance(padmask, np.ndarray):
        use_padmask = float(np.min(padmask)) < 1.0
    else:
        use_padmask = True
    if not use_padmask:
        pm3 = jnp.zeros((nwh, twn, 1), jnp.float32)
    elif isinstance(padmask, np.ndarray):
        pm3 = jnp.asarray(np.asarray(padmask, np.float32).reshape(
            nwh, nww * n, 1))
    else:
        pm3 = padmask.astype(jnp.float32).reshape(nwh, nww * n, 1)

    w1, b1, w2, b2, hidden = _mlp_weights(mlp_params, c, x.dtype)
    n2s = (norm2["scale"].reshape(1, c) if norm2 is not None
           else jnp.ones((1, c), x.dtype))
    n2b = (norm2["bias"].reshape(1, c) if norm2 is not None
           else jnp.zeros((1, c), x.dtype))
    n1s = (norm1["scale"].reshape(1, c) if norm1 is not None
           else jnp.ones((1, c), x.dtype))
    n1b = (norm1["bias"].reshape(1, c) if norm1 is not None
           else jnp.zeros((1, c), x.dtype))

    wqkv = jnp.concatenate([_linw(params, "wq"), _linw(params, "wk"),
                            _linw(params, "wv")], axis=1)
    bqkv = jnp.concatenate([_linb(params, "wq", c, x.dtype),
                            _linb(params, "wk", c, x.dtype),
                            _linb(params, "wv", c, x.dtype)], axis=1)

    def row_spec(j):
        def imap(r, i, j=j):
            return (i, (r * wh + j + sh) % hp, 0, 0)
        return pl.BlockSpec((bsub, 1, wp, c), imap,
                            memory_space=pltpu.VMEM)

    wmat = pl.BlockSpec((c, c), lambda r, i: (0, 0), memory_space=pltpu.VMEM)
    wvec = pl.BlockSpec((1, c), lambda r, i: (0, 0), memory_space=pltpu.VMEM)
    w3mat = pl.BlockSpec((c, 3 * c), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM)
    w3vec = pl.BlockSpec((1, 3 * c), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM)
    hmat = pl.BlockSpec((c, hidden), lambda r, i: (0, 0),
                        memory_space=pltpu.VMEM)
    hmat_t = pl.BlockSpec((hidden, c), lambda r, i: (0, 0),
                          memory_space=pltpu.VMEM)
    hvec = pl.BlockSpec((1, hidden), lambda r, i: (0, 0),
                        memory_space=pltpu.VMEM)
    rbias = pl.BlockSpec((heads, n, n), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, nww, n, n), lambda r, i: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    pmspec = pl.BlockSpec((1, twn, 1), lambda r, i: (r, 0, 0),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bsub, wh, wp, c), lambda r, i: (i, r, 0, 0),
                         memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel_block_rows, heads=heads,
                             scale=(c // heads) ** -0.5,
                             use_norm1=norm1 is not None,
                             use_padmask=use_padmask,
                             use_norm2=norm2 is not None,
                             bsub=bsub, wh=wh, ww=ww, sw=sw)
    return pl.pallas_call(
        kern,
        grid=(nwh, b // bsub),
        in_specs=[row_spec(j) for j in range(wh)] + [
            w3mat, w3vec, wmat, wvec,
            rbias, mspec,
            wvec, wvec, pmspec,
            wvec, wvec, hmat, hvec, hmat_t, wvec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        interpret=interpret,
    )(*([x] * wh),
      wqkv, bqkv,
      _linw(params, "proj"), _linb(params, "proj", c, x.dtype),
      bias, mask_r,
      n1s, n1b, pm3,
      n2s, n2b, w1, b1, w2, b2)


def fused_window_block(params: dict, x: jnp.ndarray,
                       bias: jnp.ndarray, mask: Optional[jnp.ndarray],
                       heads: int, mlp_params: dict,
                       norm2: Optional[dict],
                       norm1: Optional[dict] = None,
                       padmask: Optional[np.ndarray] = None, *,
                       target_rows: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """Self-attention transformer block fused into one kernel.

    x: (B, nW, N, C) window-partitioned raw input. norm1 (scale/bias dict or
    None for norm-free blocks) is applied IN-KERNEL; padmask ((nW, N) static
    0/1 validity mask from ops/windows.valid_token_mask, or None when every
    token is valid) zeroes padding tokens' norm1 view so they enter the
    projections as exact zeros. Returns x + attn(LN1(x)) + mlp(LN2(.)) in
    the same layout."""
    b, nw, n, c = x.shape
    (tw, nw_pad, nt, twn, (x5,), mask_pw, pm4, bsub,
     win5, wmat, wvec, rbias, mspec, pmspec, use_pm) = _pw_wiring(
        b, nw, n, c, heads, [x], mask, padmask, target_rows, budget=262144)

    w1, b1, w2, b2, hidden = _mlp_weights(mlp_params, c, x.dtype)
    if norm2 is not None:
        n2s = norm2["scale"].reshape(1, c)
        n2b = norm2["bias"].reshape(1, c)
    else:
        n2s = jnp.ones((1, c), x.dtype)
        n2b = jnp.zeros((1, c), x.dtype)
    if norm1 is not None:
        n1s = norm1["scale"].reshape(1, c)
        n1b = norm1["bias"].reshape(1, c)
    else:
        n1s = jnp.ones((1, c), x.dtype)
        n1b = jnp.zeros((1, c), x.dtype)

    # one (C, 3C) projection matrix: the three QKV GEMMs become one
    wqkv = jnp.concatenate([_linw(params, "wq"), _linw(params, "wk"),
                            _linw(params, "wv")], axis=1)
    bqkv = jnp.concatenate([_linb(params, "wq", c, x.dtype),
                            _linb(params, "wk", c, x.dtype),
                            _linb(params, "wv", c, x.dtype)], axis=1)

    w3mat = pl.BlockSpec((c, 3 * c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
    w3vec = pl.BlockSpec((1, 3 * c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
    hmat = pl.BlockSpec((c, hidden), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    hmat_t = pl.BlockSpec((hidden, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    hvec = pl.BlockSpec((1, hidden), lambda j, i: (0, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel_block_pw, heads=heads,
                             scale=(c // heads) ** -0.5,
                             use_norm1=norm1 is not None,
                             use_padmask=use_pm,
                             use_norm2=norm2 is not None,
                             bsub=bsub)
    out = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win5,
                  w3mat, w3vec, wmat, wvec,
                  rbias, mspec,
                  wvec, wvec, pmspec,
                  wvec, wvec, hmat, hvec, hmat_t, wvec],
        out_specs=win5,
        out_shape=jax.ShapeDtypeStruct((b, nt, tw, n, c), x.dtype),
        interpret=interpret,
    )(x5,
      wqkv, bqkv,
      _linw(params, "proj"), _linb(params, "proj", c, x.dtype),
      bias, mask_pw,
      n1s, n1b, pm4,
      n2s, n2b, w1, b1, w2, b2)
    return out.reshape(b, nw_pad, n, c)[:, :nw]


# ---------------------------------------------------------------------------
# Iteration-fusion kernels (round 3): one program per style-transformer
# encoder Scale/Shift step and one per decoder tail, eliminating the
# per-op HBM round trips between the 2-V attention and its surrounding
# LN / projection / modulation / MLP ops
# (reference hot loops: codes/style_transformer.py:855-882, 1045-1125).
# ---------------------------------------------------------------------------

def _ln_rows(x, s_ref, b_ref, eps=1e-5):
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * s_ref[0].astype(f32) + b_ref[0].astype(f32)).astype(x.dtype)


def _mlp_rows(x, w1_ref, b1_ref, w2_ref, b2_ref):
    """x + fc2(gelu(fc1(x))) on (rows, C); A-S erf (no Mosaic erf lowering)."""
    from mastermetastyletransfer_tpu.ops.pallas_mlp import _erf
    f32 = jnp.float32
    dt = x.dtype
    if _hid_lowp(dt):
        h = (kdot(x, w1_ref[:].astype(dt)) + b1_ref[0].astype(f32)).astype(dt)
        h = _gelu_lowp(h)
        h = kdot(h.astype(dt), w2_ref[:].astype(dt)) + b2_ref[0].astype(f32)
        return x.astype(f32) + h
    h = kdot(x, w1_ref[:].astype(dt)) + b1_ref[0].astype(f32)
    h = 0.5 * h * (1.0 + _erf(h * (0.5 ** 0.5)))
    h = kdot(h.astype(dt), w2_ref[:].astype(dt)) + b2_ref[0].astype(f32)
    return x.astype(f32) + h


def _dual_core_pw(q3, k3, vs3, vh3, bias_ref, mask_ref, heads, bsub):
    """Per-window batched dual-value attention core: ONE softmax(QK^T+bias+
    mask), two value streams. q3 pre-scaled. Returns (rows, C) f32 pair."""
    f32 = jnp.float32
    dt = q3.dtype
    nb, n, c = q3.shape
    dh = c // heads
    m = mask_ref[0].astype(f32)
    mt = jnp.concatenate([m] * bsub, axis=0) if bsub > 1 else m
    os_h, oh_h = [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = kdot(q3[..., sl], k3[..., sl],
                 (((2,), (2,)), ((0,), (0,))))
        s = s + mt + bias_ref[h].astype(f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        ebf = e.astype(dt)
        o1 = kdot(ebf, vs3[..., sl],
                  (((2,), (1,)), ((0,), (0,))))
        o2 = kdot(ebf, vh3[..., sl],
                  (((2,), (1,)), ((0,), (0,))))
        os_h.append((o1 * recip).astype(dt))
        oh_h.append((o2 * recip).astype(dt))
    rows = nb * n
    return (jnp.concatenate(os_h, axis=-1).reshape(rows, c),
            jnp.concatenate(oh_h, axis=-1).reshape(rows, c))


def _kernel_enc_ss(key_ref, scale_ref, shift_ref,
                   wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                   wp_ref, bp_ref, bias_ref, mask_ref,
                   n1s_ref, n1b_ref, pm_ref,
                   s1w_ref, s1b_ref, s2w_ref, s2b_ref,
                   h1w_ref, h1b_ref, h2w_ref, h2b_ref,
                   out_s_ref, out_h_ref, *, heads: int, scale: float,
                   use_norm: bool, use_padmask: bool, bsub: int):
    """Encoder Scale & Shift step in ONE program (reference
    codes/style_transformer.py:867-882): qk = zp(ln(Key)); two-V attention
    with SHARED softmax (v = zp(ln(Scale)), zp(ln(Shift)) through the shared
    wv); residuals onto raw Scale/Shift; each result through its own
    norm-free MLP residual."""
    dt = key_ref.dtype
    f32 = jnp.float32
    _, _, tw, n, c = key_ref.shape
    rows = bsub * tw * n
    nb = bsub * tw

    if use_padmask:
        pm = pm_ref[0].reshape(tw * n, 1).astype(dt)
        if bsub > 1:
            pm = jnp.concatenate([pm] * bsub, axis=0)

    def prep(ref):
        raw = ref[:, 0].reshape(rows, c)
        ln = _ln_rows(raw, n1s_ref, n1b_ref) if use_norm else raw
        if use_padmask:
            ln = ln * pm
        return raw, ln

    _, qk = prep(key_ref)
    scale_raw, v1 = prep(scale_ref)
    shift_raw, v2 = prep(shift_ref)

    def proj(x, w_ref, b_ref):
        y = kdot(x, w_ref[:].astype(dt),
                    preferred_element_type=f32) + b_ref[0].astype(f32)
        return y.astype(dt).reshape(nb, n, c)

    q3 = proj(qk, wq_ref, bq_ref) * scale
    k3 = proj(qk, wk_ref, bk_ref)
    vs3 = proj(v1, wv_ref, bv_ref)
    vh3 = proj(v2, wv_ref, bv_ref)

    a1, a2 = _dual_core_pw(q3, k3, vs3, vh3, bias_ref, mask_ref, heads, bsub)
    bp = bp_ref[0].astype(f32)
    wp = wp_ref[:].astype(dt)
    s1 = (scale_raw.astype(f32)
          + kdot(a1.astype(dt), wp) + bp)
    h1 = (shift_raw.astype(f32)
          + kdot(a2.astype(dt), wp) + bp)

    out_s = _mlp_rows(s1.astype(dt), s1w_ref, s1b_ref, s2w_ref, s2b_ref)
    out_h = _mlp_rows(h1.astype(dt), h1w_ref, h1b_ref, h2w_ref, h2b_ref)
    out_s_ref[:, 0] = out_s.reshape(bsub, tw, n, c).astype(out_s_ref.dtype)
    out_h_ref[:, 0] = out_h.reshape(bsub, tw, n, c).astype(out_h_ref.dtype)


def _pw_wiring(b, nw, n, c, heads, x_list, mask, padmask, target_rows,
               budget):
    """Shared per-window-core wiring: pad + 5D-tile the inputs, build the
    raw per-tile mask and padmask blocks, pick bsub, return specs.

    NOT batch-adaptive: growing the tile at small batches (tw 41 at b=1,
    filling the same VMEM row budget BSUB fills at b=8) was A/B'd on the
    real chip in r3 and made batch-1 latency WORSE (p50 33.7 -> 41-50 ms;
    throughput at b=8 unaffected) — 9 giant grid steps lose the
    compute/copy overlap that 74 small steps pipeline. Keep tw fixed."""
    tw, nw_pad, nt, twn = _geometry(nw, n, target_rows)
    x5 = [_pad_windows(x, nw_pad).reshape(b, nt, tw, n, c) for x in x_list]
    # mask / padmask are numpy constants on the single-device path; the
    # band-owned shard_map path (parallel/spatial_shmap.py) passes TRACED
    # per-device slabs instead (r5) — same shapes, no value inspection.
    if mask is None:
        mask_pw = jnp.zeros((nt, tw, n, n), jnp.bfloat16)
    elif isinstance(mask, np.ndarray):
        mask_pw = np.zeros((nw_pad, n, n), np.float32)
        mask_pw[:nw] = np.asarray(mask, np.float32)
        mask_pw = jnp.asarray(mask_pw.reshape(nt, tw, n, n), jnp.bfloat16)
    else:
        m = mask.astype(jnp.bfloat16)
        if nw_pad > nw:
            m = jnp.pad(m, ((0, nw_pad - nw), (0, 0), (0, 0)))
        mask_pw = m.reshape(nt, tw, n, n)
    if (padmask is not None and isinstance(padmask, np.ndarray)
            and padmask.min() >= 1.0):
        padmask = None
    use_pm = padmask is not None
    if padmask is None:
        pm4 = jnp.zeros((nt, twn, 1), jnp.float32)
    elif isinstance(padmask, np.ndarray):
        pm = np.zeros((nw_pad, n), np.float32)
        pm[:nw] = np.asarray(padmask, np.float32)
        pm4 = jnp.asarray(pm.reshape(nt, twn, 1))
    else:
        pm = padmask.astype(jnp.float32)
        if nw_pad > nw:
            pm = jnp.pad(pm, ((0, nw_pad - nw), (0, 0)))
        pm4 = pm.reshape(nt, twn, 1)
    bsub = _pick_bsub(b, c, twn, budget=budget,
                      itemsize=x_list[0].dtype.itemsize)
    win5 = pl.BlockSpec((bsub, 1, tw, n, c), lambda j, i: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    wmat = pl.BlockSpec((c, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    wvec = pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    rbias = pl.BlockSpec((heads, n, n), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, tw, n, n), lambda j, i: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    pmspec = pl.BlockSpec((1, twn, 1), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    return (tw, nw_pad, nt, twn, x5, mask_pw, pm4, bsub,
            win5, wmat, wvec, rbias, mspec, pmspec, use_pm)


def _mlp_weights(mlp_params, c, dtype):
    w1 = mlp_params["fc1"]["kernel"]
    hidden = w1.shape[1]
    b1 = mlp_params["fc1"].get("bias")
    w2 = mlp_params["fc2"]["kernel"]
    b2 = mlp_params["fc2"].get("bias")
    b1 = jnp.zeros((1, hidden), dtype) if b1 is None else b1.reshape(1, hidden)
    b2 = jnp.zeros((1, c), dtype) if b2 is None else b2.reshape(1, c)
    return w1, b1, w2, b2, hidden


def fused_encoder_scale_shift(params: dict, Key: jnp.ndarray,
                              Scale: jnp.ndarray, Shift: jnp.ndarray,
                              bias: jnp.ndarray, mask: Optional[np.ndarray],
                              heads: int, mlp_scale: dict, mlp_shift: dict,
                              norm1: Optional[dict],
                              padmask: Optional[np.ndarray] = None, *,
                              target_rows: int = 256,
                              interpret: bool = False):
    """One kernel for the encoder's Scale+Shift update. Inputs (B, nW, N, C)
    window tensors; returns (Scale', Shift') in the same layout."""
    b, nw, n, c = Key.shape
    (tw, nw_pad, nt, twn, (k5, s5, h5), mask_pw, pm4, bsub,
     win5, wmat, wvec, rbias, mspec, pmspec, use_pm) = _pw_wiring(
        b, nw, n, c, heads, [Key, Scale, Shift], mask, padmask,
        target_rows, budget=131072)

    if norm1 is not None:
        n1s = norm1["scale"].reshape(1, c)
        n1b = norm1["bias"].reshape(1, c)
    else:
        n1s = jnp.ones((1, c), Key.dtype)
        n1b = jnp.zeros((1, c), Key.dtype)

    s1w, s1b, s2w, s2b, hidden = _mlp_weights(mlp_scale, c, Key.dtype)
    h1w, h1b, h2w, h2b, _ = _mlp_weights(mlp_shift, c, Key.dtype)
    hmat = pl.BlockSpec((c, hidden), lambda j, i: (0, 0),
                        memory_space=pltpu.VMEM)
    hmat_t = pl.BlockSpec((hidden, c), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    hvec = pl.BlockSpec((1, hidden), lambda j, i: (0, 0),
                        memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel_enc_ss, heads=heads,
                             scale=(c // heads) ** -0.5,
                             use_norm=norm1 is not None,
                             use_padmask=use_pm,
                             bsub=bsub)
    out_shape = jax.ShapeDtypeStruct((b, nt, tw, n, c), Key.dtype)
    out_s, out_h = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win5, win5, win5,
                  wmat, wvec, wmat, wvec, wmat, wvec, wmat, wvec,
                  rbias, mspec,
                  wvec, wvec, pmspec,
                  hmat, hvec, hmat_t, wvec,
                  hmat, hvec, hmat_t, wvec],
        out_specs=(win5, win5),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(k5, s5, h5,
      _linw(params, "wq"), _linb(params, "wq", c, Key.dtype),
      _linw(params, "wk"), _linb(params, "wk", c, Key.dtype),
      _linw(params, "wv"), _linb(params, "wv", c, Key.dtype),
      _linw(params, "proj"), _linb(params, "proj", c, Key.dtype),
      bias, mask_pw,
      n1s, n1b, pm4,
      s1w, s1b, s2w, s2b,
      h1w, h1b, h2w, h2b)
    rs = out_s.reshape(b, nw_pad, n, c)[:, :nw]
    rh = out_h.reshape(b, nw_pad, n, c)[:, :nw]
    return rs, rh


def _kernel_dec_tail(q_ref, k_ref, vs_ref, vh_ref, query_ref,
                     wvs_ref, bvs_ref, wvh_ref, bvh_ref, wp_ref, bp_ref,
                     bias_ref, mask_ref, pm_ref,
                     m1w_ref, m1b_ref, m2w_ref, m2b_ref,
                     out_ref, *, heads: int, scale: float,
                     use_padmask: bool, bsub: int):
    """Decoder tail in ONE program (reference codes/style_transformer.py:
    1059-1125): dual-value attention (q/k arrive prepared — IN'd/projected
    outside where global statistics are needed), sigma/mu modulation
    Query*sigma + mu, then the norm-free last-MLP residual."""
    dt = q_ref.dtype
    f32 = jnp.float32
    _, _, tw, n, c = q_ref.shape
    rows = bsub * tw * n
    nb = bsub * tw

    if use_padmask:
        pm = pm_ref[0].reshape(tw * n, 1).astype(dt)
        if bsub > 1:
            pm = jnp.concatenate([pm] * bsub, axis=0)

    def rowsof(ref, zp):
        x = ref[:, 0].reshape(rows, c)
        return x * pm if (zp and use_padmask) else x

    q3 = (rowsof(q_ref, False) * scale).reshape(nb, n, c)
    k3 = rowsof(k_ref, False).reshape(nb, n, c)

    def proj(x, w_ref, b_ref):
        y = kdot(x, w_ref[:].astype(dt),
                    preferred_element_type=f32) + b_ref[0].astype(f32)
        return y.astype(dt).reshape(nb, n, c)

    vs3 = proj(rowsof(vs_ref, True), wvs_ref, bvs_ref)
    vh3 = proj(rowsof(vh_ref, True), wvh_ref, bvh_ref)

    a1, a2 = _dual_core_pw(q3, k3, vs3, vh3, bias_ref, mask_ref, heads, bsub)
    bp = bp_ref[0].astype(f32)
    wp = wp_ref[:].astype(dt)
    sigma = kdot(a1.astype(dt), wp) + bp
    mu = kdot(a2.astype(dt), wp) + bp
    query = query_ref[:, 0].reshape(rows, c).astype(f32)
    y = query * sigma + mu
    out = _mlp_rows(y.astype(dt), m1w_ref, m1b_ref, m2w_ref, m2b_ref)
    out_ref[:, 0] = out.reshape(bsub, tw, n, c).astype(out_ref.dtype)


def fused_decoder_tail(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                       v_scale: jnp.ndarray, v_shift: jnp.ndarray,
                       query: jnp.ndarray, bias: jnp.ndarray,
                       mask: Optional[np.ndarray], heads: int,
                       last_mlp: dict,
                       padmask: Optional[np.ndarray] = None, *,
                       target_rows: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """Dual attention + sigma/mu modulation + last-MLP residual in one
    kernel. q/k arrive prepared (IN'd / projected); v streams are raw
    (zero-padded + projected in-kernel via wv_scale/wv_shift)."""
    b, nw, n, c = q.shape
    (tw, nw_pad, nt, twn, (q5, k5, vs5, vh5, qr5), mask_pw, pm4, bsub,
     win5, wmat, wvec, rbias, mspec, pmspec, use_pm) = _pw_wiring(
        b, nw, n, c, heads, [q, k, v_scale, v_shift, query], mask, padmask,
        target_rows, budget=98304)

    m1w, m1b, m2w, m2b, hidden = _mlp_weights(last_mlp, c, q.dtype)
    hmat = pl.BlockSpec((c, hidden), lambda j, i: (0, 0),
                        memory_space=pltpu.VMEM)
    hmat_t = pl.BlockSpec((hidden, c), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    hvec = pl.BlockSpec((1, hidden), lambda j, i: (0, 0),
                        memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel_dec_tail, heads=heads,
                             scale=(c // heads) ** -0.5,
                             use_padmask=use_pm,
                             bsub=bsub)
    out = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win5, win5, win5, win5, win5,
                  wmat, wvec, wmat, wvec, wmat, wvec,
                  rbias, mspec, pmspec,
                  hmat, hvec, hmat_t, wvec],
        out_specs=win5,
        out_shape=jax.ShapeDtypeStruct((b, nt, tw, n, c), q.dtype),
        interpret=interpret,
    )(q5, k5, vs5, vh5, qr5,
      _linw(params, "wv_scale"), _linb(params, "wv_scale", c, q.dtype),
      _linw(params, "wv_shift"), _linb(params, "wv_shift", c, q.dtype),
      _linw(params, "proj"), _linb(params, "proj", c, q.dtype),
      bias, mask_pw, pm4,
      m1w, m1b, m2w, m2b)
    return out.reshape(b, nw_pad, n, c)[:, :nw]
