"""Fused Pallas TPU kernel for shifted-window attention.

Fuses Q/K/V projections + relative-position bias + shift mask + softmax +
value matmul (one or two value streams) + output projection in one
VMEM-resident pass (the BASELINE.json north-star kernel). The XLA op chain
(ops/attention.py) is the always-correct reference; this kernel is parity-
tested against it (tests/test_pallas.py) and enabled via
AttentionConfig.use_pallas.

Design (constraints from /opt/skills/guides/pallas_guide.md and Mosaic):
  * Mosaic rejects vector reshapes that split the lane (channel) dimension
    and matmuls with >1 batch dim, so the kernel is strictly 2D:
    every tensor a program touches is (rows, lanes).
  * Grid = (B, nT, H): program (i, j, h) handles head h of window-tile j
    (TW windows, TWN = TW*N rows) of image i. Per-head weight slices
    (C, dh) are cut by BlockSpec index maps — no in-kernel lane slicing.
  * Attention logits for the whole tile run as ONE (TWN, C_h) x (C_h, TWN)
    matmul -> (TWN, TWN): MXU-shaped (196x196 for window 7, TW=4) instead of
    TW separate 49x49 dribbles. Cross-window pairs are killed by a
    precomputed additive mask (-1e9), which simultaneously carries the
    shifted-phase region mask; the relative-position bias is expanded to
    block-diagonal form once per call (outside the kernel, tiny einsum).
  * The output projection accumulates across the head grid dimension into a
    revisited output block: out += P_h V_h W_p[h] (init at h == 0), so heads
    never need concatenation.
  * Logits/softmax accumulate in fp32 regardless of input dtype.

Reference semantics: codes/style_transformer.py:37-169 (single V) and
:414-611 (dual V: one softmax, two value streams, shared output projection).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _pick_tile(n_windows: int, n_tokens: int, target_rows: int = 256) -> int:
    """Tile size with rows <= target_rows; the window axis is padded up to a
    multiple of the tile (padded windows are dead weight but keep every
    matmul MXU-shaped — at 512^2 stage-1 nW=361=19^2 whose only small
    divisor is 1, which would collapse the kernel to 49-row dribbles)."""
    t = max(1, target_rows // n_tokens)
    # prefer an exact divisor within 25% of the target to avoid padding
    for d in range(t, max(t - t // 4, 1) - 1, -1):
        if n_windows % d == 0:
            return d
    return t


def _pad_windows(x: jnp.ndarray, nw_pad: int) -> jnp.ndarray:
    b, nw, n, c = x.shape
    if nw_pad == nw:
        return x
    return jnp.pad(x, ((0, 0), (0, nw_pad - nw), (0, 0), (0, 0)))


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
    key = None
    if mask is not None:
        key = tuple(np.asarray(mask, np.float32).ravel().tolist())
    return jnp.asarray(_static_mask_big(key, nt, tw, n, nw))


def _kernel(q_ref, k_ref, v_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
            bv_ref, wp_ref, bp_ref, bias_ref, mask_ref, out_ref, *,
            scale: float, n_heads: int):
    """Program (i, j, h): full fused attention for one head of one tile."""
    f32 = jnp.float32
    h = pl.program_id(2)
    x_q = q_ref[0, 0]                      # (TWN, C)
    x_k = k_ref[0, 0]
    x_v = v_ref[0, 0]

    q = jnp.dot(x_q, wq_ref[0], preferred_element_type=f32) + bq_ref[0].astype(f32)
    k = jnp.dot(x_k, wk_ref[0], preferred_element_type=f32) + bk_ref[0].astype(f32)
    v = jnp.dot(x_v, wv_ref[0], preferred_element_type=f32) + bv_ref[0].astype(f32)

    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)       # (TWN, TWN)
    s = s + bias_ref[0].astype(f32) + mask_ref[0].astype(f32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o = jnp.dot(p.astype(x_v.dtype), v.astype(x_v.dtype),
                preferred_element_type=f32)                   # (TWN, dh)
    contrib = jnp.dot(o.astype(x_v.dtype), wp_ref[0],
                      preferred_element_type=f32)             # (TWN, C)

    @pl.when(h == 0)
    def _():
        out_ref[0, 0] = (contrib + bp_ref[0].astype(f32)).astype(out_ref.dtype)

    @pl.when(h > 0)
    def _():
        out_ref[0, 0] = (out_ref[0, 0].astype(f32) + contrib).astype(out_ref.dtype)


def _kernel_dual(q_ref, k_ref, vs_ref, vh_ref, ws_ref, bs_ref, wsh_ref,
                 bsh_ref, wp_ref, bp_ref, bias_ref, mask_ref,
                 sigma_ref, mu_ref, *, scale: float, n_heads: int):
    """Dual-value program: q and k arrive PRE-projected (the reference's q
    has no linear when use_q_proj=False, and K's optional instance norm uses
    whole-grid statistics — a cross-window reduce that lives outside the
    tile; codes/style_transformer.py:468, :520-530). One softmax feeds two
    value streams through the SHARED output projection."""
    f32 = jnp.float32
    h = pl.program_id(2)
    q = q_ref[0, 0, 0].astype(f32)         # (TWN, dh) — head-split outside
    k = k_ref[0, 0, 0].astype(f32)
    x_vs = vs_ref[0, 0]                    # (TWN, C)
    x_vh = vh_ref[0, 0]

    v_s = jnp.dot(x_vs, ws_ref[0], preferred_element_type=f32) + bs_ref[0].astype(f32)
    v_h = jnp.dot(x_vh, wsh_ref[0], preferred_element_type=f32) + bsh_ref[0].astype(f32)

    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32)
    s = s + bias_ref[0].astype(f32) + mask_ref[0].astype(f32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x_vs.dtype)

    o_s = jnp.dot(p, v_s.astype(x_vs.dtype), preferred_element_type=f32)
    o_h = jnp.dot(p, v_h.astype(x_vs.dtype), preferred_element_type=f32)
    c_s = jnp.dot(o_s.astype(x_vs.dtype), wp_ref[0], preferred_element_type=f32)
    c_h = jnp.dot(o_h.astype(x_vs.dtype), wp_ref[0], preferred_element_type=f32)

    @pl.when(h == 0)
    def _():
        bp = bp_ref[0].astype(f32)
        sigma_ref[0, 0] = (c_s + bp).astype(sigma_ref.dtype)
        mu_ref[0, 0] = (c_h + bp).astype(mu_ref.dtype)

    @pl.when(h > 0)
    def _():
        sigma_ref[0, 0] = (sigma_ref[0, 0].astype(f32) + c_s).astype(sigma_ref.dtype)
        mu_ref[0, 0] = (mu_ref[0, 0].astype(f32) + c_h).astype(mu_ref.dtype)


def _w_heads(p: dict, name: str, heads: int) -> jnp.ndarray:
    """(C, C) weight -> head-major (H, C, dh): Pallas blocks must span full
    array dims (or be 8/128-aligned), so per-head slicing happens here via an
    XLA reshape instead of a narrow BlockSpec lane slice."""
    w = p[name]["kernel"]
    c = w.shape[0]
    return w.reshape(c, heads, c // heads).transpose(1, 0, 2)


def _b_heads(p: dict, name: str, heads: int, c: int, dtype) -> jnp.ndarray:
    """Bias -> head-major (H, 1, dh)."""
    b = p[name].get("bias")
    if b is None:
        return jnp.zeros((heads, 1, c // heads), dtype)
    return b.reshape(heads, 1, c // heads)


def _wp_heads(p: dict, name: str, heads: int) -> jnp.ndarray:
    """Output projection (C, C) -> (H, dh, C): row block h of W_p."""
    w = p[name]["kernel"]
    c = w.shape[0]
    return w.reshape(heads, c // heads, c)


def _bp_row(p: dict, name: str, c: int, dtype) -> jnp.ndarray:
    b = p[name].get("bias")
    return jnp.zeros((1, c), dtype) if b is None else b.reshape(1, c)


def _tiles(x: jnp.ndarray, nt: int) -> jnp.ndarray:
    """(B, nW, N, C) -> (B, nT, TWN, C)."""
    b, nw, n, c = x.shape
    return x.reshape(b, nt, (nw // nt) * n, c)


def _untile(x: jnp.ndarray, nw: int, n: int) -> jnp.ndarray:
    """(B, nT, TWN, C) -> (B, nW, N, C), dropping padded windows."""
    b, nt, twn, c = x.shape
    return x.reshape(b, (nt * twn) // n, n, c)[:, :nw]


def _specs(b, nt, twn, c, dh, heads):
    full = pl.BlockSpec((1, 1, twn, c), lambda i, j, h: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    # pre-head-split (B, nT, H, TWN, dh) tensors: block spans full TWN x dh
    head_sliced = pl.BlockSpec((1, 1, 1, twn, dh),
                               lambda i, j, h: (i, j, h, 0, 0),
                               memory_space=pltpu.VMEM)
    # head-major weights (H, C, dh) / biases (H, 1, dh) / proj rows (H, dh, C)
    w_head = pl.BlockSpec((1, c, dh), lambda i, j, h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    b_head = pl.BlockSpec((1, 1, dh), lambda i, j, h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    wp_head = pl.BlockSpec((1, dh, c), lambda i, j, h: (h, 0, 0),
                           memory_space=pltpu.VMEM)
    b_full = pl.BlockSpec((1, c), lambda i, j, h: (0, 0),
                          memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, twn, twn), lambda i, j, h: (h, 0, 0),
                        memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, twn, twn), lambda i, j, h: (j, 0, 0),
                        memory_space=pltpu.VMEM)
    return full, head_sliced, w_head, b_head, wp_head, b_full, bias, mask


def fused_window_attention(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, bias: jnp.ndarray,
                           mask: Optional[jnp.ndarray], heads: int, *,
                           target_rows: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (B, nW, N, C) window-partitioned inputs. bias: (heads, N, N).
    mask: (nW, N, N) shift mask or None. Returns (B, nW, N, C)."""
    b, nw, n, c = q.shape
    dh = c // heads
    tw = _pick_tile(nw, n, target_rows)
    nw_pad = ((nw + tw - 1) // tw) * tw
    nt = nw_pad // tw
    twn = tw * n

    q4, k4, v4 = (_tiles(_pad_windows(x, nw_pad), nt) for x in (q, k, v))
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    full, _, w_head, b_head, wp_head, b_full, bias_s, mask_s = _specs(
        b, nt, twn, c, dh, heads)
    kern = functools.partial(_kernel, scale=dh ** -0.5, n_heads=heads)
    out = pl.pallas_call(
        kern,
        grid=(b, nt, heads),
        in_specs=[full, full, full,
                  w_head, b_head, w_head, b_head, w_head, b_head,
                  wp_head, b_full, bias_s, mask_s],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype),
        interpret=interpret,
    )(q4, k4, v4,
      _w_heads(params, "wq", heads), _b_heads(params, "wq", heads, c, q.dtype),
      _w_heads(params, "wk", heads), _b_heads(params, "wk", heads, c, q.dtype),
      _w_heads(params, "wv", heads), _b_heads(params, "wv", heads, c, q.dtype),
      _wp_heads(params, "proj", heads), _bp_row(params, "proj", c, q.dtype),
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
    dh = c // heads
    tw = _pick_tile(nw, n, target_rows)
    nw_pad = ((nw + tw - 1) // tw) * tw
    nt = nw_pad // tw
    twn = tw * n

    def head_split(x):
        t = _tiles(_pad_windows(x, nw_pad), nt)   # (B, nT, TWN, C)
        t = t.reshape(b, nt, twn, heads, dh)
        return t.transpose(0, 1, 3, 2, 4)   # (B, nT, H, TWN, dh)

    q4, k4 = head_split(q), head_split(k)
    vs4 = _tiles(_pad_windows(v_scale, nw_pad), nt)
    vh4 = _tiles(_pad_windows(v_shift, nw_pad), nt)
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    full, head_sliced, w_head, b_head, wp_head, b_full, bias_s, mask_s = _specs(
        b, nt, twn, c, dh, heads)
    kern = functools.partial(_kernel_dual, scale=dh ** -0.5, n_heads=heads)
    out_shape = jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype)
    sigma, mu = pl.pallas_call(
        kern,
        grid=(b, nt, heads),
        in_specs=[head_sliced, head_sliced, full, full,
                  w_head, b_head, w_head, b_head,
                  wp_head, b_full, bias_s, mask_s],
        out_specs=(full, full),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(q4, k4, vs4, vh4,
      _w_heads(params, "wv_scale", heads), _b_heads(params, "wv_scale", heads, c, q.dtype),
      _w_heads(params, "wv_shift", heads), _b_heads(params, "wv_shift", heads, c, q.dtype),
      _wp_heads(params, "proj", heads), _bp_row(params, "proj", c, q.dtype),
      bias_b, mask_b)
    return _untile(sigma, nw, n), _untile(mu, nw, n)
