"""Shifted-window attention ops (XLA path), generalized to separate Q/K/V
inputs (cross attention) and to dual value streams.

These are the hot ops of the framework. Math parity targets:
  - shifted_window_attention: reference codes/style_transformer.py:37-169
    (torchvision W-MSA/SW-MSA generalized to distinct Q/K/V inputs + weights)
  - shifted_window_attention_dual_value: reference
    codes/style_transformer.py:414-611 (one attention map, two value streams
    producing the per-pixel scale sigma and shift mu)

TPU-first design notes:
  * NHWC throughout; window partition is pure reshape/transpose (layout changes
    XLA folds into the surrounding ops).
  * Shift masks and relative-position indices are numpy constants computed from
    static shapes (ops/windows.py) — nothing data-dependent under jit.
  * softmax and attention logits accumulate in float32 even under bfloat16
    compute (preferred_element_type); the MXU handles the (B*nW, N, C) batched
    matmuls.
  * A fused Pallas kernel (ops/pallas_attention.py) replaces this path for the
    production configs; this XLA path is the always-correct reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import AttentionConfig
from mastermetastyletransfer_tpu.ops.mlp import init_linear, linear, trunc_normal
from mastermetastyletransfer_tpu.ops.norm import instance_norm
from mastermetastyletransfer_tpu.ops.windows import (
    effective_shift,
    pad_to_windows,
    relative_position_bias,
    shift_attention_mask,
    window_merge,
    window_partition,
)


def init_window_attention(key, cfg: AttentionConfig) -> dict:
    """Params for the separate-Q/K/V window attention
    (reference module: codes/style_transformer.py:175-239)."""
    kq, kk, kv, kp, kb = jax.random.split(key, 5)
    d = cfg.dim
    return {
        "wq": init_linear(kq, d, d, use_bias=cfg.qkv_bias),
        "wk": init_linear(kk, d, d, use_bias=cfg.qkv_bias),
        "wv": init_linear(kv, d, d, use_bias=cfg.qkv_bias),
        "proj": init_linear(kp, d, d, use_bias=cfg.proj_bias),
        "rel_bias_table": trunc_normal(
            kb, ((2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1), cfg.num_heads)
        ),
    }


def init_dual_value_window_attention(key, cfg: AttentionConfig,
                                     use_q_proj: bool = False) -> dict:
    """Params for the decoder-last dual-value attention
    (reference module: codes/style_transformer.py:616-688)."""
    kq, kk, ks, ksh, kp, kb = jax.random.split(key, 6)
    d = cfg.dim
    p = {
        "wk": init_linear(kk, d, d, use_bias=cfg.qkv_bias),
        "wv_scale": init_linear(ks, d, d, use_bias=cfg.qkv_bias),
        "wv_shift": init_linear(ksh, d, d, use_bias=cfg.qkv_bias),
        "proj": init_linear(kp, d, d, use_bias=cfg.proj_bias),
        "rel_bias_table": trunc_normal(
            kb, ((2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1), cfg.num_heads)
        ),
    }
    if use_q_proj:
        p["wq"] = init_linear(kq, d, d, use_bias=cfg.qkv_bias)
    return p


def _dropout(x, p, deterministic, rng):
    if deterministic or p == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)


def _prepare(imgs: Sequence[jnp.ndarray], window: Tuple[int, int],
             shift: Tuple[int, int]):
    """Shared pad -> effective shift -> roll -> window partition."""
    b, h, w, _ = imgs[0].shape
    wh, ww = window
    padded = [pad_to_windows(x, wh, ww)[0] for x in imgs]
    pad_h, pad_w = padded[0].shape[1], padded[0].shape[2]
    sh, sw = effective_shift(pad_h, pad_w, window, shift)
    if sh or sw:
        padded = [jnp.roll(x, shift=(-sh, -sw), axis=(1, 2)) for x in padded]
    wins = [window_partition(x, wh, ww) for x in padded]
    geom = dict(b=b, h=h, w=w, pad_h=pad_h, pad_w=pad_w, sh=sh, sw=sw)
    return wins, geom


def _finalize(x_win: jnp.ndarray, geom: dict, window: Tuple[int, int]) -> jnp.ndarray:
    """Shared window merge -> un-roll -> un-pad."""
    wh, ww = window
    x = window_merge(x_win, geom["b"], geom["pad_h"], geom["pad_w"], wh, ww)
    if geom["sh"] or geom["sw"]:
        x = jnp.roll(x, shift=(geom["sh"], geom["sw"]), axis=(1, 2))
    return x[:, : geom["h"], : geom["w"], :]


def _attention_weights(q_win, k_win, params, cfg: AttentionConfig, geom,
                       deterministic, rng):
    """softmax(q k^T / sqrt(d) + rel_bias + shift_mask) over window tokens."""
    wh, ww = cfg.window_size
    n = wh * ww
    heads, d_head = cfg.num_heads, cfg.dim // cfg.num_heads
    bn = q_win.shape[0]

    q = q_win.reshape(bn, n, heads, d_head)
    k = k_win.reshape(bn, n, heads, d_head)
    q = q * (d_head ** -0.5)
    attn = jnp.einsum("wnhd,wmhd->whnm", q, k,
                      preferred_element_type=jnp.float32)

    bias = relative_position_bias(params["rel_bias_table"], wh, ww)
    attn = attn + bias[None].astype(attn.dtype)

    if geom["sh"] or geom["sw"]:
        mask = jnp.asarray(shift_attention_mask(
            geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"]))
        nw = mask.shape[0]
        attn = attn.reshape(geom["b"], nw, heads, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bn, heads, n, n)

    attn = jax.nn.softmax(attn, axis=-1)
    attn = _dropout(attn, cfg.attention_dropout, deterministic, rng)
    return attn


def _apply_values(attn, v_win, proj_params, cfg: AttentionConfig):
    wh, ww = cfg.window_size
    n = wh * ww
    heads, d_head = cfg.num_heads, cfg.dim // cfg.num_heads
    bn = v_win.shape[0]
    v = v_win.reshape(bn, n, heads, d_head)
    x = jnp.einsum("whnm,wmhd->wnhd", attn.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    x = x.reshape(bn, n, cfg.dim).astype(v_win.dtype)
    return linear(proj_params, x)


def _pallas_dim_ok(dim: int) -> bool:
    """Mosaic requires 128-aligned lane counts for the kernels' sublane
    merge/split reshapes ("unsupported shape cast" at C=96 on real
    hardware — swin_T/S embed dims fall back to XLA; swin_B's 128/256 and
    the style transformer's 256 run fused)."""
    return dim % 128 == 0


def _pallas_ok(cfg: AttentionConfig, deterministic: bool) -> bool:
    """The single-V and dual/two-V fused attentions have custom VJPs
    (ops/pallas_attention_vjp.window_attention / window_attention_dual) so
    they serve training too when attention dropout is off (the reference
    default); only the whole-block / iteration-fusion kernels are
    eval-only (gated by _pallas_eval_ok)."""
    return cfg.use_pallas and _pallas_dim_ok(cfg.dim) and (
        deterministic or (cfg.dropout == 0.0 and cfg.attention_dropout == 0.0))


def _pallas_eval_ok(cfg: AttentionConfig, deterministic: bool) -> bool:
    """Eval-only fused paths (no VJP rule)."""
    return cfg.use_pallas and deterministic and _pallas_dim_ok(cfg.dim)


def _rows_resident_on() -> bool:
    """Row-resident whole-block kernel gate (r4): default ON; set
    MMST_ROWS_RESIDENT=0 to A/B the per-window-tile + XLA-geometry path."""
    import os
    return os.environ.get("MMST_ROWS_RESIDENT", "1") != "0"


def _pallas_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _win4(x_win: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B*nW, N, C) window layout -> (B, nW, N, C) kernel layout."""
    bn, n, c = x_win.shape
    return x_win.reshape(b, bn // b, n, c)


def shifted_window_attention(params: dict, q_in: jnp.ndarray, k_in: jnp.ndarray,
                             v_in: jnp.ndarray, cfg: AttentionConfig, *,
                             deterministic: bool = True,
                             rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """W-MSA / SW-MSA with separate Q/K/V inputs and weights.

    Inputs are NHWC (B, H, W, C); output has the same shape. Numerics mirror
    reference codes/style_transformer.py:37-169: pad -> roll -> partition ->
    per-head scaled dot-product with relative-position bias (+ shift mask) ->
    value matmul -> output projection -> merge -> un-roll -> un-pad.

    With cfg.use_pallas the projection+attention+projection pipeline runs in
    the fused Pallas kernel (ops/pallas_attention.py); geometry (pad/roll/
    partition) stays in XLA where it folds into neighboring ops.
    """
    (qw, kw, vw), geom = _prepare([q_in, k_in, v_in], cfg.window_size, cfg.shift_size)

    if _pallas_ok(cfg, deterministic):
        from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
            window_attention,
        )
        wh, ww = cfg.window_size
        bias = relative_position_bias(params["rel_bias_table"], wh, ww)
        mask_key = None
        if geom["sh"] or geom["sw"]:
            # hashable static mask (the kernel folds it into a constant)
            m = shift_attention_mask(
                geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
            mask_key = (m.shape, tuple(m.ravel().tolist()))
        b = geom["b"]
        out4 = window_attention(
            params, _win4(qw, b), _win4(kw, b), _win4(vw, b),
            bias, mask_key, cfg.num_heads)
        x = out4.reshape(-1, out4.shape[2], out4.shape[3])
        return _finalize(x, geom, cfg.window_size)
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    q = linear(params["wq"], qw)
    k = linear(params["wk"], kw)
    v = linear(params["wv"], vw)
    attn = _attention_weights(q, k, params, cfg, geom, deterministic, r1)
    x = _apply_values(attn, v, params["proj"], cfg)
    x = _dropout(x, cfg.dropout, deterministic, r2)
    return _finalize(x, geom, cfg.window_size)


def fused_self_attention_block(block_params: dict, x_in: jnp.ndarray,
                               cfg: AttentionConfig, *,
                               use_norm: bool,
                               valid_hw: Optional[Tuple[int, int]] = None
                               ) -> jnp.ndarray:
    """Whole self-attention transformer block (norm1 -> attn -> +res ->
    [norm2 ->] MLP -> +res) in ONE Pallas kernel — norm1 included (the
    kernel zeroes padding tokens' norm1 view via a static validity mask, so
    only the raw input rides the pad/roll/partition geometry).
    Pallas eval path only; callers fall back to the composed ops otherwise.

    valid_hw: the true (h, w) of valid content when x_in arrives already
    padded (a padded-resident stage — see models/swin.py); rows/cols beyond
    it are treated as padding even if they hold garbage.
    """
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_window_block, fused_window_block_rows,
    )
    from mastermetastyletransfer_tpu.ops.windows import (
        effective_shift, pad_to_windows, valid_token_mask,
    )

    wh, ww = cfg.window_size
    attn = block_params["attn"]
    bias = relative_position_bias(attn["rel_bias_table"], wh, ww)

    # Hardware gates for the row-resident kernel (interpret mode — the CPU
    # tests — has no VMEM limit and keeps exercising it at any size/dtype):
    #  * bf16 only: at f32 its live f32 intermediates scope 19.66M/16M VMEM
    #    even at bsub=1 (measured r4, the 512^2 swin shape (2,133,133,128));
    #    f32 — the parity/compliant path — keeps the proven per-window-tile
    #    kernel below.
    #  * row width twn*C <= 256k elements: one grid step holds a full
    #    window-ROW (nww*N rows), whose f32 qkv/MLP buffers scale with
    #    twn*C — 1024^2 shapes (1813*128, 931*256 = 232k/238k) fit, the
    #    2048^2 row (3626*128 = 464k) scope-OOMs (measured r4).
    _wp = -(-x_in.shape[2] // ww) * ww
    _twn_c = (_wp // ww) * wh * ww * cfg.dim
    if _rows_resident_on() and (_pallas_interpret()
                                or (x_in.dtype == jnp.bfloat16
                                    and _twn_c <= 262144)):
        # Row-resident path (r4): the kernel reads the padded (B, Hp, Wp, C)
        # image directly (roll folded into its row index maps) and writes
        # plain rows back in the rolled frame — no partition/merge HBM
        # round trips (reference geometry: codes/style_transformer.py:77-111).
        b, h, w, _ = x_in.shape
        xp, pad_h, pad_w = pad_to_windows(x_in, wh, ww)
        sh, sw = effective_shift(pad_h, pad_w, cfg.window_size,
                                 cfg.shift_size)
        mask = None
        if sh or sw:
            mask = shift_attention_mask(pad_h, pad_w, wh, ww, sh, sw)
        vh, vw = valid_hw if valid_hw is not None else (h, w)
        padmask = valid_token_mask(vh, vw, pad_h, pad_w, wh, ww, sh, sw)
        out = fused_window_block_rows(
            attn, xp, bias, mask, cfg.num_heads,
            block_params["mlp"],
            block_params.get("norm2") if use_norm else None,
            block_params.get("norm1") if use_norm else None,
            padmask,
            window=cfg.window_size, shift=(sh, sw),
            interpret=_pallas_interpret())
        if sh or sw:
            out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
        return out[:, :h, :w, :]

    (xw,), geom = _prepare([x_in], cfg.window_size, cfg.shift_size)
    mask = None
    if geom["sh"] or geom["sw"]:
        mask = shift_attention_mask(
            geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
    vh, vw = valid_hw if valid_hw is not None else (geom["h"], geom["w"])
    padmask = valid_token_mask(vh, vw, geom["pad_h"], geom["pad_w"],
                               wh, ww, geom["sh"], geom["sw"])
    b = geom["b"]
    out4 = fused_window_block(
        attn, _win4(xw, b), bias, mask, cfg.num_heads,
        block_params["mlp"],
        block_params.get("norm2") if use_norm else None,
        block_params.get("norm1") if use_norm else None,
        padmask,
        interpret=_pallas_interpret())
    return _finalize(out4.reshape(-1, out4.shape[2], out4.shape[3]),
                     geom, cfg.window_size)


def fused_self_attention_block_pair(bp0: dict, bp1: dict, x_in: jnp.ndarray,
                                    cfg0: AttentionConfig,
                                    cfg1: AttentionConfig, *,
                                    use_norm: bool,
                                    valid_hw: Optional[Tuple[int, int]] = None
                                    ) -> jnp.ndarray:
    """A swin stage's (W-MSA, SW-MSA) block pair in ONE Pallas program with
    a one-window-row software pipeline (r5 — block0's output never touches
    HBM; see ops/pallas_attention.fused_window_block_pair_rows). Same
    contract as two fused_self_attention_block calls: x_in may arrive
    pre-padded (padded-resident stage) with valid_hw marking true content.
    Caller gates on the row-resident hardware envelope (bf16, row width)
    exactly like the single-block rows path."""
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_window_block_pair_rows,
    )
    from mastermetastyletransfer_tpu.ops.windows import (
        effective_shift, pad_to_windows, valid_token_mask,
    )

    wh, ww = cfg1.window_size
    b, h, w, _ = x_in.shape
    xp, pad_h, pad_w = pad_to_windows(x_in, wh, ww)
    sh, sw = effective_shift(pad_h, pad_w, cfg1.window_size, cfg1.shift_size)
    mask1 = None
    if sh or sw:
        mask1 = shift_attention_mask(pad_h, pad_w, wh, ww, sh, sw)
    vh, vw = valid_hw if valid_hw is not None else (h, w)
    pm0 = valid_token_mask(vh, vw, pad_h, pad_w, wh, ww, 0, 0)
    pm1 = valid_token_mask(vh, vw, pad_h, pad_w, wh, ww, sh, sw)
    bias0 = relative_position_bias(bp0["attn"]["rel_bias_table"], wh, ww)
    bias1 = relative_position_bias(bp1["attn"]["rel_bias_table"], wh, ww)
    out = fused_window_block_pair_rows(
        bp0["attn"], bp1["attn"], xp, bias0, bias1, mask1, cfg1.num_heads,
        bp0["mlp"], bp1["mlp"],
        (bp0.get("norm1") if use_norm else None,
         bp0.get("norm2") if use_norm else None),
        (bp1.get("norm1") if use_norm else None,
         bp1.get("norm2") if use_norm else None),
        pm0, pm1, window=cfg1.window_size, shift=(sh, sw),
        interpret=_pallas_interpret())
    if sh or sw:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out[:, :h, :w, :]


def shifted_window_attention_two_v(params: dict, q_in: jnp.ndarray,
                                   k_in: jnp.ndarray, v1_in: jnp.ndarray,
                                   v2_in: jnp.ndarray, cfg: AttentionConfig
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention map, two independent V inputs through the SAME
    Wv/proj weights — the style encoder's Scale and Shift blocks share
    q=k=Key and all weights (reference: codes/style_transformer.py:867-882
    computes the identical softmax twice; here it runs once).

    Pallas fast path; window_attention_dual carries a custom VJP so this
    serves training too whenever both dropouts are off (the kernel has no
    attention-dropout) — callers gate accordingly (style_transformer.py
    encoder fused_attn_ok) and fall back to two shifted_window_attention
    calls otherwise.
    """
    from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
        window_attention_dual,
    )
    # NOTE: projection must follow the zero-pad (padded tokens carry the
    # qkv bias and participate as keys in border windows — the reference
    # pads the raw inputs, codes/style_transformer.py:77-87, then projects).
    (qw, kw, v1w, v2w), geom = _prepare(
        [q_in, k_in, v1_in, v2_in], cfg.window_size, cfg.shift_size)
    qw = linear(params["wq"], qw)
    kw = linear(params["wk"], kw)
    wh, ww = cfg.window_size
    bias = relative_position_bias(params["rel_bias_table"], wh, ww)
    mask_key = None
    if geom["sh"] or geom["sw"]:
        m = shift_attention_mask(
            geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
        mask_key = (m.shape, tuple(m.ravel().tolist()))
    b = geom["b"]
    shared = {"wv_scale": params["wv"], "wv_shift": params["wv"],
              "proj": params["proj"]}
    o1, o2 = window_attention_dual(
        shared, _win4(qw, b), _win4(kw, b), _win4(v1w, b), _win4(v2w, b),
        bias, mask_key, cfg.num_heads)
    out1 = _finalize(o1.reshape(-1, o1.shape[2], o1.shape[3]), geom, cfg.window_size)
    out2 = _finalize(o2.reshape(-1, o2.shape[2], o2.shape[3]), geom, cfg.window_size)
    return out1, out2


def shifted_window_attention_dual_value(
        params: dict, q_in: jnp.ndarray, k_in: jnp.ndarray,
        v_scale_in: jnp.ndarray, v_shift_in: jnp.ndarray, cfg: AttentionConfig, *,
        use_q_proj: bool = False,
        key_instance_norm_after_linear: bool = True,
        instance_norm_params: Optional[dict] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-value shifted-window attention: one softmax(QK^T), two value
    streams through a shared output projection, yielding (sigma, mu).

    Mirrors reference codes/style_transformer.py:414-611 including the
    instance-norm placements: Q is instance-normed on entry (:468); K is
    instance-normed either before its linear (:470-472) or after it, with the
    statistics taken over the whole padded/rolled grid (:520-530). IN over
    spatial positions is permutation-invariant, so we keep K in window layout
    and normalize over (B, all-window-tokens) instead of un-rolling.

    `instance_norm_params` carries optional affine {"q": {scale, bias},
    "k": {...}} for decoder_use_instance_norm_with_affine.
    """
    inp = instance_norm_params or {}

    def _in(x, which):
        aff = inp.get(which)
        if aff is None:
            return instance_norm(x)
        return instance_norm(x, scale=aff["scale"], bias=aff["bias"])

    q_in = _in(q_in, "q")
    if not key_instance_norm_after_linear:
        k_in = _in(k_in, "k")

    (qw, kw, vsw, vshw), geom = _prepare(
        [q_in, k_in, v_scale_in, v_shift_in], cfg.window_size, cfg.shift_size)

    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)

    q = linear(params["wq"], qw) if use_q_proj else qw
    k = linear(params["wk"], kw)

    if key_instance_norm_after_linear:
        # IN statistics over the full padded grid: reshape windows back to
        # (B, tokens, C) — equivalent to un-rolling since IN is spatial-
        # permutation invariant (reference: codes/style_transformer.py:520-530).
        bn, n, c = k.shape
        k = _in(k.reshape(geom["b"], (bn // geom["b"]) * n, c), "k").reshape(bn, n, c)

    if _pallas_ok(cfg, deterministic):
        from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
            window_attention_dual,
        )
        wh, ww = cfg.window_size
        bias = relative_position_bias(params["rel_bias_table"], wh, ww)
        mask_key = None
        if geom["sh"] or geom["sw"]:
            m = shift_attention_mask(
                geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
            mask_key = (m.shape, tuple(m.ravel().tolist()))
        b = geom["b"]
        s4, m4 = window_attention_dual(
            params, _win4(q, b), _win4(k, b), _win4(vsw, b), _win4(vshw, b),
            bias, mask_key, cfg.num_heads)
        sigma = _finalize(s4.reshape(-1, s4.shape[2], s4.shape[3]),
                          geom, cfg.window_size)
        mu = _finalize(m4.reshape(-1, m4.shape[2], m4.shape[3]),
                       geom, cfg.window_size)
        return sigma, mu

    v_scale = linear(params["wv_scale"], vsw)
    v_shift = linear(params["wv_shift"], vshw)

    attn = _attention_weights(q, k, params, cfg, geom, deterministic, r1)

    sigma = _apply_values(attn, v_scale, params["proj"], cfg)
    sigma = _dropout(sigma, cfg.dropout, deterministic, r2)
    sigma = _finalize(sigma, geom, cfg.window_size)

    mu = _apply_values(attn, v_shift, params["proj"], cfg)
    mu = _dropout(mu, cfg.dropout, deterministic, r3)
    mu = _finalize(mu, geom, cfg.window_size)
    return sigma, mu
