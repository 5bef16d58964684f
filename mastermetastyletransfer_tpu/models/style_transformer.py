"""The Style Transformer: shared-weight shifted-window cross-attention encoder
+ decoder producing per-pixel scale/shift modulation.

Functional re-design of the reference modules:
  StyleSwinTransformerBlock  (reference: codes/style_transformer.py:303-398)
  StyleEncoder               (reference: codes/style_transformer.py:777-912)
  StyleDecoder               (reference: codes/style_transformer.py:918-1128)
  StyleTransformer           (reference: codes/style_transformer.py:1133-1245)

Everything is a pure function over a params pytree; `k` (the controllable
stacked-layer count, ZS-L1 vs ZS-L3) is either a static python int (unrolled,
inference) or a traced scalar (training with random k) handled by
cfg.traced_k_impl: a masked lax.scan (default — 1/4 the reverse-mode graph;
the platform XLA TPU compiler SIGSEGVs on the switch variant's grad) or a
lax.switch over unrolled depths (only the sampled depth executes) — all
jit-clean with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import AttentionConfig, StyleTransformerConfig
from mastermetastyletransfer_tpu.ops.precision import applies_matmul_mode
from mastermetastyletransfer_tpu.ops.attention import (
    init_dual_value_window_attention,
    init_window_attention,
    shifted_window_attention,
    shifted_window_attention_dual_value,
)
from mastermetastyletransfer_tpu.ops.mlp import (
    init_linear, init_mlp, linear, mlp_apply, stochastic_depth,
)
from mastermetastyletransfer_tpu.ops.norm import instance_norm, layer_norm
from mastermetastyletransfer_tpu.ops.pallas_mlp_vjp import ln_mlp_residual


def _split(rng, n):
    if rng is None:
        return (None,) * n
    return jax.random.split(rng, n)


# ---------------------------------------------------------------------------
# StyleSwinTransformerBlock
# ---------------------------------------------------------------------------

def init_style_swin_block(key, attn_cfg: AttentionConfig, *, use_norm: bool,
                          exclude_mlp: bool, mlp_ratio: float) -> dict:
    """Swin block generalized to cross-attention inputs, with optional norm
    (the style encoder runs norm-free) and optional MLP
    (reference: codes/style_transformer.py:319-373)."""
    k_attn, k_mlp = jax.random.split(key)
    p = {"attn": init_window_attention(k_attn, attn_cfg)}
    d = attn_cfg.dim
    if use_norm:
        p["norm1"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
        if not exclude_mlp:
            p["norm2"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if not exclude_mlp:
        p["mlp"] = init_mlp(k_mlp, d, int(d * mlp_ratio), init="xavier_uniform")
    return p


def _fuse_mlp_ok(attn_cfg: AttentionConfig, deterministic: bool,
                 sd_prob: float) -> bool:
    """The fused LN+MLP+residual kernel is differentiable (custom VJP,
    ops/pallas_mlp_vjp.py) so it also serves training when MLP dropout is
    off (the reference default); stochastic depth is re-applied outside via
    _sd_lerp."""
    return attn_cfg.use_pallas and (deterministic or attn_cfg.dropout == 0.0)


def _sd_lerp(x, y, sd_prob, deterministic, rng):
    """Stochastic depth over a fused residual output: the kernel computes
    y = x + m; SD needs x + mask*m/keep = x + SD(y - x)."""
    if deterministic or sd_prob == 0.0:
        return y
    return x + stochastic_depth(y - x, sd_prob, deterministic=deterministic,
                                rng=rng)


def _pallas_interpret() -> bool:
    import jax as _jax
    return _jax.default_backend() != "tpu"


def style_swin_block_apply(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, attn_cfg: AttentionConfig, *,
                           use_norm: bool, exclude_mlp: bool,
                           sd_prob: float, calculating_key: bool = False,
                           deterministic: bool = True,
                           rng: Optional[jax.Array] = None,
                           valid_hw: Optional[Tuple[int, int]] = None
                           ) -> jnp.ndarray:
    """Forward of the generalized Swin block.

    Residual source: q when computing the encoder Key or when the block is a
    full (MLP-bearing) block; v when computing Scale/Shift (both sit in the V
    position of the shared MHA) — reference: codes/style_transformer.py:382-386.

    valid_hw marks the true content size when the input arrives pre-padded
    (padded-resident stages, fused eval path only).
    """
    x = q if (calculating_key or not exclude_mlp) else v
    r_attn, r_sd1, r_mlp, r_sd2 = _split(rng, 4)

    # Eval fast path: a full self-attention block (q=k=v, MLP-bearing) runs
    # as ONE fused Pallas kernel including norm1 (ops/attention.py).
    # Dim gate: Mosaic needs 128-aligned lane counts (swin_T/S -> XLA).
    if (deterministic and attn_cfg.use_pallas
            and not exclude_mlp and q is k and k is v):
        from mastermetastyletransfer_tpu.ops.attention import (
            _pallas_dim_ok, fused_self_attention_block,
        )
        if _pallas_dim_ok(attn_cfg.dim):
            return fused_self_attention_block(params, q, attn_cfg,
                                              use_norm=use_norm,
                                              valid_hw=valid_hw)

    if use_norm:
        n1 = lambda t: layer_norm(t, params["norm1"]["scale"], params["norm1"]["bias"])
        a = shifted_window_attention(params["attn"], n1(q), n1(k), n1(v), attn_cfg,
                                     deterministic=deterministic, rng=r_attn)
        x = x + stochastic_depth(a, sd_prob, deterministic=deterministic, rng=r_sd1)
        if not exclude_mlp:
            if _fuse_mlp_ok(attn_cfg, deterministic, sd_prob):
                y = ln_mlp_residual(x, params["mlp"], params["norm2"])
                x = _sd_lerp(x, y, sd_prob, deterministic, r_sd2)
            else:
                h = layer_norm(x, params["norm2"]["scale"], params["norm2"]["bias"])
                m = mlp_apply(params["mlp"], h, dropout=attn_cfg.dropout,
                              deterministic=deterministic, rng=r_mlp)
                x = x + stochastic_depth(m, sd_prob, deterministic=deterministic, rng=r_sd2)
    else:
        a = shifted_window_attention(params["attn"], q, k, v, attn_cfg,
                                     deterministic=deterministic, rng=r_attn)
        x = x + stochastic_depth(a, sd_prob, deterministic=deterministic, rng=r_sd1)
        if not exclude_mlp:
            if _fuse_mlp_ok(attn_cfg, deterministic, sd_prob):
                y = ln_mlp_residual(x, params["mlp"], None)
                x = _sd_lerp(x, y, sd_prob, deterministic, r_sd2)
            else:
                m = mlp_apply(params["mlp"], x, dropout=attn_cfg.dropout,
                              deterministic=deterministic, rng=r_mlp)
                x = x + stochastic_depth(m, sd_prob, deterministic=deterministic, rng=r_sd2)
    return x


# ---------------------------------------------------------------------------
# StyleEncoder
# ---------------------------------------------------------------------------

def init_style_encoder(key, cfg: StyleTransformerConfig) -> dict:
    k_blk, k_key, k_scale, k_shift = jax.random.split(key, 4)
    d = cfg.encoder_dim
    hidden = int(d * cfg.encoder_mlp_ratio)
    return {
        "shared_mha": init_style_swin_block(
            k_blk, cfg.encoder_attn(), use_norm=cfg.encoder_use_norm,
            exclude_mlp=True, mlp_ratio=cfg.encoder_mlp_ratio),
        # NOTE: the reference *intends* xavier init for these three MLPs but
        # its isinstance-over-generators loop never fires
        # (codes/style_transformer.py:847-851), leaving torch-default init.
        # We implement the intended xavier init (trainers may re-init anyway).
        "mlp_key": init_mlp(k_key, d, hidden, init="xavier_uniform"),
        "mlp_scale": init_mlp(k_scale, d, hidden, init="xavier_uniform"),
        "mlp_shift": init_mlp(k_shift, d, hidden, init="xavier_uniform"),
    }


def style_encoder_apply(params: dict, Key: jnp.ndarray, Scale: jnp.ndarray,
                        Shift: jnp.ndarray, cfg: StyleTransformerConfig, *,
                        deterministic: bool = True,
                        rng: Optional[jax.Array] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One shared MHA applied 3x (Key self-attn; Scale and Shift cross-attn
    with the Key as Q/K), each followed by its own MLP + stochastic-depth
    residual (reference: codes/style_transformer.py:855-912)."""
    acfg = cfg.encoder_attn()
    sd = cfg.encoder_stochastic_depth_prob
    rs = _split(rng, 9)

    def block(q, k, v, calc_key, r):
        return style_swin_block_apply(
            params["shared_mha"], q, k, v, acfg, use_norm=cfg.encoder_use_norm,
            exclude_mlp=True, sd_prob=sd, calculating_key=calc_key,
            deterministic=deterministic, rng=r)

    def mlp_res(x, mlp_params, r_mlp, r_sd):
        if _fuse_mlp_ok(acfg, deterministic, sd):
            y = ln_mlp_residual(x, mlp_params, None)
            return _sd_lerp(x, y, sd, deterministic, r_sd)
        m = mlp_apply(mlp_params, x, dropout=cfg.encoder_dropout,
                      deterministic=deterministic, rng=r_mlp)
        return x + stochastic_depth(m, sd, deterministic=deterministic, rng=r_sd)

    def scale_shift(Key, Scale, Shift, r_a, r_b):
        """Scale and Shift cross-attend with identical q=k=Key and shared
        weights — on the Pallas path the softmax runs ONCE with two
        value streams (the reference computes it twice,
        codes/style_transformer.py:867-882). Gated like _pallas_ok
        (ops/attention.py): the fused kernel has no attention-dropout, so it
        only serves training when BOTH dropouts are off."""
        fused_attn_ok = _fuse_mlp_ok(acfg, deterministic, sd) and (
            deterministic or acfg.attention_dropout == 0.0)
        if fused_attn_ok:
            from mastermetastyletransfer_tpu.ops.attention import (
                shifted_window_attention_two_v,
            )
            attn = params["shared_mha"]["attn"]
            if cfg.encoder_use_norm:
                n1 = params["shared_mha"]["norm1"]
                qk = layer_norm(Key, n1["scale"], n1["bias"])
                v1 = layer_norm(Scale, n1["scale"], n1["bias"])
                v2 = layer_norm(Shift, n1["scale"], n1["bias"])
            else:
                qk, v1, v2 = Key, Scale, Shift
            a1, a2 = shifted_window_attention_two_v(attn, qk, qk, v1, v2, acfg)
            # Same stochastic-depth rng streams as the XLA fallback (which
            # consumes _split(r, 4)[1] inside style_swin_block_apply for each
            # of the two block() calls) so use_pallas runs are bit-reproducible
            # against their XLA twins at matched seeds.
            r1 = _split(r_a, 4)[1] if r_a is not None else None
            r2 = _split(r_b, 4)[1] if r_b is not None else None
            return (Scale + stochastic_depth(a1, sd, deterministic=deterministic, rng=r1),
                    Shift + stochastic_depth(a2, sd, deterministic=deterministic, rng=r2))
        return (block(Key, Key, Scale, False, r_a),
                block(Key, Key, Shift, False, r_b))

    if cfg.encoder_if_use_processed_Key_in_Scale_and_Shift_calculation:
        Key = block(Key, Key, Key, True, rs[0])
        Key = mlp_res(Key, params["mlp_key"], rs[1], rs[2])
        Scale, Shift = scale_shift(Key, Scale, Shift, rs[3], rs[6])
        Scale = mlp_res(Scale, params["mlp_scale"], rs[4], rs[5])
        Shift = mlp_res(Shift, params["mlp_shift"], rs[7], rs[8])
    else:
        Scale, Shift = scale_shift(Key, Scale, Shift, rs[0], rs[3])
        Scale = mlp_res(Scale, params["mlp_scale"], rs[1], rs[2])
        Shift = mlp_res(Shift, params["mlp_shift"], rs[4], rs[5])
        Key = block(Key, Key, Key, True, rs[6])
        Key = mlp_res(Key, params["mlp_key"], rs[7], rs[8])
    return Key, Scale, Shift


# ---------------------------------------------------------------------------
# StyleDecoder
# ---------------------------------------------------------------------------

def init_style_decoder(key, cfg: StyleTransformerConfig) -> dict:
    k_self, k_dual, k_last, k_aff, k_lk, k_ls, k_lsh, k_ps, k_pm = jax.random.split(key, 9)
    d = cfg.decoder_dim
    hidden = int(d * cfg.decoder_mlp_ratio)
    p = {
        "self_mha": init_style_swin_block(
            k_self, cfg.decoder_attn(), use_norm=cfg.decoder_use_norm,
            exclude_mlp=cfg.decoder_exclude_MLP_after_Fcs_self_MHA,
            mlp_ratio=cfg.decoder_mlp_ratio),
        # last MLP keeps torch-default init in the Swin-tail path; xavier in
        # the regular-MHA path (reference: codes/style_transformer.py:1037-1041)
        "last_mlp": init_mlp(
            k_last, d, hidden,
            init=("xavier_uniform" if cfg.decoder_use_regular_MHA_instead_of_Swin_at_the_end
                  else "torch_default")),
    }
    if cfg.decoder_use_instance_norm_with_affine:
        p["in_q"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
        p["in_k"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if not cfg.decoder_use_regular_MHA_instead_of_Swin_at_the_end:
        p["dual_mha"] = init_dual_value_window_attention(
            k_dual, cfg.decoder_attn(), use_q_proj=False)
    else:
        p["lin_key"] = init_linear(k_lk, d, d)
        p["lin_scale"] = init_linear(k_ls, d, d)
        p["lin_shift"] = init_linear(k_lsh, d, d)
        p["proj_sigma"] = init_linear(k_ps, d, d)
        p["proj_mu"] = init_linear(k_pm, d, d)
    return p


def style_decoder_apply(params: dict, Fcs: jnp.ndarray, Key: jnp.ndarray,
                        Scale: jnp.ndarray, Shift: jnp.ndarray,
                        cfg: StyleTransformerConfig, *,
                        deterministic: bool = True,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Fcs self-attention -> IN(Q)/IN(K) -> dual-value MHA -> modulation
    Fcs' = Query*sigma + mu -> final MLP residual
    (reference: codes/style_transformer.py:1045-1128)."""
    acfg = cfg.decoder_attn()
    sd = cfg.decoder_stochastic_depth_prob
    r_self, r_dual, r_mlp, r_sd = _split(rng, 4)

    Query = style_swin_block_apply(
        params["self_mha"], Fcs, Fcs, Fcs, acfg, use_norm=cfg.decoder_use_norm,
        exclude_mlp=cfg.decoder_exclude_MLP_after_Fcs_self_MHA,
        sd_prob=sd, calculating_key=True,
        deterministic=deterministic, rng=r_self)

    affine = cfg.decoder_use_instance_norm_with_affine

    def _in(x, which):
        if affine:
            aff = params[which]
            return instance_norm(x, scale=aff["scale"], bias=aff["bias"])
        return instance_norm(x)

    if not cfg.decoder_use_regular_MHA_instead_of_Swin_at_the_end:
        # IN applied here AND again inside the dual attention on Q / K —
        # the reference applies both (codes/style_transformer.py:1053-1057
        # then :468, :520-530); replicated for parity.
        Query_IN = _in(Query, "in_q")
        Key_IN = _in(Key, "in_k")
        in_params = ({"q": params["in_q"], "k": params["in_k"]} if affine else None)
        sigma, mu = shifted_window_attention_dual_value(
            params["dual_mha"], Query_IN, Key_IN, Scale, Shift, acfg,
            use_q_proj=False,
            key_instance_norm_after_linear=cfg.decoder_use_Key_instance_norm_after_linear_transformation,
            instance_norm_params=in_params,
            deterministic=deterministic, rng=r_dual)
    else:
        # plain (non-windowed) MHA tail over flattened tokens
        # (reference: codes/style_transformer.py:1063-1119)
        b, h, w, c = Query.shape
        Q = Query.reshape(b, h * w, c)
        K = Key.reshape(b, h * w, c)
        S = Scale.reshape(b, h * w, c)
        Sh = Shift.reshape(b, h * w, c)
        if cfg.decoder_use_Key_instance_norm_after_linear_transformation:
            K = linear(params["lin_key"], K)
            Q_IN = _in(Q, "in_q")
            K = _in(K, "in_k")
        else:
            Q_IN = _in(Q, "in_q")
            K = _in(K, "in_k")
            K = linear(params["lin_key"], K)
        S = linear(params["lin_scale"], S)
        Sh = linear(params["lin_shift"], Sh)
        Q_IN = Q_IN * (c ** -0.5)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", Q_IN, K, preferred_element_type=jnp.float32),
            axis=-1).astype(Q.dtype)
        sigma = linear(params["proj_sigma"], jnp.einsum("bnm,bmc->bnc", attn, S))
        mu = linear(params["proj_mu"], jnp.einsum("bnm,bmc->bnc", attn, Sh))
        sigma = sigma.reshape(b, h, w, c)
        mu = mu.reshape(b, h, w, c)

    Query = Query * sigma + mu
    if _fuse_mlp_ok(acfg, deterministic, sd):
        y = ln_mlp_residual(Query, params["last_mlp"], None)
        return _sd_lerp(Query, y, sd, deterministic, r_sd)
    m = mlp_apply(params["last_mlp"], Query, dropout=cfg.decoder_dropout,
                  deterministic=deterministic, rng=r_mlp)
    Query = Query + stochastic_depth(m, sd, deterministic=deterministic, rng=r_sd)
    return Query


# ---------------------------------------------------------------------------
# StyleTransformer (stacked k iterations of the shared enc/dec pair)
# ---------------------------------------------------------------------------

def init_style_transformer(key, cfg: StyleTransformerConfig) -> dict:
    k_enc, k_dec = jax.random.split(key)
    return {"encoder": init_style_encoder(k_enc, cfg),
            "decoder": init_style_decoder(k_dec, cfg)}


def _st_windowed_ok(cfg: StyleTransformerConfig, deterministic: bool) -> bool:
    """The window-resident eval fast path needs: eval mode, Pallas on, zero
    dropouts, identical encoder/decoder window geometry (so one partition
    serves every attention), and the default windowed decoder tail."""
    from mastermetastyletransfer_tpu.ops.attention import _pallas_dim_ok
    return (deterministic and cfg.use_pallas
            and _pallas_dim_ok(cfg.encoder_dim)
            and cfg.encoder_dropout == 0.0 and cfg.decoder_dropout == 0.0
            and cfg.encoder_attention_dropout == 0.0
            and cfg.decoder_attention_dropout == 0.0
            and cfg.encoder_dim == cfg.decoder_dim
            and cfg.encoder_window_size == cfg.decoder_window_size
            and cfg.encoder_shift_size == cfg.decoder_shift_size
            and not cfg.decoder_use_regular_MHA_instead_of_Swin_at_the_end)


def _masked_instance_norm(x4, vm, count: float, eps: float = 1e-5,
                          scale=None, bias=None):
    """InstanceNorm over the VALID tokens of a window-layout tensor
    (B, nW, N, C): reproduces image-layout IN statistics (the reference
    normalizes BEFORE padding; window-resident tensors carry pad tokens).
    Biased variance, eps 1e-5, f32 stats — same numerics as ops/norm."""
    f32 = jnp.float32
    xf = x4.astype(f32) * vm
    mean = jnp.sum(xf, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True) / count \
        - jnp.square(mean)
    y = (x4.astype(f32) - mean) * (var + eps) ** -0.5
    if scale is not None:
        y = y * scale.astype(f32)
    if bias is not None:
        y = y + bias.astype(f32)
    return y.astype(x4.dtype)


@applies_matmul_mode
def style_transformer_apply_windowed(params: dict, Fc: jnp.ndarray,
                                     Fs: jnp.ndarray,
                                     cfg: StyleTransformerConfig, *,
                                     k: int,
                                     fuse_iteration: Optional[bool] = None
                                     ) -> jnp.ndarray:
    """Window-RESIDENT eval fast path: partition Fc/Fs into (rolled, padded)
    windows ONCE, run all k iterations of encoder+decoder entirely in the
    (B, nW, N, C) layout, merge once at the end.

    Every attention in the style transformer shares one geometry (window 7,
    shift (4,4) — reference codes/style_transformer.py:1159-1226), and every
    op between attentions (LN/IN/MLP/modulation) is token-local or
    permutation-invariant, so the per-attention pad->roll->partition->merge->
    unroll->unpad round trips of the reference (and of the generic path) are
    pure overhead — ~25 relayout HLOs per iteration on a device with a fixed
    per-op cost.

    Parity-critical details:
      * Before each attention, inputs have their padding tokens re-zeroed
        (valid_token_mask) — the reference pads FRESH zeros each time, and
        padded tokens participate as keys in border windows (so their
        post-projection value, the qkv bias, must match).
      * INs that the reference computes on the un-padded image
        (decoder Q/K entry INs, codes/style_transformer.py:1053-1057, :468)
        use masked statistics over valid tokens; the post-linear Key IN
        (:520-530) keeps full padded-grid statistics, pad tokens carrying
        exactly the wk bias.
      * Residual sources follow codes/style_transformer.py:382-386 (q for
        Key/self blocks, v for Scale/Shift).
    """
    from mastermetastyletransfer_tpu.ops.attention import _prepare

    acfg = cfg.encoder_attn()
    (fc_w, fs_w), geom = _prepare([Fc, Fs], acfg.window_size, acfg.shift_size)
    fc_w, fs_w = _to4(fc_w, geom["b"]), _to4(fs_w, geom["b"])
    encoder, decoder = _windowed_machinery(params, cfg, geom, fc_w.dtype,
                                           fuse_iteration)

    Scale, Shift, Key, Fcs = fs_w, fs_w, fs_w, fc_w
    for _ in range(int(k)):
        Key, Scale, Shift = encoder(Key, Scale, Shift)
        Fcs = decoder(Fcs, Key, Scale, Shift)
    return _finalize_windowed(Fcs, geom, acfg.window_size)


def _to4(x, b):
    bn, n, c = x.shape
    return x.reshape(b, bn // b, n, c)


@jax.tree_util.register_pytree_node_class
class WindowedStyleStream:
    """A precomputed windowed style stream: the k (Key, Scale, Shift)
    triples in (B, nW, N, C) layout, carrying the feature-map (h, w) they
    were partitioned at as STATIC metadata. Window shapes alone cannot
    distinguish e.g. a 56x28 from a 28x56 grid (same nW, N, C) or 26x26
    from 28x28 (same padded grid, different valid-token masks) — decoding
    against a mismatched geometry would be silently wrong, so the consumer
    checks (h, w), not just shapes (r3 review finding). Registered as a
    pytree (children = triples, aux = (h, w)), so it passes through jit
    and jax.tree_util transparently."""

    def __init__(self, triples, hw):
        self.triples = list(triples)
        self.hw = tuple(hw)

    def tree_flatten(self):
        return tuple(self.triples), self.hw

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children, aux)

    def __iter__(self):
        return iter(self.triples)

    def __len__(self):
        return len(self.triples)

    def __getitem__(self, i):
        return self.triples[i]


def _bcast_stream_batch(t, bc: int):
    """One (batch-1) style stream serves a whole content batch
    (style-locked serving); equal batches pass through."""
    if t.shape[0] == bc:
        return t
    if t.shape[0] == 1:
        return jnp.broadcast_to(t, (bc,) + t.shape[1:])
    raise ValueError(f"stream batch {t.shape[0]} vs content batch {bc}")


def _finalize_windowed(Fcs, geom, window_size):
    from mastermetastyletransfer_tpu.ops.attention import _finalize

    return _finalize(Fcs.reshape(-1, Fcs.shape[2], Fcs.shape[3]), geom,
                     window_size)


def _windowed_machinery(params, cfg, geom, dtype,
                        fuse_iteration: Optional[bool] = None):
    """Build the window-resident (encoder, decoder) closures for one
    geometry. encoder: (Key, Scale, Shift) -> updated triple; decoder:
    (Fcs, Key, Scale, Shift) -> Fcs' — all (B, nW, N, C) window tensors.
    Shared by the interleaved fast path and the split style-stream API
    (the encoder triple evolves from STYLE only, so a fixed style's k
    encoder steps can be computed once and reused across contents)."""
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_decoder_tail, fused_encoder_scale_shift, fused_window_block,
    )
    from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
        window_attention, window_attention_dual,
    )
    from mastermetastyletransfer_tpu.ops.windows import (
        relative_position_bias, shift_attention_mask, valid_token_mask,
    )

    acfg = cfg.encoder_attn()
    wh, ww = acfg.window_size
    heads_e = cfg.encoder_num_heads
    heads_d = cfg.decoder_num_heads
    b = geom["b"]

    mask_key = None
    if geom["sh"] or geom["sw"]:
        m = shift_attention_mask(
            geom["pad_h"], geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
        mask_key = (m.shape, tuple(m.ravel().tolist()))
    mask_np = (None if mask_key is None
               else np.asarray(mask_key[1], np.float32).reshape(mask_key[0]))
    vmask = valid_token_mask(geom["h"], geom["w"], geom["pad_h"],
                             geom["pad_w"], wh, ww, geom["sh"], geom["sw"])
    all_valid = float(np.min(vmask)) >= 1.0
    vm = jnp.asarray(vmask, jnp.float32)[None, :, :, None]
    count = float(geom["h"] * geom["w"])

    def zp(x4):
        """Re-zero padding tokens (identity when the grid divides evenly)."""
        if all_valid:
            return x4
        return x4 * vm.astype(x4.dtype)

    enc = params["encoder"]
    dec = params["decoder"]
    e_attn = enc["shared_mha"]["attn"]
    bias_e = relative_position_bias(e_attn["rel_bias_table"], wh, ww)

    n1p = enc["shared_mha"].get("norm1") if cfg.encoder_use_norm else None
    if n1p is not None:
        ln_e = lambda t: layer_norm(t, n1p["scale"], n1p["bias"])
    else:
        ln_e = lambda t: t

    def enc_key_block_fused(Key):
        """Key self-attention block + MLP_Key residual in ONE kernel: the
        whole-block kernel's [LN1->pad-zero->attn->+res->MLP->+res] chain is
        exactly enc Key's zp(ln(Key)) -> attn -> Key+a -> mlp residual
        (norm2=None: the encoder MLPs are norm-free,
        reference codes/style_transformer.py:859-865)."""
        return fused_window_block(
            e_attn, Key, bias_e, mask_np, heads_e, enc["mlp_key"],
            None, n1p, vmask, interpret=_pallas_interpret())

    def enc_scale_shift_fused(Key, Scale, Shift):
        """Scale & Shift update (2-V attention with shared softmax + both
        norm-free MLP residuals) in ONE kernel
        (reference codes/style_transformer.py:867-882)."""
        return fused_encoder_scale_shift(
            e_attn, Key, Scale, Shift, bias_e, mask_np, heads_e,
            enc["mlp_scale"], enc["mlp_shift"], n1p, vmask,
            interpret=_pallas_interpret())

    # The iteration-fusion kernels hold the qkv streams, the shared
    # softmax, and the 4C MLP hidden rows in one scoped-VMEM footprint —
    # sized for 2-byte streams. At f32 they exceed the 16 MB scoped limit
    # even at bsub=1 (measured r3: 18.4M under default_matmul_precision
    # 'highest'), so f32 takes the separate-kernel formulation below.
    # Interpret mode (CPU tests) has no VMEM limit — keep fusion covered
    # there; pass fuse_iteration explicitly to pin either path.
    if fuse_iteration is None:
        fuse_iteration = (jnp.dtype(dtype).itemsize == 2
                          or _pallas_interpret())

    def enc_scale_shift_split(Key, Scale, Shift):
        qk = zp(ln_e(Key))
        v1 = zp(ln_e(Scale))
        v2 = zp(ln_e(Shift))
        q = linear(e_attn["wq"], qk)
        kk = linear(e_attn["wk"], qk)
        shared = {"wv_scale": e_attn["wv"], "wv_shift": e_attn["wv"],
                  "proj": e_attn["proj"]}
        a1, a2 = window_attention_dual(shared, q, kk, v1, v2, bias_e,
                                       mask_key, heads_e)
        Scale = ln_mlp_residual(Scale + a1, enc["mlp_scale"], None)
        Shift = ln_mlp_residual(Shift + a2, enc["mlp_shift"], None)
        return Scale, Shift

    def encoder(Key, Scale, Shift):
        ss = enc_scale_shift_fused if fuse_iteration else enc_scale_shift_split
        if cfg.encoder_if_use_processed_Key_in_Scale_and_Shift_calculation:
            Key = enc_key_block_fused(Key)
            Scale, Shift = ss(Key, Scale, Shift)
        else:
            Scale, Shift = ss(Key, Scale, Shift)
            Key = enc_key_block_fused(Key)
        return Key, Scale, Shift

    d_self = dec["self_mha"]
    bias_self = relative_position_bias(d_self["attn"]["rel_bias_table"],
                                       wh, ww)
    affine = cfg.decoder_use_instance_norm_with_affine

    def _in_masked(x4, which):
        aff = dec.get(which) if affine else None
        return _masked_instance_norm(
            x4, vm, count,
            scale=None if aff is None else aff["scale"],
            bias=None if aff is None else aff["bias"])

    def dec_self_block(Fcs):
        if cfg.decoder_exclude_MLP_after_Fcs_self_MHA:
            if cfg.decoder_use_norm:
                nn1 = d_self["norm1"]
                x = zp(layer_norm(Fcs, nn1["scale"], nn1["bias"]))
            else:
                x = zp(Fcs)
            a = window_attention(d_self["attn"], x, x, x, bias_self,
                                 mask_key, heads_d)
            return Fcs + a
        return fused_window_block(
            d_self["attn"], Fcs, bias_self, mask_np, heads_d,
            d_self["mlp"],
            d_self.get("norm2") if cfg.decoder_use_norm else None,
            d_self.get("norm1") if cfg.decoder_use_norm else None,
            vmask, interpret=_pallas_interpret())

    d_dual = dec["dual_mha"]
    bias_dual = relative_position_bias(d_dual["rel_bias_table"], wh, ww)

    def decoder(Fcs, Key, Scale, Shift):
        Query = dec_self_block(Fcs)
        # entry INs on the un-padded image -> masked stats
        # (reference: codes/style_transformer.py:1053-1057)
        Query_IN = _in_masked(Query, "in_q")
        Key_IN = _in_masked(Key, "in_k")
        # in-attention Q IN (reference :468) — applied AGAIN, masked
        q = zp(_in_masked(Query_IN, "in_q"))
        if cfg.decoder_use_Key_instance_norm_after_linear_transformation:
            kk = linear(d_dual["wk"], zp(Key_IN))
            # post-linear IN over the FULL padded grid (pad tokens = wk
            # bias), WITH the in_k affine when enabled — matches the generic
            # path's _in(k, "k") (ops/attention.py:348-353)
            aff_k = dec.get("in_k") if affine else None
            kk = instance_norm(
                kk.reshape(b, -1, kk.shape[-1]),
                scale=None if aff_k is None else aff_k["scale"],
                bias=None if aff_k is None else aff_k["bias"],
            ).reshape(kk.shape)
        else:
            kk = zp(_in_masked(Key_IN, "in_k"))
            kk = linear(d_dual["wk"], kk)
        # dual attention + sigma/mu modulation + last-MLP residual fused
        # (v streams zero-padded + projected in-kernel; q/k prepared above
        # because their INs need image-global statistics)
        if fuse_iteration:
            return fused_decoder_tail(
                d_dual, q, kk, Scale, Shift, Query, bias_dual, mask_np,
                heads_d, dec["last_mlp"], vmask,
                interpret=_pallas_interpret())
        sigma, mu = window_attention_dual(
            d_dual, q, kk, zp(Scale), zp(Shift), bias_dual, mask_key, heads_d)
        return ln_mlp_residual(Query * sigma + mu, dec["last_mlp"], None)

    return encoder, decoder


def style_stream_windowed(params: dict, Fs: jnp.ndarray,
                          cfg: StyleTransformerConfig, *, k: int,
                          fuse_iteration: Optional[bool] = None):
    """Precompute the k (Key, Scale, Shift) encoder triples for one style —
    they evolve from Fs alone (reference codes/style_transformer.py:
    1229-1245: the encoder consumes only the style stream), so a fixed
    style's stream can be reused EXACTLY across any number of contents of
    the same spatial size. Returns a list of k window-layout triples."""
    from mastermetastyletransfer_tpu.ops.attention import _prepare

    acfg = cfg.encoder_attn()
    (fs_w,), geom = _prepare([Fs], acfg.window_size, acfg.shift_size)
    fs_w = _to4(fs_w, geom["b"])
    encoder, _ = _windowed_machinery(params, cfg, geom, fs_w.dtype,
                                     fuse_iteration)
    Key = Scale = Shift = fs_w
    stream = []
    for _ in range(int(k)):
        Key, Scale, Shift = encoder(Key, Scale, Shift)
        stream.append((Key, Scale, Shift))
    return WindowedStyleStream(stream, (geom["h"], geom["w"]))


def style_apply_windowed_from_stream(params: dict, Fc: jnp.ndarray, stream,
                                     cfg: StyleTransformerConfig, *,
                                     fuse_iteration: Optional[bool] = None
                                     ) -> jnp.ndarray:
    """Run the decoder half of the windowed fast path against a precomputed
    style stream (style_stream_windowed). Fc must have the spatial size the
    stream was built at — checked via the stream's static (h, w)."""
    from mastermetastyletransfer_tpu.ops.attention import _prepare

    acfg = cfg.encoder_attn()
    (fc_w,), geom = _prepare([Fc], acfg.window_size, acfg.shift_size)
    fc_w = _to4(fc_w, geom["b"])
    if isinstance(stream, WindowedStyleStream):
        if stream.hw != (geom["h"], geom["w"]):
            raise ValueError(
                f"style stream was built at feature size {stream.hw}; "
                f"content features are {(geom['h'], geom['w'])} — stream "
                f"and content must share (H, W)")
    elif stream and stream[0][0].shape[1:] != fc_w.shape[1:]:
        raise ValueError(
            f"style stream geometry {stream[0][0].shape[1:]} does not match "
            f"content windows {fc_w.shape[1:]}")
    _, decoder = _windowed_machinery(params, cfg, geom, fc_w.dtype,
                                     fuse_iteration)
    bc = fc_w.shape[0]
    Fcs = fc_w
    for Key, Scale, Shift in stream:
        Fcs = decoder(Fcs, _bcast_stream_batch(Key, bc),
                      _bcast_stream_batch(Scale, bc),
                      _bcast_stream_batch(Shift, bc))
    return _finalize_windowed(Fcs, geom, acfg.window_size)


@applies_matmul_mode
def style_transformer_apply(params: dict, Fc: jnp.ndarray, Fs: jnp.ndarray,
                            cfg: StyleTransformerConfig, *, k: int = 1,
                            max_k: Optional[int] = None,
                            deterministic: bool = True,
                            rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Run k stacked iterations of (encoder, decoder) with shared params
    (reference: codes/style_transformer.py:1229-1245).

    If `max_k` is None, k must be a static python int and the loop unrolls.
    If `max_k` is given, k may be a traced scalar in [1, max_k]: a lax.switch
    dispatches over max_k unrolled depth branches so ONLY the sampled depth
    executes; all branches share parameters and output shapes, and reverse-
    mode differentiation flows through the taken branch.
    """
    if max_k is None and rng is None and _st_windowed_ok(cfg, deterministic):
        return style_transformer_apply_windowed(params, Fc, Fs, cfg, k=int(k))

    Scale = Fs
    Shift = Fs

    def one_iter(Fc, Fs, Scale, Shift, r):
        r_enc, r_dec = _split(r, 2)
        Fs2, Scale2, Shift2 = style_encoder_apply(
            params["encoder"], Fs, Scale, Shift, cfg,
            deterministic=deterministic, rng=r_enc)
        Fc2 = style_decoder_apply(
            params["decoder"], Fc, Fs2, Scale2, Shift2, cfg,
            deterministic=deterministic, rng=r_dec)
        return Fc2, Fs2, Scale2, Shift2

    if max_k is None:
        for _ in range(int(k)):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            Fc, Fs, Scale, Shift = one_iter(Fc, Fs, Scale, Shift, sub)
        return Fc

    # Traced k in [1, max_k]. Two implementations:
    #  * "switch": lax.switch over unrolled depth branches — executes ONLY
    #    the sampled depth (no wasted compute), but its reverse-mode graph
    #    holds max_k full transformer stacks and SIGSEGVs this platform's
    #    XLA TPU compiler (isolated: scripts/probe_train_compile.py —
    #    grad_full_switchk crashes, grad_full_k1_rng compiles).
    #  * "scan": ONE iteration body scanned max_k times with a masked carry
    #    (iteration i applies only while i < k) — ~1/4 the graph, compiles
    #    everywhere; always runs max_k iterations (~E[k]/max_k waste).
    rngs = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0), max_k)

    if cfg.traced_k_impl == "scan":
        def body(carry, i):
            Fc, Fs, Scale, Shift = carry
            Fc2, Fs2, Scale2, Shift2 = one_iter(Fc, Fs, Scale, Shift, rngs[i])
            keep = i < k
            sel = lambda new, old: jnp.where(keep, new, old)
            return (sel(Fc2, Fc), sel(Fs2, Fs), sel(Scale2, Scale),
                    sel(Shift2, Shift)), None

        (Fc, _, _, _), _ = jax.lax.scan(
            body, (Fc, Fs, Scale, Shift), jnp.arange(max_k))
        return Fc

    def make_branch(depth):
        def branch(operands):
            Fc, Fs, Scale, Shift = operands
            for i in range(depth):
                Fc, Fs, Scale, Shift = one_iter(Fc, Fs, Scale, Shift, rngs[i])
            return Fc
        return branch

    return jax.lax.switch(k - 1, [make_branch(d + 1) for d in range(max_k)],
                          (Fc, Fs, Scale, Shift))


@applies_matmul_mode
def style_transformer_stream(params: dict, Fs: jnp.ndarray,
                             cfg: StyleTransformerConfig, *, k: int):
    """Content-independent half of the style transformer: the k encoder
    triples (Key, Scale, Shift) evolved from Fs (reference
    codes/style_transformer.py:1229-1245 — the encoder consumes only the
    style stream). Deterministic (eval) only. Pair with
    style_transformer_apply_from_stream, which must see the SAME cfg (the
    stream layout is windowed iff the windowed fast path is eligible)."""
    if _st_windowed_ok(cfg, True):
        return style_stream_windowed(params, Fs, cfg, k=int(k))
    Key, Scale, Shift = Fs, Fs, Fs
    stream = []
    for _ in range(int(k)):
        Key, Scale, Shift = style_encoder_apply(
            params["encoder"], Key, Scale, Shift, cfg,
            deterministic=True, rng=None)
        stream.append((Key, Scale, Shift))
    return stream


@applies_matmul_mode
def style_transformer_apply_from_stream(params: dict, Fc: jnp.ndarray,
                                        stream,
                                        cfg: StyleTransformerConfig
                                        ) -> jnp.ndarray:
    """Decode Fc against a precomputed style stream
    (style_transformer_stream with the same cfg). A batch-1 stream
    broadcasts over any content batch (style-locked serving)."""
    if _st_windowed_ok(cfg, True):
        return style_apply_windowed_from_stream(params, Fc, stream, cfg)

    if len(stream) and stream[0][0].shape[1:3] != Fc.shape[1:3]:
        raise ValueError(
            f"style stream feature size {stream[0][0].shape[1:3]} does not "
            f"match content features {Fc.shape[1:3]}")
    bc = Fc.shape[0]
    for Key, Scale, Shift in stream:
        Fc = style_decoder_apply(
            params["decoder"], Fc, _bcast_stream_batch(Key, bc),
            _bcast_stream_batch(Scale, bc), _bcast_stream_batch(Shift, bc),
            cfg, deterministic=True, rng=None)
    return Fc
