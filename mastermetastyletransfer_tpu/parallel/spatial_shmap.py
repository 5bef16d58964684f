"""Band-owned spatial (context) parallelism: shard_map + explicit halos.

The GSPMD formulation (parallel/spatial.py) shards the decoder but leaves
the window stages (swin + style transformer) PARTIALLY REPLICATED — the
window-partition reshapes defeat sharding propagation (measured r4,
tests/test_distribution.py). This module is the SURVEY §2.5 CP design,
built explicitly: each device OWNS a horizontal band of the window grid
(whole window-rows), windows are embarrassingly parallel within a phase,
and the only cross-device traffic is

  * the cyclic roll of the shifted phase (reference
    codes/style_transformer.py:98-100 `torch.roll`): one `lax.ppermute` of
    the sh topmost rows to the previous neighbor (sh = 3 for the swin
    backbone, 4 for the style transformer), and its inverse un-roll;
  * band REPARTITION at stage boundaries (uniform valid bands <-> padded
    window-aligned bands): a static chain of neighbor `ppermute`s +
    a dynamic slice (window-row counts rarely divide the device count, so
    the window grid is padded with extra all-pad window rows — exactness
    w.r.t. the reference's minimal padding is preserved because windows
    never overlap and every image-global statistic is computed with masks
    of the REFERENCE's grid, see `_build_aux`).

Everything else — patch embed (stride-4, non-overlapping), PatchMerging
(2x2, bands stay even), LN/MLP/modulation (token-local), window attention
(window-local) — runs band-local with zero communication. The two
image-GLOBAL ops, the masked instance norms of the decoder entry and the
post-linear Key IN (reference codes/style_transformer.py:1053-1057,
:520-530), psum their statistics over the space axis.

Shift masks / validity masks are numpy constants per GLOBAL grid
(ops/windows.py), passed into shard_map as `P(space)`-sharded operands so
each device holds only its window-row slab (keeping them closure constants
would replicate the (nWh, nWw, N, N) mask tensor on every device).

Eval path only (deterministic; dropout/stochastic-depth are identity —
same envelope as the windowed fast path, _st_windowed_ok). Numerics mirror
the single-device XLA path op for op; parity is tested on the 8-device CPU
mesh (tests/test_spatial_shmap.py) and the compiled per-device memory is
audited in tests/test_distribution.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
from mastermetastyletransfer_tpu.models.master import _stage_ctx
from mastermetastyletransfer_tpu.models.swin import _block_cfg, patch_merging
from mastermetastyletransfer_tpu.ops.attention import _pallas_dim_ok
from mastermetastyletransfer_tpu.ops.mlp import linear, mlp_apply
from mastermetastyletransfer_tpu.ops.norm import layer_norm
from mastermetastyletransfer_tpu.ops.windows import (
    effective_shift,
    relative_position_bias,
    shift_attention_mask,
    valid_token_mask,
)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# band collectives
# ---------------------------------------------------------------------------

def _nbr(n: int, off: int):
    """ppermute pairs so device d receives from device (d + off) % n."""
    return [((d + off) % n, d) for d in range(n)]


def _band_roll_h(x, sh: int, axis: str, n: int):
    """Global jnp.roll(x, -sh, axis=1) on uniform H-bands: each device
    fetches the sh topmost rows of the NEXT band (the shifted-window
    halo — one window row at most)."""
    if n == 1:
        return jnp.roll(x, -sh, axis=1)
    halo = lax.ppermute(x[:, :sh], axis, _nbr(n, 1))
    return jnp.concatenate([x[:, sh:], halo], axis=1)


def _band_unroll_h(x, sh: int, axis: str, n: int):
    """Inverse of _band_roll_h (global jnp.roll(x, +sh, axis=1))."""
    if n == 1:
        return jnp.roll(x, sh, axis=1)
    halo = lax.ppermute(x[:, -sh:], axis, _nbr(n, -1))
    return jnp.concatenate([halo, x[:, :-sh]], axis=1)


def _band_repartition(x, o_rows: int, axis: str, n: int, h_valid: int):
    """Redistribute uniform H-bands of i_rows rows (global grid n*i_rows)
    into uniform bands of o_rows rows (global grid n*o_rows). Output rows
    with global index >= h_valid come back ZERO (window padding). Used at
    stage boundaries: valid grid -> padded window-aligned grid and back.

    The neighbor offsets each device needs are computed statically (python
    ints); every offset becomes one ppermute of a full band, the receiver
    dynamic-slices its o_rows window out of the gathered slab (start offset
    depends on lax.axis_index — traced, shape static)."""
    b, i_rows, w, c = x.shape
    if n == 1:
        if o_rows > i_rows:
            out = jnp.pad(x, ((0, 0), (0, o_rows - i_rows), (0, 0), (0, 0)))
        else:
            out = x[:, :o_rows]
        if h_valid < o_rows:
            keep = (jnp.arange(o_rows) < h_valid)[None, :, None, None]
            out = jnp.where(keep, out, 0).astype(x.dtype)
        return out

    offs = set()
    for d in range(n):
        s = o_rows * d
        offs.add(min(s // i_rows, n - 1) - d)
        offs.add(min((s + o_rows - 1) // i_rows, n - 1) - d)
    off_min, off_max = min(offs), max(offs)
    slabs = [x if off == 0 else lax.ppermute(x, axis, _nbr(n, off))
             for off in range(off_min, off_max + 1)]
    big = jnp.concatenate(slabs, axis=1)  # global rows [(d+off_min)*i, ...)
    # make sure every device's slice fits without dynamic_slice clamping
    max_start = max(o_rows * d - (d + off_min) * i_rows for d in range(n))
    deficit = max_start + o_rows - big.shape[1]
    if deficit > 0:
        big = jnp.pad(big, ((0, 0), (0, deficit), (0, 0), (0, 0)))
    d_idx = lax.axis_index(axis)
    start = o_rows * d_idx - (d_idx + off_min) * i_rows
    out = lax.dynamic_slice_in_dim(big, start, o_rows, axis=1)
    gidx = o_rows * d_idx + jnp.arange(o_rows)
    keep = (gidx < h_valid)[None, :, None, None]
    return jnp.where(keep, out, 0).astype(x.dtype)


# ---------------------------------------------------------------------------
# band-local window machinery
# ---------------------------------------------------------------------------

def _part(x, wh: int, ww: int):
    """(B, hb, Wp, C) band -> (B, nW_loc, N, C), window-row-major (matching
    the P(space)-sharded mask slabs)."""
    b, hb, wp, c = x.shape
    x = x.reshape(b, hb // wh, wh, wp // ww, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (hb // wh) * (wp // ww), wh * ww, c)


def _merge(x4, hb: int, wp: int, wh: int, ww: int):
    b, _, _, c = x4.shape
    x = x4.reshape(b, hb // wh, wp // ww, wh, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb, wp, c)


def _band_attention(q4, k4, v4s, bias, mask3, heads: int, proj):
    """Window attention on band-local windows with a TRACED mask slab.
    q4/k4/v4s: (B, nW_loc, N, C) PROJECTED streams; mask3: (nW_loc, N, N)
    or None; one softmax serves every value stream (the 2-V/dual-V sharing,
    reference codes/style_transformer.py:867-882, :547-607). Same einsum
    orders as ops/attention._attention_weights/_apply_values."""
    b, nw, nn, c = q4.shape
    dh = c // heads
    q = q4.reshape(b, nw, nn, heads, dh) * (dh ** -0.5)
    k = k4.reshape(b, nw, nn, heads, dh)
    attn = jnp.einsum("bwnhd,bwmhd->bwhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None, None].astype(attn.dtype)
    if mask3 is not None:
        attn = attn + mask3[None, :, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    outs = []
    for v4 in v4s:
        v = v4.reshape(b, nw, nn, heads, dh)
        o = jnp.einsum("bwhnm,bwmhd->bwnhd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        outs.append(linear(proj, o.reshape(b, nw, nn, c).astype(v4.dtype)))
    return outs


def _rows_kernel_ok(x, c: int, wh: int, ww: int) -> bool:
    """Hardware envelope of the row-resident kernel inside a band (same
    gates as ops/attention.fused_self_attention_block): bf16 + row width
    twn*C <= 256k elements; interpret mode (CPU tests) has no VMEM limit."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        _pallas_interpret,
    )
    twn_c = (x.shape[2] // ww) * ww * wh * c  # nww * N * C
    return _pallas_interpret() or (x.dtype == jnp.bfloat16
                                   and twn_c <= 262144)


def _band_swin_block_pallas(bp, x, acfg, bias, mask_slab, pm2,
                            sh: int, sw: int, axis: str, n: int):
    """Row-resident fused whole-block kernel on a band: the H-roll becomes
    the ppermute halo (the kernel's in-index-map roll is cyclic over ITS
    array, which would wrap within the band), the W-roll stays in-kernel,
    and the mask/padmask slabs are TRACED per-device operands (r5 support
    in ops/pallas_attention)."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        _pallas_interpret,
    )
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_window_block_rows,
    )
    if sh:
        x = _band_roll_h(x, sh, axis, n)
    out = fused_window_block_rows(
        bp["attn"], x, bias, mask_slab if (sh or sw) else None,
        acfg.num_heads, bp["mlp"], bp.get("norm2"), bp.get("norm1"),
        pm2, window=acfg.window_size, shift=(0, sw),
        interpret=_pallas_interpret())
    if sw:
        out = jnp.roll(out, sw, axis=2)
    if sh:
        out = _band_unroll_h(out, sh, axis, n)
    return out


def _band_swin_block(bp, x, acfg, bias, mask3, pm2, sh: int, sw: int,
                     axis: str, n: int):
    """One full swin self-attention block on a padded-resident band
    (LN1 -> zero pad tokens -> qkv -> window attention -> +res -> LN2 ->
    MLP -> +res; reference codes/style_transformer.py:303-398 with
    use_norm, q=k=v). Shifted blocks roll H via the ppermute halo and W
    locally; the output is un-rolled before returning, so the band frame
    stays plain. pm2: (nW_loc, N) validity slab (zeroes the LN view of pad
    tokens AND of any garbage in pad rows of the padded-resident stage —
    same contract as the fused kernel's valid_token_mask)."""
    wh, ww = acfg.window_size
    xf = x
    if sh or sw:
        xf = _band_roll_h(xf, sh, axis, n) if sh else xf
        xf = jnp.roll(xf, -sw, axis=2) if sw else xf
    attn = bp["attn"]
    ln = layer_norm(xf, bp["norm1"]["scale"], bp["norm1"]["bias"])
    lw = _part(ln, wh, ww) * pm2[None, :, :, None].astype(ln.dtype)
    q = linear(attn["wq"], lw)
    k = linear(attn["wk"], lw)
    v = linear(attn["wv"], lw)
    (a4,) = _band_attention(q, k, [v], bias, mask3, acfg.num_heads,
                            attn["proj"])
    y = xf + _merge(a4, xf.shape[1], xf.shape[2], wh, ww)
    h = layer_norm(y, bp["norm2"]["scale"], bp["norm2"]["bias"])
    y = y + mlp_apply(bp["mlp"], h)
    if sh or sw:
        y = jnp.roll(y, sw, axis=2) if sw else y
        y = _band_unroll_h(y, sh, axis, n) if sh else y
    return y


def _swin_local(sp, images, scfg, aux, meta, axis: str, n: int):
    """Swin first-2-stages on an image H-band (B, H/n, W, 3) -> feature
    band (B, H/8n, W/8, 2E). Mirrors models/swin.swin_backbone_apply
    (reference codes/utils.py:59-102), band-owned."""
    b, hb, w, cin = images.shape
    pe = sp["patch_embed"]["conv"]
    e = pe["kernel"].shape[-1]
    if scfg.patch_embed_impl == "conv":
        x = lax.conv_general_dilated(
            images, pe["kernel"].astype(images.dtype), (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + pe["bias"].astype(x.dtype)
    else:
        patches = images.reshape(b, hb // 4, 4, w // 4, 4, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hb // 4, w // 4, 16 * cin)
        wk = pe["kernel"].reshape(16 * cin, e).astype(patches.dtype)
        x = patches @ wk + pe["bias"].astype(patches.dtype)
    x = layer_norm(x, sp["patch_embed"]["norm"]["scale"],
                   sp["patch_embed"]["norm"]["bias"])

    wh, ww = scfg.window_size
    for stage in range(2):
        if stage == 1:
            x = patch_merging(sp["patch_merge"], x)
        g = meta[f"s{stage}"]
        if x.shape[2] < g["Wp"]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, g["Wp"] - x.shape[2]),
                            (0, 0)))
        x = _band_repartition(x, g["rows_loc"], axis, n, h_valid=g["hs"])
        for blk in range(scfg.depths[stage]):
            acfg = _block_cfg(scfg, stage, blk)
            shifted = blk % 2 == 1
            sh, sw = (g["sh"], g["sw"]) if shifted else (0, 0)
            bp = sp[f"stage{stage}_block{blk}"]
            bias = relative_position_bias(bp["attn"]["rel_bias_table"],
                                          wh, ww)
            nwl = (g["rows_loc"] // wh) * (g["Wp"] // ww)
            nn = wh * ww
            pm2 = aux[f"s{stage}_pm1" if shifted else f"s{stage}_pm0"]
            mask_slab = (aux[f"s{stage}_mask"] if (shifted and (sh or sw))
                         else None)
            if scfg.use_pallas and _pallas_dim_ok(acfg.dim) and \
                    _rows_kernel_ok(x, acfg.dim, wh, ww):
                x = _band_swin_block_pallas(
                    bp, x, acfg, bias, mask_slab, pm2.reshape(nwl, nn),
                    sh, sw, axis, n)
            else:
                mask3 = (mask_slab.reshape(nwl, nn, nn)
                         if mask_slab is not None else None)
                x = _band_swin_block(bp, x, acfg, bias, mask3,
                                     pm2.reshape(nwl, nn), sh, sw, axis, n)
        x = _band_repartition(x, g["hs"] // n, axis, n, h_valid=g["hs"])
        x = x[:, :, :g["ws"]]
    return x


# ---------------------------------------------------------------------------
# band-local style transformer
# ---------------------------------------------------------------------------

def _band_st_machinery(params, cfg, aux, meta, axis: str, n: int):
    """Band-owned (encoder, decoder) closures in (B, nW_loc, N, C) window
    layout — the shard_map counterpart of models/style_transformer.
    _windowed_machinery's split path, with psum'd image-global statistics.
    Reference semantics: codes/style_transformer.py:777-912 (encoder),
    :918-1128 (decoder)."""
    g = meta["st"]
    wh, ww = cfg.encoder_window_size
    nn = wh * ww
    nwl = (g["rows_loc"] // wh) * (g["Wp"] // ww)
    heads_e, heads_d = cfg.encoder_num_heads, cfg.decoder_num_heads
    f32 = jnp.float32

    mask3 = (aux["st_mask"].reshape(nwl, nn, nn)
             if (g["sh"] or g["sw"]) else None)
    pm2 = aux["st_pm"].reshape(nwl, nn)
    vm = pm2[None, :, :, None]
    refpad = aux["st_refpad"].reshape(nwl, nn)[None, :, :, None]
    count = g["count"]
    count_ref = g["count_ref"]

    # Fused-kernel closures (traced mask/padmask slabs — r5 support in
    # ops/pallas_attention): same kernels as the single-device windowed
    # machinery, per-device. The image-global INs stay outside (psum'd).
    from mastermetastyletransfer_tpu.models.style_transformer import (
        _pallas_interpret,
    )
    use_pallas = cfg.use_pallas and _pallas_dim_ok(cfg.encoder_dim)
    interp = _pallas_interpret()

    def _fused_ok(x4):
        # f32 iteration-fusion kernels exceed the 16 MB scoped VMEM on
        # hardware (PERF.md fuse_iteration gate); interpret mode has no
        # limit and keeps CPU tests exercising the fused path.
        return use_pallas and (interp or x4.dtype == jnp.bfloat16)

    def zp(x4):
        return x4 * vm.astype(x4.dtype)

    def _psum_in(x4, mask, cnt, scale=None, bias=None, eps=1e-5):
        """Masked instance norm with cross-band (psum) statistics —
        numerics of _masked_instance_norm at the global grid."""
        xf = x4.astype(f32) * mask
        mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / cnt
        var = lax.psum(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True),
                       axis) / cnt - jnp.square(mean)
        y = (x4.astype(f32) - mean) * (var + eps) ** -0.5
        if scale is not None:
            y = y * scale.astype(f32)
        if bias is not None:
            y = y + bias.astype(f32)
        return y.astype(x4.dtype)

    enc = params["encoder"]
    dec = params["decoder"]
    e_attn = enc["shared_mha"]["attn"]
    bias_e = relative_position_bias(e_attn["rel_bias_table"], wh, ww)

    n1p = enc["shared_mha"].get("norm1") if cfg.encoder_use_norm else None
    if n1p is not None:
        ln_e = lambda t: layer_norm(t, n1p["scale"], n1p["bias"])  # noqa: E731
    else:
        ln_e = lambda t: t  # noqa: E731

    def enc_key_block(Key):
        if _fused_ok(Key):
            from mastermetastyletransfer_tpu.ops.pallas_attention import (
                fused_window_block,
            )
            return fused_window_block(e_attn, Key, bias_e, mask3, heads_e,
                                      enc["mlp_key"], None, n1p, pm2,
                                      interpret=interp)
        x = zp(ln_e(Key))
        q = linear(e_attn["wq"], x)
        kk = linear(e_attn["wk"], x)
        v = linear(e_attn["wv"], x)
        (a,) = _band_attention(q, kk, [v], bias_e, mask3, heads_e,
                               e_attn["proj"])
        Key = Key + a
        return Key + mlp_apply(enc["mlp_key"], Key)

    def enc_scale_shift(Key, Scale, Shift):
        if _fused_ok(Key):
            from mastermetastyletransfer_tpu.ops.pallas_attention import (
                fused_encoder_scale_shift,
            )
            return fused_encoder_scale_shift(
                e_attn, Key, Scale, Shift, bias_e, mask3, heads_e,
                enc["mlp_scale"], enc["mlp_shift"], n1p, pm2,
                interpret=interp)
        qk = zp(ln_e(Key))
        q = linear(e_attn["wq"], qk)
        kk = linear(e_attn["wk"], qk)
        v1 = linear(e_attn["wv"], zp(ln_e(Scale)))
        v2 = linear(e_attn["wv"], zp(ln_e(Shift)))
        a1, a2 = _band_attention(q, kk, [v1, v2], bias_e, mask3, heads_e,
                                 e_attn["proj"])
        Scale = Scale + a1
        Scale = Scale + mlp_apply(enc["mlp_scale"], Scale)
        Shift = Shift + a2
        Shift = Shift + mlp_apply(enc["mlp_shift"], Shift)
        return Scale, Shift

    def encoder(Key, Scale, Shift):
        if cfg.encoder_if_use_processed_Key_in_Scale_and_Shift_calculation:
            Key = enc_key_block(Key)
            Scale, Shift = enc_scale_shift(Key, Scale, Shift)
        else:
            Scale, Shift = enc_scale_shift(Key, Scale, Shift)
            Key = enc_key_block(Key)
        return Key, Scale, Shift

    d_self = dec["self_mha"]
    bias_self = relative_position_bias(d_self["attn"]["rel_bias_table"],
                                       wh, ww)
    affine = cfg.decoder_use_instance_norm_with_affine

    def _in_masked(x4, which):
        aff = dec.get(which) if affine else None
        return _psum_in(x4, vm, count,
                        scale=None if aff is None else aff["scale"],
                        bias=None if aff is None else aff["bias"])

    def dec_self_block(Fcs):
        if (_fused_ok(Fcs)
                and not cfg.decoder_exclude_MLP_after_Fcs_self_MHA):
            from mastermetastyletransfer_tpu.ops.pallas_attention import (
                fused_window_block,
            )
            return fused_window_block(
                d_self["attn"], Fcs, bias_self, mask3, heads_d,
                d_self["mlp"],
                d_self.get("norm2") if cfg.decoder_use_norm else None,
                d_self.get("norm1") if cfg.decoder_use_norm else None,
                pm2, interpret=interp)
        sa = d_self["attn"]
        if cfg.decoder_use_norm:
            x = layer_norm(Fcs, d_self["norm1"]["scale"],
                           d_self["norm1"]["bias"])
        else:
            x = Fcs
        x = zp(x)
        q = linear(sa["wq"], x)
        kk = linear(sa["wk"], x)
        v = linear(sa["wv"], x)
        (a,) = _band_attention(q, kk, [v], bias_self, mask3, heads_d,
                               sa["proj"])
        y = Fcs + a
        if cfg.decoder_exclude_MLP_after_Fcs_self_MHA:
            return y
        if cfg.decoder_use_norm:
            h = layer_norm(y, d_self["norm2"]["scale"],
                           d_self["norm2"]["bias"])
        else:
            h = y
        return y + mlp_apply(d_self["mlp"], h)

    d_dual = dec["dual_mha"]
    bias_dual = relative_position_bias(d_dual["rel_bias_table"], wh, ww)

    def decoder(Fcs, Key, Scale, Shift):
        Query = dec_self_block(Fcs)
        Query_IN = _in_masked(Query, "in_q")
        Key_IN = _in_masked(Key, "in_k")
        q = zp(_in_masked(Query_IN, "in_q"))
        if cfg.decoder_use_Key_instance_norm_after_linear_transformation:
            kk = linear(d_dual["wk"], zp(Key_IN))
            # post-linear IN over the REFERENCE's padded grid (pad tokens
            # carry exactly the wk bias): our grid holds extra all-pad
            # window rows, so the statistics use the refpad mask + the
            # reference grid's token count — exact parity with
            # instance_norm over the minimal padded grid
            # (codes/style_transformer.py:520-530).
            aff_k = dec.get("in_k") if affine else None
            kk = _psum_in(kk, refpad, count_ref,
                          scale=None if aff_k is None else aff_k["scale"],
                          bias=None if aff_k is None else aff_k["bias"])
        else:
            kk = linear(d_dual["wk"], zp(_in_masked(Key_IN, "in_k")))
        if _fused_ok(Query):
            from mastermetastyletransfer_tpu.ops.pallas_attention import (
                fused_decoder_tail,
            )
            return fused_decoder_tail(
                d_dual, q, kk, Scale, Shift, Query, bias_dual, mask3,
                heads_d, dec["last_mlp"], pm2, interpret=interp)
        v1 = linear(d_dual["wv_scale"], zp(Scale))
        v2 = linear(d_dual["wv_shift"], zp(Shift))
        sigma, mu = _band_attention(q, kk, [v1, v2], bias_dual, mask3,
                                    heads_d, d_dual["proj"])
        out = Query * sigma + mu
        return out + mlp_apply(dec["last_mlp"], out)

    return encoder, decoder


def _st_local(params, fc, fs, cfg, aux, meta, axis: str, n: int, k: int):
    """Style transformer on uniform feature bands (B, h2/n, w2, C):
    pad/roll/partition ONCE (the windowed fast-path structure,
    style_transformer_apply_windowed), run the k iterations band-local,
    merge/unroll/unpad once."""
    g = meta["st"]
    wh, ww = cfg.encoder_window_size

    def to_windows(x):
        if x.shape[2] < g["Wp"]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, g["Wp"] - x.shape[2]),
                            (0, 0)))
        x = _band_repartition(x, g["rows_loc"], axis, n, h_valid=g["hs"])
        if g["sh"]:
            x = _band_roll_h(x, g["sh"], axis, n)
        if g["sw"]:
            x = jnp.roll(x, -g["sw"], axis=2)
        return _part(x, wh, ww)

    fc4, fs4 = to_windows(fc), to_windows(fs)
    encoder, decoder = _band_st_machinery(params, cfg, aux, meta, axis, n)
    Key = Scale = Shift = fs4
    Fcs = fc4
    for _ in range(int(k)):
        Key, Scale, Shift = encoder(Key, Scale, Shift)
        Fcs = decoder(Fcs, Key, Scale, Shift)

    x = _merge(Fcs, g["rows_loc"], g["Wp"], wh, ww)
    if g["sw"]:
        x = jnp.roll(x, g["sw"], axis=2)
    if g["sh"]:
        x = _band_unroll_h(x, g["sh"], axis, n)
    x = _band_repartition(x, g["hs"] // n, axis, n, h_valid=g["hs"])
    return x[:, :, :g["ws"]]


# ---------------------------------------------------------------------------
# mask/geometry construction + the public API
# ---------------------------------------------------------------------------

def _grid_meta(hs: int, ws: int, wh: int, ww: int, shift, n: int):
    nww = -(-ws // ww)
    wp = nww * ww
    nwh = -(-hs // wh)
    nwh_pad = _ceil_to(nwh, n)
    pad_h = nwh_pad * wh
    sh, sw = effective_shift(pad_h, wp, (wh, ww), shift)
    return dict(hs=hs, ws=ws, Wp=wp, nww=nww, nwh_pad=nwh_pad, pad_h=pad_h,
                pad_h_ref=nwh * wh, sh=sh, sw=sw, rows_loc=pad_h // n)


def _shift_mask_refgrid(g, wh: int, ww: int) -> np.ndarray:
    """Shifted-phase attention mask on the band grid, exact w.r.t. the
    reference's MINIMAL padded grid. The band grid pads the window-row
    count up to the device count with extra all-pad rows; for UNSHIFTED
    blocks that is invisible (the reference pad height nWh*wh is a window
    multiple, so extra rows never share a window with reference tokens),
    but the shifted phase's cyclic roll pulls extra pad rows into the
    bottom-boundary windows, where the reference's tokens would see them
    as additional bias-carrying KEYS (reference pads participate as keys —
    ops/attention.py two_v NOTE). Keys outside the reference grid
    therefore get -1e9 (exactly excluded: the reference grid simply has no
    such tokens), on top of the standard region mask."""
    m = shift_attention_mask(g["pad_h"], g["Wp"], wh, ww, g["sh"], g["sw"])
    m = np.array(m, np.float32)
    if g["pad_h"] > g["pad_h_ref"]:
        rp = valid_token_mask(g["pad_h_ref"], g["Wp"], g["pad_h"], g["Wp"],
                              wh, ww, g["sh"], g["sw"])
        m = m + np.where(rp == 0.0, np.float32(-1e9),
                         np.float32(0.0))[:, None, :]
    return m


def _build_aux(H: int, W: int, cfg: ModelConfig, n: int):
    """Static geometry (meta: python ints) + mask arrays (aux) with their
    shard_map PartitionSpecs (specs). Mask arrays lead with the window-row
    axis so P(space) hands each device exactly its slab."""
    meta, aux, specs = {}, {}, {}
    scfg = cfg.swin
    wh, ww = scfg.window_size
    for stage in (0, 1):
        hs, ws = H // (4 * 2 ** stage), W // (4 * 2 ** stage)
        g = _grid_meta(hs, ws, wh, ww, (wh // 2, ww // 2), n)
        meta[f"s{stage}"] = g
        nn = wh * ww
        aux[f"s{stage}_pm0"] = jnp.asarray(valid_token_mask(
            hs, ws, g["pad_h"], g["Wp"], wh, ww, 0, 0).reshape(
                g["nwh_pad"], g["nww"], nn))
        specs[f"s{stage}_pm0"] = P("space", None, None)
        aux[f"s{stage}_pm1"] = jnp.asarray(valid_token_mask(
            hs, ws, g["pad_h"], g["Wp"], wh, ww, g["sh"], g["sw"]).reshape(
                g["nwh_pad"], g["nww"], nn))
        specs[f"s{stage}_pm1"] = P("space", None, None)
        if g["sh"] or g["sw"]:
            aux[f"s{stage}_mask"] = jnp.asarray(_shift_mask_refgrid(
                g, wh, ww).reshape(g["nwh_pad"], g["nww"], nn, nn))
            specs[f"s{stage}_mask"] = P("space", None, None, None)

    tcfg = cfg.transformer
    twh, tww = tcfg.encoder_window_size
    h2, w2 = H // 8, W // 8
    g = _grid_meta(h2, w2, twh, tww, tcfg.encoder_shift_size, n)
    g["count"] = float(h2 * w2)
    g["count_ref"] = float(g["pad_h_ref"] * g["Wp"])
    meta["st"] = g
    nn = twh * tww
    aux["st_pm"] = jnp.asarray(valid_token_mask(
        h2, w2, g["pad_h"], g["Wp"], twh, tww, g["sh"], g["sw"]).reshape(
            g["nwh_pad"], g["nww"], nn))
    specs["st_pm"] = P("space", None, None)
    aux["st_refpad"] = jnp.asarray(valid_token_mask(
        g["pad_h_ref"], g["Wp"], g["pad_h"], g["Wp"], twh, tww,
        g["sh"], g["sw"]).reshape(g["nwh_pad"], g["nww"], nn))
    specs["st_refpad"] = P("space", None, None)
    if g["sh"] or g["sw"]:
        aux["st_mask"] = jnp.asarray(_shift_mask_refgrid(
            g, twh, tww).reshape(g["nwh_pad"], g["nww"], nn, nn))
        specs["st_mask"] = P("space", None, None, None)
    return aux, specs, meta


def spatial_shmap_unsupported(cfg: ModelConfig, H: int, W: int,
                              n: int) -> Optional[str]:
    """Reason this (config, shape, device-count) cannot run the band-owned
    path, or None. Same support envelope as the windowed fast path (one
    shared window geometry) plus band-divisibility."""
    t = cfg.transformer
    if t.decoder_use_regular_MHA_instead_of_Swin_at_the_end:
        return "regular-MHA decoder tail is global attention (not banded)"
    if (t.encoder_window_size != t.decoder_window_size
            or t.encoder_shift_size != t.decoder_shift_size
            or t.encoder_dim != t.decoder_dim):
        return "encoder/decoder window geometries differ"
    if H % 8 or W % 8:
        return f"H, W must be multiples of 8 (patch embed + merge): {H}x{W}"
    if (H // 4) % n or (H // 8) % n:
        return f"token rows must divide the space axis: H={H}, n={n}"
    if (H // (4 * n)) % 2:
        return "per-band stage-1 rows must be even for PatchMerging"
    return None


def _stylize_features_local(params, content, style, aux, *, cfg, k, n, axis,
                            meta):
    """Per-device body: swin (content+style batched) + style transformer on
    H-bands. Returns the feature band for the CNN decoder."""
    sd = jnp.dtype(cfg.stage_dtype("swin"))
    b = content.shape[0]
    both = jnp.concatenate([content.astype(sd), style.astype(sd)], axis=0)
    with _stage_ctx(cfg, "swin"):
        feats = _swin_local(params["swin"], both, cfg.swin, aux, meta,
                            axis, n)
    td = jnp.dtype(cfg.stage_dtype("transformer"))
    fc, fs = feats[:b].astype(td), feats[b:].astype(td)
    with _stage_ctx(cfg, "transformer"):
        fcs = _st_local(params["style_transformer"], fc, fs,
                        cfg.transformer, aux, meta, axis, n, k)
    return fcs


def make_spatial_stylize_shmap(cfg: ModelConfig, mesh: Mesh, *, k: int = 1,
                               space_axis: str = "space",
                               data_axis: Optional[str] = None):
    """Jitted band-owned spatial stylize: images H-sharded over the mesh's
    space axis (and optionally batch-sharded over data_axis). swin + style
    transformer run inside shard_map with explicit halos; the CNN decoder
    runs its plain GSPMD-shardable formulation (the measured-0.19x path,
    parallel/spatial.py docstring) under the same sharding."""
    n = mesh.shape[space_axis]
    # The decoder swaps to its plain resize+conv formulation ONLY when the
    # mesh actually splits space: the phase-space interleave reshapes defeat
    # GSPMD sharding (parallel/spatial.py), but on a 1-device mesh there is
    # nothing to shard and the phase+Pallas decoder is strictly faster
    # (measured r5: 41.4 vs 60.5 imgs/s at 1024^2 with the plain decoder).
    ccfg = cfg
    if n > 1:
        ccfg = cfg.replace(decoder=cfg.decoder.replace(
            fuse_upsample=False, use_stencil_conv=False, use_pallas=False))
    img_spec = P(data_axis, space_axis, None, None)
    img_s = NamedSharding(mesh, img_spec)
    rep = NamedSharding(mesh, P())

    def fn(params, content, style):
        _, H, W, _ = content.shape
        bad = spatial_shmap_unsupported(ccfg, H, W, n)
        if bad:
            raise ValueError(f"spatial shard_map path unsupported: {bad}")
        aux, specs, meta = _build_aux(H, W, ccfg, n)
        local = functools.partial(_stylize_features_local, cfg=ccfg, k=k,
                                  n=n, axis=space_axis, meta=meta)
        # check_vma=False: pallas_call inside shard_map has no way to
        # declare its outputs' varying-mesh-axes (jax 0.9 requires a `vma`
        # on out_shape otherwise); the specs above pin the data movement.
        fcs = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), img_spec, img_spec, specs),
            out_specs=img_spec, check_vma=False)(params, content, style, aux)
        dd = jnp.dtype(ccfg.stage_dtype("decoder"))
        with _stage_ctx(ccfg, "decoder"):
            out = cnn_decoder_apply(params["decoder"], fcs.astype(dd),
                                    ccfg.decoder)
        return out.astype(jnp.float32)

    return jax.jit(fn, in_shardings=(rep, img_s, img_s), out_shardings=img_s)
