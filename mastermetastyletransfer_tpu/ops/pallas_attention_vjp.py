"""Custom VJP for the fused single-V window-attention kernel.

Forward: ops/pallas_attention.fused_window_attention (projections + bias +
mask + softmax + value matmul + output projection in one pass). Backward:
a Pallas kernel over the same (B, nT) tile grid that recomputes the forward
intermediates flash-style (residuals = the raw window inputs only) and emits
input grads per tile plus weight/bias/relative-bias grads accumulated across
sequential grid steps.

Math per head h (S = (q*s) k^T + bias + mask, P = softmax(S), o = P v,
out = sum_h o_h Wp_h + bp):
    dO_h = G Wp_h^T ; dWp_h = o_h^T G ; dbp = sum G
    dP = dO_h v_h^T ; dv_h = P^T dO_h
    dS = P * (dP - rowsum(dP * P))           (softmax backward)
    dq_h = s * dS k_h ; dk_h = s * dS^T q_h ; dbias_h += dS
    dq/dk/dv lanes concatenate across heads; then
    dX = d{q,k,v} W^T ; dW = X^T d{q,k,v} ; db = sum d{q,k,v}

The relative-position bias enters as the block-diagonal expanded (H, TWN,
TWN) tensor; its grad is accumulated in that form and contracted back to
(H, N, N) outside the kernel (the gather into the learned table is XLA's
autodiff, outside the custom_vjp boundary).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.ops.pallas_attention import (
    _bias_big, _expand_mask, _geometry, _linb, _linw, _pad_windows,
    _pick_bsub, _specs, _tiles, _untile, fused_window_attention,
)


def _bh_dims(bsub: int):
    """dot_general dim numbers for the per-image attention math: with
    BSUB > 1 the image axis is the ONE batch dim Mosaic allows."""
    if bsub > 1:
        return ((((2,), (2,)), ((0,), (0,))),   # a @ b^T   (contract last)
                (((2,), (1,)), ((0,), (0,))))   # a @ b     (rows x rows)
    return ((((1,), (1,)), ((), ())),
            (((1,), (0,)), ((), ())))


def _tdot(a, b, bsub, ddn, f32):
    """a^T @ b per image. The r3 formulation expressed this as a batched
    dot_general contracting the MIDDLE dim of both operands
    ((((1,),(1,)),((0,),(0,)))), which SIGSEGVs the platform Mosaic
    compiler at bsub>1 (scripts/probe_bwd.py). Reformulated r4: transpose
    `a` explicitly — in-kernel sublane transposes lower fine now
    (scripts/probe_rowview.py, hardware-measured) — and contract with the
    standard rows-x-rows dims."""
    if bsub > 1:
        return jax.lax.dot_general(jnp.swapaxes(a, 1, 2), b, ddn,
                                   preferred_element_type=f32)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)


def _bwd_bsub(b: int, c: int, twn: int) -> int:
    """Image batching for the BACKWARD kernels. Default 1 (the historically
    safe point); MMST_BWD_BSUB=auto uses the forward's VMEM-budget pick
    (the bwd kernel holds ~2x the forward's live buffers), an integer
    forces that value — probe/A-B knob for the r4 transpose reformulation."""
    import os
    v = os.environ.get("MMST_BWD_BSUB", "1")
    if v == "auto":
        return _pick_bsub(b, c, 2 * twn)
    want = min(max(int(v), 1), b)
    while b % want:  # grid is (nt, b // bsub) — bsub must divide b
        want -= 1
    return want


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wp_ref,
                bias_ref, mask_ref,
                dq_ref, dk_ref, dv_ref,
                dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                dwp_ref, dbp_ref, dbias_ref,
                *, heads: int, scale: float, bsub: int):
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    first = jnp.logical_and(i == 0, j == 0)
    dt = q_ref.dtype

    from mastermetastyletransfer_tpu.ops.pallas_attention import _flat, _unflat

    x_q = _flat(q_ref)
    x_k = _flat(k_ref)
    x_v = _flat(v_ref)
    g = _flat(g_ref).astype(f32)
    rows, c = g.shape
    twn = rows // bsub
    dh = c // heads

    def proj(x, w_ref, b_ref):
        return jnp.dot(x, w_ref[:].astype(dt),
                       preferred_element_type=f32) + b_ref[0].astype(f32)

    q = proj(x_q, wq_ref, bq_ref)
    k = proj(x_k, wk_ref, bk_ref)
    v = proj(x_v, wv_ref, bv_ref)
    qs = (q * scale).astype(dt)
    q_c = q.astype(dt)
    kc = k.astype(dt)
    vc = v.astype(dt)
    gc = g.astype(dt)
    wp = wp_ref[:].astype(dt)
    mask = mask_ref[0].astype(f32)

    def img(x):
        return x.reshape(bsub, twn, -1) if bsub > 1 else x

    qs3, q3, k3, v3 = img(qs), img(q_c), img(kc), img(vc)
    ddt, ddn = _bh_dims(bsub)

    def flatten(x3):
        return x3.reshape(rows, -1) if bsub > 1 else x3

    # dO for ALL heads as one (rows, C) GEMM, then ONE full-width sublane
    # split + per-head 32-granular lane slices. The per-head form
    # (img(gc @ wp[sl,:].T)) split a NARROW (rows, dh) product —
    # vector<490x32> -> <2x245x32> is the one shape cast Mosaic rejects
    # (full-width splits, as in the forward, lower fine).
    do_all = img(jnp.dot(gc, wp.T, preferred_element_type=f32).astype(dt))

    dq_parts = []
    dk_parts = []
    dv_parts = []
    dbias_rows = []
    dwp_rows = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(qs3[..., sl], k3[..., sl], ddt,
                                preferred_element_type=f32)
        s = s + bias_ref[h].astype(f32) + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)        # (BSUB, TWN, TWN)
        pc = p.astype(dt)

        do_c = do_all[..., sl]                            # (BSUB, TWN, dh)
        o_h = jax.lax.dot_general(pc, v3[..., sl], ddn,
                                  preferred_element_type=f32)
        # shared-weight grad: sum over images AND rows -> flat 2-D GEMM
        dwp_rows.append(jnp.dot(flatten(o_h).astype(dt).T, gc,
                                preferred_element_type=f32))  # (dh, C)

        dp = jax.lax.dot_general(do_c, v3[..., sl], ddt,
                                 preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_rows.append(jnp.sum(ds, axis=0) if bsub > 1 else ds)
        ds_c = ds.astype(dt)

        dq_parts.append(flatten(scale * jax.lax.dot_general(
            ds_c, k3[..., sl], ddn, preferred_element_type=f32)))
        # dk_h = scale * dS^T q_h (q unscaled); dv_h = P^T dO_h
        dk_parts.append(flatten(
            scale * _tdot(ds_c, q3[..., sl], bsub, ddn, f32)))
        dv_parts.append(flatten(_tdot(pc, do_c, bsub, ddn, f32)))

    dq = jnp.concatenate(dq_parts, axis=-1)                   # (rows, C)
    dk = jnp.concatenate(dk_parts, axis=-1)
    dv = jnp.concatenate(dv_parts, axis=-1)
    dwp_c = jnp.concatenate(dwp_rows, axis=0)                 # (C, C)
    dbias_c = jnp.stack(dbias_rows)                           # (H, TWN, TWN)

    # back through the projections
    dxq = jnp.dot(dq.astype(dt), wq_ref[:].T.astype(dt), preferred_element_type=f32)
    dxk = jnp.dot(dk.astype(dt), wk_ref[:].T.astype(dt), preferred_element_type=f32)
    dxv = jnp.dot(dv.astype(dt), wv_ref[:].T.astype(dt), preferred_element_type=f32)
    _unflat(dxq, dq_ref)
    _unflat(dxk, dk_ref)
    _unflat(dxv, dv_ref)

    dwq_c = jnp.dot(x_q.T, dq.astype(dt), preferred_element_type=f32)
    dwk_c = jnp.dot(x_k.T, dk.astype(dt), preferred_element_type=f32)
    dwv_c = jnp.dot(x_v.T, dv.astype(dt), preferred_element_type=f32)
    dbq_c = jnp.sum(dq, axis=0, keepdims=True)
    dbk_c = jnp.sum(dk, axis=0, keepdims=True)
    dbv_c = jnp.sum(dv, axis=0, keepdims=True)
    dbp_c = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        dwq_ref[:] = dwq_c
        dbq_ref[:] = dbq_c
        dwk_ref[:] = dwk_c
        dbk_ref[:] = dbk_c
        dwv_ref[:] = dwv_c
        dbv_ref[:] = dbv_c
        dwp_ref[:] = dwp_c
        dbp_ref[:] = dbp_c
        dbias_ref[:] = dbias_c

    @pl.when(jnp.logical_not(first))
    def _():
        dwq_ref[:] += dwq_c
        dbq_ref[:] += dbq_c
        dwk_ref[:] += dwk_c
        dbk_ref[:] += dbk_c
        dwv_ref[:] += dwv_c
        dbv_ref[:] += dbv_c
        dwp_ref[:] += dwp_c
        dbp_ref[:] += dbp_c
        dbias_ref[:] += dbias_c


def _auto_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_attention(params, q, k, v, bias, mask_key, heads: int,
                     interpret=None):
    """Differentiable fused window attention. Same numerics as
    fused_window_attention; mask_key is the hashable numpy mask (or None) so
    it stays out of the differentiable arguments."""
    mask = None if mask_key is None else np.asarray(
        mask_key[1], np.float32).reshape(mask_key[0])
    return fused_window_attention(params, q, k, v, bias, mask, heads,
                                  interpret=_auto_interpret(interpret))


def _fwd(params, q, k, v, bias, mask_key, heads, interpret):
    mask = None if mask_key is None else np.asarray(
        mask_key[1], np.float32).reshape(mask_key[0])
    out = fused_window_attention(params, q, k, v, bias, mask, heads,
                                 interpret=_auto_interpret(interpret))
    return out, (params, q, k, v, bias)


def _bwd(mask_key, heads, interpret, res, g):
    params, q, k, v, bias = res
    interpret = _auto_interpret(interpret)
    b, nw, n, c = q.shape
    tw, nw_pad, nt, twn = _geometry(nw, n, 256)
    dh = c // heads

    mask = None if mask_key is None else np.asarray(
        mask_key[1], np.float32).reshape(mask_key[0])
    q4, k4, v4 = (_tiles(_pad_windows(x, nw_pad), nt) for x in (q, k, v))
    g4 = _tiles(_pad_windows(g.astype(q.dtype), nw_pad), nt)
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    # NOTE: the r3 batched (bsub>1) backward crashed the Mosaic compiler
    # (SIGSEGV, scripts/probe_bwd.py) on its middle-dim dS^T batched
    # contraction; r4 reformulated it via explicit in-kernel transposes
    # (_tdot) — compiles and runs at every train shape. Measured a WASH
    # on train throughput (126.9 vs 126.8 imgs/s, PERF.md r4 levers), so
    # the long-proven bsub=1 stays default; MMST_BWD_BSUB={auto,N} selects
    # the batched path.
    bsub = _bwd_bsub(b, c, twn)
    win, wmat, wvec, rbias, mspec = _specs(twn, c, heads, bsub)
    f32 = jnp.float32
    acc2 = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    acc3 = pl.BlockSpec((heads, twn, twn), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, heads=heads,
                             scale=(c // heads) ** -0.5, bsub=bsub)
    outs = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win, win, win, win,
                  wmat, wvec, wmat, wvec, wmat, wvec, wmat,
                  rbias, mspec],
        out_specs=(win, win, win,
                   acc2((c, c)), acc2((1, c)), acc2((c, c)), acc2((1, c)),
                   acc2((c, c)), acc2((1, c)), acc2((c, c)), acc2((1, c)),
                   acc3),
        out_shape=(jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype),
                   jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype),
                   jax.ShapeDtypeStruct((b, nt, twn, c), q.dtype),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((heads, twn, twn), f32)),
        interpret=interpret,
    )(q4, k4, v4, g4,
      _linw(params, "wq"), _linb(params, "wq", c, q.dtype),
      _linw(params, "wk"), _linb(params, "wk", c, q.dtype),
      _linw(params, "wv"), _linb(params, "wv", c, q.dtype),
      _linw(params, "proj"),
      bias_b, mask_b)

    dq4, dk4, dv4 = outs[0], outs[1], outs[2]
    dwq, dbq, dwk, dbk, dwv, dbv, dwp, dbp = outs[3:11]
    dbias_big = outs[11]

    dq = _untile(dq4, nw, n)
    dk = _untile(dk4, nw, n)
    dv = _untile(dv4, nw, n)
    # contract the block-diagonal bias grad back to (H, N, N): the bias was
    # expanded as block_diag(tw copies), so its grad is the sum over the
    # diagonal (t == t) blocks
    dbb = dbias_big.reshape(heads, tw, n, tw, n)
    dbias = jnp.einsum("htmtn->hmn", dbb).astype(bias.dtype)

    d_params = {
        "wq": {"kernel": dwq.astype(jnp.float32)},
        "wk": {"kernel": dwk.astype(jnp.float32)},
        "wv": {"kernel": dwv.astype(jnp.float32)},
        "proj": {"kernel": dwp.astype(jnp.float32)},
        # rel_bias_table grad flows through the gather OUTSIDE this vjp;
        # within this function the table is unused directly
    }
    for name, db in (("wq", dbq), ("wk", dbk), ("wv", dbv), ("proj", dbp)):
        if "bias" in params[name]:
            d_params[name]["bias"] = db[0].astype(jnp.float32)
    # params pytree must match structure: include zero grad for the table
    d_params["rel_bias_table"] = jnp.zeros_like(params["rel_bias_table"])

    return d_params, dq, dk, dv, dbias


window_attention.defvjp(_fwd, _bwd)


def _bwd_kernel_dual(q_ref, k_ref, vs_ref, vh_ref, gs_ref, gh_ref,
                     ws_ref, bs_ref, wsh_ref, bsh_ref, wp_ref,
                     bias_ref, mask_ref,
                     dq_ref, dk_ref, dvs_ref, dvh_ref,
                     dws_ref, dbs_ref, dwsh_ref, dbsh_ref,
                     dwp_ref, dbp_ref, dbias_ref,
                     *, heads: int, scale: float, bsub: int):
    """Backward for the dual-value kernel: one softmax, two value streams
    (sigma from v_scale, mu from v_shift) through the SHARED output
    projection. q/k arrive pre-projected, so their grads flow straight out;
    v_scale/v_shift projections happen in-kernel and get weight grads."""
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    first = jnp.logical_and(i == 0, j == 0)
    dt = vs_ref.dtype

    from mastermetastyletransfer_tpu.ops.pallas_attention import _flat, _unflat

    q = _flat(q_ref).astype(f32)
    k = _flat(k_ref).astype(f32)
    x_vs = _flat(vs_ref)
    x_vh = _flat(vh_ref)
    gs = _flat(gs_ref).astype(f32)
    gh = _flat(gh_ref).astype(f32)
    rows, c = q.shape
    twn = rows // bsub
    dh = c // heads

    def proj(x, w_ref, b_ref):
        return jnp.dot(x, w_ref[:].astype(dt),
                       preferred_element_type=f32) + b_ref[0].astype(f32)

    v_s = proj(x_vs, ws_ref, bs_ref)
    v_h = proj(x_vh, wsh_ref, bsh_ref)
    qs = (q * scale).astype(dt)
    q_c = q.astype(dt)
    kc = k.astype(dt)
    vsc = v_s.astype(dt)
    vhc = v_h.astype(dt)
    gsc = gs.astype(dt)
    ghc = gh.astype(dt)
    wp = wp_ref[:].astype(dt)
    mask = mask_ref[0].astype(f32)

    def img(x):
        return x.reshape(bsub, twn, -1) if bsub > 1 else x

    def flatten(x3):
        return x3.reshape(rows, -1) if bsub > 1 else x3

    qs3, q3, k3, vs3, vh3 = img(qs), img(q_c), img(kc), img(vsc), img(vhc)
    ddt, ddn = _bh_dims(bsub)

    # all-heads dO as full-width GEMMs + ONE supported full-width split
    # (see the single-V kernel note: narrow (rows, dh) splits are the one
    # shape cast Mosaic rejects).
    do_s_all = img(jnp.dot(gsc, wp.T, preferred_element_type=f32).astype(dt))
    do_h_all = img(jnp.dot(ghc, wp.T, preferred_element_type=f32).astype(dt))

    dq_parts, dk_parts, dvs_parts, dvh_parts = [], [], [], []
    dwp_rows, dbias_rows = [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(qs3[..., sl], k3[..., sl], ddt,
                                preferred_element_type=f32)
        s = s + bias_ref[h].astype(f32) + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pc = p.astype(dt)

        do_s = do_s_all[..., sl]
        do_h = do_h_all[..., sl]
        o_s = jax.lax.dot_general(pc, vs3[..., sl], ddn,
                                  preferred_element_type=f32)
        o_h = jax.lax.dot_general(pc, vh3[..., sl], ddn,
                                  preferred_element_type=f32)
        # shared projection: dWp_h = o_s^T gs + o_h^T gh
        dwp_rows.append(
            jnp.dot(flatten(o_s).astype(dt).T, gsc, preferred_element_type=f32)
            + jnp.dot(flatten(o_h).astype(dt).T, ghc,
                      preferred_element_type=f32))

        dp = (jax.lax.dot_general(do_s, vs3[..., sl], ddt,
                                  preferred_element_type=f32)
              + jax.lax.dot_general(do_h, vh3[..., sl], ddt,
                                    preferred_element_type=f32))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_rows.append(jnp.sum(ds, axis=0) if bsub > 1 else ds)
        ds_c = ds.astype(dt)

        dq_parts.append(flatten(scale * jax.lax.dot_general(
            ds_c, k3[..., sl], ddn, preferred_element_type=f32)))
        dk_parts.append(flatten(
            scale * _tdot(ds_c, q3[..., sl], bsub, ddn, f32)))
        dvs_parts.append(flatten(_tdot(pc, do_s, bsub, ddn, f32)))
        dvh_parts.append(flatten(_tdot(pc, do_h, bsub, ddn, f32)))

    dq = jnp.concatenate(dq_parts, axis=-1)
    dk = jnp.concatenate(dk_parts, axis=-1)
    dvs = jnp.concatenate(dvs_parts, axis=-1)
    dvh = jnp.concatenate(dvh_parts, axis=-1)
    dwp_c = jnp.concatenate(dwp_rows, axis=0)
    dbias_c = jnp.stack(dbias_rows)

    _unflat(dq, dq_ref)
    _unflat(dk, dk_ref)
    _unflat(jnp.dot(dvs.astype(dt), ws_ref[:].T.astype(dt),
                    preferred_element_type=f32), dvs_ref)
    _unflat(jnp.dot(dvh.astype(dt), wsh_ref[:].T.astype(dt),
                    preferred_element_type=f32), dvh_ref)

    dws_c = jnp.dot(x_vs.T, dvs.astype(dt), preferred_element_type=f32)
    dwsh_c = jnp.dot(x_vh.T, dvh.astype(dt), preferred_element_type=f32)
    dbs_c = jnp.sum(dvs, axis=0, keepdims=True)
    dbsh_c = jnp.sum(dvh, axis=0, keepdims=True)
    dbp_c = jnp.sum(gs + gh, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        dws_ref[:] = dws_c
        dbs_ref[:] = dbs_c
        dwsh_ref[:] = dwsh_c
        dbsh_ref[:] = dbsh_c
        dwp_ref[:] = dwp_c
        dbp_ref[:] = dbp_c
        dbias_ref[:] = dbias_c

    @pl.when(jnp.logical_not(first))
    def _():
        dws_ref[:] += dws_c
        dbs_ref[:] += dbs_c
        dwsh_ref[:] += dwsh_c
        dbsh_ref[:] += dbsh_c
        dwp_ref[:] += dwp_c
        dbp_ref[:] += dbp_c
        dbias_ref[:] += dbias_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def window_attention_dual(params, q, k, v_scale, v_shift, bias, mask_key,
                          heads: int, interpret=None):
    """Differentiable fused dual-value attention (q/k pre-projected; sigma
    and mu streams share one softmax and the output projection)."""
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_window_attention_dual,
    )
    mask = None if mask_key is None else np.asarray(
        mask_key[1], np.float32).reshape(mask_key[0])
    return fused_window_attention_dual(
        params, q, k, v_scale, v_shift, bias, mask, heads,
        interpret=_auto_interpret(interpret))


def _fwd_dual(params, q, k, v_scale, v_shift, bias, mask_key, heads, interpret):
    out = window_attention_dual(params, q, k, v_scale, v_shift, bias,
                                mask_key, heads, interpret)
    return out, (params, q, k, v_scale, v_shift, bias)


def _bwd_dual(mask_key, heads, interpret, res, g):
    params, q, k, v_scale, v_shift, bias = res
    g_sigma, g_mu = g
    interpret = _auto_interpret(interpret)
    b, nw, n, c = q.shape
    tw, nw_pad, nt, twn = _geometry(nw, n, 256)

    mask = None if mask_key is None else np.asarray(
        mask_key[1], np.float32).reshape(mask_key[0])
    dt = v_scale.dtype
    tiles = [_tiles(_pad_windows(x.astype(dt), nw_pad), nt)
             for x in (q, k, v_scale, v_shift, g_sigma, g_mu)]
    bias_b = _bias_big(bias, tw)
    mask_b = _expand_mask(mask, nt, tw, n, nw)

    bsub = _bwd_bsub(b, c, twn)  # see note in _bwd (r4 _tdot reformulation)
    win, wmat, wvec, rbias, mspec = _specs(twn, c, heads, bsub)
    f32 = jnp.float32
    acc2 = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    acc3 = pl.BlockSpec((heads, twn, twn), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel_dual, heads=heads,
                             scale=(c // heads) ** -0.5, bsub=bsub)
    outs = pl.pallas_call(
        kern,
        grid=(nt, b // bsub),
        in_specs=[win, win, win, win, win, win,
                  wmat, wvec, wmat, wvec, wmat,
                  rbias, mspec],
        out_specs=(win, win, win, win,
                   acc2((c, c)), acc2((1, c)), acc2((c, c)), acc2((1, c)),
                   acc2((c, c)), acc2((1, c)), acc3),
        out_shape=(jax.ShapeDtypeStruct((b, nt, twn, c), dt),
                   jax.ShapeDtypeStruct((b, nt, twn, c), dt),
                   jax.ShapeDtypeStruct((b, nt, twn, c), dt),
                   jax.ShapeDtypeStruct((b, nt, twn, c), dt),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((heads, twn, twn), f32)),
        interpret=interpret,
    )(*tiles,
      _linw(params, "wv_scale"), _linb(params, "wv_scale", c, dt),
      _linw(params, "wv_shift"), _linb(params, "wv_shift", c, dt),
      _linw(params, "proj"),
      bias_b, mask_b)

    dq = _untile(outs[0], nw, n).astype(q.dtype)
    dk = _untile(outs[1], nw, n).astype(k.dtype)
    dvs = _untile(outs[2], nw, n).astype(v_scale.dtype)
    dvh = _untile(outs[3], nw, n).astype(v_shift.dtype)
    dws, dbs, dwsh, dbsh, dwp, dbp = outs[4:10]
    dbb = outs[10].reshape(heads, tw, n, tw, n)
    dbias = jnp.einsum("htmtn->hmn", dbb).astype(bias.dtype)

    d_params = {
        "wv_scale": {"kernel": dws.astype(jnp.float32)},
        "wv_shift": {"kernel": dwsh.astype(jnp.float32)},
        "proj": {"kernel": dwp.astype(jnp.float32)},
    }
    for name, db in (("wv_scale", dbs), ("wv_shift", dbsh), ("proj", dbp)):
        if "bias" in params[name]:
            d_params[name]["bias"] = db[0].astype(jnp.float32)
    # zero grads for params this kernel doesn't touch (wk used outside, table)
    for name in params:
        if name not in d_params:
            d_params[name] = jax.tree_util.tree_map(jnp.zeros_like, params[name])
        else:
            for sub in params[name]:
                if sub not in d_params[name]:
                    d_params[name][sub] = jnp.zeros_like(params[name][sub])
    return d_params, dq, dk, dvs, dvh, dbias


window_attention_dual.defvjp(_fwd_dual, _bwd_dual)
