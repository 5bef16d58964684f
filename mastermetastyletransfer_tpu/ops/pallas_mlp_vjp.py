"""Custom VJP for the fused [LN ->] MLP -> +residual kernel.

Forward: ops/pallas_mlp.py (one VMEM pass). Backward: a Pallas kernel that
recomputes the cheap forward intermediates per row-tile (flash-style — only
the INPUT is saved as a residual) and produces dx plus weight/bias/norm
gradients, the latter accumulated across sequential grid steps into
revisited output blocks.

Math (torch exact-erf GELU):
    h = LN(x) (optional) ; a = h W1 + b1 ; z = gelu(a) ; y = x + z W2 + b2
    dz = g W2^T ; da = dz * gelu'(a),  gelu'(a) = Phi(a) + a phi(a)
    dW2 = z^T g ; db2 = sum g ; dW1 = h^T da ; db1 = sum da ; dh = da W1^T
    LN backward: dx_ln = (1/sigma) * (dhat - mean(dhat) - xhat*mean(dhat*xhat))
    with dhat = dh * scale ; dscale = sum dh*xhat ; dbias = sum dh
    dx = g + dx_ln (or g + dh when no LN)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.ops.pallas_mlp import (
    _default_budget_rows, _erf, _rows_tile, fused_ln_mlp_residual,
)

_INV_SQRT2 = 0.5 ** 0.5
_INV_SQRT2PI = 0.3989422804014327


def _bwd_kernel(x_ref, g_ref, n_s_ref, n_b_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dns_ref, dnb_ref,
                *, use_norm: bool, eps: float):
    f32 = jnp.float32
    i = pl.program_id(0)
    x = x_ref[:].astype(f32)
    g = g_ref[:].astype(f32)
    dt = x_ref.dtype

    # --- recompute forward intermediates
    if use_norm:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xhat = (x - mean) * inv
        h = xhat * n_s_ref[0].astype(f32) + n_b_ref[0].astype(f32)
    else:
        h = x
    a = jnp.dot(h.astype(dt), w1_ref[:].astype(dt),
                preferred_element_type=f32)
    a = a + b1_ref[0].astype(f32)
    phi_big = 0.5 * (1.0 + _erf(a * _INV_SQRT2))          # Phi(a)
    z = a * phi_big                                        # gelu(a)

    # --- backward
    dz = jnp.dot(g.astype(dt), w2_ref[:].T.astype(dt),
                 preferred_element_type=f32)
    dgelu = phi_big + a * _INV_SQRT2PI * jnp.exp(-0.5 * a * a)
    da = dz * dgelu
    dh = jnp.dot(da.astype(dt), w1_ref[:].T.astype(dt),
                 preferred_element_type=f32)

    dw1_c = jnp.dot(h.astype(dt).T, da.astype(dt), preferred_element_type=f32)
    db1_c = jnp.sum(da, axis=0, keepdims=True)
    dw2_c = jnp.dot(z.astype(dt).T, g.astype(dt), preferred_element_type=f32)
    db2_c = jnp.sum(g, axis=0, keepdims=True)

    if use_norm:
        dhat = dh * n_s_ref[0].astype(f32)
        m1 = jnp.mean(dhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dhat * xhat, axis=-1, keepdims=True)
        dx_ln = inv * (dhat - m1 - xhat * m2)
        dns_c = jnp.sum(dh * xhat, axis=0, keepdims=True)
        dnb_c = jnp.sum(dh, axis=0, keepdims=True)
        dx = g + dx_ln
    else:
        dns_c = jnp.zeros_like(db2_c)
        dnb_c = jnp.zeros_like(db2_c)
        dx = g + dh

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1_c.astype(dw1_ref.dtype)
        db1_ref[:] = db1_c.astype(db1_ref.dtype)
        dw2_ref[:] = dw2_c.astype(dw2_ref.dtype)
        db2_ref[:] = db2_c.astype(db2_ref.dtype)
        dns_ref[:] = dns_c.astype(dns_ref.dtype)
        dnb_ref[:] = dnb_c.astype(dnb_ref.dtype)

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1_c.astype(dw1_ref.dtype)
        db1_ref[:] += db1_c.astype(db1_ref.dtype)
        dw2_ref[:] += dw2_c.astype(dw2_ref.dtype)
        db2_ref[:] += db2_c.astype(db2_ref.dtype)
        dns_ref[:] += dns_c.astype(dns_ref.dtype)
        dnb_ref[:] += dnb_c.astype(dnb_ref.dtype)


def _run_bwd(x2, g2, n_s, n_b, w1, b1, w2, *, use_norm, eps, interpret):
    rows, c = x2.shape
    hidden = w1.shape[1]
    # The backward holds ~4 live (tile, hidden) f32 intermediates (a, z/dz,
    # da, plus the dW accumulator read-modify-write) vs the forward's 1-2,
    # so the forward's row budget sits at the scoped-VMEM edge here: at
    # tile 1024 / hidden 1024 the kernel scopes 16.12M vs the 16M limit and
    # whether it fits depends on the SURROUNDING graph's layouts (observed:
    # plain train compiled, fast_adaptation OOM'd on the identical kernel).
    # Halve the budget for deterministic headroom.
    itemsize = x2.dtype.itemsize
    tile = _rows_tile(rows, c, hidden,
                      budget_rows=_default_budget_rows(hidden, itemsize) // 2,
                      itemsize=itemsize)
    pad = (-rows) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    n_tiles = x2.shape[0] // tile

    row = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, use_norm=use_norm, eps=eps),
        grid=(n_tiles,),
        in_specs=[row, row, const((1, c)), const((1, c)),
                  const((c, hidden)), const((1, hidden)), const((hidden, c))],
        out_specs=(row, acc((c, hidden)), acc((1, hidden)),
                   acc((hidden, c)), acc((1, c)), acc((1, c)), acc((1, c))),
        out_shape=(jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                   jax.ShapeDtypeStruct((c, hidden), f32),
                   jax.ShapeDtypeStruct((1, hidden), f32),
                   jax.ShapeDtypeStruct((hidden, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)),
        interpret=interpret,
    )(x2, g2, n_s, n_b, w1, b1, w2)
    dx = outs[0]
    if pad:
        dx = dx[:rows]
    return dx, outs[1], outs[2], outs[3], outs[4], outs[5], outs[6]


def _auto_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ln_mlp_residual(x, mlp_params, norm_params, eps: float = 1e-5,
                    interpret=None):
    """Differentiable fused y = x + fc2(gelu(fc1(LN(x)))). Same numerics as
    ops/pallas_mlp.fused_ln_mlp_residual; adds a Pallas backward pass.
    interpret=None auto-selects interpreter mode off-TPU."""
    return fused_ln_mlp_residual(x, mlp_params, norm_params, eps=eps,
                                 interpret=_auto_interpret(interpret))


def _fwd(x, mlp_params, norm_params, eps, interpret):
    y = fused_ln_mlp_residual(x, mlp_params, norm_params, eps=eps,
                              interpret=_auto_interpret(interpret))
    return y, (x, mlp_params, norm_params)


def _bwd(eps, interpret, res, g):
    x, mlp_params, norm_params = res
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    g2 = g.reshape(rows, c).astype(x.dtype)

    w1 = mlp_params["fc1"]["kernel"]
    hidden = w1.shape[1]
    b1 = mlp_params["fc1"].get("bias")
    w2 = mlp_params["fc2"]["kernel"]
    b1v = jnp.zeros((1, hidden), x.dtype) if b1 is None else b1.reshape(1, hidden)
    use_norm = norm_params is not None
    if use_norm:
        n_s = norm_params["scale"].reshape(1, c)
        n_b = norm_params["bias"].reshape(1, c)
    else:
        n_s = jnp.ones((1, c), x.dtype)
        n_b = jnp.zeros((1, c), x.dtype)

    dx, dw1, db1, dw2, db2, dns, dnb = _run_bwd(
        x2, g2, n_s, n_b, w1, b1v, w2,
        use_norm=use_norm, eps=eps, interpret=_auto_interpret(interpret))

    d_mlp = {"fc1": {"kernel": dw1.astype(w1.dtype)},
             "fc2": {"kernel": dw2.astype(w2.dtype)}}
    if "bias" in mlp_params["fc1"]:
        d_mlp["fc1"]["bias"] = db1[0].astype(w1.dtype)
    if "bias" in mlp_params["fc2"]:
        d_mlp["fc2"]["bias"] = db2[0].astype(w2.dtype)
    d_norm = None
    if use_norm:
        d_norm = {"scale": dns[0].astype(norm_params["scale"].dtype),
                  "bias": dnb[0].astype(norm_params["bias"].dtype)}
    return dx.reshape(orig_shape), d_mlp, d_norm


ln_mlp_residual.defvjp(_fwd, _bwd)
