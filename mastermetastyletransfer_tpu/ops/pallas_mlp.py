"""Fused [LayerNorm ->] MLP -> +residual Pallas kernel.

On the remote-TPU execution path every XLA op pays a fixed dispatch/sequencing
cost (~0.1-0.15 ms measured), so the LN + fc1 + exact-erf GELU + fc2 +
residual chain (~8 HLOs) collapsing to ONE kernel is a direct wall-clock win
on top of the HBM-traffic savings. Used by every transformer block tail and
the style encoder's three per-stream MLPs
(reference math: torchvision MLP semantics, codes/style_transformer.py:366,
:839-841, :991; LN -> MLP -> +x residual at :383-396).

Dropout/stochastic-depth are identity here (eval semantics); training
differentiates through the custom-VJP wrapper (ops/pallas_mlp_vjp.py),
which reuses this forward and adds a Pallas backward kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mastermetastyletransfer_tpu.ops.precision import kdot


def _erf(x):
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation
    (|error| <= 1.5e-7) — Mosaic has no native erf lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _kernel(x_ref, n_s_ref, n_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, use_norm: bool, eps: float):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)                       # (rows, C)
    h = x
    if use_norm:
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + eps)
        h = h * n_s_ref[0].astype(f32) + n_b_ref[0].astype(f32)
    dt = x_ref.dtype
    h = h.astype(dt)
    # NOTE: weights are stored f32; cast at load or the mixed-dtype dot
    # silently promotes to an f32 matmul (~1/8 MXU peak).
    h = kdot(h, w1_ref[:].astype(dt)) + b1_ref[0].astype(f32)
    # exact-erf GELU (torch nn.GELU default; parity with torchvision MLP)
    h = 0.5 * h * (1.0 + _erf(h * (0.5 ** 0.5)))
    h = kdot(h.astype(dt), w2_ref[:].astype(dt)) + b2_ref[0].astype(f32)
    out_ref[:] = (x + h).astype(out_ref.dtype)


def _default_budget_rows(hidden: int, itemsize: int) -> int:
    """Forward row budget: 1024 rows scaled down for wide hidden dims,
    halved for f32 inputs (the (rows, hidden) f32 buffer is the VMEM
    driver). The backward kernel uses HALF of this (pallas_mlp_vjp) — it
    holds ~4 live (tile, hidden) intermediates vs the forward's 1-2.

    MMST_MLP_ROW_SCALE (float, probe knob): scales the budget — the r4
    high-res sweep lever (calibrated at 512^2 batch 8). ops/vmem's
    trace-time budget_scale composes on top (lambda-sweep vmap)."""
    from mastermetastyletransfer_tpu.ops.vmem import budget_scale
    rows = max(256, min(1024, (1 << 22) // hidden)) * 2 // itemsize
    scale = float(os.environ.get("MMST_MLP_ROW_SCALE", "1")) * budget_scale()
    return rows if scale == 1.0 else max(8, int(rows * scale) // 8 * 8)


def _rows_tile(rows: int, c: int, hidden: int,
               budget_rows: Optional[int] = None, itemsize: int = 2) -> int:
    """Row-tile size: multiple of 8 (fp32 sublane), <= budget. Prefers an
    exact divisor of `rows` (no pad); otherwise the caller pads the rows to
    a tile multiple. NEVER returns `rows` itself when it exceeds the budget
    — a (rows, 4C) f32 hidden buffer at e.g. rows=4900 OOMs the 16MB VMEM.
    Default budget: 1024 rows scaled down for wide hidden dims (measured
    2.4x faster than 512 at the style-transformer shape, roofline part_mlp;
    the (rows, hidden) f32 buffer is the VMEM driver). The budget is
    calibrated for 2-byte input streams; f32 inputs halve it (measured r3:
    tile 1024 at hidden 1024 scoped 16.95M/16M with f32 blocks)."""
    if budget_rows is None:
        budget_rows = _default_budget_rows(hidden, itemsize)
    t = min(budget_rows, rows)
    probe = t - t % 8
    while probe > 8 and rows % probe:
        probe -= 8
    if probe >= 8 and rows % probe == 0:
        return probe
    return max(8, t - t % 8)


def fused_ln_mlp_residual(x: jnp.ndarray, mlp_params: dict,
                          norm_params: Optional[dict] = None, *,
                          eps: float = 1e-5,
                          interpret: bool = False) -> jnp.ndarray:
    """y = x + fc2(gelu(fc1(LN(x)))) with LN optional. x: (..., C)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)

    w1 = mlp_params["fc1"]["kernel"]
    hidden = w1.shape[1]
    b1 = mlp_params["fc1"].get("bias")
    w2 = mlp_params["fc2"]["kernel"]
    b2 = mlp_params["fc2"].get("bias")
    b1 = jnp.zeros((1, hidden), x.dtype) if b1 is None else b1.reshape(1, hidden)
    b2 = jnp.zeros((1, c), x.dtype) if b2 is None else b2.reshape(1, c)

    use_norm = norm_params is not None
    if use_norm:
        n_s = norm_params["scale"].reshape(1, c)
        n_b = norm_params["bias"].reshape(1, c)
    else:
        n_s = jnp.ones((1, c), x.dtype)
        n_b = jnp.zeros((1, c), x.dtype)

    tile = _rows_tile(rows, c, hidden, itemsize=x.dtype.itemsize)
    pad = (-rows) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_tiles = x2.shape[0] // tile

    row_spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, use_norm=use_norm, eps=eps),
        grid=(n_tiles,),
        in_specs=[row_spec, const((1, c)), const((1, c)),
                  const((c, hidden)), const((1, hidden)),
                  const((hidden, c)), const((1, c))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, n_s, n_b, w1, b1, w2, b2)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
