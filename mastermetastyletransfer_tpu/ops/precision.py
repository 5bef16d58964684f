"""In-kernel matmul precision modes for the Pallas fast paths.

Why this exists: the accuracy-compliant (<=1e-3 per-pixel MAE) operating
point must not run f32 matmuls at the TPU's DEFAULT precision (a single
bf16 MXU pass, ~1.2e-2 rel error on the full model — PERF.md "Joint
operating points"). XLA offers 'high' (3-pass bf16 decomposition, 1.2e-4
rel) and 'highest' (6-pass, ~2e-6), but **Mosaic only lowers HIGHEST
in-kernel — precision=HIGH is rejected, explicit OR ambient
("NotImplementedError: Unsupported dot precision: HIGH", measured on
hardware — scripts/probe_split3.py)**. So the compliant Pallas point has
been paying the full 6-pass cost per matmul.

`kdot` closes that gap with a MANUAL 3-pass hi/lo split, algebraically
the same decomposition XLA's 'high' uses:

    a ~= a_hi + a_lo   (a_hi = rn_bf16(a); a_lo = rn_bf16(a - a_hi))
    a @ b  ~=  a_hi@b_hi + a_hi@b_lo + a_lo@b_hi     (f32 accumulation)

This is the standard bf16x3 split: the residual a_lo is itself
bf16-ROUNDED (keeping ~16 of f32's 24 mantissa bits per operand, not an
exact residual), and the a_lo@b_lo term is dropped — both effects are
O(2^-16) relative, the same error class as XLA's 'high'. Measured 4.4e-6
rel MAE vs a float64 oracle at model shapes — better than XLA 'high'
(1.3e-5) because Mosaic accumulates the three passes in f32 VMEM
(scripts/probe_split3.py).

Mode transport: a trace-time ContextVar. The model apply entry points
carry an `applies_matmul_mode` decorator that sets it from
`cfg.matmul_mode` for the duration of the call; since every jitted
caller passes cfg as a static argument, the mode is part of the compile
cache identity (a different cfg re-traces and re-reads the var — no
stale-cache hazard). Tests and probes can use `matmul_mode(...)`
directly around kernel calls.

Scope: every FORWARD Pallas kernel — the custom-vjp wrappers
(pallas_*_vjp.py) reuse the converted forwards (fused_window_attention,
fused_ln_mlp_residual), so inference is covered end to end. The
hand-written BACKWARD kernels keep plain dots: training precision policy
is bf16 (PERF.md train bench), and under an ambient 'high' those dots
would hit the Mosaic reject above — bench.py refuses
`--mode train --matmul_mode split3`; keep compliant-accuracy TRAINING on
the XLA path under jax.default_matmul_precision instead.

Modes:
  "native"  — status quo: plain dot inheriting the ambient
              jax.default_matmul_precision (bf16 inputs: one MXU pass;
              f32 inputs under ambient 'highest': 6-pass).
  "split3"  — f32 x f32 dots run the 3-pass hi/lo split above; non-f32
              dots run a single pass. All passes carry an EXPLICIT
              DEFAULT precision so an ambient 'high' (set for the XLA
              parts of the model) never reaches a Mosaic dot.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import inspect

import jax
import jax.numpy as jnp

_MODE = contextvars.ContextVar("kernel_matmul_mode", default="native")


@contextlib.contextmanager
def matmul_mode(mode: str):
    """Set the in-kernel matmul mode for code traced inside the block."""
    if mode not in ("native", "split3"):
        raise ValueError(f"unknown matmul mode {mode!r}")
    tok = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(tok)


def applies_matmul_mode(fn):
    """Decorator for model apply entry points: reads `cfg.matmul_mode`
    (default 'native') from the wrapped function's `cfg` argument and pins
    it for the duration of the (trace-time) call."""
    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        cfg = bound.arguments.get("cfg")
        mode = getattr(cfg, "matmul_mode", "native")
        with matmul_mode(mode):
            return fn(*args, **kwargs)

    return wrapper


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def kdot(a, b, dimension_numbers=None, preferred_element_type=jnp.float32):
    """Mode-aware matmul for Pallas kernel bodies.

    Drop-in for `jnp.dot(a, b, preferred_element_type=...)` (leave
    `dimension_numbers=None`) and for `lax.dot_general` (pass them).
    In 'native' mode this is EXACTLY the plain dot (ambient precision);
    in 'split3' mode f32 operands run the 3-pass bf16 hi/lo split with
    f32 accumulation.
    """
    if dimension_numbers is None:
        dimension_numbers = (((a.ndim - 1,), (0,)), ((), ()))

    def dg(x, y, precision=None):
        return jax.lax.dot_general(
            x, y, dimension_numbers,
            preferred_element_type=preferred_element_type,
            precision=precision)

    if _MODE.get() != "split3":
        return dg(a, b)
    p = jax.lax.Precision.DEFAULT  # shield Mosaic from an ambient 'high'
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        return dg(a, b, precision=p)
    a_hi, a_lo = _split_hi_lo(a)
    b_hi, b_lo = _split_hi_lo(b)
    return (dg(a_hi, b_hi, precision=p)
            + dg(a_hi, b_lo, precision=p)
            + dg(a_lo, b_hi, precision=p))
