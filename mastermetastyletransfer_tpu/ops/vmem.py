"""Trace-time VMEM budget scaling for the Pallas kernels.

Why this exists: the kernels' row/BSUB budgets are calibrated for the
plain single-model graph at 512^2 (PERF.md device model, 16 MB scoped
VMEM). Whether a budget fits depends on the SURROUNDING graph: under a
vmap over stacked parameter sets (the lambda-sweep serving mode,
inference.make_lambda_sweep_fn) the row-resident block kernel scope-OOMs
at 16.12M/16.00M (r4, bench --mode sweep) — the same class of edge as the
r3 backward-MLP 16.12M case that motivated the halved bwd budget. Callers
that embed the model in a heavier graph wrap tracing in
`vmem_budget_scale(0.5)` so every kernel picks deterministically smaller
tiles instead of depending on the neighbours' allocation luck.

Transport is a trace-time ContextVar (the `applies_matmul_mode` pattern,
ops/precision.py): the scale is read while the jitted caller TRACES, and
since sweep callers are distinct jit entry points there is no
stale-cache hazard.
"""
from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

_SCALE: ContextVar[float] = ContextVar("mmst_vmem_budget_scale", default=1.0)


def budget_scale() -> float:
    """Current trace-time budget multiplier (1.0 = calibrated budgets)."""
    return _SCALE.get()


@contextmanager
def vmem_budget_scale(scale: float):
    """Scale every Pallas kernel's VMEM element budget while tracing.
    Nesting composes multiplicatively."""
    tok = _SCALE.set(scale * _SCALE.get())
    try:
        yield
    finally:
        _SCALE.reset(tok)
