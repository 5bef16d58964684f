"""High-level inference API: zero-shot stylization, batched sweeps, and the
style-lambda control sweep.

BASELINE.json config #2 ("batched zero-shot inference with style-lambda
control sweep (lambda=2,4) at 512x512"): in the reference, lambda selects a
*checkpoint* (test/pretrained_weights/pretrained_model_lambda_is_{2,4}.pt) —
the sweep is the same architecture under multiple parameter sets. TPU-native,
that is one vmap over a stacked param pytree: XLA batches every matmul across
the lambda axis, so an N-lambda sweep costs far less than N serial runs.

Dynamic input sizes are handled with compile-size buckets (the reference pads
arbitrary H,W at runtime, codes/style_transformer.py:77-87; jit wants static
shapes, so we pad to the nearest bucket and crop the output back).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models.master import master_apply

DEFAULT_BUCKETS = (256, 512, 1024)


def pick_bucket(h: int, w: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket covering max(h, w) (largest bucket if none covers)."""
    m = max(h, w)
    for b in sorted(buckets):
        if m <= b:
            return b
    return max(buckets)


@functools.partial(jax.jit, static_argnames=("cfg", "k", "out_h", "out_w"))
def _stylize_jit(params, content, style, cfg: ModelConfig, k: int,
                 out_h: int, out_w: int):
    out = master_apply(params, content, style, cfg, k=k, deterministic=True)
    return out[:, :out_h, :out_w, :]


def stylize(params, content: jnp.ndarray, style: jnp.ndarray,
            cfg: ModelConfig, *, k: int = 1,
            buckets: Sequence[int] = DEFAULT_BUCKETS) -> jnp.ndarray:
    """Stylize NHWC [0,1]-or-normalized batches of any size via size buckets.

    content/style: (B, H, W, 3). Returns (B, H, W, 3) at the content size.
    One compile per (bucket, k) — repeat sizes hit the jit cache.
    """
    b, h, w, _ = content.shape
    size = pick_bucket(h, w, buckets)

    def pad_to(x, s):
        # reflect-pad (edge content beats zeros for style statistics);
        # reflect requires pad <= dim-1, so extreme aspect ratios (e.g.
        # 100x512 -> bucket 512) pad in repeated stages, each bounded by the
        # current dim (shapes are concrete here — the loop runs outside jit).
        _, xh, xw, _ = x.shape
        while xh < s or xw < s:
            ph = min(s - xh, max(xh - 1, 0))
            pw = min(s - xw, max(xw - 1, 0))
            if ph == 0 and pw == 0:  # degenerate 1-pixel dim
                return jnp.pad(x, ((0, 0), (0, s - xh), (0, s - xw), (0, 0)),
                               mode="edge")
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            xh, xw = xh + ph, xw + pw
        return x

    content_p = pad_to(content, size)
    style_p = pad_to(style, size)
    return _stylize_jit(params, content_p, style_p, cfg, k, h, w)


def make_lambda_sweep_fn(cfg: ModelConfig, k: int = 1):
    """Jitted sweep over stacked parameter sets (the lambda axis).

    Returns fn(stacked_params, content, style) -> (L, B, H, W, 3) where
    stacked_params has an extra leading axis L on every leaf (use
    `stack_params`).
    """
    def sweep(stacked_params, content, style):
        # the vmapped graph holds L stacked live buffers around every
        # kernel, which costs scoped-VMEM headroom the 512^2-calibrated
        # budgets assume free (measured r4: the row-resident block kernel
        # scope-OOMs 16.12M/16.00M under the 2-set vmap). Halve every
        # kernel budget at trace time for deterministic fit (ops/vmem.py).
        from mastermetastyletransfer_tpu.ops.vmem import vmem_budget_scale
        with vmem_budget_scale(0.5):
            return jax.vmap(
                lambda p: master_apply(p, content, style, cfg, k=k,
                                       deterministic=True)
            )(stacked_params)
    return jax.jit(sweep)


def stack_params(param_sets: List[dict]) -> dict:
    """Stack N compatible param pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *param_sets)


def lambda_sweep(param_sets: Dict[float, dict], content: jnp.ndarray,
                 style: jnp.ndarray, cfg: ModelConfig, *,
                 k: int = 1) -> Dict[float, np.ndarray]:
    """Run the lambda control sweep: {lambda: params} -> {lambda: stylized}."""
    lams = sorted(param_sets)
    stacked = stack_params([param_sets[l] for l in lams])
    fn = make_lambda_sweep_fn(cfg, k)
    outs = jax.device_get(fn(stacked, content, style))
    return {l: outs[i] for i, l in enumerate(lams)}


def interpolate_params(params_a: dict, params_b: dict, alpha: float) -> dict:
    """Continuous stylization-strength control between two checkpoints
    (e.g. the lambda=2 and lambda=4 models): (1-alpha)*a + alpha*b per leaf.
    alpha may also be a traced scalar for on-device interpolation sweeps."""
    return jax.tree_util.tree_map(
        lambda a, b: (1.0 - alpha) * a + alpha * b, params_a, params_b)


def blend_style_streams(streams: List, weights) -> object:
    """Style interpolation: convex combination of precomputed style streams
    (models.encode_style_stream), decoded with
    models.stylize_with_style_stream.

    The AdaIN paper's style-interpolation control (Huang & Belongie 2017
    sec. 7.1) realized at the stream level: each (Key, Scale, Shift)
    encoder triple is a per-style modulation program, and a weighted sum of
    programs blends the stylizations. The reference exposes no
    interpolation surface; the stream API makes it one tree-level lerp with
    zero extra device passes. Weights are normalized to sum to 1;
    weights=[1, 0, ...] reproduces stream 0 exactly."""
    ws = jnp.asarray(weights, jnp.float32)
    if ws.shape[0] != len(streams):
        raise ValueError(f"{len(streams)} streams but {ws.shape[0]} weights"
                         " — zip would silently drop the extras")
    # Validate on the HOST input when possible so the blend stays jittable
    # (weights may be a tracer when a caller sweeps them under jit). Traced
    # weights cannot raise, so normalization guards the denominator: a
    # zero-sum sweep point yields all-zero streams (visibly wrong, easy to
    # assert on) instead of silently NaN-poisoning every downstream image.
    if not isinstance(ws, jax.core.Tracer):
        total = float(np.sum(np.asarray(weights, np.float32)))
        if total == 0.0:
            raise ValueError("weights sum to zero")
    total = jnp.sum(ws)
    ws = ws / jnp.where(jnp.abs(total) > 0, total, 1.0)
    return jax.tree_util.tree_map(
        lambda *xs: sum(w * x.astype(jnp.float32)
                        for w, x in zip(ws, xs)).astype(xs[0].dtype),
        *streams)
