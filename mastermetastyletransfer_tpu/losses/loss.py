"""Perceptual losses: IN'd content loss, mean/std style loss, optional
self-similarity loss (reference: codes/loss.py:71-336, codes/utils.py:105-133).

total = content + lambda * style, over VGG19 [relu2_1, relu3_1, relu4_1,
relu5_1] features of (content, style, output) image triplets.

Parity notes (PyTorch semantics replicated exactly):
  * content: per-layer mean |IN(Fc) - IN(Fo)| (or squared), IN = non-affine
    InstanceNorm2d (biased var, eps=1e-5) — codes/loss.py:110-116.
  * style: per-layer mean |mu(Fs)-mu(Fo)| + |sigma(Fs)-sigma(Fo)| over
    spatial dims, where sigma is torch .std = *unbiased* (Bessel) —
    codes/loss.py:122-130.
  * similarity: lower-triangle column-normalized spatial self-cosine maps on
    relu3_1 + relu4_1 — codes/utils.py:105-133. The reference passes content
    features for both sides (always 0, codes/loss.py:333-334); we implement
    the intended content-vs-output comparison behind a compat flag.
  * lambda override: the reference inverts the check so an explicitly passed
    lambda is ignored (codes/loss.py:189-190); intended behavior here +
    compat flag replicating the bug.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import LossConfig
from mastermetastyletransfer_tpu.losses.vgg import vgg19_features_apply
from mastermetastyletransfer_tpu.ops.norm import instance_norm


def _dist(x, squared: bool, per_example: bool = False):
    """Mean |x| or mean x^2; with per_example, reduce all but the leading
    (batch) axis, returning (B,)."""
    v = jnp.square(x) if squared else jnp.abs(x)
    if per_example:
        return jnp.mean(v.reshape(v.shape[0], -1), axis=1)
    return jnp.mean(v)


def content_loss(feats_content: List[jnp.ndarray], feats_output: List[jnp.ndarray],
                 distance: str = "euclidian",
                 per_example: bool = False) -> jnp.ndarray:
    """Sum over layers of mean |IN(Fc) - IN(Fo)| (reference: codes/loss.py:284-287)."""
    sq = distance == "euclidian_squared"
    total = 0.0
    for fc, fo in zip(feats_content, feats_output):
        total = total + _dist(instance_norm(fc) - instance_norm(fo), sq, per_example)
    return total


def _spatial_mean_std(f: jnp.ndarray):
    """Per-(batch, channel) mean and *unbiased* std over spatial dims of NHWC
    (torch Tensor.std([2,3]) parity: Bessel correction)."""
    b, h, w, c = f.shape
    n = h * w
    ff = f.astype(jnp.float32).reshape(b, n, c)
    mean = jnp.mean(ff, axis=1)
    var = jnp.sum(jnp.square(ff - mean[:, None, :]), axis=1) / max(n - 1, 1)
    # sqrt with a zero (not NaN/inf) gradient at var == 0: a dead ReLU channel
    # (constant feature map) otherwise poisons the whole gradient. Forward
    # value is bit-identical to jnp.sqrt(var).
    nonzero = var > 0
    std = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, var, 1.0)), 0.0)
    return mean, std


def style_loss(feats_style: List[jnp.ndarray], feats_output: List[jnp.ndarray],
               distance: str = "euclidian",
               per_example: bool = False) -> jnp.ndarray:
    """Sum over layers of mean|mu_s - mu_o| + mean|sigma_s - sigma_o|
    (reference: codes/loss.py:310-313)."""
    sq = distance == "euclidian_squared"
    total = 0.0
    for fs, fo in zip(feats_style, feats_output):
        ms, ss = _spatial_mean_std(fs)
        mo, so = _spatial_mean_std(fo)
        total = total + _dist(ms - mo, sq, per_example) + _dist(ss - so, sq, per_example)
    return total


def _scaled_self_cosine_tril(f: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Lower-triangle (k=-1) column-normalized spatial self-cosine-similarity
    map of NHWC features (reference: codes/utils.py:105-133). O(N^2) in
    tokens — the most expensive op of the loss."""
    b, h, w, c = f.shape
    n = h * w
    x = f.astype(jnp.float32).reshape(b, n, c)
    # cosine similarity between all spatial pairs (torch cosine_similarity
    # clamps the denominator at eps=1e-8)
    norms = jnp.maximum(jnp.linalg.norm(x, axis=-1), 1e-8)
    sim = jnp.einsum("bnc,bmc->bnm", x, x) / (norms[:, :, None] * norms[:, None, :])
    col_sum = sim.sum(axis=1, keepdims=True) + eps
    sim = sim / col_sum
    tril = jnp.tril(jnp.ones((n, n), jnp.float32), k=-1)
    return sim * tril


def similarity_loss(feats_a: List[jnp.ndarray], feats_b: List[jnp.ndarray],
                    distance: str = "euclidian",
                    per_example: bool = False) -> jnp.ndarray:
    """Similarity loss over relu3_1 + relu4_1 (layers 1 and 2 of the 4-slice
    list; reference: codes/loss.py:332-334)."""
    sq = distance == "euclidian_squared"
    total = 0.0
    for i in (1, 2):
        total = total + _dist(
            _scaled_self_cosine_tril(feats_a[i]) - _scaled_self_cosine_tril(feats_b[i]),
            sq, per_example)
    return total


def perceptual_loss(vgg_params: dict, content: jnp.ndarray, style: jnp.ndarray,
                    output: jnp.ndarray, cfg: LossConfig, *,
                    lambda_value: Optional[float] = None,
                    compute_similarity: bool = False,
                    per_example: bool = False) -> dict:
    """Full loss on NHWC image triplets. Returns a dict with total/content/
    style (and similarity when requested), mirroring custom_loss.forward
    (reference: codes/loss.py:176-262). With per_example, each entry is (B,)
    instead of a scalar (used by the eval grid sweep)."""
    if lambda_value is None or cfg.replicate_lambda_override_bug:
        lambda_value = cfg.default_lambda_value

    # content+style features ride ONE batched VGG pass (both are gradient-
    # free targets); the output branch runs separately so its VGG activations
    # carry gradients. Exact: VGG ops are batch-independent.
    if content.shape == style.shape:
        b = content.shape[0]
        fcs = vgg19_features_apply(
            vgg_params, jax.lax.stop_gradient(
                jnp.concatenate([content, style], axis=0)))
        fc = [f[:b] for f in fcs]
        fs = [f[b:] for f in fcs]
    else:
        fc = vgg19_features_apply(vgg_params, jax.lax.stop_gradient(content))
        fs = vgg19_features_apply(vgg_params, jax.lax.stop_gradient(style))
    fo = vgg19_features_apply(vgg_params, output)

    c_loss = content_loss(fc, fo, cfg.distance_content, per_example)
    s_loss = style_loss(fs, fo, cfg.distance_style, per_example)
    out = {
        "content": c_loss,
        "style": s_loss,
        "total": c_loss + lambda_value * s_loss,
    }
    if compute_similarity:
        if cfg.replicate_similarity_bug:
            out["similarity"] = similarity_loss(fc, fc, cfg.distance_style, per_example)
        else:
            out["similarity"] = similarity_loss(fc, fo, cfg.distance_style, per_example)
    return out


def make_loss_fn(vgg_params: dict, cfg: LossConfig, *,
                 lambda_value: Optional[float] = None,
                 compute_similarity: bool = False):
    """Jit-friendly closure over frozen VGG params."""
    frozen = jax.lax.stop_gradient(vgg_params)

    def loss_fn(content, style, output):
        return perceptual_loss(frozen, content, style, output, cfg,
                               lambda_value=lambda_value,
                               compute_similarity=compute_similarity)
    return loss_fn
