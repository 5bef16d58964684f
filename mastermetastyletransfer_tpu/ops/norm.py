"""Normalization ops with PyTorch-parity numerics.

- instance_norm matches nn.InstanceNorm2d(affine=False): per-(sample, channel)
  mean and *biased* variance over spatial dims, eps=1e-5
  (reference: codes/style_transformer.py:983-986, codes/loss.py:102-105).
- layer_norm matches nn.LayerNorm over the last dim, eps=1e-5.

All operate on NHWC tensors (channel-last — TPU friendly); statistics are
computed in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  scale: jnp.ndarray | None = None,
                  bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Instance norm over spatial dims of an NHWC tensor (axes 1..rank-2).

    For rank-3 input (B, N, C) normalizes over N. Optional per-channel affine
    (scale/bias of shape (C,)) for decoder_use_instance_norm_with_affine
    (reference: codes/style_transformer.py:982-983).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=axes, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * (var + eps) ** -0.5
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last dim with affine params (PyTorch nn.LayerNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * (var + eps) ** -0.5
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
