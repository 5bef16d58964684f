"""Linear / MLP / stochastic-depth primitives as pure param-pytree functions.

The MLP matches torchvision.ops.MLP(dim, [hidden, dim], activation=GELU,
dropout=d) used throughout the style transformer
(reference: codes/style_transformer.py:366, :839-841, :991): Linear -> GELU
(exact erf form, torch nn.GELU default) -> Dropout -> Linear -> Dropout.

Kernel layout is JAX-convention (in_features, out_features); the torch
converter transposes (see utils/convert.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.init.trunc_normal_(std=std) parity: normal(0, std) truncated to
    the absolute interval [-2, 2] (NOT +-2 std)."""
    lower = -2.0 / std
    upper = 2.0 / std
    return (jax.random.truncated_normal(key, lower, upper, shape, jnp.float32) * std).astype(dtype)


def init_linear(key, in_dim: int, out_dim: int, use_bias: bool = True,
                init: str = "torch_default") -> dict:
    """Linear params. "torch_default" = kaiming-uniform(a=sqrt5) fan_in like
    nn.Linear; "xavier_uniform" + tiny-normal bias mirrors the reference's MLP
    init (reference: codes/style_transformer.py:368-372); "trunc_normal" mirrors
    the trainer-wide init at train.py:199-201."""
    kkey, bkey = jax.random.split(key)
    if init == "xavier_uniform":
        limit = (6.0 / (in_dim + out_dim)) ** 0.5
        kernel = jax.random.uniform(kkey, (in_dim, out_dim), jnp.float32, -limit, limit)
        bias = (jax.random.normal(bkey, (out_dim,), jnp.float32) * 1e-6) if use_bias else None
    elif init == "trunc_normal":
        kernel = trunc_normal(kkey, (in_dim, out_dim))
        bias = jnp.zeros((out_dim,), jnp.float32) if use_bias else None
    else:  # torch nn.Linear default
        limit = (1.0 / in_dim) ** 0.5
        kernel = jax.random.uniform(kkey, (in_dim, out_dim), jnp.float32, -limit, limit)
        bias = jax.random.uniform(bkey, (out_dim,), jnp.float32, -limit, limit) if use_bias else None
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = bias
    return p


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["kernel"].astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def init_mlp(key, dim: int, hidden: int, init: str = "torch_default") -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden, init=init),
            "fc2": init_linear(k2, hidden, dim, init=init)}


def mlp_apply(params: dict, x: jnp.ndarray, *, dropout: float = 0.0,
              deterministic: bool = True, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    h = linear(params["fc1"], x)
    h = jax.nn.gelu(h, approximate=False)
    if not deterministic and dropout > 0.0:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0).astype(h.dtype)
    y = linear(params["fc2"], h)
    if not deterministic and dropout > 0.0:
        _, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, y.shape)
        y = jnp.where(keep, y / (1.0 - dropout), 0.0).astype(y.dtype)
    return y


def stochastic_depth(x: jnp.ndarray, p: float, *, deterministic: bool = True,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """torchvision StochasticDepth(p, "row"): per-sample Bernoulli keep with
    prob 1-p, scaled by 1/(1-p); identity at eval
    (reference: codes/style_transformer.py:361, :819)."""
    if deterministic or p == 0.0:
        return x
    keep_prob = 1.0 - p
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape)
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)
