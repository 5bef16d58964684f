"""NHWC convolution / upsampling primitives for the CNN decoder and VGG loss.

Reflect-padded 3x3 convs + nearest 2x upsampling mirror the AdaIN decoder
stack (reference: codes/decoder.py:23-55). Kernels are HWIO (TPU-native
layout); conv runs on the MXU via lax.conv_general_dilated and XLA fuses the
pad + ReLU into it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def init_conv(key, in_ch: int, out_ch: int, ksize: int = 3,
              initializer: str = "kaiming_normal_") -> dict:
    """Conv params with the reference's selectable initializers
    (reference: codes/decoder.py:58-73). fan_out mode, relu gain."""
    kkey, _ = jax.random.split(key)
    shape = (ksize, ksize, in_ch, out_ch)
    fan_out = ksize * ksize * out_ch
    fan_in = ksize * ksize * in_ch
    gain = 2.0 ** 0.5  # relu
    if initializer == "kaiming_normal_":
        std = gain / (fan_out ** 0.5)
        kernel = jax.random.normal(kkey, shape, jnp.float32) * std
    elif initializer == "kaiming_uniform_":
        bound = gain * (3.0 / fan_out) ** 0.5
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    elif initializer == "xavier_normal_":
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        kernel = jax.random.normal(kkey, shape, jnp.float32) * std
    elif initializer == "xavier_uniform_":
        bound = (6.0 / (fan_in + fan_out)) ** 0.5
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    elif initializer == "orthogonal_":
        flat = jax.random.normal(kkey, (fan_in, out_ch), jnp.float32)
        q, _ = jnp.linalg.qr(flat)
        kernel = q.reshape(ksize, ksize, in_ch, out_ch)
    elif initializer == "default":
        # torch Conv2d default: kaiming_uniform_(a=sqrt(5)) on fan_in
        bound = (1.0 / fan_in) ** 0.5 * (3.0 ** 0.5) * (2.0 / 6.0) ** 0.5
        bound = (6.0 / fan_in) ** 0.5 / (6.0 ** 0.5)  # = 1/sqrt(fan_in)
        kernel = jax.random.uniform(kkey, shape, jnp.float32, -bound, bound)
    else:
        raise ValueError(f"unknown initializer {initializer!r}")
    bias = jnp.zeros((out_ch,), jnp.float32)
    return {"kernel": kernel, "bias": bias}


def conv2d(params: dict, x: jnp.ndarray, *, stride: int = 1,
           padding="VALID") -> jnp.ndarray:
    y = lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = (y + params["bias"].astype(jnp.float32)).astype(x.dtype)
    return y


def reflect_conv(params: dict, x: jnp.ndarray, *, relu: bool = True) -> jnp.ndarray:
    """1px reflect pad -> 3x3 conv -> optional ReLU (reference: codes/decoder.py:24-25)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = conv2d(params, x)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (reference: codes/decoder.py:27)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)
