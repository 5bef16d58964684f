"""VGG19 feature extractor cut at relu5_1, emitting [relu2_1, relu3_1,
relu4_1, relu5_1] — the loss backbone of the framework.

Mirrors the reference's cut torchvision VGG19 (plain features[0:30] / bn
features[0:43]) re-wrapped into 4-slice extractors
(reference: codes/loss.py:15-63, cutter codes/utils.py:10-56).

TPU-native: NHWC convs (XLA MXU), max-pool via reduce_window, the whole
extractor inlining into the jitted loss/train step. Weights are He-init
random by default; utils/convert.py maps a torch vgg19(_bn) state_dict in
for parity runs.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mastermetastyletransfer_tpu.ops.conv import conv2d

# (kind, in_ch, out_ch); "C"=conv3x3+ReLU (BN variant: conv+BN+ReLU),
# "M"=maxpool 2x2/2. Slices end after the ReLU of the named layer.
# Plain VGG19 features[0:30] (reference: codes/utils.py:46):
VGG19_LAYER_PLAN: List[List[Tuple[str, int, int]]] = [
    # -> relu2_1 (features[:7], reference: codes/loss.py:25)
    [("C", 3, 64), ("C", 64, 64), ("M", 0, 0), ("C", 64, 128)],
    # -> relu3_1 (features[7:12], reference: codes/loss.py:28)
    [("C", 128, 128), ("M", 0, 0), ("C", 128, 256)],
    # -> relu4_1 (features[12:21], reference: codes/loss.py:31)
    [("C", 256, 256), ("C", 256, 256), ("C", 256, 256), ("M", 0, 0), ("C", 256, 512)],
    # -> relu5_1 (features[21:30], reference: codes/loss.py:34)
    [("C", 512, 512), ("C", 512, 512), ("C", 512, 512), ("M", 0, 0), ("C", 512, 512)],
]
# The BN variant has identical conv topology (features[0:43] with BN layers
# interleaved, reference: codes/loss.py:41-63); BN folds into conv at
# conversion time, so the plan is shared.
VGG19_BN_LAYER_PLAN = VGG19_LAYER_PLAN


def init_vgg19_features(key) -> dict:
    """He-normal random init (useful shape-wise; load real weights via
    utils/convert.py for loss parity)."""
    params = {}
    idx = 0
    for sl in VGG19_LAYER_PLAN:
        for kind, cin, cout in sl:
            if kind == "C":
                key, sub = jax.random.split(key)
                std = (2.0 / (3 * 3 * cin)) ** 0.5
                params[f"conv{idx}"] = {
                    "kernel": jax.random.normal(sub, (3, 3, cin, cout), jnp.float32) * std,
                    "bias": jnp.zeros((cout,), jnp.float32),
                }
                idx += 1
    return params


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg19_features_apply(params: dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """NHWC image batch -> [relu2_1, relu3_1, relu4_1, relu5_1] features.

    Conv padding is SAME-1px zero padding (torch Conv2d padding=1)."""
    feats = []
    idx = 0
    for sl in VGG19_LAYER_PLAN:
        for kind, _, _ in sl:
            if kind == "M":
                x = _maxpool2(x)
            else:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                x = conv2d(params[f"conv{idx}"], x)
                x = jnp.maximum(x, 0)
                idx += 1
        feats.append(x)
    return feats
