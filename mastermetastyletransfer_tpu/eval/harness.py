"""Evaluation harness: the full content x style grid sweep with loss
statistics and optional stylized-image dumps (reference: test_model.py:17-214,
the 11x20 = 220-pair grid of goals.txt:34).

TPU-native: instead of the reference's per-pair Python loop, each content is
evaluated against a *batch* of styles in one jitted call (pairs are
independent), so the grid runs as ceil(S/B) batched launches per content.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import ExperimentConfig
from mastermetastyletransfer_tpu.data.pipeline import _decode_resize, list_images
from mastermetastyletransfer_tpu.losses.loss import perceptual_loss
from mastermetastyletransfer_tpu.models.master import imagenet_normalize, master_apply
from mastermetastyletransfer_tpu.train.step import _loss_views, prepare_batch_for_model


@dataclasses.dataclass
class EvalReport:
    total: List[float]
    content: List[float]
    style: List[float]
    similarity: List[float]
    pairs: List[Tuple[str, str]]

    def summary(self) -> Dict[str, float]:
        def ms(xs):
            a = np.asarray(xs, np.float64)
            return (float(a.mean()), float(a.std())) if a.size else (float("nan"),) * 2

        out = {}
        for name in ("total", "content", "style", "similarity"):
            vals = getattr(self, name)
            if vals:
                out[f"{name}_mean"], out[f"{name}_std"] = ms(vals)
        out["num_pairs"] = len(self.pairs)
        return out


def load_eval_images(root: str, image_size: int = 256) -> Tuple[np.ndarray, List[str]]:
    """All images under root, resized to (image_size, image_size), float [0,1]
    (reference: test_model.py:39-48 uses Resize(256) only — no crop)."""
    files = list_images(root, recursive=True)
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    imgs = np.stack([_decode_resize(f, image_size) for f in files])
    return imgs.astype(np.float32) / 255.0, files


def evaluate_grid(params, vgg_params, cfg: ExperimentConfig, *,
                  content_images: np.ndarray, style_images: np.ndarray,
                  content_names: Optional[List[str]] = None,
                  style_names: Optional[List[str]] = None,
                  k: int = 1, style_batch: int = 8,
                  compute_similarity: bool = False,
                  save_images_to: Optional[str] = None) -> EvalReport:
    """Sweep every content x style pair at layer count k.

    content_images: (C, H, W, 3) float [0,1]; style_images: (S, H, W, 3).
    Loss statistics accumulate per pair like Test.test_
    (reference: test_model.py:101-199).
    """
    C = content_images.shape[0]
    S = style_images.shape[0]
    content_names = content_names or [f"content{i}" for i in range(C)]
    style_names = style_names or [f"style{i}" for i in range(S)]

    from mastermetastyletransfer_tpu.models.master import (
        encode_features, encode_style_stream,
        stylize_from_features_with_stream,
    )

    @jax.jit
    def encode_styles(params, styles):
        ms = prepare_batch_for_model(styles, styles, cfg.data)[1]
        return encode_style_stream(params, ms, cfg.model, k=k)

    @jax.jit
    def eval_batch(params, content_one, styles, stream):
        """Everything content-independent — the style swin pass AND the k
        style-transformer encoder triples — is precomputed once per style
        and reused across every content (exact; the grid reuses each style
        C times; the reference recomputes per pair)."""
        b = styles.shape[0]
        content = jnp.tile(content_one[None], (b, 1, 1, 1))
        mc = prepare_batch_for_model(content, styles, cfg.data)[0]
        fc = encode_features(params, mc, cfg.model)
        out = stylize_from_features_with_stream(params, fc, stream, cfg.model)
        lc, ls, lo = _loss_views(content, styles, out, cfg.data)
        losses = perceptual_loss(
            vgg_params, lc, ls, lo, cfg.loss,
            lambda_value=cfg.train.lambda_style,
            compute_similarity=compute_similarity, per_example=True)
        return out, losses

    # Pad styles to a multiple of style_batch so one shape compiles.
    pad = (-S) % style_batch
    styles_padded = np.concatenate(
        [style_images, np.zeros((pad,) + style_images.shape[1:], np.float32)])

    report = EvalReport([], [], [], [], [])
    if save_images_to:
        os.makedirs(save_images_to, exist_ok=True)

    style_feats = {
        s0: encode_styles(params, jnp.asarray(styles_padded[s0:s0 + style_batch]))
        for s0 in range(0, S, style_batch)
    }

    for ci in range(C):
        c_img = jnp.asarray(content_images[ci])
        for s0 in range(0, S, style_batch):
            chunk = jnp.asarray(styles_padded[s0:s0 + style_batch])
            out, losses = eval_batch(params, c_img, chunk, style_feats[s0])
            out = np.asarray(jax.device_get(out))
            losses = jax.device_get(losses)
            n_valid = min(style_batch, S - s0)
            for j in range(n_valid):
                si = s0 + j
                report.pairs.append((content_names[ci], style_names[si]))
                report.total.append(float(losses["total"][j]))
                report.content.append(float(losses["content"][j]))
                report.style.append(float(losses["style"][j]))
                if compute_similarity:
                    report.similarity.append(float(losses["similarity"][j]))
                if save_images_to:
                    _save_image(
                        out[j],
                        os.path.join(
                            save_images_to,
                            f"{_stem(content_names[ci])}__{_stem(style_names[si])}.jpg"))
    return report


def _stem(p: str) -> str:
    return os.path.splitext(os.path.basename(p))[0]


def _save_image(img01: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
