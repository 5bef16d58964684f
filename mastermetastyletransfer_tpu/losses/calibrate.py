"""Loss calibration harness: sweep loss variants over image triplets.

The reference's closest thing to a golden test (codes/loss.py:341-805): it
computes loss magnitudes on the paper's published figure-4/figure-9 images
across VGG +-batchnorm x L1/L2 distance x +-ImageNet-normalization so
reproduced numbers can be compared against the paper's Table 1. This CLI
generalizes that: point it at (content, style, stylized) images — single
files or aligned directories — and it prints the full sweep as JSON.

    python -m mastermetastyletransfer_tpu.losses.calibrate \
        --content c.jpg --style s.jpg --output o.jpg \
        --vgg_weights vgg19.npz [--vgg_bn_weights vgg19_bn.npz]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import List

import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _load_images(path: str, image_size: int) -> List[np.ndarray]:
    from mastermetastyletransfer_tpu.data.pipeline import _decode_resize

    if os.path.isdir(path):
        from mastermetastyletransfer_tpu.data.pipeline import list_images
        files = list_images(path)
    else:
        files = [path]
    return [(_decode_resize(f, image_size).astype(np.float32) / 255.0)
            for f in files]


def run_sweep(content, style, output, *, vgg_params_by_kind: dict,
              lambda_value: float = 1.0,
              compute_similarity: bool = False) -> List[dict]:
    import jax.numpy as jnp

    from mastermetastyletransfer_tpu.config import LossConfig
    from mastermetastyletransfer_tpu.losses.loss import perceptual_loss
    from mastermetastyletransfer_tpu.models.master import imagenet_normalize

    rows = []
    for (kind, vgg), dist, norm in itertools.product(
            vgg_params_by_kind.items(),
            ["euclidian", "euclidian_squared"],
            [False, True]):
        cfg = LossConfig(use_vgg19_with_batchnorm=(kind == "bn"),
                         default_lambda_value=lambda_value,
                         distance_content=dist, distance_style=dist)
        c, s, o = (jnp.asarray(x)[None] for x in (content, style, output))
        if norm:
            c, s, o = imagenet_normalize(c), imagenet_normalize(s), imagenet_normalize(o)
        losses = perceptual_loss(vgg, c, s, o, cfg,
                                 compute_similarity=compute_similarity)
        row = {"vgg": kind, "distance": dist, "imagenet_norm": norm,
               **{k: float(v) for k, v in losses.items()}}
        rows.append(row)
    return rows


def render_grid(triplets, rows_by_triplet, path: str):
    """Annotated image grid, one row per (content, style, stylized) triplet
    with the loss values printed beside the stylized image — the reference
    demo's 3x3 matplotlib figure (codes/loss.py:528-608: imshow content/
    style/output per row, red loss text at the output's right edge).

    Annotates the ImageNet-normalized euclidian_squared plain-VGG config —
    the reference demo's default (codes/loss.py:404-417).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(triplets)
    fig, ax = plt.subplots(n, 3, figsize=(14, 4 * n), squeeze=False)
    for i, (c, s, o) in enumerate(triplets):
        for j, (img, title) in enumerate(
                ((c, "Content Image"), (s, "Style Image"),
                 (o, f"Output Image (triplet {i})"))):
            ax[i][j].imshow(np.clip(img, 0.0, 1.0))
            ax[i][j].set_title(title)
            ax[i][j].axis("off")
        rows = rows_by_triplet[i]
        best = next((r for r in rows
                     if r["vgg"] == "plain" and r["imagenet_norm"]
                     and r["distance"] == "euclidian_squared"), rows[0])
        h = c.shape[0]
        lines = [(f"plain VGG, {best['distance']}, "
                  f"norm={best['imagenet_norm']}", "green"),
                 (f"Total Loss:    {best['total']:.4g}", "red"),
                 (f"Content Loss:  {best['content']:.4g}", "red"),
                 (f"Style Loss:    {best['style']:.4g}", "red")]
        if "similarity" in best:
            lines.append((f"Similarity Loss: {best['similarity']:.4g}", "red"))
        for li, (text, color) in enumerate(lines):
            ax[i][2].text(c.shape[1] * 1.05, h * (0.15 + 0.12 * li), text,
                          fontsize=12, color=color, clip_on=False)
    fig.tight_layout()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--content", required=True)
    ap.add_argument("--style", required=True)
    ap.add_argument("--output", required=True,
                    help="stylized image (or dir aligned with --content)")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--lambda_value", type=float, default=1.0)
    ap.add_argument("--vgg_weights", default=None, help=".npz or .pt (plain)")
    ap.add_argument("--vgg_bn_weights", default=None,
                    help=".npz or .pt (batchnorm variant; optional)")
    ap.add_argument("--compute_similarity", action="store_true")
    ap.add_argument("--render", default=None, metavar="GRID_PNG",
                    help="also write the annotated image grid (reference "
                         "codes/loss.py:528-608) to this path")
    args = ap.parse_args(argv)

    from mastermetastyletransfer_tpu.train.trainer import load_vgg_params

    vggs = {"plain": load_vgg_params(args.vgg_weights)}
    if args.vgg_bn_weights:
        vggs["bn"] = load_vgg_params(args.vgg_bn_weights)

    contents = _load_images(args.content, args.image_size)
    styles = _load_images(args.style, args.image_size)
    outputs = _load_images(args.output, args.image_size)

    all_rows = []
    rows_by_triplet = []
    for i, (c, s, o) in enumerate(zip(contents, styles, outputs)):
        rows = run_sweep(c, s, o, vgg_params_by_kind=vggs,
                         lambda_value=args.lambda_value,
                         compute_similarity=args.compute_similarity)
        for r in rows:
            r["triplet"] = i
        rows_by_triplet.append(rows)
        all_rows.extend(rows)
    print(json.dumps(all_rows, indent=2))
    if args.render:
        render_grid(list(zip(contents, styles, outputs)), rows_by_triplet,
                    args.render)
        print(f"wrote {args.render}", file=sys.stderr)


if __name__ == "__main__":
    main()
