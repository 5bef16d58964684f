"""Few-shot adaptation CLI: adapt the style encoder to ONE novel style image
with a handful of steps, then stylize.

This is the paper's few-shot product story (reference: the fast-adaptation
stage of train_only_inner_loop.py — load a pretrained transformer+decoder,
freeze everything except the style-transformer *encoder*, adapt on the novel
style, reference:306-318). The generic trainer covers the dataset-driven
version; this CLI is the single-style workflow:

    python -m mastermetastyletransfer_tpu.adapt \
        --style novel_style.jpg --content_dir photos/ \
        --checkpoint pretrained.npz --steps 20 --out_dir adapted/

Outputs: adapted params (adapted.npz) + stylized versions of the contents.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def adapt_to_style(params, vgg, cfg, style_img: np.ndarray,
                   content_imgs: np.ndarray, *, steps: int = 20,
                   lr: float = 1e-4, batch: int = 4, seed: int = 0,
                   log=print):
    """Run `steps` fast-adaptation updates against one style image.

    style_img: (H, W, 3) float [0,1]; content_imgs: (N, H, W, 3).
    Returns adapted params."""
    import jax
    import jax.numpy as jnp

    from mastermetastyletransfer_tpu.data import repeat_style_to_batch
    from mastermetastyletransfer_tpu.train.state import (
        create_train_state, make_optimizer,
    )
    from mastermetastyletransfer_tpu.train.step import make_train_step

    tcfg = cfg.train.replace(mode="fast_adaptation", inner_lr=lr,
                             use_lr_schedule=False)
    cfg = cfg.replace(train=tcfg)
    tx = make_optimizer(params, tcfg)
    state, tx = create_train_state(params, tcfg, tx)
    step = make_train_step(cfg, vgg, tx)

    rng = jax.random.PRNGKey(seed)
    style = repeat_style_to_batch(jnp.asarray(style_img), batch)
    n = content_imgs.shape[0]
    order = np.random.default_rng(seed)
    for it in range(steps):
        idx = order.integers(0, n, size=batch)
        content = jnp.asarray(content_imgs[idx])
        state, metrics = step(state, content, style,
                              jax.random.fold_in(rng, it))
        if (it + 1) % max(steps // 5, 1) == 0 or it == 0:
            log(f"[adapt {it + 1}/{steps}] total={float(metrics['total']):.4f} "
                f"style={float(metrics['style']):.4f}")
    return jax.device_get(state.params)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--style", required=True, help="the novel style image")
    ap.add_argument("--content_dir", required=True,
                    help="content images (adaptation + stylization targets)")
    ap.add_argument("--checkpoint", default=None,
                    help=".npz pretrained params (random init if omitted)")
    ap.add_argument("--vgg_weights", default=None)
    ap.add_argument("--out_dir", default="adapted")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from mastermetastyletransfer_tpu.config import ExperimentConfig
    from mastermetastyletransfer_tpu.data.pipeline import _decode_resize, list_images
    from mastermetastyletransfer_tpu.eval.harness import _save_image
    from mastermetastyletransfer_tpu.inference import stylize
    from mastermetastyletransfer_tpu.models import init_master_model
    from mastermetastyletransfer_tpu.train.trainer import load_vgg_params
    from mastermetastyletransfer_tpu.utils import checkpoint as ckpt_lib

    cfg = ExperimentConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg.model)
    if args.checkpoint:
        params = ckpt_lib.load_params_npz(args.checkpoint, params)
    vgg = load_vgg_params(args.vgg_weights)

    style = _decode_resize(args.style, args.image_size).astype(np.float32) / 255.0
    files = list_images(args.content_dir)
    contents = np.stack([
        _decode_resize(f, args.image_size).astype(np.float32) / 255.0
        for f in files])
    print(f"adapting to {os.path.basename(args.style)} on {len(files)} "
          f"contents, {args.steps} steps")

    adapted = adapt_to_style(params, vgg, cfg, style, contents,
                             steps=args.steps, lr=args.lr, batch=args.batch,
                             seed=args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_lib.save_params_npz(os.path.join(args.out_dir, "adapted.npz"), adapted)

    import jax.numpy as jnp
    style_b = jnp.asarray(style)[None]
    for f, c in zip(files, contents):
        out = stylize(adapted, jnp.asarray(c)[None],
                      style_b, cfg.model, k=args.k)
        _save_image(np.asarray(out)[0],
                    os.path.join(args.out_dir,
                                 os.path.splitext(os.path.basename(f))[0]
                                 + "_stylized.jpg"))
    print(f"wrote {args.out_dir}/adapted.npz and "
          f"{len(files)} stylized images")


if __name__ == "__main__":
    main()
