"""Locate the compile-helper SIGSEGV in the training graph: compile grads of
successively larger subgraphs (no Pallas anywhere).

    python scripts/probe_train_compile.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.config import ExperimentConfig, LossConfig, ModelConfig
from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
from mastermetastyletransfer_tpu.losses.loss import perceptual_loss
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        sync(out)
        print(json.dumps({"probe": name, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False,
                          "error": str(e)[:120]}), flush=True)
        return False


def main():
    cfg = ModelConfig(compute_dtype="bfloat16")   # no pallas anywhere
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    vgg = init_vgg19_features(jax.random.PRNGKey(1))
    s = 128
    content = jax.random.uniform(jax.random.PRNGKey(2), (2, s, s, 3))
    style = jax.random.uniform(jax.random.PRNGKey(3), (2, s, s, 3))

    # 1. grad of swin encoder only
    def loss_swin(p, x):
        return jnp.sum(swin_backbone_apply(p, x, cfg.swin) ** 2)

    run("grad_swin", jax.grad(loss_swin), params["swin"], content)

    # 2. grad of the full forward (no VGG loss)
    def loss_fwd(p, c, st):
        return jnp.sum(master_apply(p, c, st, cfg, k=1) ** 2)

    run("grad_master", jax.grad(loss_fwd), params, content, style)

    # 3. grad of VGG-loss only (stylized image as input)
    lcfg = LossConfig(default_lambda_value=10.0)

    def loss_vgg(img, c, st):
        losses = perceptual_loss(vgg, c, st, img, lcfg)
        return losses["total"]

    img0 = jax.random.uniform(jax.random.PRNGKey(4), (2, s, s, 3))
    run("grad_vggloss", jax.grad(loss_vgg), img0, content, style)

    # 4. grad of forward + VGG loss (the full training objective)
    def loss_full(p, c, st):
        img = master_apply(p, c, st, cfg, k=1)
        losses = perceptual_loss(vgg, c, st, img, lcfg)
        return losses["total"]

    run("grad_full", jax.grad(loss_full), params, content, style)


if __name__ == "__main__":
    main()


def probe_switch():
    cfg = ModelConfig(compute_dtype="bfloat16")
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    vgg = init_vgg19_features(jax.random.PRNGKey(1))
    lcfg = LossConfig(default_lambda_value=10.0)
    s = 128
    content = jax.random.uniform(jax.random.PRNGKey(2), (2, s, s, 3))
    style = jax.random.uniform(jax.random.PRNGKey(3), (2, s, s, 3))

    # traced-k switch over max_k=4 branches + train-mode rng (the two things
    # the step-4 probe lacked vs the real train step)
    def loss_k(p, c, st, k, rng):
        img = master_apply(p, c, st, cfg, k=k, max_k=4,
                           deterministic=False, rng=rng)
        losses = perceptual_loss(vgg, c, st, img, lcfg)
        return losses["total"]

    rng = jax.random.PRNGKey(5)
    run("grad_full_switchk", jax.grad(loss_k), params, content, style,
        jnp.asarray(2), rng)

    def loss_k1(p, c, st, rng):
        img = master_apply(p, c, st, cfg, k=1, deterministic=False, rng=rng)
        losses = perceptual_loss(vgg, c, st, img, lcfg)
        return losses["total"]

    run("grad_full_k1_rng", jax.grad(loss_k1), params, content, style, rng)


probe_switch()
