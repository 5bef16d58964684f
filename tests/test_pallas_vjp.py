"""Custom-VJP parity: Pallas backward kernels vs jax.grad of the XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mastermetastyletransfer_tpu.ops.mlp import init_mlp, mlp_apply
from mastermetastyletransfer_tpu.ops.norm import layer_norm
from mastermetastyletransfer_tpu.ops.pallas_mlp_vjp import ln_mlp_residual


def _ref_fn(x, mlp_params, norm_params):
    h = x
    if norm_params is not None:
        h = layer_norm(h, norm_params["scale"], norm_params["bias"])
    return x + mlp_apply(mlp_params, h)


@pytest.mark.parametrize("use_norm", [False, True])
def test_ln_mlp_residual_grads_match_xla(rng, use_norm):
    c, hidden = 64, 128
    mlp = init_mlp(jax.random.PRNGKey(0), c, hidden)
    norm = None
    if use_norm:
        norm = {"scale": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
                "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))

    def loss_fused(x, mlp, norm):
        return jnp.sum(jnp.sin(ln_mlp_residual(x, mlp, norm)))

    def loss_ref(x, mlp, norm):
        return jnp.sum(jnp.sin(_ref_fn(x, mlp, norm)))

    val_f, grads_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        x, mlp, norm)
    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, mlp, norm)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-5)
    for gf, gr in zip(jax.tree_util.tree_leaves(grads_f),
                      jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_train_step_with_pallas_mlp():
    """Training with use_pallas: single/dual-V attention and the fused
    LN+MLP+residual all train through their custom VJPs (Pallas backward
    kernels); only the whole-block eval kernel stays forward-only."""
    from mastermetastyletransfer_tpu.config import (
        DataConfig, ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
    from mastermetastyletransfer_tpu.models import init_master_model
    from mastermetastyletransfer_tpu.train import create_train_state, make_train_step
    from mastermetastyletransfer_tpu.train.state import make_optimizer

    base = ModelConfig()
    model = base.replace(swin=base.swin.replace(use_pallas=True),
                         transformer=base.transformer.replace(use_pallas=True))
    cfg = ExperimentConfig(model=model, loss=LossConfig(),
                           data=DataConfig(crop_to=64),
                           train=TrainConfig(max_layers=2))
    params = init_master_model(jax.random.PRNGKey(0), cfg.model)
    vgg = init_vgg19_features(jax.random.PRNGKey(1))
    tx = make_optimizer(params, cfg.train)
    state, tx = create_train_state(params, cfg.train, tx)
    step = make_train_step(cfg, vgg, tx)
    c = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    old = jax.device_get(state.params)  # the step donates its input state
    new_state, metrics = step(state, c, s, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["total"]))
    # params actually moved (grads flowed through the fused MLP)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(old)))
    assert moved


@pytest.mark.parametrize("shift", [(0, 0), (4, 4)])
@pytest.mark.parametrize("bwd_bsub", ["1", "2"])
def test_window_attention_grads_match_xla(rng, shift, bwd_bsub, monkeypatch):
    """jax.grad through the Pallas attention (custom VJP) must match the XLA
    chain's autodiff for params and all three inputs — at bsub=1 and at the
    r4 image-batched backward (MMST_BWD_BSUB, _tdot transpose formulation)."""
    monkeypatch.setenv("MMST_BWD_BSUB", bwd_bsub)
    from mastermetastyletransfer_tpu.config import AttentionConfig
    from mastermetastyletransfer_tpu.ops.attention import (
        init_window_attention, shifted_window_attention,
    )

    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=shift)
    cfg_p = cfg.replace(use_pallas=True)
    params = init_window_attention(jax.random.PRNGKey(0), cfg)
    q = jnp.asarray(rng.standard_normal((2, 18, 20, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 18, 20, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 18, 20, 64)).astype(np.float32))

    def loss(c):
        def f(params, q, k, v):
            out = shifted_window_attention(params, q, k, v, c,
                                           deterministic=False)
            return jnp.sum(jnp.sin(out))
        return f

    vp, gp = jax.value_and_grad(loss(cfg_p), argnums=(0, 1, 2, 3))(
        params, q, k, v)
    vr, gr = jax.value_and_grad(loss(cfg), argnums=(0, 1, 2, 3))(
        params, q, k, v)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("bwd_bsub", ["1", "2"])
def test_dual_value_attention_grads_match_xla(rng, bwd_bsub, monkeypatch):
    """jax.grad through the dual-V Pallas kernel (sigma+mu streams, shared
    projection) must match the XLA chain's autodiff (both backward bsubs)."""
    monkeypatch.setenv("MMST_BWD_BSUB", bwd_bsub)
    from mastermetastyletransfer_tpu.config import AttentionConfig
    from mastermetastyletransfer_tpu.ops.attention import (
        init_dual_value_window_attention, shifted_window_attention_dual_value,
    )

    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=(4, 4))
    cfg_p = cfg.replace(use_pallas=True)
    params = init_dual_value_window_attention(jax.random.PRNGKey(0), cfg)
    xs = [jnp.asarray(rng.standard_normal((2, 18, 20, 64)).astype(np.float32))
          for _ in range(4)]

    def loss(c):
        def f(params, q, k, v1, v2):
            s, m = shifted_window_attention_dual_value(
                params, q, k, v1, v2, c, deterministic=False)
            return jnp.sum(jnp.sin(s)) + jnp.sum(jnp.cos(m))
        return f

    vp, gp = jax.value_and_grad(loss(cfg_p), argnums=(0, 1, 2, 3, 4))(
        params, *xs)
    vr, gr = jax.value_and_grad(loss(cfg), argnums=(0, 1, 2, 3, 4))(
        params, *xs)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
