"""Training-stack tests: lr schedule, plain step (incl. data-parallel mesh),
Reptile meta step, fast-adaptation freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mastermetastyletransfer_tpu.config import (
    DataConfig, ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
)
from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
from mastermetastyletransfer_tpu.models.master import init_master_model
from mastermetastyletransfer_tpu.parallel import make_mesh
from mastermetastyletransfer_tpu.train import (
    create_train_state, make_lr_schedule, make_meta_train_step, make_train_step,
)
from mastermetastyletransfer_tpu.train.state import make_optimizer, trainable_labels


def _tiny_cfg(**train_kw):
    return ExperimentConfig(
        model=ModelConfig(),
        loss=LossConfig(default_lambda_value=10.0),
        data=DataConfig(crop_to=64),
        train=TrainConfig(max_layers=2, num_inner_updates=2, **train_kw),
    )


def _setup(cfg):
    params = init_master_model(jax.random.PRNGKey(0), cfg.model)
    vgg = init_vgg19_features(jax.random.PRNGKey(1))
    tx = make_optimizer(params, cfg.train)
    state, tx = create_train_state(params, cfg.train, tx)
    return state, tx, vgg


def _batch(n=2, hw=64):
    c = jax.random.uniform(jax.random.PRNGKey(2), (n, hw, hw, 3))
    s = jax.random.uniform(jax.random.PRNGKey(3), (n, hw, hw, 3))
    return c, s


def _leaves_equal(a, b):
    return [bool(jnp.array_equal(x, y)) for x, y in
            zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))]


def test_lr_schedule_matches_reference_formula():
    cfg = TrainConfig(inner_lr=1e-4, warmup_iterations=10, lr_decay_rate=0.02,
                      lr_decay_every=5, lr_decay_until=0.0)
    sched = make_lr_schedule(cfg)
    # warmup: iteration 1 (step 0) -> lr * (1/10*0.99 + 0.01)
    np.testing.assert_allclose(float(sched(0)), 1e-4 * (0.1 * 0.99 + 0.01), rtol=1e-6)
    # post-warmup, before first decay boundary: base lr
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-6)
    # after 2 decay periods: base * 0.98^2
    np.testing.assert_allclose(float(sched(9 + 2 * 5)), 1e-4 * 0.98 ** 2, rtol=1e-6)
    # floor
    cfg2 = cfg.replace(lr_decay_until=9e-5)
    np.testing.assert_allclose(float(make_lr_schedule(cfg2)(10_000)), 9e-5, rtol=1e-6)


def test_plain_train_step_updates_trainable_only():
    cfg = _tiny_cfg(mode="plain", freeze_encoder=True)
    state, tx, vgg = _setup(cfg)
    step = make_train_step(cfg, vgg, tx)
    c, s = _batch()
    old_swin = jax.tree_util.tree_map(lambda x: x.copy(), state.params["swin"])
    old_dec = jax.tree_util.tree_map(lambda x: x.copy(), state.params["decoder"])
    new_state, metrics = step(state, c, s, jax.random.PRNGKey(7))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total"]))
    assert 1 <= int(metrics["k"]) <= cfg.train.max_layers
    # swin frozen, decoder trained
    assert all(_leaves_equal(new_state.params["swin"], old_swin))
    assert not all(_leaves_equal(new_state.params["decoder"], old_dec))


def test_fast_adaptation_freezes_all_but_style_encoder():
    cfg = _tiny_cfg(mode="fast_adaptation")
    state, tx, vgg = _setup(cfg)
    step = make_train_step(cfg, vgg, tx)
    c, s = _batch()
    old = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    new_state, _ = step(state, c, s, jax.random.PRNGKey(7))
    assert all(_leaves_equal(new_state.params["swin"], old["swin"]))
    assert all(_leaves_equal(new_state.params["decoder"], old["decoder"]))
    assert all(_leaves_equal(new_state.params["style_transformer"]["decoder"],
                             old["style_transformer"]["decoder"]))
    assert not all(_leaves_equal(new_state.params["style_transformer"]["encoder"],
                                 old["style_transformer"]["encoder"]))


def test_meta_train_step_reptile():
    cfg = _tiny_cfg(mode="meta", outer_lr=0.5)
    state, tx, vgg = _setup(cfg)
    step = make_meta_train_step(cfg, vgg, tx)
    n_inner = cfg.train.num_inner_updates
    c = jax.random.uniform(jax.random.PRNGKey(2), (n_inner, 2, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    old = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    new_state, metrics = step(state, c, s, jax.random.PRNGKey(7))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total"]))
    # theta moved toward omega on trainable leaves; swin untouched
    assert all(_leaves_equal(new_state.params["swin"], old["swin"]))
    assert not all(_leaves_equal(new_state.params["style_transformer"],
                                 old["style_transformer"]))


def test_data_parallel_train_step_matches_single_device():
    """The mesh-sharded step must compute the same update as unsharded."""
    cfg = _tiny_cfg(mode="plain")
    state, tx, vgg = _setup(cfg)
    c, s = _batch(n=8)
    rng = jax.random.PRNGKey(7)

    step1 = make_train_step(cfg, vgg, tx)
    sA, mA = step1(jax.tree_util.tree_map(lambda x: x.copy(), state), c, s, rng)

    mesh = make_mesh(8)
    step8 = make_train_step(cfg, vgg, tx, mesh=mesh)
    sB, mB = step8(jax.tree_util.tree_map(lambda x: x.copy(), state), c, s, rng)

    np.testing.assert_allclose(float(mA["total"]), float(mB["total"]), rtol=1e-4)
    # Adam's first update is ~sign(grad)*lr; sharded reduction order can flip
    # the sign of near-zero grads, so bound the diff by the update scale
    # (2*lr) rather than demanding elementwise closeness.
    lr = cfg.train.inner_lr
    la = jax.tree_util.tree_leaves(sA.params)
    lb = jax.tree_util.tree_leaves(sB.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5 * lr)


def test_trainable_labels_shapes_match_params():
    cfg = _tiny_cfg()
    params = init_master_model(jax.random.PRNGKey(0), cfg.model)
    labels = trainable_labels(params, cfg.train)
    assert (jax.tree_util.tree_structure(labels)
            == jax.tree_util.tree_structure(params))


def test_train_step_bfloat16_forward():
    """bf16 model forward must be trainable (conv transpose dtype rule)."""
    cfg = _tiny_cfg(mode="plain")
    cfg = cfg.replace(model=cfg.model.replace(compute_dtype="bfloat16"))
    state, tx, vgg = _setup(cfg)
    step = make_train_step(cfg, vgg, tx)
    c, s = _batch()
    new_state, metrics = step(state, c, s, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1


def test_remat_matches_plain():
    """jax.checkpoint must not change the computed update."""
    cfg = _tiny_cfg(mode="plain")
    cfg_r = cfg.replace(train=cfg.train.replace(remat=True))
    state, tx, vgg = _setup(cfg)
    c, s = _batch()
    rng = jax.random.PRNGKey(7)
    sA, mA = make_train_step(cfg, vgg, tx)(
        jax.tree_util.tree_map(lambda x: x.copy(), state), c, s, rng)
    sB, mB = make_train_step(cfg_r, vgg, tx)(
        jax.tree_util.tree_map(lambda x: x.copy(), state), c, s, rng)
    np.testing.assert_allclose(float(mA["total"]), float(mB["total"]), rtol=1e-5)
    # grads match to float noise, but Adam's first update is ~sign(grad)*lr,
    # so near-zero grads can flip: bound by the update scale
    lr = cfg.train.inner_lr
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5 * lr)


def test_grad_accum_matches_full_batch():
    """2 micro-batches must average to the full-batch gradient. Stochastic
    depth is zeroed (micro-batches consume different rng streams than the
    full batch) so the comparison is exact up to fp reduction order."""
    from mastermetastyletransfer_tpu.train.step import _make_loss_and_grad

    cfg = _tiny_cfg(mode="plain")
    st = cfg.model.transformer.replace(encoder_stochastic_depth_prob=0.0,
                                       decoder_stochastic_depth_prob=0.0)
    sw = cfg.model.swin.replace(stochastic_depth_probs=(0.0, 0.0, 0.0, 0.0))
    cfg = cfg.replace(model=cfg.model.replace(transformer=st, swin=sw))
    cfg_a = cfg.replace(train=cfg.train.replace(grad_accum_steps=2))
    state, tx, vgg = _setup(cfg)
    c, s = _batch(n=4)
    rng = jax.random.PRNGKey(7)
    k = jnp.asarray(2)

    (_, m1), g1 = jax.jit(_make_loss_and_grad(cfg, vgg))(
        state.params, c, s, k, rng)
    (_, m2), g2 = jax.jit(_make_loss_and_grad(cfg_a, vgg))(
        state.params, c, s, k, rng)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
