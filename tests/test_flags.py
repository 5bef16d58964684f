"""Flag-plumbing tests: the 4 ImageNet-normalization combinations
(reference: train_only_inner_loop.py:494-575) and the reference-bug compat
flags (SURVEY.md 3.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import DataConfig, LossConfig
from mastermetastyletransfer_tpu.losses.loss import perceptual_loss, similarity_loss
from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
from mastermetastyletransfer_tpu.models.master import imagenet_normalize
from mastermetastyletransfer_tpu.train.step import (
    _loss_views, prepare_batch_for_model,
)


def _imgs(n=1, hw=32):
    c = jax.random.uniform(jax.random.PRNGKey(1), (n, hw, hw, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (n, hw, hw, 3))
    o = jax.random.uniform(jax.random.PRNGKey(3), (n, hw, hw, 3))
    return c, s, o


def test_normalization_flag_combinations():
    c, s, o = _imgs()
    for swin_on in (False, True):
        for loss_on in (False, True):
            cfg = DataConfig(use_imagenet_normalization_for_swin=swin_on,
                             use_imagenet_normalization_for_loss=loss_on)
            mc, ms = prepare_batch_for_model(c, s, cfg)
            lc, ls, lo = _loss_views(c, s, o, cfg)
            exp_m = imagenet_normalize(c) if swin_on else c
            exp_l = imagenet_normalize(c) if loss_on else c
            exp_o = imagenet_normalize(o) if loss_on else o
            np.testing.assert_allclose(np.asarray(mc), np.asarray(exp_m), atol=1e-6)
            np.testing.assert_allclose(np.asarray(lc), np.asarray(exp_l), atol=1e-6)
            np.testing.assert_allclose(np.asarray(lo), np.asarray(exp_o), atol=1e-6)


def test_lambda_override_bug_compat():
    vgg = init_vgg19_features(jax.random.PRNGKey(0))
    c, s, o = _imgs()
    # intended behavior: an explicit lambda wins
    cfg = LossConfig(default_lambda_value=10.0)
    r = perceptual_loss(vgg, c, s, o, cfg, lambda_value=2.0)
    np.testing.assert_allclose(float(r["total"]),
                               float(r["content"] + 2.0 * r["style"]), rtol=1e-6)
    # reference bug replicated: explicit lambda is ignored
    cfg_bug = LossConfig(default_lambda_value=10.0,
                         replicate_lambda_override_bug=True)
    rb = perceptual_loss(vgg, c, s, o, cfg_bug, lambda_value=2.0)
    np.testing.assert_allclose(float(rb["total"]),
                               float(rb["content"] + 10.0 * rb["style"]), rtol=1e-6)


def test_similarity_bug_compat():
    vgg = init_vgg19_features(jax.random.PRNGKey(0))
    c, s, o = _imgs()
    cfg_bug = LossConfig(replicate_similarity_bug=True)
    rb = perceptual_loss(vgg, c, s, o, cfg_bug, compute_similarity=True)
    # content-vs-content: always exactly 0 (reference codes/loss.py:333-334)
    assert float(rb["similarity"]) == 0.0
    cfg = LossConfig()
    r = perceptual_loss(vgg, c, s, o, cfg, compute_similarity=True)
    assert float(r["similarity"]) > 0.0


def test_experiment_config_json_roundtrip_carries_every_field():
    """ExperimentConfig -> JSON -> ExperimentConfig is exact, including the
    r3 matmul_mode knob on all three submodel configs (a silently dropped
    field here would resurrect the wrong precision on resume)."""
    from mastermetastyletransfer_tpu.config import (
        ExperimentConfig, ModelConfig, TrainConfig,
    )

    model = ModelConfig()
    model = model.replace(
        compute_dtype="bfloat16",
        swin=model.swin.replace(use_pallas=True, matmul_mode="split3"),
        transformer=model.transformer.replace(matmul_mode="split3",
                                              traced_k_impl="scan"),
        decoder=model.decoder.replace(matmul_mode="split3", phase_exit=8))
    cfg = ExperimentConfig(model=model,
                           train=TrainConfig(lambda_style=4.0))
    back = ExperimentConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.model.swin.matmul_mode == "split3"
    assert back.model.decoder.phase_exit == 8
