"""Loss parity tests against torch semantics (torch CPU is available; the
oracle recomputes the loss formulas directly with torch ops — std([2,3])
Bessel correction, cosine_similarity, InstanceNorm — independent of the
reference implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mastermetastyletransfer_tpu.config import LossConfig
from mastermetastyletransfer_tpu.losses import (
    content_loss, style_loss, similarity_loss,
    init_vgg19_features, vgg19_features_apply, perceptual_loss,
)


def _feats(rng, shapes):
    return [rng.standard_normal(s).astype(np.float32) for s in shapes]


SHAPES = [(2, 16, 16, 128), (2, 8, 8, 256), (2, 4, 4, 512), (2, 2, 2, 512)]


def torch_instance_norm(x_nchw, eps=1e-5):
    mean = x_nchw.mean(dim=(2, 3), keepdim=True)
    var = x_nchw.var(dim=(2, 3), keepdim=True, unbiased=False)
    return (x_nchw - mean) / torch.sqrt(var + eps)


def test_content_loss_torch_parity(rng):
    fc = _feats(rng, SHAPES)
    fo = _feats(rng, SHAPES)
    got = float(content_loss([jnp.asarray(a) for a in fc],
                             [jnp.asarray(a) for a in fo]))
    want = 0.0
    for a, b in zip(fc, fo):
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        want += torch.mean(torch.abs(torch_instance_norm(ta) - torch_instance_norm(tb))).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_style_loss_torch_parity(rng):
    fs = _feats(rng, SHAPES)
    fo = _feats(rng, SHAPES)
    got = float(style_loss([jnp.asarray(a) for a in fs],
                           [jnp.asarray(a) for a in fo]))
    want = 0.0
    for a, b in zip(fs, fo):
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        want += (torch.mean(torch.abs(ta.mean([2, 3]) - tb.mean([2, 3])))
                 + torch.mean(torch.abs(ta.std([2, 3]) - tb.std([2, 3])))).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def torch_scaled_self_cos_tril(a_nchw, eps=1e-6):
    a_flat = a_nchw.reshape(a_nchw.size(0), a_nchw.size(1), -1).permute(0, 2, 1)
    sim = torch.nn.functional.cosine_similarity(
        a_flat.unsqueeze(1), a_flat.unsqueeze(2), dim=3)
    sim = sim / (sim.sum(dim=1, keepdim=True) + eps)
    return sim.tril(diagonal=-1)


def test_similarity_loss_torch_parity(rng):
    fa = _feats(rng, [(1, 6, 6, 32)] * 4)
    fb = _feats(rng, [(1, 6, 6, 32)] * 4)
    got = float(similarity_loss([jnp.asarray(a) for a in fa],
                                [jnp.asarray(a) for a in fb]))
    want = 0.0
    for i in (1, 2):
        ta = torch.from_numpy(fa[i]).permute(0, 3, 1, 2)
        tb = torch.from_numpy(fb[i]).permute(0, 3, 1, 2)
        want += torch.mean(torch.abs(
            torch_scaled_self_cos_tril(ta) - torch_scaled_self_cos_tril(tb))).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_vgg_feature_shapes():
    params = init_vgg19_features(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 256, 256, 3))
    feats = vgg19_features_apply(params, x)
    # reference shape contract (codes/loss.py:228-232), NHWC here
    assert feats[0].shape == (1, 128, 128, 128)
    assert feats[1].shape == (1, 64, 64, 256)
    assert feats[2].shape == (1, 32, 32, 512)
    assert feats[3].shape == (1, 16, 16, 512)


def test_perceptual_loss_end_to_end_and_lambda(rng):
    params = init_vgg19_features(jax.random.PRNGKey(0))
    cfg = LossConfig(default_lambda_value=10.0)
    c = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    o = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    res = perceptual_loss(params, c, s, o, cfg, lambda_value=2.0)
    np.testing.assert_allclose(
        float(res["total"]),
        float(res["content"]) + 2.0 * float(res["style"]), rtol=1e-6)
    # compat flag: passed lambda ignored, default used (reference bug,
    # codes/loss.py:189-190)
    cfg_bug = LossConfig(default_lambda_value=10.0, replicate_lambda_override_bug=True)
    res_bug = perceptual_loss(params, c, s, o, cfg_bug, lambda_value=2.0)
    np.testing.assert_allclose(
        float(res_bug["total"]),
        float(res_bug["content"]) + 10.0 * float(res_bug["style"]), rtol=1e-6)
    # similarity: identical features -> 0 under the replicate-bug flag
    cfg_sim = LossConfig(replicate_similarity_bug=True)
    res_sim = perceptual_loss(params, c, s, o, cfg_sim, compute_similarity=True)
    assert float(res_sim["similarity"]) == 0.0
