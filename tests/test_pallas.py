"""Fused Pallas window-attention kernel parity vs the XLA path.

Runs in interpret mode on the CPU test mesh (the dispatch in ops/attention.py
selects interpret automatically off-TPU), so these tests validate the exact
kernel program that runs compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mastermetastyletransfer_tpu.config import AttentionConfig, ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model, master_apply
from mastermetastyletransfer_tpu.ops.attention import (
    init_dual_value_window_attention, init_window_attention,
    shifted_window_attention, shifted_window_attention_dual_value,
)


@pytest.mark.parametrize("shift", [(0, 0), (4, 4)])
@pytest.mark.parametrize("hw", [(21, 21), (16, 16)])  # exact and padded grids
def test_fused_single_matches_xla(rng, shift, hw):
    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=shift)
    params = init_window_attention(jax.random.PRNGKey(0), cfg)
    h, w = hw
    q = jnp.asarray(rng.standard_normal((2, h, w, 64), np.float32))
    k = jnp.asarray(rng.standard_normal((2, h, w, 64), np.float32))
    v = jnp.asarray(rng.standard_normal((2, h, w, 64), np.float32))
    ref = shifted_window_attention(params, q, k, v, cfg)
    out = shifted_window_attention(params, q, k, v, cfg.replace(use_pallas=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("key_in_after", [True, False])
def test_fused_dual_matches_xla(rng, key_in_after):
    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=(4, 4))
    params = init_dual_value_window_attention(jax.random.PRNGKey(0), cfg)
    x = [jnp.asarray(rng.standard_normal((1, 18, 20, 64), np.float32))
         for _ in range(4)]
    s_ref, m_ref = shifted_window_attention_dual_value(
        params, *x, cfg, key_instance_norm_after_linear=key_in_after)
    s, m = shifted_window_attention_dual_value(
        params, *x, cfg.replace(use_pallas=True),
        key_instance_norm_after_linear=key_in_after)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-4, atol=1e-4)


def test_full_model_pallas_matches_xla():
    cfg = ModelConfig()
    cfg_p = ModelConfig(
        swin=cfg.swin.replace(use_pallas=True),
        transformer=cfg.transformer.replace(use_pallas=True),
        decoder=cfg.decoder)
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    c = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    ref = master_apply(params, c, s, cfg, k=1)
    out = master_apply(params, c, s, cfg_p, k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
