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


@pytest.mark.parametrize("shift", [(0, 0), (4, 4)])
def test_block_rows_resident_matches_tile_path(rng, shift, monkeypatch):
    """The r4 row-resident whole-block kernel (geometry folded into index
    maps) must match the per-window-tile block kernel + XLA geometry it
    replaced, on a padded grid with a shift (both paths through
    fused_self_attention_block; hardware runs rows-resident only at bf16 —
    the f32 VMEM gate — but interpret mode tests the kernel at f32)."""
    from mastermetastyletransfer_tpu.ops.attention import (
        fused_self_attention_block,
    )

    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=shift, use_pallas=True)
    params = init_window_attention(jax.random.PRNGKey(0), cfg)
    mlp = {"fc1": {"kernel": jnp.asarray(
                       rng.standard_normal((64, 256)) * 0.02, jnp.float32),
                   "bias": jnp.zeros((256,))},
           "fc2": {"kernel": jnp.asarray(
                       rng.standard_normal((256, 64)) * 0.02, jnp.float32),
                   "bias": jnp.zeros((64,))}}
    norm = lambda: {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
    block = {"attn": params, "mlp": mlp, "norm1": norm(), "norm2": norm()}
    x = jnp.asarray(rng.standard_normal((2, 18, 20, 64)), jnp.float32)

    monkeypatch.setenv("MMST_ROWS_RESIDENT", "0")
    ref = fused_self_attention_block(block, x, cfg, use_norm=True)
    monkeypatch.setenv("MMST_ROWS_RESIDENT", "1")
    out = fused_self_attention_block(block, x, cfg, use_norm=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _win_partition(x, wh=7, ww=7):
    """(B, H, W, C) divisible grid -> (B, nW, N, C) (no roll/pad; the fused
    iteration kernels operate on already-partitioned window tensors)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h // wh) * (w // ww), wh * ww, c)


def test_fused_encoder_scale_shift_kernel(rng):
    """One-program encoder Scale/Shift step vs the unfused op chain
    (reference codes/style_transformer.py:867-882)."""
    from mastermetastyletransfer_tpu.ops.mlp import init_mlp
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_encoder_scale_shift,
    )
    from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
        window_attention_dual,
    )
    from mastermetastyletransfer_tpu.ops.pallas_mlp import fused_ln_mlp_residual
    from mastermetastyletransfer_tpu.ops.windows import (
        relative_position_bias, shift_attention_mask,
    )

    c, heads = 128, 4
    cfg = AttentionConfig(dim=c, num_heads=heads, window_size=(7, 7),
                          shift_size=(4, 4))
    attn = init_window_attention(jax.random.PRNGKey(0), cfg)
    mlp_s = init_mlp(jax.random.PRNGKey(1), c, 4 * c, init="xavier_uniform")
    mlp_h = init_mlp(jax.random.PRNGKey(2), c, 4 * c, init="xavier_uniform")
    bias = relative_position_bias(attn["rel_bias_table"], 7, 7)
    m = shift_attention_mask(21, 28, 7, 7, 4, 4)
    mkey = (m.shape, tuple(m.ravel().tolist()))

    key, scale, shift = (jnp.asarray(
        rng.standard_normal((2, 3 * 4, 49, c), np.float32) * 0.5)
        for _ in range(3))

    # reference chain: projections outside, dual attention, 2 MLP residuals
    from mastermetastyletransfer_tpu.ops.mlp import linear
    q = linear(attn["wq"], key)
    kk = linear(attn["wk"], key)
    shared = {"wv_scale": attn["wv"], "wv_shift": attn["wv"],
              "proj": attn["proj"]}
    a1, a2 = window_attention_dual(shared, q, kk, scale, shift, bias,
                                   mkey, heads)
    want_s = fused_ln_mlp_residual(scale + a1, mlp_s, None, interpret=True)
    want_h = fused_ln_mlp_residual(shift + a2, mlp_h, None, interpret=True)

    got_s, got_h = fused_encoder_scale_shift(
        attn, key, scale, shift, bias, m, heads, mlp_s, mlp_h,
        None, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-4, atol=2e-4)


def test_fused_decoder_tail_kernel(rng):
    """One-program decoder tail (dual attention + sigma/mu modulation +
    last-MLP residual) vs the unfused chain
    (reference codes/style_transformer.py:1059-1125)."""
    from mastermetastyletransfer_tpu.ops.mlp import init_mlp
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_decoder_tail,
    )
    from mastermetastyletransfer_tpu.ops.pallas_attention_vjp import (
        window_attention_dual,
    )
    from mastermetastyletransfer_tpu.ops.pallas_mlp import fused_ln_mlp_residual
    from mastermetastyletransfer_tpu.ops.windows import relative_position_bias

    c, heads = 128, 4
    cfg = AttentionConfig(dim=c, num_heads=heads, window_size=(7, 7),
                          shift_size=(0, 0))
    dual = init_dual_value_window_attention(jax.random.PRNGKey(3), cfg)
    mlp = init_mlp(jax.random.PRNGKey(4), c, 4 * c, init="xavier_uniform")
    bias = relative_position_bias(dual["rel_bias_table"], 7, 7)

    q, kk, vs, vh, query = (jnp.asarray(
        rng.standard_normal((2, 8, 49, c), np.float32) * 0.5)
        for _ in range(5))

    s_ref, m_ref = window_attention_dual(dual, q, kk, vs, vh, bias,
                                         None, heads)
    want = fused_ln_mlp_residual(query * s_ref + m_ref, mlp, None,
                                 interpret=True)
    got = fused_decoder_tail(dual, q, kk, vs, vh, query, bias, None,
                             heads, mlp, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kdot_split3_accuracy_and_native_identity():
    """ops/precision.kdot: 'split3' must land in the ~1e-5 relative class
    (the 3-pass hi/lo decomposition drops only the lo@lo term) and 'native'
    must be bit-identical to a plain dot."""
    from mastermetastyletransfer_tpu.ops.precision import kdot, matmul_mode

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    oracle = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(oracle).mean()

    native = np.asarray(kdot(a, b))
    np.testing.assert_array_equal(
        native, np.asarray(jnp.dot(a, b, preferred_element_type=jnp.float32)))

    with matmul_mode("split3"):
        out = np.asarray(kdot(a, b))
    rel = np.abs(out - oracle).mean() / scale
    assert rel < 5e-5, rel
    # and it must NOT be the 1-pass bf16 result (~2e-3)
    bf = np.asarray(jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), np.float64)
    assert rel < 0.1 * np.abs(bf - oracle).mean() / scale


def test_full_model_pallas_split3_compliant():
    """matmul_mode='split3' through every Pallas forward kernel (interpret
    mode on CPU): the full-model output stays in the <=1e-3-MAE class vs the
    plain f32 XLA forward, and differs from it (the mode is actually live).
    This is the accuracy half of the 'float32-split3+pallas' operating point
    (scripts/operating_points.py)."""
    cfg = ModelConfig()
    cfg_p = ModelConfig(
        swin=cfg.swin.replace(use_pallas=True, matmul_mode="split3"),
        transformer=cfg.transformer.replace(use_pallas=True,
                                            matmul_mode="split3"),
        decoder=cfg.decoder.replace(use_pallas=True, matmul_mode="split3"))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    c = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    ref = np.asarray(master_apply(params, c, s, cfg, k=1))
    out = np.asarray(master_apply(params, c, s, cfg_p, k=1))
    mae = np.abs(out - ref).mean()
    assert mae <= 1e-3, mae
    assert mae > 0.0  # split3 is live, not silently falling back to f32


def test_vmem_budget_scale_contextvar():
    """ops/vmem trace-time budget scaling: composes multiplicatively,
    resets on exit, and shrinks the kernels' picked tiles (the lambda-sweep
    vmap fix — the 2-set sweep scope-OOM'd the row-resident kernel at
    16.12M/16.00M with the calibrated budgets, r4)."""
    from mastermetastyletransfer_tpu.ops.pallas_attention import _pick_bsub
    from mastermetastyletransfer_tpu.ops.pallas_mlp import (
        _default_budget_rows,
    )
    from mastermetastyletransfer_tpu.ops.vmem import (
        budget_scale, vmem_budget_scale,
    )

    assert budget_scale() == 1.0
    base_bsub = _pick_bsub(8, 128, 245)
    base_rows = _default_budget_rows(1024, 2)
    with vmem_budget_scale(0.5):
        assert budget_scale() == 0.5
        with vmem_budget_scale(0.5):
            assert budget_scale() == 0.25
            assert _pick_bsub(8, 128, 245) <= max(1, base_bsub // 2)
        assert _default_budget_rows(1024, 2) <= base_rows // 2 + 8
    assert budget_scale() == 1.0
    assert _pick_bsub(8, 128, 245) == base_bsub
