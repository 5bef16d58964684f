"""Regression pins for the r5 kernel knobs (PERF.md "Round-5 levers").

Each knob was A/B'd on hardware and is OFF by default (the winners are
elsewhere); these tests keep the gated code paths from bit-rotting — the
same contract as the r4 patch-embed negative-result kernel. Env gates are
read at trace time; the calls below are un-jitted so each one re-traces
under the monkeypatched environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply


@pytest.fixture(scope="module")
def swin_setup():
    base = ModelConfig()
    cfg = base.swin.replace(use_pallas=True)
    params = init_master_model(jax.random.PRNGKey(0), base)["swin"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 3)).astype(np.float32))
    ref = np.asarray(swin_backbone_apply(params, x, cfg))
    return cfg, params, x, ref


def test_gelu_lowp_matches_exact_gelu():
    """_gelu_lowp (the comparison-free A-S erf form: x*sign(x) = |x|) is
    the exact-erf GELU to the A-S approximation bound at f32."""
    from mastermetastyletransfer_tpu.ops.pallas_attention import _gelu_lowp

    x = jnp.asarray(np.linspace(-6, 6, 4001), jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(_gelu_lowp(x)), np.asarray(ref),
                               atol=1e-6)


def test_block_pair_kernel_bitwise(swin_setup, monkeypatch):
    """The two-blocks-one-program pipeline kernel (closed negative on
    hardware, kept as the gated record) is BITWISE equal to the sequential
    two-kernel path in interpret mode — pins the scratch-lag + cyclic-wrap
    logic."""
    cfg, params, x, ref = swin_setup
    monkeypatch.setenv("MMST_BLOCK_PAIR", "1")
    out = np.asarray(swin_backbone_apply(params, x, cfg))
    np.testing.assert_array_equal(out, ref)


def test_mlp_chunking_and_qkv_split_exact(swin_setup, monkeypatch):
    """Hidden-dim chunked MLP + split QKV projections: same math, only
    f32 accumulation order differs (fc2 partials)."""
    cfg, params, x, ref = swin_setup
    monkeypatch.setenv("MMST_MLP_CHUNKS", "4")
    monkeypatch.setenv("MMST_QKV_SPLIT", "1")
    out = np.asarray(swin_backbone_apply(params, x, cfg))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_hid_bf16_knob_close_to_baseline(swin_setup, monkeypatch):
    """MMST_HID_BF16 (bf16 MLP hidden buffer; closed -5% on hardware but
    kept as a knob): bf16-path output stays within bf16 rounding of the
    f32-hidden bf16 path, and the f32 path is untouched."""
    cfg, params, x, ref = swin_setup
    xb = x.astype(jnp.bfloat16)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    base_bf = np.asarray(swin_backbone_apply(pb, xb, cfg), np.float32)
    monkeypatch.setenv("MMST_HID_BF16", "1")
    on_bf = np.asarray(swin_backbone_apply(pb, xb, cfg), np.float32)
    scale = np.abs(base_bf).mean()
    # measured 6.7e-3 rel across the two-stage backbone (bf16 GELU rounding
    # compounds per block); the bound guards gross breakage, not noise
    assert np.mean(np.abs(on_bf - base_bf)) / scale < 2e-2
    on_f32 = np.asarray(swin_backbone_apply(params, x, cfg))
    np.testing.assert_array_equal(on_f32, ref)
