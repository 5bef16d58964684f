"""Model-level shape/behavior tests: swin backbone, style transformer, CNN
decoder, full master model."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import (
    DecoderConfig, ModelConfig, StyleTransformerConfig, SwinConfig,
)
from mastermetastyletransfer_tpu.models import (
    init_cnn_decoder, cnn_decoder_apply,
    init_swin_backbone, swin_backbone_apply,
    init_style_transformer, style_transformer_apply,
    init_master_model, master_apply,
)


def _param_count(p):
    return sum(x.size for x in jax.tree_util.tree_leaves(p))


def test_cnn_decoder_shapes():
    cfg = DecoderConfig()
    params = init_cnn_decoder(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 32, 32, 256))
    y = cnn_decoder_apply(params, x, cfg)
    assert y.shape == (2, 256, 256, 3)
    # 9 convs (reference: codes/decoder.py:23-55)
    assert len(params) == 9


def test_swin_backbone_shapes():
    cfg = SwinConfig.for_variant("swin_B")
    params = init_swin_backbone(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 256, 256, 3))
    y = swin_backbone_apply(params, x, cfg)
    # first 2 stages: 256/4 = 64 -> merge -> 32, dim 2*128
    assert y.shape == (1, 32, 32, 256)


def test_style_transformer_unrolled_vs_scan():
    """Static-k unrolled loop and masked-scan must agree for every k."""
    cfg = StyleTransformerConfig(
        encoder_dim=32, decoder_dim=32, encoder_num_heads=4, decoder_num_heads=4)
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    fc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 32))
    fs = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 32))
    for k in [1, 2, 3]:
        unrolled = style_transformer_apply(params, fc, fs, cfg, k=k)
        for impl in ("scan", "switch"):
            traced = style_transformer_apply(
                params, fc, fs, cfg.replace(traced_k_impl=impl),
                k=jnp.asarray(k), max_k=3)
            np.testing.assert_allclose(np.asarray(unrolled),
                                       np.asarray(traced), atol=1e-5)


def test_master_model_end_to_end():
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    content = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    style = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    out = master_apply(params, content, style, cfg, k=1)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())
    # sane scale: swin_B first-2-stages (~2M) + style transformer (~3.5M)
    # + CNN decoder (~1M) ≈ 7M params
    n = _param_count(params)
    assert 3_000_000 < n < 30_000_000, n


def test_master_model_train_mode_stochastic():
    """Train mode with rng must differ across rngs (stochastic depth active)
    and eval mode must be deterministic."""
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    c = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    o1 = master_apply(params, c, s, cfg, k=1)
    o2 = master_apply(params, c, s, cfg, k=1)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    t1 = master_apply(params, c, s, cfg, k=1, deterministic=False,
                      rng=jax.random.PRNGKey(3))
    t2 = master_apply(params, c, s, cfg, k=1, deterministic=False,
                      rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_mixed_precision_stage_policy():
    """Per-stage dtype overrides (ModelConfig.{swin,transformer,decoder}_dtype,
    r4 mixed-precision operating points): all-f32 overrides match the plain
    f32 path exactly, a mixed assignment runs end-to-end and tracks the f32
    output at bf16-rounding error, and stage_dtype falls back to
    compute_dtype when unset."""
    cfg = ModelConfig()
    assert cfg.stage_dtype("swin") == "float32"
    assert cfg.replace(compute_dtype="bfloat16").stage_dtype("decoder") == \
        "bfloat16"
    assert cfg.replace(transformer_dtype="bfloat16").stage_dtype(
        "transformer") == "bfloat16"

    params = init_master_model(jax.random.PRNGKey(0), cfg)
    c = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    base = np.asarray(master_apply(params, c, s, cfg, k=1))

    all_f32 = cfg.replace(swin_dtype="float32", transformer_dtype="float32",
                          decoder_dtype="float32")
    np.testing.assert_allclose(
        np.asarray(master_apply(params, c, s, all_f32, k=1)), base,
        rtol=0, atol=5e-6)

    mixed = cfg.replace(swin_dtype="bfloat16", transformer_dtype="float32",
                        decoder_dtype="float32")
    out = np.asarray(master_apply(params, c, s, mixed, k=1))
    assert out.dtype == np.float32
    err = np.mean(np.abs(out - base))
    assert 0 < err < 0.2, err  # ran bf16 somewhere, still sane

    # JSON round-trip preserves the policy (config snapshots in exp dirs)
    rt = ModelConfig.from_dict(json.loads(mixed.to_json()))
    assert rt == mixed


def test_swin_variants():
    """swin_T / swin_S / swin_B configs all build and run
    (reference: codes/utils.py:59-102 variants)."""
    for variant, out_dim in [("swin_T", 192), ("swin_S", 192), ("swin_B", 256)]:
        cfg = SwinConfig.for_variant(variant)
        params = init_swin_backbone(jax.random.PRNGKey(0), cfg)
        y = swin_backbone_apply(params, jnp.zeros((1, 64, 64, 3)), cfg)
        assert y.shape == (1, 8, 8, out_dim), (variant, y.shape)


def test_style_transformer_windowed_fast_path_parity():
    """Window-resident eval fast path == generic composed path (both k=1 and
    k=2, non-divisible 36x36 grid exercising pad-token re-zeroing and masked
    instance-norm stats)."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_transformer_apply_windowed,
    )

    cfg = StyleTransformerConfig(use_pallas=True)
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    fc = jax.random.normal(jax.random.PRNGKey(1), (2, 36, 36, 256)) * 0.5
    fs = jax.random.normal(jax.random.PRNGKey(2), (2, 36, 36, 256)) * 0.5
    for k in (1, 2):
        want = style_transformer_apply(
            params, fc, fs, cfg.replace(use_pallas=False), k=k)
        got = style_transformer_apply_windowed(params, fc, fs, cfg, k=k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
        # the dispatcher must route to the windowed path
        via = style_transformer_apply(params, fc, fs, cfg, k=k)
        np.testing.assert_allclose(np.asarray(via), np.asarray(got),
                                   rtol=0, atol=0)


def test_style_transformer_windowed_config_branches():
    """Windowed fast path parity across the reference's config branches:
    encoder norm, unprocessed-Key order, decoder affine IN, key-IN before
    linear, MLP-less decoder self block, decoder without norm."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        _st_windowed_ok, style_transformer_apply_windowed,
    )

    variants = [
        dict(encoder_use_norm=True),
        dict(encoder_if_use_processed_Key_in_Scale_and_Shift_calculation=False),
        dict(decoder_use_instance_norm_with_affine=True),
        dict(decoder_use_Key_instance_norm_after_linear_transformation=False),
        dict(decoder_exclude_MLP_after_Fcs_self_MHA=True),
        dict(decoder_use_norm=False),
    ]
    fc = jax.random.normal(jax.random.PRNGKey(1), (1, 29, 29, 256)) * 0.5
    fs = jax.random.normal(jax.random.PRNGKey(2), (1, 29, 29, 256)) * 0.5
    for kw in variants:
        cfg = StyleTransformerConfig(use_pallas=True, **kw)
        assert _st_windowed_ok(cfg, True), kw
        params = init_style_transformer(jax.random.PRNGKey(0), cfg)
        if kw.get("decoder_use_instance_norm_with_affine"):
            # NON-identity affine: freshly-initialized scale=1/bias=0 would
            # mask a dropped-affine bug (found in review round 2)
            for which in ("in_q", "in_k"):
                aff = params["decoder"][which]
                params["decoder"][which] = {
                    "scale": aff["scale"] * 1.3 + 0.1,
                    "bias": aff["bias"] + 0.2,
                }
        want = style_transformer_apply(
            params, fc, fs, cfg.replace(use_pallas=False), k=1)
        got = style_transformer_apply_windowed(params, fc, fs, cfg, k=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2, err_msg=str(kw))
    # the regular-MHA tail must NOT take the windowed path
    cfg = StyleTransformerConfig(
        use_pallas=True, decoder_use_regular_MHA_instead_of_Swin_at_the_end=True)
    assert not _st_windowed_ok(cfg, True)


def test_style_stream_matches_interleaved_apply():
    """Precomputed style stream (content-independent encoder triples) +
    stream decode == the interleaved apply, for the windowed fast path AND
    the generic path, k=1 and k=3; a batch-1 stream broadcasts over a
    larger content batch (style-locked serving)."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_transformer_apply_from_stream, style_transformer_stream,
    )

    fc = jax.random.normal(jax.random.PRNGKey(1), (2, 36, 36, 256)) * 0.5
    fs = jax.random.normal(jax.random.PRNGKey(2), (2, 36, 36, 256)) * 0.5
    for cfg in (StyleTransformerConfig(use_pallas=True),
                StyleTransformerConfig(
                    use_pallas=False,
                    decoder_use_regular_MHA_instead_of_Swin_at_the_end=True)):
        params = init_style_transformer(jax.random.PRNGKey(0), cfg)
        for k in (1, 3):
            want = style_transformer_apply(params, fc, fs, cfg, k=k)
            stream = style_transformer_stream(params, fs, cfg, k=k)
            got = style_transformer_apply_from_stream(params, fc, stream, cfg)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
        # batch-1 style stream broadcast over a content batch of 2
        want1 = style_transformer_apply(
            params, fc, jnp.tile(fs[:1], (2, 1, 1, 1)), cfg, k=1)
        s1 = style_transformer_stream(params, fs[:1], cfg, k=1)
        got1 = style_transformer_apply_from_stream(params, fc, s1, cfg)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                                   rtol=1e-5, atol=1e-5)


def test_style_transformer_windowed_split_fallback_parity():
    """The f32 separate-kernel fallback (fuse_iteration=False — taken on
    hardware when the compute dtype is 4-byte, where the iteration-fusion
    kernels exceed the 16 MB scoped-VMEM limit even at bsub=1) matches the
    fused formulation."""
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_transformer_apply_windowed,
    )

    cfg = StyleTransformerConfig(use_pallas=True)
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    fc = jax.random.normal(jax.random.PRNGKey(1), (2, 36, 36, 256)) * 0.5
    fs = jax.random.normal(jax.random.PRNGKey(2), (2, 36, 36, 256)) * 0.5
    for k in (1, 2):
        fused = style_transformer_apply_windowed(
            params, fc, fs, cfg, k=k, fuse_iteration=True)
        split = style_transformer_apply_windowed(
            params, fc, fs, cfg, k=k, fuse_iteration=False)
        np.testing.assert_allclose(np.asarray(split), np.asarray(fused),
                                   rtol=1e-4, atol=1e-4)


def test_swin_variants_pallas_parity():
    """swin_T/S (embed dims 96/192): Mosaic rejects non-128-aligned lane
    reshapes on real hardware, so use_pallas must fall back to the XLA path
    (including disabling the padded-resident stages whose safety depends on
    the fused kernel's validity mask) and still match exactly."""
    for variant in ("swin_T", "swin_S"):
        cfg_x = SwinConfig.for_variant(variant)
        cfg_p = cfg_x.replace(use_pallas=True)
        params = init_swin_backbone(jax.random.PRNGKey(0), cfg_x)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        want = swin_backbone_apply(params, x, cfg_x)
        got = swin_backbone_apply(params, x, cfg_p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2, err_msg=variant)


def test_blend_style_streams():
    """Style interpolation at the stream level: weights [1,0] reproduce
    stream A exactly; a 50/50 blend is finite and differs from both ends."""
    from mastermetastyletransfer_tpu.inference import blend_style_streams
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_transformer_apply_from_stream, style_transformer_stream,
    )

    cfg = StyleTransformerConfig(use_pallas=True)
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    fc = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 256)) * 0.5
    fsa = jax.random.normal(jax.random.PRNGKey(2), (1, 28, 28, 256)) * 0.5
    fsb = jax.random.normal(jax.random.PRNGKey(3), (1, 28, 28, 256)) * 0.5
    sa = style_transformer_stream(params, fsa, cfg, k=1)
    sb = style_transformer_stream(params, fsb, cfg, k=1)

    out_a = style_transformer_apply_from_stream(params, fc, sa, cfg)
    pure_a = style_transformer_apply_from_stream(
        params, fc, blend_style_streams([sa, sb], [1.0, 0.0]), cfg)
    np.testing.assert_allclose(np.asarray(pure_a), np.asarray(out_a),
                               rtol=1e-6, atol=1e-6)

    mix = style_transformer_apply_from_stream(
        params, fc, blend_style_streams([sa, sb], [0.5, 0.5]), cfg)
    out_b = style_transformer_apply_from_stream(params, fc, sb, cfg)
    assert np.isfinite(np.asarray(mix)).all()
    assert not np.allclose(np.asarray(mix), np.asarray(out_a), atol=1e-3)
    assert not np.allclose(np.asarray(mix), np.asarray(out_b), atol=1e-3)


def test_style_stream_guards():
    """Geometry and weight-validation guards: decoding against a stream
    built at a different feature size raises; blend validates weights."""
    import pytest

    from mastermetastyletransfer_tpu.inference import blend_style_streams
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_transformer_apply_from_stream, style_transformer_stream,
    )

    cfg = StyleTransformerConfig(use_pallas=True)
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    fs = jax.random.normal(jax.random.PRNGKey(2), (1, 28, 28, 256)) * 0.5
    stream = style_transformer_stream(params, fs, cfg, k=1)

    # same padded window grid (28x28 both pad to 28), different valid size
    fc_26 = jax.random.normal(jax.random.PRNGKey(1), (1, 26, 26, 256)) * 0.5
    with pytest.raises(ValueError, match="share \\(H, W\\)"):
        style_transformer_apply_from_stream(params, fc_26, stream, cfg)

    with pytest.raises(ValueError, match="weights"):
        blend_style_streams([stream, stream], [1.0])
    with pytest.raises(ValueError, match="zero"):
        blend_style_streams([stream, stream], [0.0, 0.0])
