"""Converter tests: synthetic torch-layout state dicts -> params that load
and run; BN folding validated against torch's own conv+batchnorm."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mastermetastyletransfer_tpu.config import ModelConfig, StyleTransformerConfig, SwinConfig
from mastermetastyletransfer_tpu.models import (
    init_master_model, master_apply,
    init_style_transformer, style_transformer_apply,
    swin_backbone_apply,
)
from mastermetastyletransfer_tpu.utils import convert


def _r(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.05


def make_swin_block_sd(rng, dim):
    """A single original-Swin block state_dict (the surgery source layout)."""
    return {
        "0.weight": _r(rng, dim), "0.bias": _r(rng, dim),
        "1.relative_position_bias_table": _r(rng, 169, 8),
        "1.relative_position_index": np.zeros((49, 49), np.int64),
        "1.qkv.weight": _r(rng, 3 * dim, dim), "1.qkv.bias": _r(rng, 3 * dim),
        "1.proj.weight": _r(rng, dim, dim), "1.proj.bias": _r(rng, dim),
        "3.weight": _r(rng, dim), "3.bias": _r(rng, dim),
        "4.fc1.weight": _r(rng, 4 * dim, dim), "4.fc1.bias": _r(rng, 4 * dim),
        "4.fc2.weight": _r(rng, dim, 4 * dim), "4.fc2.bias": _r(rng, dim),
    }


def make_swin_backbone_sd(rng, cfg: SwinConfig):
    e = cfg.embed_dim
    sd = {
        "0.0.weight": _r(rng, e, 3, 4, 4), "0.0.bias": _r(rng, e),
        "0.2.weight": _r(rng, e), "0.2.bias": _r(rng, e),
        "2.norm.weight": _r(rng, 4 * e), "2.norm.bias": _r(rng, 4 * e),
        "2.reduction.weight": _r(rng, 2 * e, 4 * e),
    }
    for seq, stage in (("1", 0), ("3", 1)):
        d = e * (2 ** stage)
        heads = cfg.num_heads[stage]
        tbl = (2 * cfg.window_size[0] - 1) * (2 * cfg.window_size[1] - 1)
        for b in range(cfg.depths[stage]):
            p = f"{seq}.{b}"
            sd.update({
                f"{p}.norm1.weight": _r(rng, d), f"{p}.norm1.bias": _r(rng, d),
                f"{p}.attn.qkv.weight": _r(rng, 3 * d, d),
                f"{p}.attn.qkv.bias": _r(rng, 3 * d),
                f"{p}.attn.proj.weight": _r(rng, d, d),
                f"{p}.attn.proj.bias": _r(rng, d),
                f"{p}.attn.relative_position_bias_table": _r(rng, tbl, heads),
                f"{p}.norm2.weight": _r(rng, d), f"{p}.norm2.bias": _r(rng, d),
                f"{p}.mlp.0.weight": _r(rng, 4 * d, d), f"{p}.mlp.0.bias": _r(rng, 4 * d),
                f"{p}.mlp.3.weight": _r(rng, d, 4 * d), f"{p}.mlp.3.bias": _r(rng, d),
            })
    return sd


def make_style_transformer_sd(rng, dim=256):
    sd = {}
    tbl = 169

    def attn(prefix):
        sd.update({
            f"{prefix}.Wq.weight": _r(rng, dim, dim), f"{prefix}.Wq.bias": _r(rng, dim),
            f"{prefix}.Wk.weight": _r(rng, dim, dim), f"{prefix}.Wk.bias": _r(rng, dim),
            f"{prefix}.Wv.weight": _r(rng, dim, dim), f"{prefix}.Wv.bias": _r(rng, dim),
            f"{prefix}.proj.weight": _r(rng, dim, dim), f"{prefix}.proj.bias": _r(rng, dim),
            f"{prefix}.relative_position_bias_table": _r(rng, tbl, 8),
        })

    def mlp(prefix):
        sd.update({
            f"{prefix}.0.weight": _r(rng, 4 * dim, dim), f"{prefix}.0.bias": _r(rng, 4 * dim),
            f"{prefix}.3.weight": _r(rng, dim, 4 * dim), f"{prefix}.3.bias": _r(rng, dim),
        })

    attn("encoder.shared_MHA_without_MLP.attn")
    mlp("encoder.encoder_MLP_Key")
    mlp("encoder.encoder_MLP_Scale")
    mlp("encoder.encoder_MLP_Shift")
    attn("decoder.MHA_self_attn.attn")
    sd.update({
        "decoder.MHA_self_attn.norm1.weight": _r(rng, dim),
        "decoder.MHA_self_attn.norm1.bias": _r(rng, dim),
        "decoder.MHA_self_attn.norm2.weight": _r(rng, dim),
        "decoder.MHA_self_attn.norm2.bias": _r(rng, dim),
    })
    mlp("decoder.MHA_self_attn.mlp")
    pre = "decoder.decoder_MHA_for_sigma_and_mu"
    sd.update({
        f"{pre}.Wk.weight": _r(rng, dim, dim), f"{pre}.Wk.bias": _r(rng, dim),
        f"{pre}.Wv_scale.weight": _r(rng, dim, dim), f"{pre}.Wv_scale.bias": _r(rng, dim),
        f"{pre}.Wv_shift.weight": _r(rng, dim, dim), f"{pre}.Wv_shift.bias": _r(rng, dim),
        f"{pre}.proj.weight": _r(rng, dim, dim), f"{pre}.proj.bias": _r(rng, dim),
        f"{pre}.relative_position_bias_table": _r(rng, tbl, 8),
    })
    mlp("decoder.last_MLP")
    return sd


def test_convert_swin_backbone_runs(rng):
    cfg = SwinConfig.for_variant("swin_B")
    sd = make_swin_backbone_sd(rng, cfg)
    params = convert.convert_swin_backbone(sd, cfg)
    y = swin_backbone_apply(params, jnp.zeros((1, 64, 64, 3)), cfg)
    assert y.shape == (1, 8, 8, 256)
    # qkv split parity: first third of fused weight == wq kernel (transposed)
    w = sd["1.0.attn.qkv.weight"]
    np.testing.assert_array_equal(
        np.asarray(params["stage0_block0"]["attn"]["wq"]["kernel"]), w[:128].T)


def test_convert_style_transformer_runs(rng):
    cfg = StyleTransformerConfig()
    sd = make_style_transformer_sd(rng)
    params = convert.convert_style_transformer(sd, cfg)
    fc = jnp.asarray(rng.standard_normal((1, 16, 16, 256)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((1, 16, 16, 256)).astype(np.float32))
    out = style_transformer_apply(params, fc, fs, cfg, k=1)
    assert out.shape == fc.shape and bool(jnp.isfinite(out).all())


def test_seed_from_swin_block(rng):
    cfg = StyleTransformerConfig()
    params = init_style_transformer(jax.random.PRNGKey(0), cfg)
    block_sd = make_swin_block_sd(rng, 256)
    seeded = convert.seed_style_transformer_from_swin_block(block_sd, params, cfg)
    # every non-positional leaf must have changed (the reference's
    # verification criterion, codes/full_model.py:198-204)
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(seeded)[0])
    changed, total = 0, 0
    for path, old in flat_old:
        if "rel_bias_table" in str(path):
            continue
        total += 1
        if not np.array_equal(np.asarray(old), np.asarray(flat_new[path])):
            changed += 1
    assert changed == total, f"only {changed}/{total} leaves changed"
    # dual-MHA mapping: Wv_scale and Wv_shift both get the fused v third
    v = block_sd["1.qkv.weight"][512:]
    np.testing.assert_array_equal(
        np.asarray(seeded["decoder"]["dual_mha"]["wv_scale"]["kernel"]), v.T)
    np.testing.assert_array_equal(
        np.asarray(seeded["decoder"]["dual_mha"]["wv_shift"]["kernel"]), v.T)
    # seeded model still runs
    fc = jnp.asarray(rng.standard_normal((1, 16, 16, 256)).astype(np.float32))
    out = style_transformer_apply(seeded, fc, fc, cfg, k=2)
    assert bool(jnp.isfinite(out).all())


def test_vgg_bn_folding_matches_torch(rng):
    """Folded conv+BN must equal torch's conv followed by eval-mode BN."""
    cin, cout = 3, 8
    w = _r(rng, cout, cin, 3, 3)
    b = _r(rng, cout)
    gamma = 1.0 + _r(rng, cout)
    beta = _r(rng, cout)
    mean = _r(rng, cout)
    var = np.abs(_r(rng, cout)) + 0.5
    sd = {"features.0.weight": w, "features.0.bias": b,
          "features.1.weight": gamma, "features.1.bias": beta,
          "features.1.running_mean": mean, "features.1.running_var": var}
    # only convert the first conv: build a minimal plan slice by hand
    folded = convert.convert_vgg19(
        {**sd, **{f"features.{i}.weight": _r(rng, 8, 8, 3, 3) for i in
                  convert._VGG19_BN_CONV_IDX[1:]},
         **{f"features.{i}.bias": _r(rng, 8) for i in convert._VGG19_BN_CONV_IDX[1:]},
         **{f"features.{i+1}.weight": np.ones(8, np.float32) for i in
            convert._VGG19_BN_CONV_IDX[1:]},
         **{f"features.{i+1}.bias": np.zeros(8, np.float32) for i in
            convert._VGG19_BN_CONV_IDX[1:]},
         **{f"features.{i+1}.running_mean": np.zeros(8, np.float32) for i in
            convert._VGG19_BN_CONV_IDX[1:]},
         **{f"features.{i+1}.running_var": np.ones(8, np.float32) for i in
            convert._VGG19_BN_CONV_IDX[1:]}},
        use_batchnorm=True)["conv0"]

    x = rng.standard_normal((1, cin, 10, 10)).astype(np.float32)
    tx = torch.from_numpy(x)
    ty = torch.nn.functional.conv2d(tx, torch.from_numpy(w), torch.from_numpy(b), padding=0)
    ty = torch.nn.functional.batch_norm(
        ty, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(gamma), torch.from_numpy(beta), training=False, eps=1e-5)
    want = ty.numpy().transpose(0, 2, 3, 1)

    from mastermetastyletransfer_tpu.ops.conv import conv2d
    got = np.asarray(conv2d(folded, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convert_master_model_assembly(rng):
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    st_sd = make_style_transformer_sd(rng)
    swin_sd = make_swin_backbone_sd(rng, cfg.swin)
    new = convert.convert_master_model(st_sd, None, swin_sd, params, cfg)
    out = master_apply(new, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), cfg)
    assert out.shape == (1, 64, 64, 3) and bool(jnp.isfinite(out).all())


def test_split_whole_model_state_dict(rng):
    """save_whole_model layout (reference train_only_inner_loop.py:382-385):
    prefix routing, decoder double-prefix handling, unknown-key rejection."""
    cfg = ModelConfig()
    st_sd = make_style_transformer_sd(rng)
    swin_sd = make_swin_backbone_sd(rng, cfg.swin)
    dec_sd = {f"decoder.{i}.weight": _r(rng, 8, 8, 3, 3)
              for i in (0, 3, 5, 7, 9, 12, 14, 17, 19)}
    dec_sd.update({f"decoder.{i}.bias": _r(rng, 8)
                   for i in (0, 3, 5, 7, 9, 12, 14, 17, 19)})
    whole = {}
    whole.update({f"swin_encoder.{k}": v for k, v in swin_sd.items()})
    whole.update({f"style_transformer.{k}": v for k, v in st_sd.items()})
    whole.update({f"decoder.{k}": v for k, v in dec_sd.items()})

    s, t, d = convert.split_whole_model_state_dict(whole)
    assert set(s) == set(swin_sd) and set(t) == set(st_sd)
    assert set(d) == set(dec_sd)  # CNN decoder keeps its own "decoder." level
    np.testing.assert_array_equal(d["decoder.0.weight"],
                                  dec_sd["decoder.0.weight"])

    # absent component -> None
    s2, t2, d2 = convert.split_whole_model_state_dict(
        {f"style_transformer.{k}": v for k, v in st_sd.items()})
    assert s2 is None and d2 is None and set(t2) == set(st_sd)

    import pytest
    with pytest.raises(ValueError, match="unrecognized"):
        convert.split_whole_model_state_dict({"bogus.key": st_sd[next(iter(st_sd))]})
