"""Matched-weight parity vs the ACTUAL reference PyTorch code.

These tests import and execute /root/reference/codes/*.py (through the
torchvision stand-in of tests/tv_shim.py), export each module's live
state_dict through utils/convert.py, and assert this framework's outputs
match the reference's eval-mode outputs — the BASELINE.md north star
("output MAE vs PyTorch reference at matched weights <= 1e-3"), proven at
the level of:

  * the functional shifted-window cross-attention module
    (reference: codes/style_transformer.py:175-295)
  * the dual-value decoder attention, both IN placements
    (reference: codes/style_transformer.py:616-764)
  * the full StyleTransformer at k=1 and k=3
    (reference: codes/style_transformer.py:1133-1245)
  * the CNN decoder (reference: codes/decoder.py:23-76)
  * the swin features[:4] backbone in the torchvision fused-qkv layout
    (tests/torch_swin_ref.py oracle; reference: codes/utils.py:59-102)
  * custom_loss with a shared random VGG19 (reference: codes/loss.py:71-336)
  * the END-TO-END MasterStyleTransferModel at 256^2
    (reference: codes/full_model.py:214-226)
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import tv_shim

codes = tv_shim.import_reference_codes()

from mastermetastyletransfer_tpu.config import (  # noqa: E402
    AttentionConfig, LossConfig, ModelConfig, StyleTransformerConfig, SwinConfig,
)
from mastermetastyletransfer_tpu.losses.loss import perceptual_loss  # noqa: E402
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply  # noqa: E402
from mastermetastyletransfer_tpu.config import DecoderConfig  # noqa: E402
from mastermetastyletransfer_tpu.models.master import master_apply  # noqa: E402
from mastermetastyletransfer_tpu.models.style_transformer import (  # noqa: E402
    style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply  # noqa: E402
from mastermetastyletransfer_tpu.ops.attention import (  # noqa: E402
    shifted_window_attention, shifted_window_attention_dual_value,
)
from mastermetastyletransfer_tpu.utils.convert import (  # noqa: E402
    convert_cnn_decoder, convert_style_transformer, convert_swin_backbone,
    convert_vgg19, convert_whole_model,
)

MAE_TOL = 1e-3  # the north-star bound; observed values are ~1e-6 (fp32)


def _sd_numpy(module: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _mae(a, b) -> float:
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale
            ).astype(np.float32)


def _patched_torch_load():
    """The reference calls bare torch.load on full-module pickles
    (codes/full_model.py:69); torch>=2.6 defaults weights_only=True which
    refuses them. Patch within the test only."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = torch.load

        def load(*a, **kw):
            kw.setdefault("weights_only", False)
            return orig(*a, **kw)

        torch.load = load
        try:
            yield
        finally:
            torch.load = orig
    return ctx()


# ---------------------------------------------------------------------------
# Attention modules
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("window,shift,hw", [
    ((7, 7), (4, 4), (18, 20)),   # pad + effective-shift path
    ((8, 8), (4, 4), (32, 32)),   # full_model.py default geometry, no pad
    ((7, 7), (0, 0), (14, 14)),   # unshifted
])
def test_reference_attention_module_parity(window, shift, hw):
    torch.manual_seed(3)
    ref = codes.style_transformer.ShiftedWindowAttention(
        dim=64, num_heads=4, window_size=list(window), shift_size=list(shift)
    ).eval()

    q = _rand((2, hw[0], hw[1], 64), 10)
    k = _rand((2, hw[0], hw[1], 64), 11)
    v = _rand((2, hw[0], hw[1], 64), 12)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(v)).numpy()

    sd = _sd_numpy(ref)
    params = {
        "wq": {"kernel": jnp.asarray(sd["Wq.weight"].T),
               "bias": jnp.asarray(sd["Wq.bias"])},
        "wk": {"kernel": jnp.asarray(sd["Wk.weight"].T),
               "bias": jnp.asarray(sd["Wk.bias"])},
        "wv": {"kernel": jnp.asarray(sd["Wv.weight"].T),
               "bias": jnp.asarray(sd["Wv.bias"])},
        "proj": {"kernel": jnp.asarray(sd["proj.weight"].T),
                 "bias": jnp.asarray(sd["proj.bias"])},
        "rel_bias_table": jnp.asarray(sd["relative_position_bias_table"]),
    }
    cfg = AttentionConfig(dim=64, num_heads=4, window_size=window,
                          shift_size=shift)
    out = shifted_window_attention(params, jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), cfg)
    assert _mae(out, out_ref) <= MAE_TOL


@pytest.mark.parametrize("in_after_linear", [True, False])
def test_reference_dual_value_attention_parity(in_after_linear):
    torch.manual_seed(4)
    ref = codes.style_transformer.ShiftedWindowAttention_for_decoder_last_MHA(
        dim=64, num_heads=4, window_size=[7, 7], shift_size=[4, 4],
        instance_norm_q=torch.nn.InstanceNorm2d(64),
        instance_norm_k=torch.nn.InstanceNorm2d(64),
        use_q_proj=False,
        use_Key_instance_norm_after_linear_transformation=in_after_linear,
    ).eval()

    q = _rand((2, 18, 20, 64), 20)
    k = _rand((2, 18, 20, 64), 21)
    vs = _rand((2, 18, 20, 64), 22)
    vm = _rand((2, 18, 20, 64), 23)
    with torch.no_grad():
        sig_ref, mu_ref = ref(torch.from_numpy(q), torch.from_numpy(k),
                              torch.from_numpy(vs), torch.from_numpy(vm))

    sd = _sd_numpy(ref)
    params = {
        "wk": {"kernel": jnp.asarray(sd["Wk.weight"].T),
               "bias": jnp.asarray(sd["Wk.bias"])},
        "wv_scale": {"kernel": jnp.asarray(sd["Wv_scale.weight"].T),
                     "bias": jnp.asarray(sd["Wv_scale.bias"])},
        "wv_shift": {"kernel": jnp.asarray(sd["Wv_shift.weight"].T),
                     "bias": jnp.asarray(sd["Wv_shift.bias"])},
        "proj": {"kernel": jnp.asarray(sd["proj.weight"].T),
                 "bias": jnp.asarray(sd["proj.bias"])},
        "rel_bias_table": jnp.asarray(sd["relative_position_bias_table"]),
    }
    cfg = AttentionConfig(dim=64, num_heads=4, window_size=(7, 7),
                          shift_size=(4, 4))
    sig, mu = shifted_window_attention_dual_value(
        params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(vs),
        jnp.asarray(vm), cfg, use_q_proj=False,
        key_instance_norm_after_linear=in_after_linear)
    assert _mae(sig, sig_ref.numpy()) <= MAE_TOL
    assert _mae(mu, mu_ref.numpy()) <= MAE_TOL


# ---------------------------------------------------------------------------
# StyleTransformer
# ---------------------------------------------------------------------------

def _ref_style_transformer(window=(7, 7)):
    torch.manual_seed(5)
    return codes.style_transformer.StyleTransformer(
        encoder_dim=64, decoder_dim=64, encoder_num_heads=4,
        decoder_num_heads=4, encoder_window_size=list(window),
        decoder_window_size=list(window), encoder_shift_size=[4, 4],
        decoder_shift_size=[4, 4]).eval()


def _st_cfg(window=(7, 7), use_pallas=False):
    return StyleTransformerConfig(
        encoder_dim=64, decoder_dim=64, encoder_num_heads=4,
        decoder_num_heads=4, encoder_window_size=window,
        decoder_window_size=window, encoder_shift_size=(4, 4),
        decoder_shift_size=(4, 4), use_pallas=use_pallas)


@pytest.mark.parametrize("k", [1, 3])
def test_reference_style_transformer_parity(k):
    ref = _ref_style_transformer()
    fc = _rand((2, 16, 16, 64), 30, scale=0.5)
    fs = _rand((2, 16, 16, 64), 31, scale=0.5)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(fc), torch.from_numpy(fs), k=k).numpy()

    params = convert_style_transformer(_sd_numpy(ref), _st_cfg())
    out = style_transformer_apply(params, jnp.asarray(fc), jnp.asarray(fs),
                                  _st_cfg(), k=k)
    assert _mae(out, out_ref) <= MAE_TOL


def test_reference_style_transformer_parity_pallas_interpret():
    """Same comparison through the fused Pallas kernels (interpret mode on
    CPU) — proves the production path, not just the XLA fallback."""
    ref = _ref_style_transformer()
    fc = _rand((2, 16, 16, 64), 32, scale=0.5)
    fs = _rand((2, 16, 16, 64), 33, scale=0.5)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(fc), torch.from_numpy(fs), k=1).numpy()

    params = convert_style_transformer(_sd_numpy(ref), _st_cfg())
    out = style_transformer_apply(
        params, jnp.asarray(fc), jnp.asarray(fs), _st_cfg(use_pallas=True), k=1)
    assert _mae(out, out_ref) <= MAE_TOL


# ---------------------------------------------------------------------------
# CNN decoder
# ---------------------------------------------------------------------------

def test_reference_cnn_decoder_parity():
    torch.manual_seed(6)
    ref = codes.decoder.Decoder(channel_dim=64,
                                initializer="kaiming_normal_").eval()
    x = _rand((2, 64, 16, 16), 40, scale=0.5)  # NCHW for torch
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()  # (2, 3, 128, 128)

    params = convert_cnn_decoder(_sd_numpy(ref))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    for fuse in (False, True):
        out = cnn_decoder_apply(params, x_nhwc,
                                DecoderConfig(channel_dim=64, fuse_upsample=fuse))
        assert _mae(out, out_ref.transpose(0, 2, 3, 1)) <= MAE_TOL


# ---------------------------------------------------------------------------
# Swin backbone (torchvision fused-qkv layout)
# ---------------------------------------------------------------------------

def test_swin_backbone_converter_parity_torchvision_layout():
    from tests.torch_swin_ref import build_tv_swin_features

    tv = build_tv_swin_features(embed_dim=32, num_heads=(2, 4),
                                window_size=(7, 7), seed=7).eval()
    img = _rand((2, 3, 64, 64), 50)  # NCHW
    with torch.no_grad():
        out_ref = tv(torch.from_numpy(img)).numpy()  # NHWC (2, 8, 8, 64)

    cfg = SwinConfig(variant="swin_custom", embed_dim=32, num_heads=(2, 4),
                     window_size=(7, 7),
                     stochastic_depth_probs=(0.0, 0.0, 0.0, 0.0))
    params = convert_swin_backbone(_sd_numpy(tv), cfg)
    out = swin_backbone_apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                              cfg)
    assert _mae(out, out_ref) <= MAE_TOL


def test_swin_b_block_pair_parity_exact_geometry():
    """Unshifted + shifted torchvision SwinTransformerBlock pair at swin_b's
    exact stage-1 geometry — dim 128, 4 heads, window 7, shift 3 (torchvision
    swin_b: embed_dim=128, num_heads=[4,...], window [7,7], odd-block shift
    [7//2, 7//2]) — vs our style_swin_block_apply through the converter's
    fused-qkv split. Focused de-circularization check: the oracle block is
    audited line-by-line against torchvision v0.15.2 (tests/torch_swin_ref.py
    docstrings); this pins the converter+kernel at the real swin_b shape."""
    from tests.torch_swin_ref import TVSwinBlock
    from mastermetastyletransfer_tpu.models.style_transformer import (
        style_swin_block_apply,
    )
    from mastermetastyletransfer_tpu.utils.convert import _lin, _norm, _split_qkv

    torch.manual_seed(21)
    blocks = torch.nn.Sequential(
        TVSwinBlock(128, 4, [7, 7], [0, 0]),
        TVSwinBlock(128, 4, [7, 7], [3, 3]),
    ).eval()
    # swin_b stage-1 runs on a 128x128 token grid at 512^2 input; use a
    # non-multiple-of-7 grid (the real case) so the pad path is exercised
    x = _rand((2, 18, 20, 128), 22, 0.5)
    with torch.no_grad():
        out_ref = blocks(torch.from_numpy(x)).numpy()

    sd = _sd_numpy(blocks)
    y = jnp.asarray(x)
    for i, shift in enumerate(((0, 0), (3, 3))):
        bsd = {k[len(f"{i}."):]: v for k, v in sd.items()
               if k.startswith(f"{i}.")}
        attn = _split_qkv(bsd, "attn.qkv")
        attn["proj"] = _lin(bsd, "attn.proj")
        attn["rel_bias_table"] = jnp.asarray(
            bsd["attn.relative_position_bias_table"])
        p = {"attn": attn, "norm1": _norm(bsd, "norm1"),
             "norm2": _norm(bsd, "norm2"),
             "mlp": {"fc1": _lin(bsd, "mlp.0"), "fc2": _lin(bsd, "mlp.3")}}
        acfg = AttentionConfig(dim=128, num_heads=4, window_size=(7, 7),
                               shift_size=shift)
        y = style_swin_block_apply(p, y, y, y, acfg, use_norm=True,
                                   exclude_mlp=False, sd_prob=0.0,
                                   calculating_key=True, deterministic=True)
    assert _mae(y, out_ref) <= MAE_TOL


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _build_torch_vgg19_features(seed=8) -> torch.nn.Sequential:
    """Random-init torch vgg19().features[:30] (conv indices
    0,2,5,7,10,12,14,16,19,21,23,25,28 — the exact Sequential the reference
    cuts and torch.saves, codes/utils.py:10-56)."""
    torch.manual_seed(seed)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    pool_after = {1, 3, 7, 11}  # conv index after which a MaxPool follows
    layers = []
    for i, (cin, cout) in enumerate(chans):
        layers.append(torch.nn.Conv2d(cin, cout, 3, padding=1))
        layers.append(torch.nn.ReLU(inplace=True))
        if i in pool_after:
            layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers)


def test_reference_loss_parity(tmp_path):
    feats = _build_torch_vgg19_features().eval()
    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    torch.save(feats, weights_dir / "vgg_19_last_layer_is_relu_5_1_output.pt")

    with _patched_torch_load():
        ref_loss = codes.loss.custom_loss(
            project_absolute_path=str(tmp_path),
            default_lambda_value=10).eval()

    c = np.clip(_rand((2, 3, 128, 128), 60, 0.25) + 0.5, 0, 1)
    s = np.clip(_rand((2, 3, 128, 128), 61, 0.25) + 0.5, 0, 1)
    o = np.clip(_rand((2, 3, 128, 128), 62, 0.25) + 0.5, 0, 1)
    with torch.no_grad():
        total_ref, content_ref, style_ref = ref_loss(
            torch.from_numpy(c), torch.from_numpy(s), torch.from_numpy(o),
            output_content_and_style_loss=True)

    vgg = convert_vgg19(_sd_numpy(feats))
    losses = perceptual_loss(
        vgg, jnp.asarray(c.transpose(0, 2, 3, 1)),
        jnp.asarray(s.transpose(0, 2, 3, 1)),
        jnp.asarray(o.transpose(0, 2, 3, 1)),
        LossConfig(default_lambda_value=10.0))
    np.testing.assert_allclose(float(losses["content"]), float(content_ref),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["style"]), float(style_ref),
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["total"]), float(total_ref),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# End-to-end MasterStyleTransferModel
# ---------------------------------------------------------------------------

def test_reference_full_model_parity(tmp_path):
    """The headline claim: full reference model (swin -> StyleTransformer ->
    CNN decoder) vs master_apply at matched weights, 256^2 input, k=1."""
    from tests.torch_swin_ref import build_tv_swin_features

    tv_swin = build_tv_swin_features(embed_dim=128, num_heads=(4, 8),
                                     window_size=(7, 7), seed=9).eval()
    models_dir = tmp_path / "models"
    models_dir.mkdir()
    torch.save(tv_swin, models_dir / "swin_B_first_2_stages.pt")

    with _patched_torch_load():
        torch.manual_seed(10)
        ref = codes.full_model.MasterStyleTransferModel(
            project_absolute_path=str(tmp_path),
            swin_model_relative_path=os.path.join(
                "models", "swin_B_first_2_stages.pt"),
            style_encoder_window_size=[7, 7],
            style_decoder_window_size=[7, 7],
            style_encoder_shift_size=[4, 4],
            style_decoder_shift_size=[4, 4],
        ).eval()

    content = np.clip(_rand((1, 3, 256, 256), 70, 0.25) + 0.5, 0, 1)
    style = np.clip(_rand((1, 3, 256, 256), 71, 0.25) + 0.5, 0, 1)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(content), torch.from_numpy(style),
                      transformer_layer_count=1).numpy()  # NCHW

    cfg = ModelConfig(
        swin=SwinConfig.for_variant("swin_B").replace(
            window_size=(7, 7)),
        transformer=StyleTransformerConfig(),  # dim 256, window 7, shift 4
    )
    params = {
        "swin": convert_swin_backbone(_sd_numpy(tv_swin), cfg.swin),
        "style_transformer": convert_style_transformer(
            _sd_numpy(ref.style_transformer), cfg.transformer),
        "decoder": convert_cnn_decoder(_sd_numpy(ref.decoder)),
    }
    out = master_apply(params, jnp.asarray(content.transpose(0, 2, 3, 1)),
                       jnp.asarray(style.transpose(0, 2, 3, 1)), cfg, k=1)
    mae = _mae(out, out_ref.transpose(0, 2, 3, 1))
    print(f"full-model MAE vs reference: {mae:.2e}")
    assert mae <= MAE_TOL

    # Whole-model checkpoint ingestion (reference
    # train_only_inner_loop.py:382-385 save_whole_model — the layout the
    # missing pretrained_model_lambda_is_{2,4}.pt uses): the live reference
    # model's full state_dict, split + converted, must produce the same
    # output as the per-component path above.
    whole_sd = _sd_numpy(ref)
    from mastermetastyletransfer_tpu.models import init_master_model
    template = init_master_model(jax.random.PRNGKey(0), cfg)
    params_w = convert_whole_model(whole_sd, template, cfg)
    out_w = master_apply(params_w,
                         jnp.asarray(content.transpose(0, 2, 3, 1)),
                         jnp.asarray(style.transpose(0, 2, 3, 1)), cfg, k=1)
    mae_w = _mae(out_w, out_ref.transpose(0, 2, 3, 1))
    print(f"whole-model-checkpoint MAE vs reference: {mae_w:.2e}")
    assert mae_w <= MAE_TOL
