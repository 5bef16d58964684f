"""Weight converters: PyTorch state_dicts (reference / torchvision layouts)
-> this framework's param pytrees.

Covers the reference's whole weight-acquisition surface:
  * torchvision swin_{t,s,b} features[:4] backbone (the opaque pickled
    Sequential the reference torch.loads, codes/full_model.py:69) including
    the fused-qkv -> separate Q/K/V split
  * torch vgg19 / vgg19_bn features for the loss (codes/utils.py:10-56);
    BN folds into the preceding conv (exact in eval mode)
  * the reference StyleTransformer / Decoder state_dicts
    (direct_pretrained_* paths, codes/full_model.py:147-155)
  * the pretrained-weight surgery seeding the style transformer from one
    original-Swin block (codes/load_pretrained_weights_to_style_transformer.py)

All inputs are plain dicts name -> numpy array (use `load_torch_state_dict`
to read .pt/.pth files via torch CPU without touching CUDA).

Layout conventions converted:
  torch Linear weight (out, in)      -> kernel (in, out)        [transpose]
  torch Conv2d weight (out,in,kh,kw) -> kernel (kh,kw,in,out)   [(2,3,1,0)]
  fused qkv weight (3C, C)           -> thirds, each transposed
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import (
    ModelConfig, StyleTransformerConfig, SwinConfig,
)
from mastermetastyletransfer_tpu.losses.vgg import VGG19_LAYER_PLAN


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy (CPU, weights only when possible)."""
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _lin(sd, prefix, use_bias=True):
    p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if use_bias and f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _norm(sd, prefix):
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    """torchvision MLP is Sequential[Linear, act, Dropout, Linear, Dropout]
    -> keys .0 and .3 (reference key scheme, e.g.
    load_pretrained_weights_to_style_transformer.py:250-253)."""
    return {"fc1": _lin(sd, f"{prefix}.0"), "fc2": _lin(sd, f"{prefix}.3")}


def _split_qkv(sd, prefix):
    """Split a fused qkv Linear into separate wq/wk/wv params (the same
    surgery as reference codes/load_pretrained_weights_to_style_transformer.py:52-60)."""
    w = sd[f"{prefix}.weight"]          # (3C, C)
    c = w.shape[0] // 3
    out = {}
    for i, name in enumerate(("wq", "wk", "wv")):
        out[name] = {"kernel": jnp.asarray(w[i * c:(i + 1) * c].T)}
        if f"{prefix}.bias" in sd:
            b = sd[f"{prefix}.bias"]
            out[name]["bias"] = jnp.asarray(b[i * c:(i + 1) * c])
    return out


def _attn_separate(sd, prefix):
    """Reference ShiftedWindowAttention params (separate Wq/Wk/Wv)."""
    return {
        "wq": _lin(sd, f"{prefix}.Wq"),
        "wk": _lin(sd, f"{prefix}.Wk"),
        "wv": _lin(sd, f"{prefix}.Wv"),
        "proj": _lin(sd, f"{prefix}.proj"),
        "rel_bias_table": jnp.asarray(sd[f"{prefix}.relative_position_bias_table"]),
    }


# ---------------------------------------------------------------------------
# Swin backbone (torchvision features[:4] Sequential key scheme)
# ---------------------------------------------------------------------------

def convert_swin_backbone(sd: Dict[str, np.ndarray], cfg: SwinConfig) -> dict:
    """torchvision swin features[:4] state_dict -> swin backbone params.

    Key scheme: "0.0"=patch conv, "0.2"=patch norm, "1.{b}.*"=stage-1 blocks,
    "2.*"=PatchMerging, "3.{b}.*"=stage-2 blocks.
    """
    params = {
        "patch_embed": {
            "conv": {"kernel": jnp.asarray(sd["0.0.weight"].transpose(2, 3, 1, 0)),
                     "bias": jnp.asarray(sd["0.0.bias"])},
            "norm": _norm(sd, "0.2"),
        },
        "patch_merge": {
            "norm": _norm(sd, "2.norm"),
            "reduction": {"kernel": jnp.asarray(sd["2.reduction.weight"].T)},
        },
    }
    for stage, seq in ((0, "1"), (1, "3")):
        for blk in range(cfg.depths[stage]):
            pre = f"{seq}.{blk}"
            attn = _split_qkv(sd, f"{pre}.attn.qkv")
            attn["proj"] = _lin(sd, f"{pre}.attn.proj")
            attn["rel_bias_table"] = jnp.asarray(
                sd[f"{pre}.attn.relative_position_bias_table"])
            params[f"stage{stage}_block{blk}"] = {
                "attn": attn,
                "norm1": _norm(sd, f"{pre}.norm1"),
                "norm2": _norm(sd, f"{pre}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{pre}.mlp.0"),
                        "fc2": _lin(sd, f"{pre}.mlp.3")},
            }
    return params


# ---------------------------------------------------------------------------
# VGG19 loss backbone
# ---------------------------------------------------------------------------

_VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
_VGG19_BN_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 23, 27, 30, 33, 36, 40]


def convert_vgg19(sd: Dict[str, np.ndarray], use_batchnorm: bool = False,
                  eps: float = 1e-5) -> dict:
    """torch vgg19(_bn).features state_dict -> vgg params. Keys may carry a
    "features." prefix (full-model dict) or be bare indices (cut Sequential).
    BN (eval mode) folds exactly into the preceding conv."""
    if any(k.startswith("features.") for k in sd):
        sd = {k[len("features."):]: v for k, v in sd.items() if k.startswith("features.")}
    idxs = _VGG19_BN_CONV_IDX if use_batchnorm else _VGG19_CONV_IDX
    n_convs = sum(1 for sl in VGG19_LAYER_PLAN for kind, _, _ in sl if kind == "C")
    params = {}
    for i in range(n_convs):
        ci = idxs[i]
        w = sd[f"{ci}.weight"].astype(np.float64)
        b = sd[f"{ci}.bias"].astype(np.float64)
        if use_batchnorm:
            gamma = sd[f"{ci + 1}.weight"].astype(np.float64)
            beta = sd[f"{ci + 1}.bias"].astype(np.float64)
            mean = sd[f"{ci + 1}.running_mean"].astype(np.float64)
            var = sd[f"{ci + 1}.running_var"].astype(np.float64)
            scale = gamma / np.sqrt(var + eps)
            w = w * scale[:, None, None, None]
            b = (b - mean) * scale + beta
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype=jnp.float32),
            "bias": jnp.asarray(b, dtype=jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# StyleTransformer / CNN decoder (reference state_dict key schemes)
# ---------------------------------------------------------------------------

def convert_style_transformer(sd: Dict[str, np.ndarray],
                              cfg: StyleTransformerConfig) -> dict:
    """Reference StyleTransformer.state_dict() -> style transformer params
    (key scheme verified against
    codes/load_pretrained_weights_to_style_transformer.py:183-400)."""
    enc = {
        "shared_mha": {"attn": _attn_separate(sd, "encoder.shared_MHA_without_MLP.attn")},
        "mlp_key": _mlp(sd, "encoder.encoder_MLP_Key"),
        "mlp_scale": _mlp(sd, "encoder.encoder_MLP_Scale"),
        "mlp_shift": _mlp(sd, "encoder.encoder_MLP_Shift"),
    }
    if cfg.encoder_use_norm:
        enc["shared_mha"]["norm1"] = _norm(sd, "encoder.shared_MHA_without_MLP.norm1")

    self_mha = {"attn": _attn_separate(sd, "decoder.MHA_self_attn.attn")}
    if cfg.decoder_use_norm:
        self_mha["norm1"] = _norm(sd, "decoder.MHA_self_attn.norm1")
        if not cfg.decoder_exclude_MLP_after_Fcs_self_MHA:
            self_mha["norm2"] = _norm(sd, "decoder.MHA_self_attn.norm2")
    if not cfg.decoder_exclude_MLP_after_Fcs_self_MHA:
        self_mha["mlp"] = _mlp(sd, "decoder.MHA_self_attn.mlp")

    dec = {"self_mha": self_mha, "last_mlp": _mlp(sd, "decoder.last_MLP")}

    if cfg.decoder_use_instance_norm_with_affine:
        dec["in_q"] = {"scale": jnp.asarray(sd["decoder.instance_norm_Query.weight"]),
                       "bias": jnp.asarray(sd["decoder.instance_norm_Query.bias"])}
        dec["in_k"] = {"scale": jnp.asarray(sd["decoder.instance_norm_Key.weight"]),
                       "bias": jnp.asarray(sd["decoder.instance_norm_Key.bias"])}

    if not cfg.decoder_use_regular_MHA_instead_of_Swin_at_the_end:
        pre = "decoder.decoder_MHA_for_sigma_and_mu"
        dual = {
            "wk": _lin(sd, f"{pre}.Wk"),
            "wv_scale": _lin(sd, f"{pre}.Wv_scale"),
            "wv_shift": _lin(sd, f"{pre}.Wv_shift"),
            "proj": _lin(sd, f"{pre}.proj"),
            "rel_bias_table": jnp.asarray(sd[f"{pre}.relative_position_bias_table"]),
        }
        if f"{pre}.Wq.weight" in sd:
            dual["wq"] = _lin(sd, f"{pre}.Wq")
        dec["dual_mha"] = dual
    else:
        dec["lin_key"] = _lin(sd, "decoder.linear_transformation_Key")
        dec["lin_scale"] = _lin(sd, "decoder.linear_transformation_Scale")
        dec["lin_shift"] = _lin(sd, "decoder.linear_transformation_Shift")
        dec["proj_sigma"] = _lin(sd, "decoder.proj_sigma")
        dec["proj_mu"] = _lin(sd, "decoder.proj_mu")

    return {"encoder": enc, "decoder": dec}


def convert_cnn_decoder(sd: Dict[str, np.ndarray]) -> dict:
    """Reference Decoder.state_dict() (Sequential "decoder.{i}" with convs at
    0,3,5,7,9,12,14,17,19 — codes/decoder.py:23-55) -> decoder params."""
    conv_idxs = [i for i in range(20) if f"decoder.{i}.weight" in sd]
    assert len(conv_idxs) == 9, f"expected 9 convs, found {conv_idxs}"
    return {f"conv{n}": {
        "kernel": jnp.asarray(sd[f"decoder.{i}.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd[f"decoder.{i}.bias"])}
        for n, i in enumerate(conv_idxs)}


# ---------------------------------------------------------------------------
# Pretrained-weight surgery: seed the style transformer from one original-Swin
# block (reference: codes/load_pretrained_weights_to_style_transformer.py)
# ---------------------------------------------------------------------------

def seed_style_transformer_from_swin_block(
        block_sd: Dict[str, np.ndarray], params: dict,
        cfg: StyleTransformerConfig) -> dict:
    """Inject a single Swin block state_dict (keys "0.*"=norm1, "1.*"=attn,
    "3.*"=norm2, "4.*"=mlp; the ModuleList->2nd BasicLayer->2nd block cut)
    into every attention module and MLP of the style transformer, splitting
    the fused qkv. Mirrors the mapping of
    codes/load_pretrained_weights_to_style_transformer.py:65-683:
      - encoder shared attn + decoder self attn: Wq/Wk/Wv <- qkv thirds
      - decoder dual attn: Wk <- k, Wv_scale <- v, Wv_shift <- v
      - all five MLPs <- the block's MLP (fc1/fc2)
      - norms (where present) <- the block's norm1/norm2
      - relative-position bias tables <- the block's table when shapes match
    Returns a NEW params pytree (input is not mutated)."""
    import copy
    assert cfg.encoder_dim == 256 and cfg.decoder_dim == 256, \
        "pretrained Swin-block seeding requires dim 256 (reference assert :85-86)"
    p = copy.deepcopy(params)

    qkv = _split_qkv(block_sd, "1.qkv")
    proj = _lin(block_sd, "1.proj")
    table = jnp.asarray(block_sd["1.relative_position_bias_table"])
    norm1 = _norm(block_sd, "0")
    norm2 = _norm(block_sd, "3")
    mlp = {"fc1": _lin(block_sd, "4.fc1"), "fc2": _lin(block_sd, "4.fc2")}

    def fill_attn(attn):
        attn["wq"], attn["wk"], attn["wv"] = qkv["wq"], qkv["wk"], qkv["wv"]
        attn["proj"] = proj
        if attn["rel_bias_table"].shape == table.shape:
            attn["rel_bias_table"] = table

    fill_attn(p["encoder"]["shared_mha"]["attn"])
    if "norm1" in p["encoder"]["shared_mha"]:
        p["encoder"]["shared_mha"]["norm1"] = dict(norm1)
    for name in ("mlp_key", "mlp_scale", "mlp_shift"):
        p["encoder"][name] = copy.deepcopy(mlp)

    fill_attn(p["decoder"]["self_mha"]["attn"])
    if "norm1" in p["decoder"]["self_mha"]:
        p["decoder"]["self_mha"]["norm1"] = dict(norm1)
    if "norm2" in p["decoder"]["self_mha"]:
        p["decoder"]["self_mha"]["norm2"] = dict(norm2)
    if "mlp" in p["decoder"]["self_mha"]:
        p["decoder"]["self_mha"]["mlp"] = copy.deepcopy(mlp)

    if "dual_mha" in p["decoder"]:
        dual = p["decoder"]["dual_mha"]
        dual["wk"] = qkv["wk"]
        dual["wv_scale"] = copy.deepcopy(qkv["wv"])
        dual["wv_shift"] = copy.deepcopy(qkv["wv"])
        dual["proj"] = proj
        if dual["rel_bias_table"].shape == table.shape:
            dual["rel_bias_table"] = table
        if "wq" in dual:
            dual["wq"] = qkv["wq"]
    p["decoder"]["last_mlp"] = copy.deepcopy(mlp)
    return p


def split_whole_model_state_dict(sd: Dict[str, np.ndarray]):
    """Split a whole-model state_dict — the layout `save_whole_model` writes
    (reference train_only_inner_loop.py:382-385:
    `torch.save(self.master_style_transformer.state_dict(), ...)`), which is
    the layout the missing `pretrained_model_lambda_is_{2,4}.pt` checkpoints
    use — into the three component dicts the per-component converters
    consume. Prefixes follow codes/full_model.py attribute names:
    `swin_encoder.*` (torchvision cut-Sequential keys), `style_transformer.*`
    (codes/style_transformer.py key scheme), `decoder.*` (the CNN decoder,
    whose own Sequential attr is also named `decoder`, codes/decoder.py:23).

    Returns (swin_sd, style_transformer_sd, decoder_sd); any group absent
    from the input maps to None."""
    groups: Dict[str, Dict[str, np.ndarray]] = {
        "swin_encoder": {}, "style_transformer": {}, "decoder": {}}
    unknown = []
    for k, v in sd.items():
        for prefix, g in groups.items():
            if k.startswith(prefix + "."):
                g[k[len(prefix) + 1:]] = v
                break
        else:
            unknown.append(k)
    if unknown:
        raise ValueError(
            "not a whole-model state dict; unrecognized keys (expected "
            f"swin_encoder./style_transformer./decoder. prefixes): "
            f"{unknown[:5]}")
    return tuple(g or None for g in
                 (groups["swin_encoder"], groups["style_transformer"],
                  groups["decoder"]))


def convert_whole_model(sd: Dict[str, np.ndarray], params: dict,
                        cfg: ModelConfig) -> dict:
    """Whole-model state_dict (save_whole_model layout) -> full params
    pytree, falling back to `params` for any absent component."""
    swin_sd, st_sd, dec_sd = split_whole_model_state_dict(sd)
    return convert_master_model(st_sd, dec_sd, swin_sd, params, cfg)


def convert_master_model(style_transformer_sd: Optional[Dict[str, np.ndarray]],
                         decoder_sd: Optional[Dict[str, np.ndarray]],
                         swin_sd: Optional[Dict[str, np.ndarray]],
                         params: dict, cfg: ModelConfig) -> dict:
    """Assemble full-model params from any subset of reference checkpoints,
    falling back to the provided (e.g. random-init) params elsewhere —
    the direct_pretrained_* loading paths of codes/full_model.py:144-155."""
    out = dict(params)
    if swin_sd is not None:
        out["swin"] = convert_swin_backbone(swin_sd, cfg.swin)
    if style_transformer_sd is not None:
        out["style_transformer"] = convert_style_transformer(
            style_transformer_sd, cfg.transformer)
    if decoder_sd is not None:
        out["decoder"] = convert_cnn_decoder(decoder_sd)
    return out
