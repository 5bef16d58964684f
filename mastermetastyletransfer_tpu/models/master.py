"""Full model composition: frozen Swin encoder -> StyleTransformer -> CNN
decoder (reference: codes/full_model.py:21-226).

TPU-native: one pure `master_apply` covering the whole forward, NHWC
throughout (no NHWC<->NCHW permutes), jit-compiled via `make_stylize_fn`
with static layer count k and compute-dtype policy.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply, init_cnn_decoder
from mastermetastyletransfer_tpu.models.style_transformer import (
    init_style_transformer, style_transformer_apply,
    style_transformer_apply_from_stream, style_transformer_stream,
)
from mastermetastyletransfer_tpu.models.swin import init_swin_backbone, swin_backbone_apply


def init_master_model(key, cfg: ModelConfig) -> dict:
    k_swin, k_st, k_dec = jax.random.split(key, 3)
    return {
        "swin": init_swin_backbone(k_swin, cfg.swin),
        "style_transformer": init_style_transformer(k_st, cfg.transformer),
        "decoder": init_cnn_decoder(k_dec, cfg.decoder),
    }


def cast_params(params: dict, dtype) -> dict:
    """One-time inference-serving cast of float params to the compute dtype
    (e.g. bfloat16): the kernels cast weights at load anyway (a mixed
    bf16 x f32 dot silently promotes to an f32 matmul — see CLAUDE.md), so a
    bf16 store is compute-identical on the fused path while halving weight
    HBM/VMEM traffic. Keep the f32 store for training (optimizer state and
    update accumulation stay f32)."""
    dtype = jnp.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def _stage_ctx(cfg: ModelConfig, stage: str):
    """Precision context for one stage of the forward pass.

    Only active when the stage has an explicit dtype override (mixed-
    precision policy): an f32 stage then runs under matmul precision
    HIGHEST (the TPU's DEFAULT feeds f32 arrays to the MXU as single bf16
    passes — PERF.md device model), a bf16 stage under DEFAULT (bf16 is MXU-
    native; nesting restores it even if an outer 'highest' context is
    ambient). With no override, ambient precision applies — exactly the
    pre-r4 behavior every recorded operating point was measured under.
    """
    if getattr(cfg, f"{stage}_dtype") is None:
        return contextlib.nullcontext()
    f32 = jnp.dtype(cfg.stage_dtype(stage)) == jnp.float32
    return jax.default_matmul_precision("highest" if f32 else "default")


def master_apply(params: dict, content: jnp.ndarray, style: jnp.ndarray,
                 cfg: ModelConfig, *, k: int = 1, max_k: Optional[int] = None,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Stylize `content` with `style` (both NHWC RGB, already normalized the
    way the swin encoder expects). Mirrors MasterStyleTransferModel.forward
    (reference: codes/full_model.py:214-226): swin(content), swin(style) ->
    style_transformer(Fc, Fs, k) -> CNN decoder -> RGB.

    k = number of stacked style-transformer iterations (ZS-L1 vs ZS-L3 knob);
    pass max_k to allow a traced k (training with random k).
    """
    dtype = jnp.dtype(cfg.stage_dtype("swin"))
    content = content.astype(dtype)
    style = style.astype(dtype)

    r_st = r_swin = None
    if rng is not None:
        rng, r_st, r_swin = jax.random.split(rng, 3)

    # Swin freezing is handled by optimizer masking in train/ (the reference
    # freezes it via requires_grad, train.py:216-218, but can unfreeze).
    # Stochastic depth stays ACTIVE on the frozen swin in training — the
    # reference runs the whole model in train() mode.
    # Content and style ride ONE batched encoder pass (the reference calls
    # swin twice, codes/full_model.py:219-220; every op here is
    # batch-independent so a concat is exact and halves per-op overhead).
    with _stage_ctx(cfg, "swin"):
        if content.shape == style.shape:
            b = content.shape[0]
            both = swin_backbone_apply(
                params["swin"], jnp.concatenate([content, style], axis=0),
                cfg.swin, deterministic=deterministic, rng=r_swin)
            fc, fs = both[:b], both[b:]
        else:
            r_sw2 = None
            if r_swin is not None:
                r_swin, r_sw2 = jax.random.split(r_swin)
            fc = swin_backbone_apply(params["swin"], content, cfg.swin,
                                     deterministic=deterministic, rng=r_swin)
            fs = swin_backbone_apply(params["swin"], style, cfg.swin,
                                     deterministic=deterministic, rng=r_sw2)

    return stylize_from_features(params, fc, fs, cfg, k=k, max_k=max_k,
                                 deterministic=deterministic, rng=r_st)


def encode_features(params: dict, images: jnp.ndarray,
                    cfg: ModelConfig) -> jnp.ndarray:
    """Frozen-encoder features (B, H/8, W/8, 2E) for NHWC images. Lets
    callers cache style features across many contents (the eval grid reuses
    each style 11x; the reference recomputes swin per pair,
    codes/full_model.py:219-220)."""
    with _stage_ctx(cfg, "swin"):
        return swin_backbone_apply(
            params["swin"],
            images.astype(jnp.dtype(cfg.stage_dtype("swin"))), cfg.swin)


def stylize_from_features(params: dict, fc: jnp.ndarray, fs: jnp.ndarray,
                          cfg: ModelConfig, *, k: int = 1,
                          max_k: Optional[int] = None,
                          deterministic: bool = True,
                          rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Style transformer + CNN decoder on precomputed encoder features."""
    td = jnp.dtype(cfg.stage_dtype("transformer"))
    with _stage_ctx(cfg, "transformer"):
        fcs = style_transformer_apply(
            params["style_transformer"], fc.astype(td), fs.astype(td),
            cfg.transformer, k=k, max_k=max_k,
            deterministic=deterministic, rng=rng)
    dd = jnp.dtype(cfg.stage_dtype("decoder"))
    with _stage_ctx(cfg, "decoder"):
        out = cnn_decoder_apply(params["decoder"], fcs.astype(dd), cfg.decoder,
                                deterministic=deterministic)
    return out.astype(jnp.float32)


def encode_style_stream(params: dict, style: jnp.ndarray, cfg: ModelConfig,
                        *, k: int):
    """Everything content-independent for one style: swin features + the k
    style-transformer encoder triples (Key, Scale, Shift). The reference
    recomputes all of it per (content, style) pair
    (codes/full_model.py:219-226); computing it once per style is exact —
    the encoder consumes only the style stream — and removes the style swin
    pass AND the encoder half of every transformer iteration from each
    subsequent content (style-locked serving, eval-grid sweeps)."""
    fs = encode_features(params, style, cfg)
    td = jnp.dtype(cfg.stage_dtype("transformer"))
    with _stage_ctx(cfg, "transformer"):
        return style_transformer_stream(
            params["style_transformer"], fs.astype(td), cfg.transformer, k=k)


def stylize_from_features_with_stream(params: dict, fc: jnp.ndarray, stream,
                                      cfg: ModelConfig) -> jnp.ndarray:
    """Transformer decoder + CNN decoder on precomputed content features and
    a precomputed style stream (encode_style_stream, same cfg)."""
    td = jnp.dtype(cfg.stage_dtype("transformer"))
    with _stage_ctx(cfg, "transformer"):
        fcs = style_transformer_apply_from_stream(
            params["style_transformer"], fc.astype(td), stream,
            cfg.transformer)
    dd = jnp.dtype(cfg.stage_dtype("decoder"))
    with _stage_ctx(cfg, "decoder"):
        out = cnn_decoder_apply(params["decoder"], fcs.astype(dd), cfg.decoder)
    return out.astype(jnp.float32)


def stylize_with_style_stream(params: dict, content: jnp.ndarray, stream,
                              cfg: ModelConfig) -> jnp.ndarray:
    """Stylize a content batch against one precomputed style stream; a
    batch-1 stream broadcasts over the whole content batch."""
    fc = encode_features(params, content, cfg)
    return stylize_from_features_with_stream(params, fc, stream, cfg)


def make_stylize_fn(cfg: ModelConfig, k: int = 1):
    """Jitted zero-shot stylization closure: (params, content, style) -> RGB."""
    def stylize(params, content, style):
        return master_apply(params, content, style, cfg, k=k, deterministic=True)
    return jax.jit(stylize)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC [0,1] RGB -> ImageNet-normalized (reference: train.py:418-424)."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def imagenet_denormalize(x: jnp.ndarray) -> jnp.ndarray:
    return x * IMAGENET_STD + IMAGENET_MEAN
