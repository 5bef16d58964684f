"""Frozen Swin first-2-stages backbone, re-derived from the torchvision
swin_{t,s,b} architecture the reference cuts to features[:4]
(reference: codes/utils.py:59-102; demo codes/swin_backbone_load_example.py).

Structure (NHWC): patch-embed (4x4 conv stride 4 + LayerNorm) -> stage-1
blocks (dim E, shift 0 then window//2) -> PatchMerging (-> 2E) -> stage-2
blocks (dim 2E). Output (B, H/8, W/8, 2E).

The self-attention blocks reuse the tested generalized window-attention op
with q=k=v; torchvision's fused qkv weights are split into thirds by the
converter (utils/convert.py), the same surgery the reference applies when
seeding the style transformer
(reference: codes/load_pretrained_weights_to_style_transformer.py:52-60).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import AttentionConfig, SwinConfig
from mastermetastyletransfer_tpu.models.style_transformer import (
    init_style_swin_block, style_swin_block_apply,
)
from mastermetastyletransfer_tpu.ops.precision import applies_matmul_mode

from mastermetastyletransfer_tpu.ops.norm import layer_norm


def _block_cfg(cfg: SwinConfig, stage: int, block_idx: int) -> AttentionConfig:
    dim = cfg.embed_dim * (2 ** stage)
    wh, ww = cfg.window_size
    # torchvision alternates shift 0 / window//2 within a stage
    shifted = block_idx % 2 == 1
    return AttentionConfig(
        dim=dim, num_heads=cfg.num_heads[stage], window_size=(wh, ww),
        shift_size=((wh // 2, ww // 2) if shifted else (0, 0)),
        use_pallas=cfg.use_pallas)


def init_swin_backbone(key, cfg: SwinConfig) -> dict:
    keys = jax.random.split(key, 8)
    e = cfg.embed_dim
    # torch Conv2d default init for patch embed
    fan_in = 3 * 4 * 4
    bound = (1.0 / fan_in) ** 0.5
    params = {
        "patch_embed": {
            "conv": {
                "kernel": jax.random.uniform(keys[0], (4, 4, 3, e), jnp.float32, -bound, bound),
                "bias": jnp.zeros((e,), jnp.float32),
            },
            "norm": {"scale": jnp.ones((e,)), "bias": jnp.zeros((e,))},
        },
        "patch_merge": {
            "norm": {"scale": jnp.ones((4 * e,)), "bias": jnp.zeros((4 * e,))},
            # Linear(4E -> 2E, bias=False)
            "reduction": {"kernel": jax.random.uniform(
                keys[1], (4 * e, 2 * e), jnp.float32,
                -(1.0 / (4 * e)) ** 0.5, (1.0 / (4 * e)) ** 0.5)},
        },
    }
    ki = 2
    for stage in range(2):
        for blk in range(cfg.depths[stage]):
            acfg = _block_cfg(cfg, stage, blk)
            params[f"stage{stage}_block{blk}"] = init_style_swin_block(
                keys[ki], acfg, use_norm=True, exclude_mlp=False,
                mlp_ratio=cfg.mlp_ratio)
            ki += 1
    return params


def patch_merging(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """torchvision PatchMerging: pad H,W to even, gather the 2x2 neighborhood
    in (even-even, odd-even, even-odd, odd-odd) order, LayerNorm(4C), then
    Linear(4C->2C, no bias)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return x @ params["reduction"]["kernel"].astype(x.dtype)


@applies_matmul_mode
def swin_backbone_apply(params: dict, images: jnp.ndarray, cfg: SwinConfig, *,
                        deterministic: bool = True,
                        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """NHWC images (B, H, W, 3) -> NHWC features (B, H/8, W/8, 2*embed_dim)."""
    # patch embed: the 4x4 stride-4 conv IS a per-patch matmul — run it as
    # space-to-depth + GEMM (exact; contraction 48, MXU-friendly lanes E),
    # or as a direct stride-4 conv (A/B knob: the s2d transpose is a
    # relayout the conv path avoids)
    b, h, w, cin = images.shape
    pe = params["patch_embed"]["conv"]
    e = pe["kernel"].shape[-1]
    pe_norm = params["patch_embed"]["norm"]
    # NOTE (r4): a Pallas patch-embed+LN kernel (ops/pallas_conv.
    # pallas_patch_embed) was built and measured 20.2 ms vs 2.7 ms for this
    # s2d path standalone at (16, 512^2, 3) — the 3-lane input pads to 128
    # VMEM lanes and the 16 tap views lower to VPU-bound strided code. The
    # "patch embed costs ~7 ms in-context" reading that motivated it was
    # first-prefix dispatch overhead + tunnel variance (PERF.md r4 table).
    # Lever CLOSED; the kernel stays (tested) as the negative-result record.
    if cfg.patch_embed_impl == "conv":
        x = jax.lax.conv_general_dilated(
            images, pe["kernel"].astype(images.dtype), (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + pe["bias"].astype(x.dtype)
    else:
        patches = images.reshape(b, h // 4, 4, w // 4, 4, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 4, w // 4, 16 * cin)
        wk = pe["kernel"].reshape(16 * cin, e).astype(patches.dtype)
        x = patches @ wk + pe["bias"].astype(patches.dtype)
    x = layer_norm(x, pe_norm["scale"], pe_norm["bias"])

    # Eval fast path (fused Pallas blocks): each stage stays PADDED-resident —
    # pad to the window multiple once, run both blocks on the padded grid
    # (the fused kernel's validity mask keeps pad rows inert — garbage there
    # never reaches valid tokens), crop once at the stage end. Saves the
    # crop+re-pad round trip between blocks. MUST be gated exactly like the
    # fused block kernel (the XLA fallback has no validity mask, so
    # padded-resident garbage rows would leak into border windows): Mosaic
    # needs 128-aligned dims, so swin_T/S (96/192) run the plain path.
    from mastermetastyletransfer_tpu.ops.attention import _pallas_dim_ok
    fast = (deterministic and cfg.use_pallas
            and _pallas_dim_ok(cfg.embed_dim)
            and _pallas_dim_ok(2 * cfg.embed_dim))
    from mastermetastyletransfer_tpu.ops.windows import pad_to_windows
    wh, ww = cfg.window_size

    import os
    from mastermetastyletransfer_tpu.ops.attention import (
        _pallas_interpret, fused_self_attention_block_pair,
    )
    pair_on = os.environ.get("MMST_BLOCK_PAIR", "0") == "1"

    sd_idx = 0
    for stage in range(2):
        if stage == 1:
            x = patch_merging(params["patch_merge"], x)
        vh, vw = x.shape[1], x.shape[2]
        if fast:
            x, _, _ = pad_to_windows(x, wh, ww)
        # r5 two-blocks-one-program path (MMST_BLOCK_PAIR=1): the stage's
        # (W-MSA, SW-MSA) pair runs as ONE kernel with a one-window-row
        # pipeline — block0's output never touches HBM. Same hardware
        # envelope as the row-resident kernel (bf16, row width).
        _twn_c = (-(-x.shape[2] // ww) * ww // ww) * wh * ww * \
            cfg.embed_dim * (2 ** stage)
        if (fast and pair_on and cfg.depths[stage] == 2
                and deterministic
                and (_pallas_interpret()
                     or (x.dtype == jnp.bfloat16 and _twn_c <= 262144))):
            x = fused_self_attention_block_pair(
                params[f"stage{stage}_block0"],
                params[f"stage{stage}_block1"],
                x, _block_cfg(cfg, stage, 0), _block_cfg(cfg, stage, 1),
                use_norm=True, valid_hw=(vh, vw))
            sd_idx += 2
            if fast:
                x = x[:, :vh, :vw]
            continue
        for blk in range(cfg.depths[stage]):
            acfg = _block_cfg(cfg, stage, blk)
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            x = style_swin_block_apply(
                params[f"stage{stage}_block{blk}"], x, x, x, acfg,
                use_norm=True, exclude_mlp=False,
                sd_prob=cfg.stochastic_depth_probs[sd_idx],
                calculating_key=True, deterministic=deterministic, rng=sub,
                valid_hw=(vh, vw) if fast else None)
            sd_idx += 1
        if fast:
            x = x[:, :vh, :vw]
    return x
