"""Configuration dataclasses for the framework.

Replaces the reference's ~60 argparse flags mirrored onto `Train` attributes
(reference: train.py:589-806, train.py:40-134) with frozen, hashable dataclasses
that can be passed as static args to jit and serialized to/from JSON/YAML dicts.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _as_dict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


class _ConfigBase:
    def to_dict(self) -> Dict[str, Any]:
        return _as_dict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]):
        """Build from a (possibly nested) plain dict, tolerating extra keys."""
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            ft = f.type if isinstance(f.type, type) else None
            if dataclasses.is_dataclass(ft) and isinstance(v, dict):
                v = ft.from_dict(v)
            if isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class AttentionConfig(_ConfigBase):
    """Shifted-window attention block config.

    Mirrors the knobs of the reference's ShiftedWindowAttention
    (reference: codes/style_transformer.py:175-295).
    """
    dim: int = 256
    num_heads: int = 8
    window_size: Tuple[int, int] = (7, 7)
    shift_size: Tuple[int, int] = (4, 4)
    qkv_bias: bool = True
    proj_bias: bool = True
    dropout: float = 0.0
    attention_dropout: float = 0.0
    # Use the fused Pallas TPU kernel (ops/pallas_attention.py) instead of the
    # XLA op chain. Falls back to XLA automatically when dropout is active.
    use_pallas: bool = False


@dataclass(frozen=True)
class StyleTransformerConfig(_ConfigBase):
    """Config of the style transformer (encoder+decoder pair).

    Mirrors StyleTransformer.__init__ kwargs
    (reference: codes/style_transformer.py:1159-1226) and the matching
    MasterStyleTransferModel kwargs (reference: codes/full_model.py:21-60).
    """
    encoder_dim: int = 256
    decoder_dim: int = 256
    encoder_num_heads: int = 8
    decoder_num_heads: int = 8
    encoder_window_size: Tuple[int, int] = (7, 7)
    decoder_window_size: Tuple[int, int] = (7, 7)
    encoder_shift_size: Tuple[int, int] = (4, 4)
    decoder_shift_size: Tuple[int, int] = (4, 4)
    encoder_mlp_ratio: float = 4.0
    decoder_mlp_ratio: float = 4.0
    encoder_dropout: float = 0.0
    decoder_dropout: float = 0.0
    encoder_attention_dropout: float = 0.0
    decoder_attention_dropout: float = 0.0
    encoder_qkv_bias: bool = True
    decoder_qkv_bias: bool = True
    encoder_proj_bias: bool = True
    decoder_proj_bias: bool = True
    encoder_stochastic_depth_prob: float = 0.1
    decoder_stochastic_depth_prob: float = 0.1
    # The reference passes norm_layer callables; the style encoder uses None
    # (no norm; paper says norms are harmful in the style encoder) and the
    # decoder self-attention block uses LayerNorm
    # (reference: codes/style_transformer.py:807, :946).
    encoder_use_norm: bool = False
    decoder_use_norm: bool = True
    encoder_if_use_processed_Key_in_Scale_and_Shift_calculation: bool = True
    decoder_use_instance_norm_with_affine: bool = False
    decoder_use_regular_MHA_instead_of_Swin_at_the_end: bool = False
    decoder_use_Key_instance_norm_after_linear_transformation: bool = True
    decoder_exclude_MLP_after_Fcs_self_MHA: bool = False
    use_pallas: bool = False
    # In-kernel matmul mode for the Pallas paths (ops/precision.py):
    # "native" (ambient precision) or "split3" (3-pass bf16 hi/lo split of
    # f32 operands — XLA-'high'-class accuracy at half the HIGHEST passes;
    # Mosaic cannot lower precision=HIGH directly).
    matmul_mode: str = "native"
    # Traced-k (random layer count) implementation: "scan" (masked carry,
    # 1/4 the reverse-mode graph, compiles everywhere) or "switch" (runs
    # only the sampled depth, but its grad graph crashes this platform's
    # XLA TPU compiler — see models/style_transformer.py).
    traced_k_impl: str = "scan"

    def encoder_attn(self) -> AttentionConfig:
        return AttentionConfig(
            dim=self.encoder_dim, num_heads=self.encoder_num_heads,
            window_size=self.encoder_window_size, shift_size=self.encoder_shift_size,
            qkv_bias=self.encoder_qkv_bias, proj_bias=self.encoder_proj_bias,
            dropout=self.encoder_dropout, attention_dropout=self.encoder_attention_dropout,
            use_pallas=self.use_pallas)

    def decoder_attn(self) -> AttentionConfig:
        return AttentionConfig(
            dim=self.decoder_dim, num_heads=self.decoder_num_heads,
            window_size=self.decoder_window_size, shift_size=self.decoder_shift_size,
            qkv_bias=self.decoder_qkv_bias, proj_bias=self.decoder_proj_bias,
            dropout=self.decoder_dropout, attention_dropout=self.decoder_attention_dropout,
            use_pallas=self.use_pallas)


@dataclass(frozen=True)
class SwinConfig(_ConfigBase):
    """First-2-stages Swin backbone (torchvision layout).

    The reference cuts torchvision swin_{t,s,b} to features[:4]
    (reference: codes/utils.py:59-102): patch-embed (4x4), stage-1 blocks,
    PatchMerging, stage-2 blocks. Output is NHWC (B, H/8, W/8, 2*embed_dim).
    """
    variant: str = "swin_B"
    embed_dim: int = 128           # swin_T/S: 96
    depths: Tuple[int, int] = (2, 2)
    num_heads: Tuple[int, int] = (4, 8)     # swin_T/S: (3, 6)
    window_size: Tuple[int, int] = (7, 7)
    mlp_ratio: float = 4.0
    # torchvision scales stochastic depth linearly over *all* blocks of the
    # full model; for the first 4 blocks of swin_b (total 24, p_max=0.5):
    # p_i = p_max * i / (24 - 1).
    stochastic_depth_probs: Tuple[float, ...] = (0.0, 0.5 / 23, 1.0 / 23, 1.5 / 23)
    use_pallas: bool = False
    # In-kernel matmul mode for the Pallas paths (ops/precision.py):
    # "native" (ambient precision) or "split3" (3-pass bf16 hi/lo split of
    # f32 operands — XLA-'high'-class accuracy at half the HIGHEST passes;
    # Mosaic cannot lower precision=HIGH directly).
    matmul_mode: str = "native"

    # "s2d": space-to-depth reshape + GEMM (exact; pays a relayout);
    # "conv": direct stride-4 conv_general_dilated. A/B knob — same math.
    patch_embed_impl: str = "s2d"

    @staticmethod
    def for_variant(variant: str) -> "SwinConfig":
        if variant == "swin_B":
            return SwinConfig(variant=variant, embed_dim=128, num_heads=(4, 8),
                              stochastic_depth_probs=(0.0, 0.5 / 23, 1.0 / 23, 1.5 / 23))
        if variant == "swin_S":
            return SwinConfig(variant=variant, embed_dim=96, num_heads=(3, 6),
                              stochastic_depth_probs=(0.0, 0.3 / 23, 0.6 / 23, 0.9 / 23))
        if variant == "swin_T":
            return SwinConfig(variant=variant, embed_dim=96, num_heads=(3, 6),
                              stochastic_depth_probs=(0.0, 0.2 / 11, 0.4 / 11, 0.6 / 11))
        raise ValueError(f"unknown swin variant {variant!r} (swin_T/swin_S/swin_B)")

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2


@dataclass(frozen=True)
class DecoderConfig(_ConfigBase):
    """CNN (AdaIN-paper) decoder config (reference: codes/decoder.py:15-21)."""
    channel_dim: int = 256
    initializer: str = "kaiming_normal_"
    # Exact algebraic fusion of upsample->pad->conv pairs into coarse-grid
    # phase convs (ops/conv.py:upsample_conv_fused); bit-comparable output.
    fuse_upsample: bool = True
    # Pallas phase-align kernel for the post-conv phase realignment (the
    # 4-slice+concat XLA chain costs ~3ms at 256^2; the kernel is one
    # bandwidth-bound op). Exact — same values, different schedule.
    use_pallas: bool = False
    # In-kernel matmul mode for the Pallas paths (ops/precision.py):
    # "native" (ambient precision) or "split3" (3-pass bf16 hi/lo split of
    # f32 operands — XLA-'high'-class accuracy at half the HIGHEST passes;
    # Mosaic cannot lower precision=HIGH directly).
    matmul_mode: str = "native"

    # First conv index that runs on the plain fine grid instead of phase
    # space (exact either way). The phase path wins while channel counts are
    # narrow, but its align+interleave tail can lose to a plain XLA conv at
    # the last layers — A/B'd on the full bench (PERF.md round 3).
    phase_exit: int = 99
    # Stencil-GEMM phase conv (ops/pallas_conv.stencil_phase_conv),
    # DEFAULT ON since the r3 input-resident rewrite (+2% style-locked):
    # conv+bias+ReLU+align in one kernel of MXU GEMMs. The r3 input-resident
    # rewrite (one streamed view + 2-row tail instead of three full halo
    # views) turned the first version's -1..-2% into +2% on style-locked
    # serving (359 vs 349-353 imgs/s) and a wash on the pair headline
    # (PERF.md A/B table) — on by default; gated to even tile heights and
    # 128-lane inputs, exact either way.
    use_stencil_conv: bool = True
    # Double-phase (L2) tail (r4): the final upsample->conv and the RGB conv
    # run in a SECOND phase level (spatial stays at the pre-upsample grid,
    # lanes grow 16x), so the 256^2-512^2 fine grids at 32/3 channels — the
    # decoder's three most expensive convs (scripts/probe_decoder.py) —
    # become wide GEMM stencils; the fine RGB grid materializes exactly
    # once at the final interleave. Exact (tests/test_ops.py phase2 parity).
    phase2_tail: bool = True
    # RGB (final) conv formulation under phase2_tail. All six probed
    # variants (scripts/probe_conv8.py + bench A/Bs): "l2" (direct composed
    # XLA conv, DEFAULT — pair 258.2 / locked 381.9), "l1" (downlevel
    # relayout + L1 phase conv — 245.6 / 354.4, the relayout costs more
    # than it saves), Pallas RGB kernel (_RGB_KERNEL_ON — 249.0 / 361.1),
    # pad32 stencil, fine-grid XLA, explicit GEMMs (all slower isolated).
    # plus "l2gemm" (r4: the composed conv as 4 shifted GEMM accumulations —
    # full-bench WASH, pair 260.97 vs 261.74 / locked 386.65 vs 390.28; the
    # isolated win does not survive in-context fusion) and "l2k128" (r4
    # kernel v2, ops/pallas_conv.stencil_phase2_rgb128: dense N=128 tap
    # GEMMs with 8-lane output slots + in-kernel lane-mask align — fixes
    # both costs the first RGB kernel lost its A/B to).
    rgb_tail: str = "l2"


@dataclass(frozen=True)
class ModelConfig(_ConfigBase):
    """Full model = swin encoder + style transformer + CNN decoder
    (reference: codes/full_model.py:21-155)."""
    swin: SwinConfig = field(default_factory=SwinConfig)
    transformer: StyleTransformerConfig = field(default_factory=StyleTransformerConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    # Compute dtype for the forward pass ("float32" or "bfloat16"); params stay fp32.
    compute_dtype: str = "float32"
    # Per-stage dtype overrides (mixed-precision operating points, r4).
    # None -> compute_dtype. When an override IS set, that stage manages its
    # own matmul precision (f32 stage -> HIGHEST so the TPU MXU doesn't
    # silently run its f32 matmuls as single bf16 passes; bf16 stage ->
    # DEFAULT), so a mixed config is self-contained regardless of the
    # ambient jax.default_matmul_precision. With all three at None, behavior
    # is exactly the pre-r4 single-dtype path (ambient precision applies).
    swin_dtype: Optional[str] = None
    transformer_dtype: Optional[str] = None
    decoder_dtype: Optional[str] = None

    def stage_dtype(self, stage: str) -> str:
        return getattr(self, f"{stage}_dtype") or self.compute_dtype

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        return cls(
            swin=SwinConfig.from_dict(d.get("swin", {})),
            transformer=StyleTransformerConfig.from_dict(d.get("transformer", {})),
            decoder=DecoderConfig.from_dict(d.get("decoder", {})),
            compute_dtype=d.get("compute_dtype", "float32"),
            swin_dtype=d.get("swin_dtype"),
            transformer_dtype=d.get("transformer_dtype"),
            decoder_dtype=d.get("decoder_dtype"),
        )


@dataclass(frozen=True)
class LossConfig(_ConfigBase):
    """VGG19 perceptual loss config (reference: codes/loss.py:77-98)."""
    use_vgg19_with_batchnorm: bool = False
    default_lambda_value: float = 10.0
    distance_content: str = "euclidian"        # or "euclidian_squared"
    distance_style: str = "euclidian"
    # Reference bug (codes/loss.py:189-190): an explicitly passed lambda is
    # overwritten by the default. We implement the intended behavior; set this
    # flag to replicate the reference bit-for-bit.
    replicate_lambda_override_bug: bool = False
    # Reference bug (codes/loss.py:333-334): similarity loss compares content
    # features against themselves (always 0). We compare content vs output
    # (the intended Lss); set this flag to replicate the reference.
    replicate_similarity_bug: bool = False


@dataclass(frozen=True)
class DataConfig(_ConfigBase):
    """Data pipeline config (reference: codes/get_dataloader.py, train.py:222-245)."""
    content_dir: str = "datasets/coco_train_dataset/train2017"
    style_dir: str = "datasets/wikiart"
    batch_size_content: int = 4
    batch_size_style: int = 1
    resize_to: int = 512
    crop_to: int = 256
    use_random_crop: bool = True
    use_imagenet_normalization_for_swin: bool = True
    use_imagenet_normalization_for_loss: bool = True
    num_workers: int = 4
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig(_ConfigBase):
    """Training loop config.

    Mirrors the flag surface of train.py:589-806 / train_only_inner_loop.py:619-879.
    """
    mode: str = "plain"                 # "plain" | "meta" | "fast_adaptation"
    # Ambient matmul precision for the run ("default" | "high" | "highest").
    # Lives IN the config so checkpoints/exp-dir/metrics record it and a
    # resumed run restores it (TPU DEFAULT runs f32 matmuls as single bf16
    # MXU passes — PERF.md); applied by train/trainer.py at run start.
    matmul_precision: str = "default"
    inner_lr: float = 1e-4
    outer_lr: float = 1e-4              # Reptile outer step (meta mode)
    num_inner_updates: int = 1
    max_layers: int = 4                 # random k in [1, max_layers]
    lambda_style: float = 10.0
    max_iterations: int = 15000
    freeze_encoder: bool = True
    save_every: int = 100
    save_every_for_model: int = 1000
    # lr schedule (reference: train_only_inner_loop.py:321-341; defaults from
    # the argparse surface at train_only_inner_loop.py:697-709)
    use_lr_schedule: bool = True
    warmup_iterations: int = 0
    lr_decay_rate: float = 0.02
    lr_decay_every: int = 3000
    lr_decay_until: float = 0.0
    seed: int = 42
    # Parallelism: data-parallel shards over this many devices (mesh axis "data").
    num_devices: int = 1
    # Rematerialize the model forward in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for a much smaller activation footprint, enabling
    # larger batches / resolutions per chip.
    remat: bool = False
    # Gradient accumulation: split each batch into this many sequential
    # micro-batches and average their grads before the optimizer update
    # (large effective batches beyond per-chip memory).
    grad_accum_steps: int = 1


@dataclass(frozen=True)
class ExperimentConfig(_ConfigBase):
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    exp_name: str = "master"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        return cls(
            model=ModelConfig.from_dict(d.get("model", {})),
            loss=LossConfig.from_dict(d.get("loss", {})),
            data=DataConfig.from_dict(d.get("data", {})),
            train=TrainConfig.from_dict(d.get("train", {})),
            exp_name=d.get("exp_name", "master"),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))
