"""MasterMetaStyleTransfer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
"Master: Meta Style Transformer for Controllable Zero-Shot and Few-Shot Artistic
Style Transfer" (CVPR 2023).

Re-designed TPU-first with the capabilities of the PyTorch reference
(uozyurt/MasterMetaStyleTransfer): frozen Swin first-2-stage encoder, shared-weight
shifted-window cross-attention style transformer producing per-pixel scale/shift
modulation, AdaIN-style CNN decoder, VGG19 perceptual losses, plain/meta (Reptile)
training loops, few-shot fast adaptation, and a 220-pair evaluation harness.

Layout:
  ops/       window/shifted-window attention (XLA + fused Pallas), norms, MLP, convs
  models/    Swin backbone, style transformer, CNN decoder, full model
  losses/    VGG19 feature extractor + content/style/similarity losses
  data/      host decode + device-side preprocessing pipelines
  train/     jitted train steps, plain + Reptile meta + fast-adaptation trainers
  parallel/  device-mesh / sharding helpers (data-parallel first)
  utils/     checkpointing, torch state-dict converters, image IO
  eval/      test_model.py-equivalent pairwise evaluation sweep
"""

__version__ = "0.1.0"
