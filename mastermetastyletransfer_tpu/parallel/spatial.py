"""Spatial (sequence/context) parallelism for high-resolution stylization.

The reference caps cost architecturally — attention is window-local (49
tokens/window) with global mixing via the alternating cyclic shift
(reference: codes/style_transformer.py:97-111) — but runs strictly on one
device. For the 1024^2 config (BASELINE.json config #5) the token grid is
sharded across chips along H: windows are embarrassingly parallel within a
phase, and the only cross-shard traffic is the cyclic roll of the shifted
phase plus the window-padding edges.

Implementation is pjit/GSPMD-native: the feature maps carry a
NamedSharding(P(None, "space")) annotation and XLA's SPMD partitioner emits
the halo exchanges (collective-permutes over ICI) for jnp.roll / window
reshapes automatically — the TPU-idiomatic replacement for hand-written
NCCL halo code. A hybrid ("data", "space") mesh composes batch and spatial
sharding for batched high-res serving.

MEASURED DISTRIBUTION STATUS (r4, 8-device CPU mesh, compile-only audit in
tests/test_distribution.py): GSPMD distributes this model PARTIALLY.
  - decoder plain path (fuse_upsample=False): true scaling — per-device
    temp 0.19x single-device, halo collective-permutes, zero all-gathers
    (make_spatial_stylize swaps it in via sharded_decoder=True).
  - swin / style transformer: the window-partition reshapes (H -> H/7 x 7)
    defeat sharding propagation; GSPMD keeps large replicated temps
    (swin 0.50x single at window-aligned sizes, 0.74x at 512^2 where the
    8-way row split crosses window boundaries; full model 0.76x). Output
    and input stay properly sharded and the halo collective-permutes for
    the shifted phase ARE emitted, but per-device PEAK MEMORY does not
    scale ~1/n for these stages.

r5: the band-owned shard_map implementation with explicit ppermute halos
LANDED in parallel/spatial_shmap.py (per-device temp 0.17x single-device
at 512^2 for swin AND the full model, zero all-gathers — the tightened
audits in tests/test_distribution.py pin it). Prefer
make_spatial_stylize_shmap for spatial scaling; this GSPMD module remains
the zero-custom-code fallback and the decoder's sharding provider.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.parallel.mesh import make_mesh


def make_hybrid_mesh(data: int, space: int) -> Mesh:
    """Mesh over (data, space): batch-shard x spatial-shard."""
    return make_mesh(data * space, axis_names=("data", "space"),
                     shape=(data, space))


def make_spatial_stylize(cfg: ModelConfig, mesh: Mesh, *, k: int = 1,
                         data_axis: Optional[str] = None,
                         space_axis: str = "space",
                         sharded_decoder: bool = True):
    """Jitted stylize with images sharded over H (and optionally batch).

    Params replicate (the model is ~7M params — replication is free next to
    the activation footprint at 1024^2: a (B,128,128,256) fp32 feature map is
    16 MB/image while params are 28 MB total).

    sharded_decoder (default True) swaps the decoder to its plain
    resize+conv formulation — EXACT same math as the phase-space fusion
    (ops/conv.py docstring), but GSPMD shards it to 0.19x single-device
    temp where the phase path's interleave reshapes hold 0.40x replicated
    temps (tests/test_distribution.py). The phase path is the right choice
    on ONE chip; under a spatial mesh, shardability wins.
    """
    if sharded_decoder:
        cfg = cfg.replace(decoder=cfg.decoder.replace(
            fuse_upsample=False, use_stencil_conv=False, use_pallas=False))
    img_spec = P(data_axis, space_axis, None, None)
    img_s = NamedSharding(mesh, img_spec)
    rep = NamedSharding(mesh, P())

    def stylize(params, content, style):
        out = master_apply(params, content, style, cfg, k=k, deterministic=True)
        return out

    return jax.jit(stylize, in_shardings=(rep, img_s, img_s),
                   out_shardings=img_s)


def shard_images_spatial(batch, mesh: Mesh, *, data_axis: Optional[str] = None,
                         space_axis: str = "space"):
    """Place NHWC image arrays sharded over H (and optionally batch)."""
    s = NamedSharding(mesh, P(data_axis, space_axis, None, None))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
