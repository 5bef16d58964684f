"""Distribution EVIDENCE for the spatial (sequence/context) parallel path
(VERDICT r3 task 3 / Missing #3): parity tests alone pass even when GSPMD
silently replicates, so these tests inspect the COMPILED artifact — HLO
collectives, per-device output bytes, per-device temp memory — and fail
when the partitioner stops distributing.

Measured status on the 8-device CPU mesh (r4, recorded in PERF.md):
  - full model, 512^2: collective-permutes present; per-device output is
    exactly 1/8 of the global; temp 124 MB vs 164 MB single-device (0.76x).
  - decoder PLAIN path (fuse_upsample=False): temp 0.19x single — true
    spatial scaling (1/8 + conv halos).
  - decoder PHASE path: 0.40x; swin: 0.74x at 512^2 (window-misaligned),
    0.50x at 448^2 (aligned, zero all-gathers) — the window-partition
    reshapes defeat GSPMD propagation, so swin/ST stages are PARTIALLY
    REPLICATED today. The thresholds below pin the measured status: a
    regression toward full replication fails them, and a future
    shard_map/halo implementation should tighten them.

r5 UPDATE: the band-owned shard_map path (parallel/spatial_shmap.py) now
provides TRUE spatial distribution for swin + ST (measured temp 0.17x
single-device at 512^2, zero all-gathers) — audited by the
test_spatial_shmap_* tests below with the VERDICT-r4-prescribed tightened
thresholds (<0.3 full model, <=0.25 swin). The original GSPMD tests remain
as status pins for the pjit-annotation path. Numeric parity for the
shard_map path: tests/test_spatial_shmap.py.

All tests are AOT compile-only (ShapeDtypeStruct in, no execution).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
from mastermetastyletransfer_tpu.parallel import make_mesh
from mastermetastyletransfer_tpu.parallel.spatial import make_spatial_stylize


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, axis_names=("space",))
    return cfg, params, mesh


def _counts(txt):
    return {kind: len(re.findall(kind, txt))
            for kind in ("collective-permute", "all-gather", "all-reduce")}


def test_spatial_full_model_compile_distributes(setup):
    """512^2 full model on the 8-device spatial mesh: the compiled module
    must carry halo collectives, shard the output 8-way, and use less
    per-device temp than the single-device compile. All three fail on a
    silently replicated compile (0 collectives, full-size output buffer,
    identical temp)."""
    cfg, params, mesh = setup
    img = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)

    fn = make_spatial_stylize(cfg, mesh, k=1)
    compiled = fn.lower(params, img, img).compile()
    txt = compiled.as_text()
    c = _counts(txt)
    assert c["collective-permute"] > 0, c

    ma = compiled.memory_analysis()
    # per-device output shard = global bytes / 8
    assert ma.output_size_in_bytes == 512 * 512 * 3 * 4 // 8

    single = jax.jit(
        lambda p, c_, s_: __import__(
            "mastermetastyletransfer_tpu.models.master",
            fromlist=["master_apply"]).master_apply(p, c_, s_, cfg, k=1)
    ).lower(params, img, img).compile()
    ratio = ma.temp_size_in_bytes / single.memory_analysis().temp_size_in_bytes
    # measured 0.76 (r4); full replication would be ~1.0
    assert ratio < 0.85, ratio


def test_decoder_plain_path_spatial_memory_scales(setup):
    """The decoder's plain (resize+conv) path is fully GSPMD-shardable:
    per-device temp must be < 0.25x the single-device compile (measured
    0.19 = 1/8 + 3x3-conv halos) with zero all-gathers."""
    cfg, params, mesh = setup
    dcfg = cfg.decoder.replace(fuse_upsample=False)
    sp = NamedSharding(mesh, P(None, "space", None, None))
    rep = NamedSharding(mesh, P())
    feat = jax.ShapeDtypeStruct((1, 64, 64, 256), jnp.float32)

    f = lambda p, x: cnn_decoder_apply(p["decoder"], x, dcfg)  # noqa: E731
    sharded = jax.jit(f, in_shardings=(rep, sp)).lower(params, feat).compile()
    single = jax.jit(f).lower(params, feat).compile()

    c = _counts(sharded.as_text())
    assert c["collective-permute"] > 0 and c["all-gather"] == 0, c
    ratio = (sharded.memory_analysis().temp_size_in_bytes /
             single.memory_analysis().temp_size_in_bytes)
    assert ratio < 0.25, ratio


def test_spatial_shmap_full_model_memory_scales(setup):
    """The band-owned shard_map path (r5, parallel/spatial_shmap.py) must
    DISTRIBUTE: per-device temp < 0.3x single-device (measured 0.17 =
    1/8 + halos + decoder), zero all-gathers, halo collective-permutes
    present, output sharded 8-way. This is the r4-VERDICT-prescribed
    tightening of the 0.85 GSPMD bound."""
    cfg, params, mesh = setup
    from mastermetastyletransfer_tpu.parallel.spatial_shmap import (
        make_spatial_stylize_shmap,
    )

    img = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    fn = make_spatial_stylize_shmap(cfg, mesh, k=1)
    compiled = fn.lower(params, img, img).compile()
    c = _counts(compiled.as_text())
    assert c["collective-permute"] > 0 and c["all-gather"] == 0, c
    ma = compiled.memory_analysis()
    assert ma.output_size_in_bytes == 512 * 512 * 3 * 4 // 8

    pcfg = cfg.replace(decoder=cfg.decoder.replace(fuse_upsample=False))
    single = jax.jit(
        lambda p, c_, s_: __import__(
            "mastermetastyletransfer_tpu.models.master",
            fromlist=["master_apply"]).master_apply(p, c_, s_, pcfg, k=1)
    ).lower(params, img, img).compile()
    ratio = ma.temp_size_in_bytes / single.memory_analysis().temp_size_in_bytes
    assert ratio < 0.3, ratio  # measured 0.173 (r5)


def test_spatial_shmap_swin_memory_scales(setup):
    """Band-owned swin alone: per-device temp <= 0.25x single-device
    (measured 0.173 at 512^2 — ~1/8 + the one-window-row halos), the
    r4-VERDICT-prescribed tightening of the 0.6 GSPMD bound."""
    cfg, params, mesh = setup
    from jax.sharding import PartitionSpec
    from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply
    from mastermetastyletransfer_tpu.parallel import spatial_shmap as ss

    n = 8
    aux, specs, meta = ss._build_aux(512, 512, cfg, n)
    spec = PartitionSpec(None, "space", None, None)
    img = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)

    def f(p, x, aux):
        return ss._swin_local(p["swin"], x, cfg.swin, aux, meta, "space", n)

    with mesh:
        sharded = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(PartitionSpec(), spec, specs),
            out_specs=spec)).lower(params, img, aux).compile()
    single = jax.jit(lambda p, x: swin_backbone_apply(
        p["swin"], x, cfg.swin)).lower(params, img).compile()
    c = _counts(sharded.as_text())
    assert c["collective-permute"] > 0 and c["all-gather"] == 0, c
    ratio = (sharded.memory_analysis().temp_size_in_bytes /
             single.memory_analysis().temp_size_in_bytes)
    assert ratio <= 0.25, ratio  # measured 0.173 (r5)


def test_swin_aligned_size_distribution_status(setup):
    """GSPMD-status pin (NOT the distributed path — that is the shard_map
    band path above): swin under plain GSPMD at a window-ALIGNED size
    (448^2: 14 token rows/device = 2 whole windows): no all-gathers and
    temp <= 0.6x single-device. Pins the measured partial distribution
    (0.50x, r4) so a regression toward full replication still fails."""
    cfg, params, mesh = setup
    from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply

    sp = NamedSharding(mesh, P(None, "space", None, None))
    rep = NamedSharding(mesh, P())
    img = jax.ShapeDtypeStruct((1, 448, 448, 3), jnp.float32)

    f = lambda p, x: swin_backbone_apply(p["swin"], x, cfg.swin)  # noqa: E731
    sharded = jax.jit(f, in_shardings=(rep, sp)).lower(params, img).compile()
    single = jax.jit(f).lower(params, img).compile()

    c = _counts(sharded.as_text())
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] > 0, c
    ratio = (sharded.memory_analysis().temp_size_in_bytes /
             single.memory_analysis().temp_size_in_bytes)
    assert ratio <= 0.6, ratio
