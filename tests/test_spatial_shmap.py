"""Parity + halo-correctness tests for the band-owned shard_map spatial
path (parallel/spatial_shmap.py) — the SURVEY §2.5 CP design: window-grid
bands per device, ppermute halos for the shifted roll, psum'd image-global
statistics. Reference semantics: codes/style_transformer.py:98-111 (roll/
partition), :1053-1057 and :520-530 (image-global INs).

Compile-time distribution EVIDENCE (per-device memory, collective counts)
lives in tests/test_distribution.py; these tests check NUMBERS against the
single-device path on the 8-virtual-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply
from mastermetastyletransfer_tpu.parallel import make_mesh
from mastermetastyletransfer_tpu.parallel import spatial_shmap as ss


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((2, 256, 256, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 256, 256, 3)).astype(np.float32))
    return cfg, params, c, s


def test_band_repartition_roundtrip():
    """Uniform -> window-aligned -> uniform bands is the identity on valid
    rows for every offset pattern the swin/ST stages use (incl. the
    3-neighbor gather when o_rows > i_rows)."""
    n = 8
    mesh = make_mesh(n, axis_names=("space",))
    rng = np.random.default_rng(0)
    for h_valid, o_loc in ((64, 14), (32, 7), (128, 21)):
        x = rng.standard_normal((1, h_valid, 4, 8)).astype(np.float32)

        def f(xl, o_loc=o_loc, h_valid=h_valid):
            y = ss._band_repartition(xl, o_loc, "space", n, h_valid=h_valid)
            return ss._band_repartition(y, h_valid // n, "space", n,
                                        h_valid=h_valid)

        out = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(None, "space", None, None),
            out_specs=P(None, "space", None, None)))(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(out), x)


def test_band_roll_matches_global_roll():
    n = 8
    mesh = make_mesh(n, axis_names=("space",))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 56, 3, 4)).astype(np.float32)
    for sh in (3, 4):
        def f(xl, sh=sh):
            r = ss._band_roll_h(xl, sh, "space", n)
            u = ss._band_unroll_h(r, sh, "space", n)
            return r, u

        r, u = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(None, "space", None, None),
            out_specs=(P(None, "space", None, None),) * 2))(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(r), np.roll(x, -sh, axis=1))
        np.testing.assert_array_equal(np.asarray(u), x)


def test_swin_band_parity_exact(setup):
    """The band-owned swin matches the single-device path BITWISE at f32:
    all its ops are window/token-local, the extra all-pad window rows never
    share a window with reference tokens (unshifted), and shifted-phase
    masks exclude keys outside the reference grid (_shift_mask_refgrid)."""
    cfg, params, c, _ = setup
    ref = jax.jit(lambda p, x: swin_backbone_apply(
        p["swin"], x, cfg.swin))(params, c)
    for n in (2, 8):
        mesh = make_mesh(n, axis_names=("space",))
        aux, specs, meta = ss._build_aux(256, 256, cfg, n)
        spec = P(None, "space", None, None)

        def f(p, x, aux, meta=meta, n=n):
            return ss._swin_local(p["swin"], x, cfg.swin, aux, meta,
                                  "space", n)

        out = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(), spec, specs),
            out_specs=spec))(params, c, aux)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("k", [1, 3])
def test_full_spatial_shmap_parity(setup, k):
    """Full pipeline (swin + ST in shard_map, decoder via GSPMD) vs the
    single-device forward; only the psum'd instance-norm statistics
    reassociate, so the tolerance is tight."""
    cfg, params, c, s = setup
    mesh = make_mesh(8, axis_names=("space",))
    pcfg = cfg.replace(decoder=cfg.decoder.replace(fuse_upsample=False))
    ref = np.asarray(jax.jit(functools.partial(
        lambda p, a, b, k: master_apply(p, a, b, pcfg, k=k), k=k))(
            params, c, s))
    out = np.asarray(ss.make_spatial_stylize_shmap(cfg, mesh, k=k)(
        params, c, s))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_full_spatial_shmap_parity_pallas(setup):
    """Same parity with the FUSED Pallas kernels per device (interpret on
    CPU): the band path feeds them TRACED mask/padmask slabs (r5 support
    in ops/pallas_attention) — swin via the row-resident kernel with the
    H-roll as the ppermute halo, ST via the iteration-fusion kernels."""
    cfg, params, c, s = setup
    cfg = cfg.replace(swin=cfg.swin.replace(use_pallas=True),
                      transformer=cfg.transformer.replace(use_pallas=True))
    mesh = make_mesh(8, axis_names=("space",))
    pcfg = cfg.replace(decoder=cfg.decoder.replace(fuse_upsample=False))
    ref = np.asarray(jax.jit(
        lambda p, a, b: master_apply(p, a, b, pcfg, k=1))(params, c, s))
    out = np.asarray(ss.make_spatial_stylize_shmap(cfg, mesh, k=1)(
        params, c, s))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_hybrid_data_x_space_shmap_parity(setup):
    """Band-owned path on a hybrid (data=2, space=4) mesh: batch shards
    over data, H-bands over space, psums stay space-only."""
    cfg, params, c, s = setup
    from mastermetastyletransfer_tpu.parallel.spatial import make_hybrid_mesh

    mesh = make_hybrid_mesh(2, 4)
    pcfg = cfg.replace(decoder=cfg.decoder.replace(fuse_upsample=False))
    ref = np.asarray(jax.jit(
        lambda p, a, b: master_apply(p, a, b, pcfg, k=1))(params, c, s))
    out = np.asarray(ss.make_spatial_stylize_shmap(
        cfg, mesh, k=1, data_axis="data")(params, c, s))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_spatial_shmap_unsupported_reasons():
    cfg = ModelConfig()
    assert ss.spatial_shmap_unsupported(cfg, 256, 256, 8) is None
    assert ss.spatial_shmap_unsupported(cfg, 250, 256, 8)  # not /8
    assert ss.spatial_shmap_unsupported(cfg, 256, 256, 3)  # rows !/ n
    bad = cfg.replace(transformer=cfg.transformer.replace(
        decoder_use_regular_MHA_instead_of_Swin_at_the_end=True))
    assert ss.spatial_shmap_unsupported(bad, 256, 256, 8)
