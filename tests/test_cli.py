"""CLI-surface tests: converter CLI end-to-end on synthetic torch state
dicts; loss-calibration sweep."""

import numpy as np
import torch

from tests.test_convert import (
    make_style_transformer_sd, make_swin_backbone_sd,
)
from mastermetastyletransfer_tpu.config import SwinConfig


def test_convert_cli_swin_and_seed(tmp_path, rng):
    sd = make_swin_backbone_sd(rng, SwinConfig.for_variant("swin_B"))
    pt = str(tmp_path / "swin.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)

    from mastermetastyletransfer_tpu.utils.convert_cli import main

    out = str(tmp_path / "swin.npz")
    main(["swin", "--input", pt, "--output", out, "--variant", "swin_B"])
    data = np.load(out)
    assert len(data.files) > 10

    out2 = str(tmp_path / "st_seeded.npz")
    main(["seed_from_swin", "--input", pt, "--output", out2])
    assert len(np.load(out2).files) > 10


def test_convert_cli_style_transformer(tmp_path, rng):
    sd = make_style_transformer_sd(rng)
    pt = str(tmp_path / "st.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)

    from mastermetastyletransfer_tpu.utils.convert_cli import main

    out = str(tmp_path / "st.npz")
    main(["style_transformer", "--input", pt, "--output", out])
    assert len(np.load(out).files) > 20


def test_bench_cli_chunked_smoke(capsys, monkeypatch):
    """bench.py --chunks scans G batch-chunks inside one jit call (dispatch
    amortization, PERF.md); smoke the CLI path end-to-end on CPU and check
    the one-JSON-line contract counts all G*b images."""
    import json
    import sys

    sys.modules.pop("bench", None)
    import bench

    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--size", "64", "--batch", "1", "--chunks", "2",
         "--iters", "1", "--warmup", "0", "--dtype", "float32",
         "--no-pallas"])
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    rec = json.loads(line)
    assert rec["unit"] == "imgs/sec" and rec["value"] > 0
    assert "64x64" in rec["metric"]


def test_loss_calibration_sweep(rng):
    from mastermetastyletransfer_tpu.losses.calibrate import run_sweep
    from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
    import jax

    vgg = init_vgg19_features(jax.random.PRNGKey(0))
    c, s, o = (rng.random((64, 64, 3)).astype(np.float32) for _ in range(3))
    rows = run_sweep(c, s, o, vgg_params_by_kind={"plain": vgg})
    # 1 vgg x 2 distances x 2 norms = 4 rows, all finite
    assert len(rows) == 4
    for r in rows:
        assert np.isfinite(r["total"]) and np.isfinite(r["style"])
    # L2 differs from L1
    assert rows[0]["total"] != rows[2]["total"]


def test_loss_calibration_render_grid(tmp_path, rng):
    from mastermetastyletransfer_tpu.losses.calibrate import (
        render_grid, run_sweep,
    )
    from mastermetastyletransfer_tpu.losses.vgg import init_vgg19_features
    import jax

    vgg = init_vgg19_features(jax.random.PRNGKey(0))
    triplets = [tuple(rng.random((64, 64, 3)).astype(np.float32)
                      for _ in range(3))]
    rows = run_sweep(*triplets[0], vgg_params_by_kind={"plain": vgg})
    out = str(tmp_path / "grid.png")
    render_grid(triplets, [rows], out)
    import os
    assert os.path.getsize(out) > 1000  # a real PNG, not an empty figure
