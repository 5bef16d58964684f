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


def test_turnkey_whole_model_readme_sequence(tmp_path, capsys):
    """The README 'real pretrained weights' sequence as a test (VERDICT r3
    task 6): synthesize pretrained_model_lambda_is_2.pt from the LIVE
    reference model in the exact save_whole_model layout (reference
    train_only_inner_loop.py:382-385), run the actual CLI sequence
    (convert_cli whole_model + vgg19 -> eval CLI on fixture images), and
    assert the grid stats match a direct torch-reference run (reference
    test_model.py:95-165 loop) with the same loss network. Once the real
    blobs exist, the goals.txt comparison is provably this one sequence."""
    import json
    import shutil

    import jax
    import jax.numpy as jnp

    from scripts.operating_points import build_reference
    from tests.test_reference_parity import (
        _build_torch_vgg19_features, _patched_torch_load, _sd_numpy, codes,
    )

    size, lam = 128, 2.0
    whole_sd, _, _, _, ref = build_reference(str(tmp_path), size=size, k=1)

    # 0. the checkpoint the README names, in the reference's exact layout
    pt = tmp_path / "pretrained_model_lambda_is_2.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in whole_sd.items()}, pt)
    feats = _build_torch_vgg19_features().eval()
    vgg_pt = tmp_path / "vgg19.pt"
    torch.save(feats.state_dict(), vgg_pt)

    # 1. convert weights to .npz param pytrees (README step 1)
    from mastermetastyletransfer_tpu.utils.convert_cli import main as conv_main

    npz = str(tmp_path / "master_lambda2.npz")
    vgg_npz = str(tmp_path / "vgg19.npz")
    conv_main(["whole_model", "--input", str(pt), "--output", npz])
    conv_main(["vgg19", "--input", str(vgg_pt), "--output", vgg_npz])

    # 2. the eval grid on fixture images (README step 2) — 2x2 pairs
    cdir, sdir = tmp_path / "content", tmp_path / "style"
    cdir.mkdir(), sdir.mkdir()
    for name in ("lenna.jpg", "modern.jpg"):
        shutil.copy(f"/root/reference/test/content_input/{name}", cdir)
    for name in sorted(__import__("os").listdir(
            "/root/reference/test/style_input"))[:2]:
        shutil.copy(f"/root/reference/test/style_input/{name}", sdir)

    from mastermetastyletransfer_tpu.eval.cli import main as eval_main

    out_dir = str(tmp_path / "outs")
    eval_main(["--content_dir", str(cdir), "--style_dir", str(sdir),
               "--checkpoint", npz, "--vgg_weights", vgg_npz,
               "--image_size", str(size), "--k", "1",
               "--lambda_style", str(lam), "--style_batch", "2",
               "--save_images_to", out_dir])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert summary["num_pairs"] == 4
    assert summary["weights"] == npz  # provenance banner points at the ckpt

    # 3. the direct torch-reference run (test_model.py loop) on the same
    # pairs with the same VGG — the goals.txt-style comparison
    from mastermetastyletransfer_tpu.eval.harness import load_eval_images

    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    torch.save(_build_torch_vgg19_features().eval(),
               weights_dir / "vgg_19_last_layer_is_relu_5_1_output.pt")
    with _patched_torch_load():
        ref_loss = codes.loss.custom_loss(
            project_absolute_path=str(tmp_path),
            default_lambda_value=lam).eval()

    contents, _ = load_eval_images(str(cdir), size)
    styles, _ = load_eval_images(str(sdir), size)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    tot_t, con_t, sty_t = [], [], []
    with torch.no_grad():
        for c in contents:
            tc = torch.from_numpy(c.transpose(2, 0, 1))[None]
            tcn = (tc - mean) / std
            for s in styles:
                ts = torch.from_numpy(s.transpose(2, 0, 1))[None]
                tsn = (ts - mean) / std
                o = ref(tcn, tsn, 1)
                # reference test loop: loss(content_norm, style_norm,
                # imagenet_norm(stylized)) — test_model.py:149-156
                t, cl, sl = ref_loss(tcn, tsn, (o - mean) / std,
                                     output_content_and_style_loss=True)
                tot_t.append(float(t)), con_t.append(float(cl))
                sty_t.append(float(sl))

    np.testing.assert_allclose(summary["content_mean"], np.mean(con_t),
                               rtol=2e-3)
    np.testing.assert_allclose(summary["style_mean"], np.mean(sty_t),
                               rtol=2e-3)
    np.testing.assert_allclose(summary["total_mean"], np.mean(tot_t),
                               rtol=2e-3)


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
