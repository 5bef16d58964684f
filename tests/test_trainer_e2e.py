"""End-to-end trainer smoke tests on the CPU backend: run a few real steps of
each mode through the public train() entry point with synthetic data, then
resume from the checkpoint."""

import os

import numpy as np
import pytest


def _write_images(dirpath, n, seed=0):
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    r = np.random.default_rng(seed)
    for i in range(n):
        arr = r.integers(0, 255, size=(96, 120, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(dirpath, f"i{i}.jpg"))


def _cfg(tmp_path, mode, iters):
    from mastermetastyletransfer_tpu.config import (
        DataConfig, ExperimentConfig, LossConfig, ModelConfig, TrainConfig,
    )

    cdir, sdir = str(tmp_path / "c"), str(tmp_path / "s")
    _write_images(cdir, 6, seed=1)
    _write_images(sdir, 3, seed=2)
    return ExperimentConfig(
        model=ModelConfig(),
        loss=LossConfig(),
        data=DataConfig(content_dir=cdir, style_dir=sdir,
                        batch_size_content=2, resize_to=96, crop_to=64),
        train=TrainConfig(mode=mode, max_iterations=iters, max_layers=2,
                          num_inner_updates=2, save_every=1000,
                          save_every_for_model=1000, seed=0),
    )


@pytest.mark.parametrize("mode", ["plain", "meta", "fast_adaptation"])
def test_trainer_end_to_end(tmp_path, mode):
    from mastermetastyletransfer_tpu.train.trainer import train

    cfg = _cfg(tmp_path, mode, 2)
    metrics = train(cfg, exp_dir=str(tmp_path / "exp"), log_every=1,
                    dump_images=False)
    assert np.isfinite(metrics["total"])
    assert os.path.exists(tmp_path / "exp" / "config.json")
    assert os.path.exists(tmp_path / "exp" / "metrics.jsonl")
    # final checkpoint written
    ckpts = os.listdir(tmp_path / "exp" / "checkpoints")
    assert any(d.isdigit() for d in ckpts)


def test_trainer_resume(tmp_path):
    from mastermetastyletransfer_tpu.train.trainer import train
    from mastermetastyletransfer_tpu.utils import checkpoint as ckpt_lib

    cfg = _cfg(tmp_path, "plain", 2)
    train(cfg, exp_dir=str(tmp_path / "exp"), log_every=1, dump_images=False)
    assert ckpt_lib.latest_step(str(tmp_path / "exp" / "checkpoints")) == 2
    # continue to 4 iterations from the checkpoint
    cfg2 = cfg.replace(train=cfg.train.replace(max_iterations=4))
    train(cfg2, exp_dir=str(tmp_path / "exp"), resume=True, log_every=1,
          dump_images=False)
    assert ckpt_lib.latest_step(str(tmp_path / "exp" / "checkpoints")) == 4


def test_trainer_data_parallel(tmp_path):
    """train() over a 2-device mesh: full plumbing incl. sharded batches."""
    from mastermetastyletransfer_tpu.train.trainer import train

    cfg = _cfg(tmp_path, "plain", 2)
    cfg = cfg.replace(train=cfg.train.replace(num_devices=2))
    metrics = train(cfg, exp_dir=str(tmp_path / "exp_dp"), log_every=1,
                    dump_images=False)
    assert np.isfinite(metrics["total"])
