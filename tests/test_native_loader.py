"""Native C++ loader tests: build, decode parity with PIL, fallback path."""

import os

import numpy as np
import pytest

from mastermetastyletransfer_tpu.data.native_loader import (
    decode_resize_batch, native_available,
)
from mastermetastyletransfer_tpu.data.pipeline import (
    ImageFolderDataset, _decode_resize,
)


def _write_jpegs(dirpath, n, size=(300, 400)):
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    r = np.random.default_rng(0)
    paths = []
    for i in range(n):
        # smooth image (JPEG-friendly): upsampled low-res noise
        base = r.integers(0, 255, (12, 16, 3), np.uint8)
        img = Image.fromarray(base).resize((size[1], size[0]), Image.BILINEAR)
        p = os.path.join(dirpath, f"img_{i}.jpg")
        img.save(p, quality=95)
        paths.append(p)
    return paths


def test_native_loader_builds_and_decodes(tmp_path):
    paths = _write_jpegs(str(tmp_path), 4)
    if not native_available():
        pytest.skip("native toolchain/libjpeg unavailable")
    batch = decode_resize_batch(paths, 128)
    assert batch.shape == (4, 128, 128, 3) and batch.dtype == np.uint8
    ref = np.stack([_decode_resize(p, 128) for p in paths])
    # bilinear vs PIL's antialiased resample on smooth JPEGs: close but not
    # bit-equal (the reference's own cv2 path is the non-antialiased one)
    diff = np.abs(batch.astype(np.int32) - ref.astype(np.int32)).mean()
    assert diff < 6.0, diff


def test_native_loader_fallback_on_bad_file(tmp_path):
    paths = _write_jpegs(str(tmp_path), 2)
    png = str(tmp_path / "x.png")
    from PIL import Image

    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(png)
    if not native_available():
        pytest.skip("native unavailable")
    batch = decode_resize_batch(paths + [png], 64)
    assert batch.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(batch[2], _decode_resize(png, 64))


def test_dataset_get_batch_native(tmp_path):
    _write_jpegs(str(tmp_path), 5)
    ds = ImageFolderDataset(str(tmp_path), resize_to=96)
    batch = ds.get_batch([0, 2, 4])
    assert batch.shape == (3, 96, 96, 3)
    ds_py = ImageFolderDataset(str(tmp_path), resize_to=96, use_native=False)
    ref = ds_py.get_batch([0, 2, 4])
    assert np.abs(batch.astype(int) - ref.astype(int)).mean() < 6.0
