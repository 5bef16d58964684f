"""Data pipeline: COCO content + WikiArt style streams.

Reference behavior covered (codes/get_dataloader.py, train.py:222-245,411-416):
- endless reshuffled index stream (InfiniteSampler, get_dataloader.py:10-19)
- per-item decode -> RGB -> resize(512,512) -> random/center-crop(256)
- one style image per step repeated to the content batch size
- multi-worker prefetch (DataLoader(num_workers=4, pin_memory))

TPU-native split: the host only decodes and resizes to the fixed staging size
(variable JPEG shapes must become static before jit); crop + [0,1] scaling +
ImageNet normalization run on-device inside the jitted step
(device_preprocess_batch), so HBM is fed uint8 at 1/4 the bandwidth of fp32.
Prefetch uses a thread pool + bounded queue (PIL decode releases the GIL).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.config import DataConfig

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(root: str, recursive: bool = True) -> List[str]:
    """All image files under root (reference globs *.jpg flat for COCO,
    recursive for wikiart — get_dataloader.py:30,81)."""
    pat = os.path.join(root, "**", "*") if recursive else os.path.join(root, "*")
    files = [f for f in glob.glob(pat, recursive=recursive)
             if f.lower().endswith(_EXTS)]
    files.sort()
    return files


class InfiniteIndexSampler:
    """Endless reshuffled index stream (reference: get_dataloader.py:10-19)."""

    def __init__(self, n: int, seed: int = 0):
        if n <= 0:
            raise ValueError("empty dataset")
        self.n = n
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        while True:
            order = self._rng.permutation(self.n)
            for i in order:
                yield int(i)


def _decode_resize(path: str, resize_to: int) -> np.ndarray:
    """Host side: decode -> RGB -> bilinear resize to (resize_to, resize_to)
    uint8 HWC (reference: cv2 BGR->RGB + transforms.Resize((512,512)),
    get_dataloader.py:63-69)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((resize_to, resize_to), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


class ImageFolderDataset:
    """Decoded+staged image dataset over a directory.

    Batch reads go through the native C++ loader (threaded libjpeg decode +
    bilinear resize, native/loader.cpp) when it is available, with automatic
    per-file PIL fallback."""

    def __init__(self, root: str, resize_to: int = 512, recursive: bool = True,
                 use_native: bool = True):
        self.files = list_images(root, recursive=recursive)
        self.resize_to = resize_to
        self.use_native = use_native

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        return _decode_resize(self.files[i], self.resize_to)

    def get_batch(self, indices) -> np.ndarray:
        if self.use_native:
            from mastermetastyletransfer_tpu.data.native_loader import (
                decode_resize_batch, native_available,
            )
            if native_available():
                return decode_resize_batch(
                    [self.files[i] for i in indices], self.resize_to)
        return np.stack([self[i] for i in indices])


class _LoadError:
    """A worker-side batch failure, delivered in-sequence to the consumer."""

    def __init__(self, indices, error):
        self.indices = indices
        self.error = error


class PrefetchLoader:
    """Thread-pool batch loader with a bounded prefetch window and
    DETERMINISTIC batch order.

    Yields uint8 (B, resize_to, resize_to, 3) batches forever. A single
    index producer assigns a sequence number to every batch's index group
    (so batch k always holds the same images for a given seed), workers
    decode concurrently, and delivery reorders by sequence number — a
    fixed-seed run sees the identical batch stream regardless of worker
    count or thread scheduling, matching the exact-resume rng design of the
    trainer (derived per-step keys). Outstanding work is bounded by
    prefetch + num_workers batches.
    """

    def __init__(self, dataset, batch_size: int, *, num_workers: int = 4,
                 seed: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self._sampler = iter(InfiniteIndexSampler(len(dataset), seed))
        self._window = prefetch + max(1, num_workers)
        self._tasks: "queue.Queue[Tuple[int, List[int]]]" = queue.Queue(
            maxsize=prefetch)
        self._results = {}
        self._cond = threading.Condition()
        self._next_seq = 0
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_workers))
        ]
        self._threads.append(
            threading.Thread(target=self._produce, daemon=True))
        for t in self._threads:
            t.start()

    def _produce(self):
        seq = 0
        while not self._stop.is_set():
            # Gate on CONSUMPTION, not just the task queue: without this,
            # workers drain tasks into `_results` as fast as they decode and
            # the producer refills, so decoded-but-unconsumed batches (and
            # the decode threads' CPU use) grow without bound whenever the
            # consumer stalls — e.g. a minutes-long XLA compile was starved
            # by 8+ decode threads spinning at full tilt (r3 regression:
            # trainer e2e tests went from ~1 min to >10 min each).
            with self._cond:
                while (not self._stop.is_set()
                       and seq >= self._next_seq + self._window):
                    self._cond.wait(0.5)
            if self._stop.is_set():
                break
            idx = [next(self._sampler) for _ in range(self.batch_size)]
            while not self._stop.is_set():
                try:
                    self._tasks.put((seq, idx), timeout=0.5)
                    seq += 1
                    break
                except queue.Full:
                    continue

    def _worker(self):
        while not self._stop.is_set():
            try:
                seq, idx = self._tasks.get(timeout=0.5)
            except queue.Empty:
                continue
            try:
                if hasattr(self.dataset, "get_batch"):
                    batch = self.dataset.get_batch(idx)
                else:
                    batch = np.stack([self.dataset[i] for i in idx])
            except Exception as e:  # noqa: BLE001
                # Deliver the failure for this seq instead of dying: a dead
                # worker would leave a hole in the sequence and __next__
                # would wait on it forever (silent training hang). Raising
                # at the consumer is deterministic and names the bad input.
                batch = _LoadError(idx, e)
            with self._cond:
                self._results[seq] = batch
                self._cond.notify_all()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        with self._cond:
            while self._next_seq not in self._results:
                if self._stop.is_set():
                    raise StopIteration
                self._cond.wait(0.5)
            batch = self._results.pop(self._next_seq)
            self._next_seq += 1
            self._cond.notify_all()  # wake the gated producer
        if isinstance(batch, _LoadError):
            raise RuntimeError(
                f"batch load failed for dataset indices {batch.indices}"
            ) from batch.error
        return batch

    def close(self):
        self._stop.set()
        with self._cond:
            self._cond.notify_all()


def device_preprocess_batch(batch_u8: jnp.ndarray, crop_to: int, *,
                            random_crop: bool,
                            rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """On-device: uint8 staged batch -> float [0,1] crop. Jit-safe (static
    output shape; random offsets via dynamic_slice).

    Mirrors RandomCrop/CenterCrop(256) + ToTensor (train.py:222-245).
    ImageNet normalization is applied later per the swin/loss flags
    (train/step.py), matching the reference's flag plumbing.
    """
    b, h, w, c = batch_u8.shape
    x = batch_u8.astype(jnp.float32) / 255.0
    if crop_to > h or crop_to > w:
        raise ValueError(f"crop {crop_to} larger than staged size {h}x{w}")
    if crop_to == h and crop_to == w:
        return x
    if random_crop:
        if rng is None:
            raise ValueError("random_crop requires rng")
        ry, rx = jax.random.split(rng)
        oy = jax.random.randint(ry, (b,), 0, h - crop_to + 1)
        ox = jax.random.randint(rx, (b,), 0, w - crop_to + 1)
    else:
        oy = jnp.full((b,), (h - crop_to) // 2)
        ox = jnp.full((b,), (w - crop_to) // 2)

    def crop_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (crop_to, crop_to, c))

    return jax.vmap(crop_one)(x, oy, ox)


def repeat_style_to_batch(style_one: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """One style image -> repeated to the content batch size
    (reference: train.py:411-416)."""
    if style_one.ndim == 3:
        style_one = style_one[None]
    return jnp.tile(style_one[:1], (batch_size, 1, 1, 1))


def make_train_iterators(cfg: DataConfig) -> Tuple[PrefetchLoader, PrefetchLoader]:
    """(content_loader, style_loader) over COCO/WikiArt directories."""
    content = ImageFolderDataset(cfg.content_dir, cfg.resize_to, recursive=False)
    style = ImageFolderDataset(cfg.style_dir, cfg.resize_to, recursive=True)
    if len(content) == 0:
        raise FileNotFoundError(f"no images under {cfg.content_dir}")
    if len(style) == 0:
        raise FileNotFoundError(f"no images under {cfg.style_dir}")
    c_loader = PrefetchLoader(content, cfg.batch_size_content,
                              num_workers=cfg.num_workers, seed=cfg.seed)
    s_loader = PrefetchLoader(style, cfg.batch_size_style,
                              num_workers=max(1, cfg.num_workers // 2),
                              seed=cfg.seed + 1)
    return c_loader, s_loader
