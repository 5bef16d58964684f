"""Static window geometry: partition/merge reshapes, relative-position index,
and shifted-window attention masks.

All mask/index construction happens in numpy at trace time from *static* shapes
(everything under jit sees them as constants folded into the program), matching
the data-independent construction requirement of XLA. The math mirrors the
reference semantics (reference: codes/style_transformer.py:136-150 for the
shift mask, :227-239 for the relative-position index) without any torch.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index for tokens in a (wh, ww) window.

    Returns int32 array of shape (wh*ww * wh*ww,) indexing into a bias table of
    size (2*wh-1)*(2*ww-1). Semantics match the Swin construction
    (reference: codes/style_transformer.py:227-239).
    """
    coords_h, coords_w = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([coords_h.reshape(-1), coords_w.reshape(-1)])      # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]                        # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)                        # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).reshape(-1).astype(np.int32)                      # (N*N,)


def relative_position_bias(table: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """Gather the learned bias table into a per-window bias.

    table: ((2*wh-1)*(2*ww-1), num_heads) -> (num_heads, N, N) with N = wh*ww.
    (reference: codes/style_transformer.py:21-28)
    """
    n = wh * ww
    idx = jnp.asarray(relative_position_index(wh, ww))
    bias = table[idx].reshape(n, n, -1)
    return bias.transpose(2, 0, 1)


@lru_cache(maxsize=None)
def shift_attention_mask(pad_h: int, pad_w: int, wh: int, ww: int,
                         sh: int, sw: int) -> np.ndarray:
    """Attention mask for the shifted phase on a (pad_h, pad_w) padded grid.

    After the cyclic roll by (-sh, -sw), tokens from opposite image edges share
    border windows; pairs originating from different pre-roll regions must not
    attend to each other. Regions are delimited by the slice boundaries
    (0, -wh), (-wh, -sh), (-sh, None) per axis; mismatched region ids get -100
    (reference: codes/style_transformer.py:136-147).

    Returns float32 (num_windows, N, N) with entries in {0, -100}.
    """
    region = np.zeros((pad_h, pad_w), dtype=np.int32)
    h_slices = ((0, pad_h - wh), (pad_h - wh, pad_h - sh), (pad_h - sh, pad_h))
    w_slices = ((0, pad_w - ww), (pad_w - ww, pad_w - sw), (pad_w - sw, pad_w))
    count = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            region[h0:h1, w0:w1] = count
            count += 1
    # partition the region map into windows
    region = region.reshape(pad_h // wh, wh, pad_w // ww, ww)
    region = region.transpose(0, 2, 1, 3).reshape(-1, wh * ww)           # (nW, N)
    diff = region[:, None, :] - region[:, :, None]                       # (nW, N, N)
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


@lru_cache(maxsize=None)
def valid_token_mask(h: int, w: int, pad_h: int, pad_w: int, wh: int, ww: int,
                     sh: int, sw: int) -> np.ndarray:
    """(nW, N) float32 mask marking tokens that originate inside the valid
    (h, w) region of a (pad_h, pad_w) padded grid, after the cyclic roll by
    (-sh, -sw) and window partition. Used by the fused block kernel to zero
    the norm1 view of padding tokens in-kernel (a padded token's LayerNorm is
    its bias, but the reference zero-pads AFTER norm1 — multiplying by this
    mask reproduces that exactly, and also makes garbage in pad rows of a
    padded-resident stage inert)."""
    m = np.zeros((pad_h, pad_w), np.float32)
    m[:h, :w] = 1.0
    if sh or sw:
        m = np.roll(m, (-sh, -sw), axis=(0, 1))
    m = m.reshape(pad_h // wh, wh, pad_w // ww, ww).transpose(0, 2, 1, 3)
    return m.reshape(-1, wh * ww)


def window_partition(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nW, wh*ww, C); H, W must be multiples of wh, ww."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // wh) * (w // ww), wh * ww, c)


def window_merge(x: jnp.ndarray, b: int, h: int, w: int, wh: int, ww: int) -> jnp.ndarray:
    """Inverse of window_partition: (B*nW, wh*ww, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    x = x.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def pad_to_windows(x: jnp.ndarray, wh: int, ww: int) -> Tuple[jnp.ndarray, int, int]:
    """Zero-pad H, W (bottom/right) to multiples of the window size
    (reference: codes/style_transformer.py:77-87). Returns (x, pad_h, pad_w)."""
    _, h, w, _ = x.shape
    pad_b = (-h) % wh
    pad_r = (-w) % ww
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x, h + pad_b, w + pad_r


def effective_shift(pad_h: int, pad_w: int, window: Tuple[int, int],
                    shift: Tuple[int, int]) -> Tuple[int, int]:
    """If the window covers the whole (padded) axis there is nothing to shift
    (reference: codes/style_transformer.py:91-94)."""
    sh = 0 if window[0] >= pad_h else shift[0]
    sw = 0 if window[1] >= pad_w else shift[1]
    return sh, sw
