"""Independent numpy oracle for the framework's core math.

Deliberately naive (explicit python loops over windows and heads, float64)
so the vectorized JAX ops in mastermetastyletransfer_tpu/ops can be validated
against a structurally different implementation of the same algorithm:
shifted-window multi-head attention with relative-position bias and shift
masks (the W-MSA/SW-MSA semantics of Swin, generalized to separate Q/K/V
inputs — behavioral spec: reference codes/style_transformer.py:37-169).
"""

from __future__ import annotations

import numpy as np


def softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def naive_relative_position_index(wh, ww):
    n = wh * ww
    out = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            dy = (i // ww) - (j // ww) + (wh - 1)
            dx = (i % ww) - (j % ww) + (ww - 1)
            out[i, j] = dy * (2 * ww - 1) + dx
    return out


def naive_instance_norm(x_nhwc, eps=1e-5, scale=None, bias=None):
    x = x_nhwc.astype(np.float64)
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)  # biased, like torch IN
    y = (x - mean) / np.sqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def naive_layer_norm(x, scale, bias, eps=1e-5):
    x = x.astype(np.float64)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def gelu(x):
    from math import sqrt
    from scipy.special import erf  # scipy available in the image
    return 0.5 * x * (1.0 + erf(x / sqrt(2.0)))


def _region_id(y, x, pad_h, pad_w, wh, ww, sh, sw):
    """Pre-roll region id of a padded-grid pixel, for the shift mask."""
    if y < pad_h - wh:
        ry = 0
    elif y < pad_h - sh:
        ry = 1
    else:
        ry = 2
    if x < pad_w - ww:
        rx = 0
    elif x < pad_w - sw:
        rx = 1
    else:
        rx = 2
    return ry * 3 + rx


def naive_shifted_window_attention(
        q_img, k_img, v_imgs, wq, bq, wk, bk, wvs, bvs, wproj, bproj,
        bias_table, wh, ww, sh, sw, num_heads, q_proj=True):
    """Naive shifted-window attention.

    q_img/k_img: (B,H,W,C); v_imgs: list of value-stream images (1 or 2).
    Weights are numpy (in,out); b* may be None. Returns list of (B,H,W,C)
    outputs, one per value stream. Loops over every window and head.
    """
    b, h, w, c = q_img.shape
    d_head = c // num_heads
    pad_b = (-h) % wh
    pad_r = (-w) % ww

    def pad(x):
        return np.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

    q_img, k_img = pad(q_img), pad(k_img)
    v_imgs = [pad(v) for v in v_imgs]
    pad_h, pad_w = h + pad_b, w + pad_r
    if wh >= pad_h:
        sh = 0
    if ww >= pad_w:
        sw = 0
    if sh or sw:
        q_img = np.roll(q_img, (-sh, -sw), axis=(1, 2))
        k_img = np.roll(k_img, (-sh, -sw), axis=(1, 2))
        v_imgs = [np.roll(v, (-sh, -sw), axis=(1, 2)) for v in v_imgs]

    idx = naive_relative_position_index(wh, ww)
    rel_bias = bias_table[idx]                       # (N, N, heads)
    n = wh * ww

    outs = [np.zeros_like(q_img, dtype=np.float64) for _ in v_imgs]
    for bi in range(b):
        for wy in range(pad_h // wh):
            for wx in range(pad_w // ww):
                ys, xs = wy * wh, wx * ww
                qt = q_img[bi, ys:ys + wh, xs:xs + ww].reshape(n, c)
                kt = k_img[bi, ys:ys + wh, xs:xs + ww].reshape(n, c)
                q = (qt @ wq + (bq if bq is not None else 0)) if q_proj else qt
                k = kt @ wk + (bk if bk is not None else 0)

                # shift mask for this window
                mask = np.zeros((n, n))
                if sh or sw:
                    ids = []
                    for ty in range(wh):
                        for tx in range(ww):
                            ids.append(_region_id(ys + ty, xs + tx,
                                                  pad_h, pad_w, wh, ww, sh, sw))
                    ids = np.array(ids)
                    mask = np.where(ids[None, :] != ids[:, None], -100.0, 0.0)

                attn_heads = []
                for hh in range(num_heads):
                    qh = q[:, hh * d_head:(hh + 1) * d_head] / np.sqrt(d_head)
                    kh = k[:, hh * d_head:(hh + 1) * d_head]
                    logits = qh @ kh.T + rel_bias[:, :, hh] + mask
                    attn_heads.append(softmax(logits, axis=-1))

                for vi, (v_img, wv, bv) in enumerate(zip(v_imgs, wvs, bvs)):
                    vt = v_img[bi, ys:ys + wh, xs:xs + ww].reshape(n, c)
                    v = vt @ wv + (bv if bv is not None else 0)
                    ctx = np.zeros((n, c))
                    for hh in range(num_heads):
                        vh = v[:, hh * d_head:(hh + 1) * d_head]
                        ctx[:, hh * d_head:(hh + 1) * d_head] = attn_heads[hh] @ vh
                    o = ctx @ wproj + (bproj if bproj is not None else 0)
                    outs[vi][bi, ys:ys + wh, xs:xs + ww] = o.reshape(wh, ww, c)

    if sh or sw:
        outs = [np.roll(o, (sh, sw), axis=(1, 2)) for o in outs]
    return [o[:, :h, :w, :] for o in outs]
