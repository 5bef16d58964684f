"""Pick the fastest exact formulation for the decoder's RGB conv (conv8)
under the double-phase tail (r4).

probe_decoder --phase2 measured conv8 at 4.0 ms isolated — WORSE than the
old L1 path's 2.5 — because the composed (2,2,512,48) XLA conv ends in a
16-group x 3-lane align (slices XLA relays badly) plus the final
interleave. Variants timed here (all consume the L2 phase tensor conv7
emits, (B, 128, 128, 512) at 512^2):

  v0 current: XLA conv -> _align2 (16x3-lane slices) -> interleave2
  v0a pieces: conv only / conv+align2 (isolates the align cost)
  v1 pad32:  pad C' 3->32, Pallas stencil2 (groups of 32), interleave2,
             slice [..., :3]
  v2 downlevel: interleave2 L2->fine, then plain fine-grid reflect conv
  v3 downlevel1: L2 -> L1 phase (one level interleave), old L1 phase conv
     (what the pre-phase2 decoder did after conv7, for reference)

Usage: python scripts/probe_conv8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mastermetastyletransfer_tpu.ops import conv as C


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2, rounds=5):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2]


def pad_cout(params, c_out_pad):
    w = params["kernel"]
    cp = c_out_pad - w.shape[-1]
    return {"kernel": jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cp))),
            "bias": jnp.pad(params["bias"], (0, cp))}


def main():
    b, g = 8, 64  # decoder coarse grid at 512^2 is 64 -> L2 grid 128
    l2g = 2 * g
    c = 32
    params = C.init_conv(jax.random.PRNGKey(0), c, 3)
    params = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, l2g, l2g, 16 * c),
                          jnp.bfloat16)

    def v0(p, xx):
        return C.phase2_conv3x3(p, xx, up=False, relu=False, interleave=True,
                                use_pallas=False)

    def v0_conv_only(p, xx):
        k2, _ = C._phase2_kernel(p["kernel"].astype(jnp.float32), False)
        pp = C._phase2_pad(xx, 4, c, False)
        return jax.lax.conv_general_dilated(
            pp, k2.astype(xx.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def v0_conv_align(p, xx):
        k2, bases = C._phase2_kernel(p["kernel"].astype(jnp.float32), False)
        pp = C._phase2_pad(xx, 4, c, False)
        big = jax.lax.conv_general_dilated(
            pp, k2.astype(xx.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return C._align2(big, l2g, l2g, 3, bases)

    def v1(p, xx):
        pp32 = pad_cout(p, 32)
        out = C.phase2_conv3x3(pp32, xx, up=False, relu=False,
                               interleave=True, use_pallas=True)
        return out[..., :3]

    def v1_xla(p, xx):
        pp32 = pad_cout(p, 32)
        out = C.phase2_conv3x3(pp32, xx, up=False, relu=False,
                               interleave=True, use_pallas=False)
        return out[..., :3]

    def v4(p, xx):
        # pad C' 3->8: the composed conv emits 16*8 = 128 lanes (full MXU
        # width, vs v0's 48) and _align2's 16 lane-slices land 8-aligned
        # (vs 3-lane slices). 2.7x the conv FLOPs of v0, 4x less than v1.
        pp8 = pad_cout(p, 8)
        out = C.phase2_conv3x3(pp8, xx, up=False, relu=False,
                               interleave=True, use_pallas=False)
        return out[..., :3]

    def _pp_k2(p, xx):
        k2, bases = C._phase2_kernel(p["kernel"].astype(jnp.float32), False)
        pp = C._phase2_pad(xx, 4, c, False)
        return pp, k2.astype(xx.dtype), bases

    def v5(p, xx):
        # the composed (2,2,512,48) conv as 4 shifted GEMM accumulations —
        # the XLA conv path measures ~7 TF/s at N=48; plain dots may not.
        pp, k2, bases = _pp_k2(p, xx)
        bb, hp, wp, kk = pp.shape
        ho, wo = hp - 1, wp - 1
        acc = None
        for dy in range(2):
            for dx in range(2):
                tap = pp[:, dy:dy + ho, dx:dx + wo, :]
                t = jnp.einsum("bhwc,cd->bhwd", tap, k2[dy, dx],
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        big = (acc + jnp.tile(p["bias"], 16)).astype(xx.dtype)
        out = C._align2(big, l2g, l2g, 3, bases)
        return C.phase_interleave2(out)

    def v6(p, xx):
        # im2col: concat the 4 taps on lanes, ONE (M, 2048) @ (2048, 48) GEMM
        pp, k2, bases = _pp_k2(p, xx)
        bb, hp, wp, kk = pp.shape
        ho, wo = hp - 1, wp - 1
        taps = [pp[:, dy:dy + ho, dx:dx + wo, :]
                for dy in range(2) for dx in range(2)]
        col = jnp.concatenate(taps, axis=-1)
        big = col.reshape(bb * ho * wo, 4 * kk) @ k2.reshape(4 * kk, 48)
        big = (big + jnp.tile(p["bias"], 16)).reshape(bb, ho, wo, 48)
        out = C._align2(big, l2g, l2g, 3, bases)
        return C.phase_interleave2(out)

    def v7(p, xx):
        # v6 with the 16 output groups scattered to 8-lane slots (N=128,
        # same MXU pass count as N=48) so _align2's slices land 8-aligned
        pp, k2, bases = _pp_k2(p, xx)
        bb, hp, wp, kk = pp.shape
        ho, wo = hp - 1, wp - 1
        taps = [pp[:, dy:dy + ho, dx:dx + wo, :]
                for dy in range(2) for dx in range(2)]
        col = jnp.concatenate(taps, axis=-1)
        kw = k2.reshape(4 * kk, 16, 3)
        kw8 = jnp.zeros((4 * kk, 16, 8), xx.dtype).at[:, :, :3].set(kw)
        b8 = jnp.zeros((16, 8), xx.dtype).at[:, :3].set(
            jnp.broadcast_to(p["bias"], (16, 3)).astype(xx.dtype))
        big = (col.reshape(bb * ho * wo, 4 * kk) @ kw8.reshape(4 * kk, 128)
               + b8.reshape(128)).reshape(bb, ho, wo, 128)
        subs = [big[:, bases[a]:bases[a] + l2g, bases[b]:bases[b] + l2g,
                    (4 * a + b) * 8:(4 * a + b) * 8 + 8]
                for a in range(4) for b in range(4)]
        out = jnp.concatenate(subs, axis=-1)           # (B, H, W, 16*8)
        x6 = out.reshape(bb, l2g, l2g, 4, 4, 8)
        fine = x6.transpose(0, 1, 3, 2, 4, 5).reshape(
            bb, 4 * l2g, 4 * l2g, 8)
        return fine[..., :3]

    def v8(p, xx):
        # r4 kernel v2: dense N=128 tap GEMMs + in-kernel lane-mask align,
        # XLA interleave on 8-lane groups (ops/pallas_conv.rgb128)
        return C.phase2_conv3x3(p, xx, up=False, relu=False,
                                interleave=True, k128=True)

    def v2(p, xx):
        fine = C.phase_interleave2(xx)
        return C.reflect_conv(p, fine, relu=False)

    def v3(p, xx):
        # L2 -> L1: (B,H,W,16C) -> (B,2H,2W,4C) keeping (a%2, b%2) phases
        bb, h, w, _ = xx.shape
        x6 = xx.reshape(bb, h, w, 2, 2, 2, 2, c)
        # group (a,b) = (2a1+a0, 2b1+b0): fine row 4i+a = 2(2i+a1)+a0
        l1 = x6.transpose(0, 1, 3, 2, 5, 4, 6, 7).reshape(
            bb, 2 * h, 2 * w, 4 * c)
        return C.phase_conv3x3(p, l1, relu=False, interleave=True,
                               use_pallas=True, stencil=True)

    ref = None
    for name, fn in [("v0_current", v0), ("v0_conv_only", v0_conv_only),
                     ("v0_conv_align", v0_conv_align),
                     ("v1_pad32_pallas", v1), ("v1_pad32_xla", v1_xla),
                     ("v4_pad8_xla", v4),
                     ("v5_4tap_gemm", v5), ("v6_im2col_gemm", v6),
                     ("v7_im2col_pad8", v7), ("v8_k128_kernel", v8),
                     ("v2_fine_xla", v2), ("v3_downlevel_L1", v3)]:
        try:
            jf = jax.jit(fn)
            out = jf(params, x)
            row = {"case": name, "ms": round(timeit(jf, params, x) * 1e3, 3)}
            if out.shape[-1] == 3:
                if ref is None and name == "v0_current":
                    ref = np.asarray(out, np.float32)
                elif ref is not None:
                    err = float(np.max(np.abs(np.asarray(out, np.float32)
                                              - ref)))
                    row["max_err_vs_v0"] = round(err, 6)
            print(json.dumps(row), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "error": str(e)[-300:]}),
                  flush=True)


if __name__ == "__main__":
    main()
