"""Roofline evidence for the 512^2 forward: what the device actually gives us.

Measures on the real TPU:
  1. Pure-matmul ceilings at the framework's hot GEMM shapes (the
     max TF/s this chip+tunnel reaches per shape — the per-stage ceiling).
  2. Each decoder conv layer separately, in the current phase-packed layout
     AND the plain fine-grid layout, to locate the phase-FLOP-waste
    crossover (phase_conv3x3 computes a dense (2,2,4C,4C') kernel = 16/9
     the fine-grid FLOPs, but keeps 4x the lanes).
  3. The fused whole-block kernel on the swin stage-1 shape across
     target_rows (program count vs per-program matmul size trade).

Usage:  python scripts/roofline.py [--part matmul|decoder|block|all]
Emits one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
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


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=20, warmup=2, rounds=3):
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def report(name, seconds, flops=None, **extra):
    rec = {"bench": name, "ms": round(seconds * 1e3, 4)}
    if flops is not None:
        rec["tflops"] = round(flops / seconds / 1e12, 2)
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------------------
# 1. pure matmul ceilings
# ---------------------------------------------------------------------------

def part_matmul():
    shapes = [
        # (M, K, N, tag)
        (17689 * 16, 128, 128, "swin1_proj_flat"),     # stage-1 projections
        (17689 * 16, 128, 512, "swin1_mlp1_flat"),
        (17689 * 16, 512, 128, "swin1_mlp2_flat"),
        (4096 * 16, 256, 256, "swin2_proj_flat"),
        (4096 * 16, 256, 1024, "swin2_mlp1_flat"),
        (4096 * 8, 256, 256, "st_proj_flat"),           # style transformer
        (4096 * 8, 256, 1024, "st_mlp1_flat"),
        (245, 128, 128, "swin1_proj_tile"),             # per-program tile
        (245, 128, 384, "swin1_qkv_tile"),
        (490, 128, 128, "swin1_proj_tile2x"),
        (4096, 4096, 4096, "big_4k"),
        (8192, 8192, 8192, "big_8k"),
    ]
    for m, k, n, tag in shapes:
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        dt = timeit(f, a, b)
        report(f"matmul_{tag}", dt, flops=2 * m * k * n,
               shape=[m, k, n])


# ---------------------------------------------------------------------------
# 2. decoder conv layers, phase vs fine
# ---------------------------------------------------------------------------

def part_decoder(batch=8):
    from mastermetastyletransfer_tpu.ops.conv import (
        init_conv, phase_conv3x3, reflect_conv, upsample_conv_fused,
    )

    # (name, coarse_hw, C_in, C_out, kind)
    # phase tensors hold 4*C lanes at coarse resolution
    layers = [
        ("conv0_up", 64, 256, 128, "up"),
        ("conv1", 64, 128, 128, "mid"),
        ("conv2", 64, 128, 128, "mid"),
        ("conv3", 64, 128, 128, "mid"),
        ("conv4_up", 128, 128, 64, "up"),
        ("conv5", 128, 64, 64, "mid"),
        ("conv6_up", 256, 64, 32, "up"),
        ("conv7", 256, 32, 32, "mid"),
        ("conv8_rgb", 256, 32, 3, "last"),
    ]
    key = jax.random.PRNGKey(0)
    for name, hw, ci, co, kind in layers:
        p = init_conv(key, ci, co)
        p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
        if kind == "up":
            # input: plain coarse grid (B, hw, hw, ci)
            x = jax.random.normal(key, (batch, hw, hw, ci), jnp.bfloat16)
            f = jax.jit(functools.partial(upsample_conv_fused, keep_phase=True))
            dt = timeit(f, p, x)
            flops = batch * hw * hw * 4 * ci * (4 * co) * 2
            report(f"dec_{name}_phasefused", dt, flops=flops)
            fp = jax.jit(functools.partial(upsample_conv_fused,
                                           keep_phase=True, use_pallas=True))
            report(f"dec_{name}_phasefused_pallas", timeit(fp, p, x),
                   flops=flops)
            # unfused: upsample + reflect conv on the fine grid
            from mastermetastyletransfer_tpu.ops.conv import upsample_nearest
            g = jax.jit(lambda p, x: reflect_conv(p, upsample_nearest(x, 2)))
            dt = timeit(g, p, x)
            report(f"dec_{name}_fine", dt,
                   flops=batch * (2 * hw) ** 2 * 9 * ci * co * 2)
        elif kind in ("mid", "last"):
            # phase path: input (B, hw/2... actually coarse hw/2? no:
            # phase tensor lives at half the fine res; hw here is FINE res
            # before this conv... keep consistent: hw = fine resolution of
            # this conv's input. Phase tensor: (B, hw/2, hw/2, 4*ci).
            ph = hw // 2
            xp = jax.random.normal(key, (batch, ph, ph, 4 * ci), jnp.bfloat16)
            f = jax.jit(functools.partial(phase_conv3x3,
                                          interleave=(kind == "last")))
            dt = timeit(f, p, xp)
            flops = batch * ph * ph * 4 * (4 * ci) * (4 * co) * 2
            report(f"dec_{name}_phase", dt, flops=flops)
            fp = jax.jit(functools.partial(phase_conv3x3,
                                           interleave=(kind == "last"),
                                           use_pallas=True))
            report(f"dec_{name}_phase_pallas", timeit(fp, p, xp), flops=flops)
            xf = jax.random.normal(key, (batch, hw, hw, ci), jnp.bfloat16)
            g = jax.jit(functools.partial(reflect_conv, relu=(kind != "last")))
            dt = timeit(g, p, xf)
            report(f"dec_{name}_fine", dt,
                   flops=batch * hw * hw * 9 * ci * co * 2)


# ---------------------------------------------------------------------------
# 3. whole-block kernel across target_rows on the swin stage-1 shape
# ---------------------------------------------------------------------------

def part_block(batch=16):
    from mastermetastyletransfer_tpu.config import AttentionConfig
    from mastermetastyletransfer_tpu.models.style_transformer import (
        init_style_swin_block,
    )
    from mastermetastyletransfer_tpu.ops.pallas_attention import (
        fused_window_block,
    )
    from mastermetastyletransfer_tpu.ops.windows import (
        relative_position_bias, shift_attention_mask,
    )

    for tag, dim, heads, tok_hw, win in [("swin1", 128, 4, 133, 7),
                                         ("swin2", 256, 8, 70, 7),
                                         ("st", 256, 8, 64, 8)]:
        nW = (tok_hw // win) ** 2
        n = win * win
        cfg = AttentionConfig(dim=dim, num_heads=heads,
                              window_size=(win, win), shift_size=(0, 0))
        p = init_style_swin_block(jax.random.PRNGKey(0), cfg, use_norm=True,
                                  exclude_mlp=False, mlp_ratio=4.0)
        p = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, nW, n, dim),
                              jnp.bfloat16)
        bias = relative_position_bias(
            p["attn"]["rel_bias_table"], win, win).astype(jnp.bfloat16)
        bsz = batch if tag != "st" else 8
        x = x[:bsz]
        tok = nW * n
        flops = bsz * (tok * dim * dim * 2 * 4            # q,k,v,proj
                       + nW * n * n * dim * 2 * 2          # logits + PV
                       + tok * dim * 4 * dim * 2 * 2)      # MLP
        for tr in (128, 256, 512, 1024, 2048):
            f = jax.jit(lambda pa, xx, bb, mlp, n2, n1, _tr=tr:
                        fused_window_block(pa, xx, bb, None, heads, mlp,
                                           n2, n1, None, target_rows=_tr))
            try:
                dt = timeit(f, p["attn"], x, bias,
                            p["mlp"], p["norm2"], p["norm1"])
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bench": f"block_{tag}_tr{tr}",
                                  "error": str(e)[:200]}), flush=True)
                continue
            report(f"block_{tag}_tr{tr}", dt, flops=flops, nW=nW)


# ---------------------------------------------------------------------------
# 4. lean attention-core kernel (projections/MLP hoisted out) across tiles
# ---------------------------------------------------------------------------

def part_core(batch=16):
    """Hypothesis test: with Q/K/V pre-projected by flat XLA GEMMs, how fast
    is a Pallas kernel that only does logits+softmax+PV, across tile sizes?"""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mastermetastyletransfer_tpu.ops import pallas_attention as pa

    def core_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                    heads, scale):
        f32 = jnp.float32
        dt = q_ref.dtype
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        twn, c = q.shape
        dh = c // heads
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jax.lax.dot_general(
                (q[:, sl].astype(f32) * scale).astype(dt), k[:, sl],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            s = s + bias_ref[h].astype(f32) + mask_ref[0].astype(f32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            outs.append(jnp.dot(p, v[:, sl], preferred_element_type=f32))
        out_ref[0, 0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)

    for tag, dim, heads, tok_hw, win, bsz in [("swin1", 128, 4, 133, 7, 16),
                                              ("swin2", 256, 8, 70, 7, 16),
                                              ("st", 256, 8, 64, 8, 8)]:
        nW = (tok_hw // win) ** 2
        n = win * win
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (bsz, nW, n, dim), jnp.bfloat16)
        bias = jax.random.normal(key, (heads, n, n), jnp.bfloat16) * 0.02
        flops = bsz * nW * n * n * dim * 2 * 2
        for tr in (64, 128, 256, 512):
            tw, nw_pad, nt, twn = pa._geometry(nW, n, tr)
            q4 = pa._tiles(pa._pad_windows(q, nw_pad), nt)
            bias_b = pa._bias_big(bias, tw)
            mask_b = pa._expand_mask(None, nt, tw, n, nW)
            win_spec = pl.BlockSpec((1, 1, twn, dim), lambda i, j: (0, i, j, 0)[1:] if False else (i, j, 0, 0),
                                    memory_space=pltpu.VMEM)
            rbias = pl.BlockSpec((heads, twn, twn), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((1, twn, twn), lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM)
            kern = functools.partial(core_kernel, heads=heads,
                                     scale=(dim // heads) ** -0.5)
            f = jax.jit(lambda q4, b, m: pl.pallas_call(
                kern, grid=(bsz, nt),
                in_specs=[win_spec, win_spec, win_spec, rbias, mspec],
                out_specs=win_spec,
                out_shape=jax.ShapeDtypeStruct((bsz, nt, twn, dim),
                                               jnp.bfloat16))(q4, q4, q4, b, m))
            try:
                dt = timeit(f, q4, bias_b, mask_b)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bench": f"core_{tag}_tr{tr}",
                                  "error": str(e)[:200]}), flush=True)
                continue
            report(f"core_{tag}_tr{tr}", dt, flops=flops, tw=tw, steps=bsz * nt)


# ---------------------------------------------------------------------------
# 5. patch embed: space-to-depth GEMM (current) vs strided conv
# ---------------------------------------------------------------------------

def part_embed(batch=16):
    from jax import lax
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 512, 512, 3),
                           jnp.bfloat16)
    wk = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, 128),
                           jnp.bfloat16) * 0.02
    bias = jnp.zeros((128,), jnp.bfloat16)

    @jax.jit
    def s2d_gemm(x, wk, bias):
        b, h, w, cin = x.shape
        p = x.reshape(b, h // 4, 4, w // 4, 4, cin)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * cin)
        return p @ wk.reshape(48, 128) + bias

    @jax.jit
    def conv4(x, wk, bias):
        y = lax.conv_general_dilated(
            x, wk, (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias

    report("embed_s2d_gemm", timeit(s2d_gemm, x, wk, bias),
           flops=batch * 128 * 128 * 48 * 128 * 2)
    report("embed_conv_stride4", timeit(conv4, x, wk, bias),
           flops=batch * 128 * 128 * 48 * 128 * 2)


# ---------------------------------------------------------------------------
# 6. conv6 pathology: XLA conv vs im2col GEMM for the 2x2 phase kernels
# ---------------------------------------------------------------------------

def part_conv6(batch=8):
    from jax import lax

    def one(tag, hw, ci, co):
        # phase kernel (2, 2, ci, 4*co); input edge-padded coarse grid
        xp = jax.random.normal(jax.random.PRNGKey(0),
                               (batch, hw + 2, hw + 2, ci), jnp.bfloat16)
        pk = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 2, ci, 4 * co), jnp.bfloat16) * 0.05
        flops = batch * (hw + 1) * (hw + 1) * 4 * ci * 4 * co * 2

        @jax.jit
        def xla_conv(xp, pk):
            y = lax.conv_general_dilated(
                xp, pk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0)

        @jax.jit
        def im2col(xp, pk):
            b, hp, wp, c = xp.shape
            h = hp - 1
            cols = jnp.concatenate(
                [xp[:, dy:dy + h, dx:dx + h, :]
                 for dy in range(2) for dx in range(2)], axis=-1)
            w2 = pk.reshape(4 * c, -1)
            y = cols.reshape(b * h * h, 4 * c) @ w2
            return jnp.maximum(y, 0).reshape(b, h, h, -1)

        @jax.jit
        def tapsum(xp, pk):
            b, hp, wp, c = xp.shape
            h = hp - 1
            acc = None
            for dy in range(2):
                for dx in range(2):
                    v = xp[:, dy:dy + h, dx:dx + h, :].reshape(b * h * h, c)
                    t = v @ pk[dy, dx]
                    acc = t if acc is None else acc + t
            return jnp.maximum(acc, 0).reshape(b, h, h, -1)

        report(f"c6_{tag}_xlaconv", timeit(xla_conv, xp, pk), flops=flops)
        report(f"c6_{tag}_im2col", timeit(im2col, xp, pk), flops=flops)
        report(f"c6_{tag}_tapsum", timeit(tapsum, xp, pk), flops=flops)

    one("conv6", 256, 64, 32)
    one("conv4", 128, 128, 64)
    one("conv0", 64, 256, 128)


# ---------------------------------------------------------------------------
# 7. window geometry: merge->roll->partition chain vs one static permutation
# ---------------------------------------------------------------------------

def part_geom(batch=16):
    import numpy as np
    from mastermetastyletransfer_tpu.ops.windows import (
        window_merge, window_partition,
    )

    for tag, pad_hw, c, sh in [("swin1", 133, 128, 3), ("swin2", 70, 256, 3),
                               ("st", 70, 256, 4)]:
        wh = ww = 7
        nW = (pad_hw // 7) ** 2
        n = 49
        x = jax.random.normal(jax.random.PRNGKey(0), (batch * nW, n, c),
                              jnp.bfloat16)

        @jax.jit
        def chain(xw):
            img = window_merge(xw, batch, pad_hw, pad_hw, wh, ww)
            img = jnp.roll(img, shift=(-sh, -sh), axis=(1, 2))
            return window_partition(img, wh, ww)

        # static permutation: token t of window w reads token perm[w, t]
        idx = np.arange(pad_hw * pad_hw).reshape(pad_hw, pad_hw)
        idx = np.roll(idx, shift=(-sh, -sh), axis=(0, 1))
        idx = idx.reshape(pad_hw // 7, 7, pad_hw // 7, 7)
        idx = idx.transpose(0, 2, 1, 3).reshape(nW * n)
        # and the inverse of the original partition
        inv = np.arange(pad_hw * pad_hw).reshape(
            pad_hw // 7, 7, pad_hw // 7, 7).transpose(0, 2, 1, 3).reshape(-1)
        inv_pos = np.empty_like(inv)
        inv_pos[inv] = np.arange(inv.size)
        perm = jnp.asarray(inv_pos[idx])

        @jax.jit
        def gather(xw):
            bt = xw.reshape(batch, nW * n, c)
            return jnp.take(bt, perm, axis=1).reshape(batch * nW, n, c)

        a = chain(x)
        bres = gather(x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - bres.astype(jnp.float32))))
        report(f"geom_{tag}_chain", timeit(chain, x), err=err)
        report(f"geom_{tag}_gather", timeit(gather, x))


# ---------------------------------------------------------------------------
# 8. misc relayouts: phase interleave, edge pads, patch-embed pieces
# ---------------------------------------------------------------------------

def part_misc(batch=8):
    from mastermetastyletransfer_tpu.ops.conv import phase_interleave

    p5 = jax.random.normal(jax.random.PRNGKey(0), (batch, 128, 128, 256),
                           jnp.bfloat16)
    report("misc_interleave_128_256", timeit(jax.jit(phase_interleave), p5))
    p8 = jax.random.normal(jax.random.PRNGKey(0), (batch, 256, 256, 12),
                           jnp.bfloat16)
    report("misc_interleave_256_12", timeit(jax.jit(phase_interleave), p8))

    x6 = jax.random.normal(jax.random.PRNGKey(0), (batch, 256, 256, 64),
                           jnp.bfloat16)
    pad = jax.jit(lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                    mode="edge"))
    report("misc_edgepad_256_64", timeit(pad, x6))

    # swin patch-embed pieces at 512^2 (batch 16: content+style)
    img = jax.random.uniform(jax.random.PRNGKey(1), (16, 512, 512, 3),
                             jnp.bfloat16)

    @jax.jit
    def s2d(img):
        b, h, w, cin = img.shape
        p = img.reshape(b, h // 4, 4, w // 4, 4, cin)
        return p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 48)

    report("misc_embed_s2d_relayout", timeit(s2d, img))
    from mastermetastyletransfer_tpu.ops.norm import layer_norm
    feat = jax.random.normal(jax.random.PRNGKey(2), (16, 128, 128, 128),
                             jnp.bfloat16)
    sc = jnp.ones((128,))
    bi = jnp.zeros((128,))
    report("misc_embed_ln", timeit(jax.jit(layer_norm), feat, sc, bi))


# ---------------------------------------------------------------------------
# 9. fused LN+MLP+residual kernel vs XLA, across row-tile budgets
# ---------------------------------------------------------------------------

def part_mlp(batch=8):
    import mastermetastyletransfer_tpu.ops.pallas_mlp as pm
    from mastermetastyletransfer_tpu.ops.mlp import init_mlp, mlp_apply

    rows, c, hidden = batch * 100 * 49, 256, 1024   # ST shape at 512^2
    p = init_mlp(jax.random.PRNGKey(0), c, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (rows, c), jnp.bfloat16)
    flops = rows * c * hidden * 2 * 2

    f_x = jax.jit(lambda p, x: x + mlp_apply(p, x, dropout=0.0,
                                             deterministic=True))
    report("mlp_st_xla", timeit(f_x, p, x), flops=flops)

    orig = pm._rows_tile
    for budget in (256, 512, 1024):
        # accept and forward the r3 itemsize kwarg (a positional-only
        # lambda here silently turned every row into an error report)
        pm._rows_tile = lambda r, cc, h, budget_rows=budget, **kw: orig(
            r, cc, h, budget_rows, **kw)
        f_p = jax.jit(lambda p, x: pm.fused_ln_mlp_residual(x, p, None))
        try:
            dt = timeit(f_p, p, x)
            report(f"mlp_st_pallas_b{budget}", dt, flops=flops)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"bench": f"mlp_st_pallas_b{budget}",
                              "error": str(e)[:160]}), flush=True)
    pm._rows_tile = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["matmul", "decoder", "block", "core", "embed",
                             "conv6", "geom", "misc", "mlp", "all"])
    args = ap.parse_args()
    if args.part in ("matmul", "all"):
        part_matmul()
    if args.part in ("decoder", "all"):
        part_decoder()
    if args.part in ("block", "all"):
        part_block()
    if args.part in ("core", "all"):
        part_core()
    if args.part in ("embed", "all"):
        part_embed()
    if args.part in ("conv6", "all"):
        part_conv6()
    if args.part in ("geom", "all"):
        part_geom()
    if args.part in ("misc", "all"):
        part_misc()
    if args.part in ("mlp", "all"):
        part_mlp()


if __name__ == "__main__":
    main()
