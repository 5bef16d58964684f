"""Joint north-star measurement (VERDICT r2 task 2).

BASELINE.md's north star is a JOINT claim: >=500 imgs/sec/chip at 512^2 AND
<=1e-3 per-pixel output MAE vs the PyTorch reference at matched weights.
Round 2 proved the two halves in different configs (MAE in fp32, throughput
in bf16+Pallas). This script measures BOTH quantities at each operating
point, at matched weights, in one run:

  1. torch (CPU): build the live reference MasterStyleTransferModel
     (reference codes/full_model.py via tests/tv_shim — real reference code,
     matched random-init weights; no pretrained blobs exist in this
     environment), compute its 512^2 output, export its whole-model
     state_dict (the save_whole_model layout,
     reference train_only_inner_loop.py:382-385).
  2. JAX (real TPU): ingest the state dict through
     utils/convert.convert_whole_model, then for each operating point
     {float32, bfloat16, bfloat16+Pallas} record
       - per-pixel MAE vs the torch output (same single pair)
       - imgs/sec at --batch (bench.py methodology: best of 3 rounds,
         scalar-fetch sync through the tunnel)
  3. write goldens/operating_points.json.

Usage:  python scripts/operating_points.py [--size 512] [--batch 8] [--k 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_reference(tmp, size, k, seed_swin=9, seed_model=10):
    """Live reference model at matched weights + its output (NHWC f32)."""
    import torch

    from tests import tv_shim
    from tests.torch_swin_ref import build_tv_swin_features

    codes = tv_shim.import_reference_codes()

    tv_swin = build_tv_swin_features(embed_dim=128, num_heads=(4, 8),
                                     window_size=(7, 7), seed=seed_swin).eval()
    models_dir = os.path.join(tmp, "models")
    os.makedirs(models_dir, exist_ok=True)
    torch.save(tv_swin, os.path.join(models_dir, "swin_B_first_2_stages.pt"))

    orig_load = torch.load
    torch.load = lambda *a, **kw: orig_load(*a, **{**kw, "weights_only": False})
    try:
        torch.manual_seed(seed_model)
        ref = codes.full_model.MasterStyleTransferModel(
            project_absolute_path=tmp,
            swin_model_relative_path=os.path.join(
                "models", "swin_B_first_2_stages.pt"),
            style_encoder_window_size=[7, 7],
            style_decoder_window_size=[7, 7],
            style_encoder_shift_size=[4, 4],
            style_decoder_shift_size=[4, 4],
        ).eval()
    finally:
        torch.load = orig_load

    rng = np.random.default_rng(70)
    content = np.clip(rng.standard_normal((1, 3, size, size)) * 0.25 + 0.5,
                      0, 1).astype(np.float32)
    style = np.clip(np.random.default_rng(71).standard_normal(
        (1, 3, size, size)) * 0.25 + 0.5, 0, 1).astype(np.float32)
    t0 = time.perf_counter()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(content), torch.from_numpy(style),
                      transformer_layer_count=k).numpy()
    torch_s = time.perf_counter() - t0
    print(f"reference torch forward ({size}^2, k={k}): {torch_s:.1f}s CPU")

    whole_sd = {kk: v.detach().numpy() for kk, v in ref.state_dict().items()}
    return (whole_sd, content.transpose(0, 2, 3, 1),
            style.transpose(0, 2, 3, 1), out_ref.transpose(0, 2, 3, 1), ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="goldens/operating_points.json")
    ap.add_argument("--points",
                    default="float32,float32-default,float32-high,"
                            "float32+pallas,float32-split3+pallas,"
                            "bfloat16,bfloat16+pallas,"
                            "bfloat16+pallas-locked,float32+pallas-locked",
                    help="comma list from {float32, float32-default, "
                         "float32-high, float32+pallas, float32-split3+pallas, "
                         "bfloat16, bfloat16+pallas}. Plain 'float32' "
                         "runs under jax.default_matmul_precision('highest') — "
                         "on TPU the DEFAULT matmul precision feeds the MXU "
                         "bf16 passes even for f32 arrays, which is NOT a true "
                         "f32 operating point (diagnosed r3: default-precision "
                         "'f32' MAE tracked the bf16 point at ~1.7e-2 while "
                         "CPU f32 is 2.9e-6). 'float32-default' keeps the old "
                         "behavior, recorded for the precision-cost table. "
                         "Also: mix-<swin><st><dec>[+pallas] with letters in "
                         "{b, F} = the r4 per-stage dtype policy, e.g. "
                         "mix-bFF+pallas (bf16 swin, f32 transformer+decoder; "
                         "stage contexts pin per-stage matmul precision). "
                         "Any point may carry a '-locked' suffix (r5): the "
                         "style-locked serving path, stream precompute "
                         "amortized out of the timed loop.")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        whole_sd, content, style, out_ref, _ = build_reference(
            tmp, args.size, args.k)

    import jax
    import jax.numpy as jnp

    from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mastermetastyletransfer_tpu.config import (
        ModelConfig, StyleTransformerConfig, SwinConfig,
    )
    from mastermetastyletransfer_tpu.models import init_master_model
    from mastermetastyletransfer_tpu.models.master import master_apply
    from mastermetastyletransfer_tpu.utils.convert import convert_whole_model

    base = ModelConfig(
        swin=SwinConfig.for_variant("swin_B").replace(window_size=(7, 7)),
        transformer=StyleTransformerConfig(),
    )
    template = init_master_model(jax.random.PRNGKey(0), base)
    params = convert_whole_model(whole_sd, template, base)

    def _sync(x):
        jax.device_get(x.ravel()[0])

    ref_abs_mean = float(np.mean(np.abs(out_ref)))
    results = {
        "meta": {
            "size": args.size, "batch": args.batch, "k": args.k,
            "weights": "matched random-init (live reference model via "
                       "tests/tv_shim; no pretrained blobs in environment)",
            "ref_abs_mean": ref_abs_mean,
            "device": str(jax.devices()[0]),
            "note": "MAE = per-pixel |out - torch_reference| mean at the "
                    "SAME operating point that produced the imgs/sec number",
        },
        "points": {},
    }

    cb = jnp.asarray(np.broadcast_to(content, (args.batch,) + content.shape[1:]))
    sb = jnp.asarray(np.broadcast_to(style, (args.batch,) + style.shape[1:]))
    c1, s1 = jnp.asarray(content), jnp.asarray(style)

    for point in args.points.split(","):
        point = point.strip()
        # "-locked" suffix (r5): measure the style-locked serving path
        # (encode_style_stream once per style, stylize_with_style_stream per
        # content batch — models/master.py:143-179) at this operating point.
        # MAE uses the SAME locked path on the reference pair; the stream
        # precompute is per-style amortized and excluded from the timed loop
        # (bench.py bench_locked methodology).
        locked = point.endswith("-locked")
        base_point = point[: -len("-locked")] if locked else point
        dtype, _, flag = base_point.partition("+")
        use_pallas = flag == "pallas"
        if dtype.startswith("mix-"):
            # Per-stage dtype policy (r4): mix-<swin><st><dec>[+pallas],
            # each letter b (bfloat16) or F (float32). The stage contexts in
            # models/master.py pin the matmul precision per stage (f32 ->
            # HIGHEST, bf16 -> DEFAULT), so no ambient precision is set.
            tag = dtype[len("mix-"):]
            if len(tag) != 3 or any(c not in "bF" for c in tag):
                raise SystemExit(f"{point}: expected mix-<swin><st><dec> "
                                 "with letters in {b, F}")
            names = {"b": "bfloat16", "F": "float32"}
            cfg = base.replace(swin_dtype=names[tag[0]],
                               transformer_dtype=names[tag[1]],
                               decoder_dtype=names[tag[2]])
            if use_pallas:
                cfg = cfg.replace(
                    swin=cfg.swin.replace(use_pallas=True),
                    transformer=cfg.transformer.replace(use_pallas=True),
                    decoder=cfg.decoder.replace(use_pallas=True))
            precision = None
        else:
            # "float32" = true f32 ('highest', 6-pass MXU); "float32-high" =
            # 3-pass bf16 ('high'); "float32-default" = f32 arrays at default
            # matmul precision (single bf16 MXU pass); "float32-split3" = the
            # manual 3-pass hi/lo split INSIDE the Pallas kernels
            # (ops/precision.kdot — Mosaic cannot lower precision=HIGH) with
            # ambient 'high' for the XLA parts (decoder convs, patch embed).
            precision = {"float32": "highest", "float32-high": "high",
                         "float32-split3": "high"}.get(dtype)
            mmode = "split3" if dtype.endswith("-split3") else "native"
            if mmode == "split3" and not use_pallas:
                raise SystemExit(
                    f"{point}: split3 lives in the Pallas kernels "
                    "(ops/precision.py) — use float32-split3+pallas")
            dtype = (dtype.replace("-default", "").replace("-high", "")
                     .replace("-split3", ""))
            cfg = base.replace(compute_dtype=dtype)
            if use_pallas:
                cfg = cfg.replace(
                    swin=cfg.swin.replace(use_pallas=True, matmul_mode=mmode),
                    transformer=cfg.transformer.replace(use_pallas=True,
                                                        matmul_mode=mmode),
                    decoder=cfg.decoder.replace(use_pallas=True,
                                                matmul_mode=mmode))

        def _prec(fn, precision=precision):
            def wrapped(*a, **kw):
                if precision is None:
                    return fn(*a, **kw)
                with jax.default_matmul_precision(precision):
                    return fn(*a, **kw)
            return wrapped

        if locked:
            from mastermetastyletransfer_tpu.models import (
                encode_style_stream, stylize_with_style_stream,
            )

            @jax.jit
            @_prec
            def encode(p, s, cfg=cfg):
                return encode_style_stream(p, s, cfg, k=args.k)

            @jax.jit
            @_prec
            def stylize_l(p, c, stream, cfg=cfg):
                return stylize_with_style_stream(p, c, stream, cfg)

            stream1 = encode(params, s1)
            out1 = np.asarray(stylize_l(params, c1, stream1), np.float32)
            mae = float(np.mean(np.abs(out1 - out_ref)))

            streamb = encode(params, sb[:1])
            for _ in range(3):
                _sync(stylize_l(params, cb, streamb))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = stylize_l(params, cb, streamb)
                _sync(out)
                best = min(best, time.perf_counter() - t0)
            ips = args.iters * args.batch / best
        else:
            @jax.jit
            @_prec
            def stylize(p, c, s, cfg=cfg):
                return master_apply(p, c, s, cfg, k=args.k,
                                    deterministic=True)

            # MAE on the reference pair
            out1 = np.asarray(stylize(params, c1, s1), np.float32)
            mae = float(np.mean(np.abs(out1 - out_ref)))

            # throughput at --batch (separate compile; bench.py methodology)
            for _ in range(3):
                _sync(stylize(params, cb, sb))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = stylize(params, cb, sb)
                _sync(out)
                best = min(best, time.perf_counter() - t0)
            ips = args.iters * args.batch / best

        results["points"][point] = {
            "mae": mae,
            "mae_rel": mae / ref_abs_mean,
            "imgs_per_sec": round(ips, 2),
            "meets_mae_1e-3": mae <= 1e-3,
        }
        print(f"{point:18s} MAE {mae:.3e} (rel {mae / ref_abs_mean:.3e})  "
              f"{ips:8.2f} imgs/s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):  # merge a partial-point run into the golden
        with open(args.out) as f:
            prior = json.load(f)
        pm = prior.get("meta", {})
        # merge ONLY when the operating condition is identical — a size/
        # batch/k mismatch would mix points from different conditions under
        # one meta block
        if all(pm.get(f) == results["meta"][f] for f in ("size", "batch", "k")):
            results["points"] = {**prior["points"], **results["points"]}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
