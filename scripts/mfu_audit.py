"""Whole-model MFU audit (VERDICT r3 task 2a).

Counts per-stage FLOPs and HBM bytes with XLA's own cost model
(compiled.cost_analysis() on the CPU backend — canonical algorithm cost,
no precision-pass multipliers), combines them with the measured in-context
stage times (scripts/profile_prefix.py on the real chip), and reports:

  - achieved TF/s per stage,
  - MFU vs the chip's bf16 peak (~394 TF/s, TPU v5e),
  - utilization vs the MEASURED flat-GEMM ceiling on this chip through the
    tunnel (145 TF/s at 8k^3 — PERF.md device model), which is the honest
    local roofline,
  - arithmetic intensity (FLOPs/byte) -> whether the stage is even
    theoretically MXU-bound at the HBM bandwidth (~820 GB/s v5e).

Usage:
  python scripts/mfu_audit.py                       # CPU cost model only
  python scripts/mfu_audit.py --ms swin=20.7,st=5.2,dec=9.1 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply

PEAK_BF16_TFS = 394.0       # TPU v5e MXU peak
MEASURED_GEMM_TFS = 145.0   # flat 8k^3 bf16 GEMM through this tunnel (PERF.md)
HBM_GBS = 820.0             # v5e HBM bandwidth


def stage_cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--ms", default="swin=20.7,st=5.2,dec=9.1",
                    help="measured in-context stage ms (profile_prefix)")
    ap.add_argument("--label", default="bf16+pallas 512^2 b8 (r3 profile)")
    ap.add_argument("--out", default="goldens/mfu_audit.json")
    args = ap.parse_args()

    ms = {k: float(v) for k, v in
          (kv.split("=") for kv in args.ms.split(","))}

    cfg = ModelConfig()  # XLA path: canonical op set for the cost model
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    b, s = args.batch, args.size
    img2 = jax.ShapeDtypeStruct((2 * b, s, s, 3), jnp.float32)
    feat = jax.ShapeDtypeStruct((b, s // 8, s // 8, 256), jnp.float32)

    flops = {}
    fl, by = stage_cost(
        lambda p, x: swin_backbone_apply(p["swin"], x, cfg.swin), params, img2)
    flops["swin"] = (fl, by)
    fl, by = stage_cost(
        lambda p, fc, fs: style_transformer_apply(
            p["style_transformer"], fc, fs, cfg.transformer, k=args.k),
        params, feat, feat)
    flops["st"] = (fl, by)
    fl, by = stage_cost(
        lambda p, f: cnn_decoder_apply(p["decoder"], f, cfg.decoder),
        params, feat)
    flops["dec"] = (fl, by)

    rows, total_fl, total_ms = [], 0.0, 0.0
    for stage, (fl, by) in flops.items():
        t = ms.get(stage)
        tfs = fl / t / 1e9 if t else None
        rows.append({
            "stage": stage,
            "gflops": round(fl / 1e9, 1),
            "hbm_gb": round(by / 1e9, 3),
            "arith_intensity": round(fl / by, 1) if by else None,
            "bw_bound_floor_ms": round(by / HBM_GBS / 1e6, 2),
            "measured_ms": t,
            "achieved_tfs": round(tfs, 1) if tfs else None,
            "mfu_vs_peak_pct": round(100 * tfs / PEAK_BF16_TFS, 1) if tfs else None,
            "util_vs_measured_gemm_pct":
                round(100 * tfs / MEASURED_GEMM_TFS, 1) if tfs else None,
        })
        total_fl += fl
        total_ms += t or 0.0
    model_tfs = total_fl / total_ms / 1e9 if total_ms else None
    summary = {
        "label": args.label,
        "size": args.size, "batch": args.batch, "k": args.k,
        "note": "FLOPs/bytes from XLA cost_analysis (CPU backend, canonical "
                "algorithm cost); times are in-context prefix deltas on the "
                "real chip; peaks: 394 TF/s v5e bf16, 145 TF/s measured "
                "flat-GEMM ceiling through the tunnel, 820 GB/s HBM",
        "stages": rows,
        "model_gflops": round(total_fl / 1e9, 1),
        "model_ms": total_ms,
        "model_achieved_tfs": round(model_tfs, 1) if model_tfs else None,
        "model_mfu_vs_peak_pct":
            round(100 * model_tfs / PEAK_BF16_TFS, 1) if model_tfs else None,
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        existing = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            existing = prev if isinstance(prev, list) else [prev]
        existing = [e for e in existing if e.get("label") != args.label]
        existing.append(summary)
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
