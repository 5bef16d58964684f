"""Rank per-stage bf16 sensitivity for the mixed-precision operating point
(VERDICT r3 task 1).

The r3 finding: the whole-model bf16 MAE (1.3e-2 rel) is MXU input rounding
amplified by the instance-norm chains; full-f32 meets the <=1e-3 bar but runs
72 imgs/s (31% of the bf16 headline). The frontier in between is a PER-STAGE
dtype assignment (ModelConfig.{swin,transformer,decoder}_dtype). This script
measures the final-output MAE vs the live torch reference for all 8 combos of
(swin, transformer, decoder) in {bfloat16, float32} on CPU.

CPU is a faithful rounding proxy for the TPU points we can reach:
  - a bf16 stage casts inputs (and in-kernel weights) to bf16, and XLA
    accumulates bf16 x bf16 dots in f32 — the same rounding model as one
    MXU pass (the TPU bf16 point);
  - an f32 stage on CPU is exact f32 — the same class as the TPU's
    HIGHEST (6-pass) matmuls, which measured 2.8e-6 whole-model.
The combo ranking (which stages must stay f32) therefore transfers; the
absolute TPU numbers are then measured by scripts/operating_points.py
--points mixed:... on hardware.

Usage: python scripts/mixed_precision_bisect.py [--size 512] [--k 1]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mastermetastyletransfer_tpu.config import (
    ModelConfig, StyleTransformerConfig, SwinConfig,
)
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.utils.convert import convert_whole_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--k", type=int, default=1)
    args = ap.parse_args()

    from scripts.operating_points import build_reference

    with tempfile.TemporaryDirectory() as tmp:
        whole_sd, content, style, out_ref, _ = build_reference(
            tmp, args.size, args.k)

    base = ModelConfig(
        swin=SwinConfig.for_variant("swin_B").replace(window_size=(7, 7)),
        transformer=StyleTransformerConfig(),
    )
    template = init_master_model(jax.random.PRNGKey(0), base)
    params = convert_whole_model(whole_sd, template, base)

    cj, sj = jnp.asarray(content), jnp.asarray(style)
    ref_abs = float(np.mean(np.abs(out_ref)))
    print(f"|ref| mean {ref_abs:.4f}; combos are (swin, transformer, decoder)")

    rows = []
    for combo in itertools.product(["bfloat16", "float32"], repeat=3):
        sw, tr, de = combo
        cfg = base.replace(swin_dtype=sw, transformer_dtype=tr,
                           decoder_dtype=de)
        out = np.asarray(
            jax.jit(lambda p, c, s, cfg=cfg: master_apply(
                p, c, s, cfg, k=args.k))(params, cj, sj), np.float32)
        mae = float(np.mean(np.abs(out - out_ref)))
        rows.append((combo, mae))
        tag = "".join("b" if d == "bfloat16" else "F" for d in combo)
        print(f"  {tag}  swin={sw:8s} st={tr:8s} dec={de:8s} "
              f"MAE {mae:.3e}  rel {mae / ref_abs:.3e}  "
              f"{'<=1e-3' if mae <= 1e-3 else ''}")

    rows.sort(key=lambda r: r[1])
    print("\nranking (best MAE first):")
    for combo, mae in rows:
        tag = "".join("b" if d == "bfloat16" else "F" for d in combo)
        print(f"  {tag}: {mae:.3e}")


if __name__ == "__main__":
    main()
