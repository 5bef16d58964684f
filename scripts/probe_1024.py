"""High-res (1024^2 — BASELINE config #5) tuning pass (VERDICT r3 task 4).

Runs, in order, on the real chip:
  1. prefix profile at 1024^2 (batch from --batch) — true in-context stage
     costs at the 128x128-token grid;
  2. a one-at-a-time sweep of the two VMEM budget knobs that were
     calibrated at 512^2 (MMST_BSUB_BUDGET_SCALE for the attention/block
     kernels' image-batching budget, MMST_MLP_ROW_SCALE for the MLP row
     tiles), each point a full `bench.py --size 1024` subprocess.

    python scripts/probe_1024.py [--batch 4] [--scales 0.5,2] [--skip-prefix]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench(batch: int, env: dict, label: str, extra=()):
    e = dict(os.environ, **env)
    p = subprocess.run(
        [sys.executable, "bench.py", "--size", "1024",
         "--batch", str(batch), *extra],
        capture_output=True, text=True, cwd=ROOT, env=e, timeout=3600)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    val = json.loads(line[-1])["value"] if line else None
    print(json.dumps({"point": label, "env": env, "imgs_per_sec": val}),
          flush=True)
    if not line:
        print(p.stdout[-800:] + p.stderr[-800:], flush=True)
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scales", default="0.5,2")
    ap.add_argument("--skip-prefix", action="store_true")
    args = ap.parse_args()

    if not args.skip_prefix:
        subprocess.run(
            [sys.executable, "scripts/profile_prefix.py", "--size", "1024",
             "--batch", str(args.batch)], cwd=ROOT, timeout=3600)

    bench(args.batch, {}, "baseline")
    for s in args.scales.split(","):
        bench(args.batch, {"MMST_BSUB_BUDGET_SCALE": s}, f"bsub_budget x{s}")
    for s in args.scales.split(","):
        bench(args.batch, {"MMST_MLP_ROW_SCALE": s}, f"mlp_rows x{s}")


if __name__ == "__main__":
    main()
