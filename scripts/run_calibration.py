"""Run the loss-calibration sweep on the paper's fixture images
(reference: codes/loss.py:341-805 over codes/images_to_try_loss_function/)
and record the results as committed goldens.

Real torchvision VGG19 weights are unreachable in this environment (zero
egress), so the sweep runs with the deterministic He-init VGG
(jax.random.PRNGKey(1), the same init `load_vgg_params(None)` produces).
The values are therefore GOLDENS for regression detection, not paper-Table-1
comparisons; tests/test_reference_parity.py proves the loss math itself
matches the reference's custom_loss at matched weights.

    python scripts/run_calibration.py [--out goldens/loss_calibration.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/codes/images_to_try_loss_function"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="goldens/loss_calibration.json")
    ap.add_argument("--image_size", type=int, default=256)
    args = ap.parse_args()

    from mastermetastyletransfer_tpu.losses.calibrate import (
        _load_images, run_sweep,
    )
    from mastermetastyletransfer_tpu.train.trainer import load_vgg_params

    vggs = {"plain": load_vgg_params(None)}  # He-init, PRNGKey(1)

    records = []

    # figure 9: one content/style pair, outputs at stacked layer 1/3/5
    f9 = os.path.join(FIXTURES, "figure9")
    c9 = _load_images(os.path.join(f9, "content_layer.png"), args.image_size)[0]
    s9 = _load_images(os.path.join(f9, "style_layer.png"), args.image_size)[0]
    for layer in (1, 3, 5):
        o = _load_images(os.path.join(f9, f"output_layer_{layer}.png"),
                         args.image_size)[0]
        for row in run_sweep(c9, s9, o, vgg_params_by_kind=vggs):
            row.update(figure="figure9", output=f"layer_{layer}")
            records.append(row)

    # figure 4: 5 columns x 4 method outputs
    f4 = os.path.join(FIXTURES, "figure4")
    for col in range(1, 6):
        c = _load_images(os.path.join(f4, f"figure4_column{col}_content.png"),
                         args.image_size)[0]
        s = _load_images(os.path.join(f4, f"figure4_column{col}_style.png"),
                         args.image_size)[0]
        for method in ("Master_ZS_layer1", "Master_ZS_layer3", "Master_FS",
                       "AdaAttN"):
            o = _load_images(
                os.path.join(f4, f"figure4_column{col}_output_{method}.png"),
                args.image_size)[0]
            for row in run_sweep(c, s, o, vgg_params_by_kind=vggs):
                row.update(figure="figure4", column=col, output=method)
                records.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out = {
        "note": ("He-init VGG (PRNGKey(1)); goldens for regression detection."
                 " Loss math parity vs the reference's custom_loss is proven"
                 " separately in tests/test_reference_parity.py."),
        "image_size": args.image_size,
        "records": records,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()
