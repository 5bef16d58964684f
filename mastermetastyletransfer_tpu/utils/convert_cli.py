"""Weight-conversion CLI: torch state dicts -> framework .npz params.

Covers the reference's whole weight-acquisition surface
(codes/utils.py:10-102, codes/load_pretrained_weights_to_style_transformer.py):

    # torchvision swin_{t,s,b} state dict -> cut backbone params
    python -m mastermetastyletransfer_tpu.utils.convert_cli swin \
        --input swin_b.pth --output swin_backbone.npz --variant swin_B

    # torchvision vgg19(+bn) features -> loss-network params (BN folded)
    python -m mastermetastyletransfer_tpu.utils.convert_cli vgg19 \
        --input vgg19.pth --output vgg19.npz [--batchnorm]

    # reference-trained style transformer / decoder .pt -> params
    python -m mastermetastyletransfer_tpu.utils.convert_cli style_transformer \
        --input style_transformer.pt --output st.npz
    python -m mastermetastyletransfer_tpu.utils.convert_cli decoder \
        --input decoder.pt --output dec.npz

    # the paper's pretrained-weight surgery: seed the style transformer from
    # an original Swin block (fused qkv split into thirds)
    python -m mastermetastyletransfer_tpu.utils.convert_cli seed_from_swin \
        --input swin_b.pth --output st_seeded.npz

    # a whole-model checkpoint (save_whole_model layout — the
    # pretrained_model_lambda_is_{2,4}.pt format,
    # reference train_only_inner_loop.py:382-385) -> full params
    python -m mastermetastyletransfer_tpu.utils.convert_cli whole_model \
        --input pretrained_model_lambda_is_2.pt --output master_lambda2.npz
"""

from __future__ import annotations

import argparse

import jax


def _extract_swin_block(sd: dict) -> dict:
    """Pull the 2nd stage-2 SwinTransformerBlock out of a full torchvision
    swin state dict and re-key it as the loader's block scheme ("0."=norm1,
    "1."=attn, "3."=norm2, "4."=mlp). This is the block the reference's
    surgery targets: ModuleList -> 2nd BasicLayer -> 2nd block, i.e.
    features.3.1 in torchvision layout (reference:
    codes/load_pretrained_weights_to_style_transformer.py:16-50)."""
    if any(k.startswith("1.qkv.") for k in sd):
        return sd  # already a block state dict
    remap = {"norm1.": "0.", "attn.": "1.", "norm2.": "3.", "mlp.0.": "4.fc1.",
             "mlp.3.": "4.fc2."}
    # full torchvision model ("features.3.1.") or the reference's cut
    # Sequential(features[:4]) save ("3.1.")
    for prefix in ("features.3.1.", "3.1."):
        out = {}
        for k, v in sd.items():
            if not k.startswith(prefix):
                continue
            rest = k[len(prefix):]
            for old, new in remap.items():
                if rest.startswith(old):
                    out[new + rest[len(old):]] = v
                    break
        if out:
            return out
    raise ValueError(
        "no (features.)3.1.* keys found — pass a torchvision swin state "
        "dict, the cut backbone save, or a pre-extracted block state dict")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["swin", "vgg19", "style_transformer",
                                     "decoder", "seed_from_swin",
                                     "whole_model"])
    ap.add_argument("--input", required=True, help="torch .pt/.pth state dict")
    ap.add_argument("--output", required=True, help=".npz output path")
    ap.add_argument("--variant", default="swin_B")
    ap.add_argument("--batchnorm", action="store_true")
    args = ap.parse_args(argv)

    from mastermetastyletransfer_tpu.config import (
        ModelConfig, StyleTransformerConfig, SwinConfig,
    )
    from mastermetastyletransfer_tpu.utils import checkpoint as ckpt_lib
    from mastermetastyletransfer_tpu.utils.convert import (
        convert_cnn_decoder, convert_style_transformer, convert_swin_backbone,
        convert_vgg19, convert_whole_model, load_torch_state_dict,
        seed_style_transformer_from_swin_block,
    )

    sd = load_torch_state_dict(args.input)

    if args.kind == "whole_model":
        from mastermetastyletransfer_tpu.models import init_master_model
        cfg = ModelConfig()
        template = init_master_model(jax.random.PRNGKey(0), cfg)
        params = convert_whole_model(sd, template, cfg)
    elif args.kind == "swin":
        params = convert_swin_backbone(sd, SwinConfig.for_variant(args.variant))
    elif args.kind == "vgg19":
        params = convert_vgg19(sd, use_batchnorm=args.batchnorm)
    elif args.kind == "style_transformer":
        params = convert_style_transformer(sd, StyleTransformerConfig())
    elif args.kind == "decoder":
        params = convert_cnn_decoder(sd)
    else:  # seed_from_swin
        from mastermetastyletransfer_tpu.models.style_transformer import (
            init_style_transformer,
        )
        cfg = StyleTransformerConfig()
        template = init_style_transformer(jax.random.PRNGKey(0), cfg)
        params = seed_style_transformer_from_swin_block(
            _extract_swin_block(sd), template, cfg)

    ckpt_lib.save_params_npz(args.output, params)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.output}: {n:,} params")


if __name__ == "__main__":
    main()
