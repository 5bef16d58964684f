"""Diagnose the 512^2 operating-points MAE (r3): localize torch-vs-JAX f32
divergence by size and by stage (swin features -> transformer -> decoder).

Runs entirely on CPU. Reuses operating_points.build_reference construction.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import torch

from mastermetastyletransfer_tpu.config import (
    ModelConfig, StyleTransformerConfig, SwinConfig,
)
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.models.master import master_apply
from mastermetastyletransfer_tpu.models.swin import swin_backbone_apply
from mastermetastyletransfer_tpu.models.style_transformer import (
    style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.decoder import cnn_decoder_apply
from mastermetastyletransfer_tpu.utils.convert import convert_whole_model


def mae(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.float32) -
                                np.asarray(b, np.float32))))


def main():
    # matched-weights construction SHARED with the measurement script —
    # any divergence here would make the diagnosis explain a different
    # model than the one measured
    from scripts.operating_points import build_reference

    tmp = tempfile.mkdtemp()
    whole_sd, _, _, _, ref = build_reference(tmp, size=256, k=1)

    cfg = ModelConfig(
        swin=SwinConfig.for_variant("swin_B").replace(window_size=(7, 7)),
        transformer=StyleTransformerConfig(),
    )
    template = init_master_model(jax.random.PRNGKey(0), cfg)
    params = convert_whole_model(whole_sd, template, cfg)

    for size in (256, 384, 448, 512):
        rng = np.random.default_rng(70)
        content = np.clip(rng.standard_normal((1, 3, size, size)) * 0.25 + 0.5,
                          0, 1).astype(np.float32)
        style = np.clip(np.random.default_rng(71).standard_normal(
            (1, 3, size, size)) * 0.25 + 0.5, 0, 1).astype(np.float32)

        with torch.no_grad():
            tc, ts = torch.from_numpy(content), torch.from_numpy(style)
            fc_t = ref.swin_encoder(tc)       # NCHW? torchvision features NHWC
            fs_t = ref.swin_encoder(ts)
            out_t = ref(tc, ts, transformer_layer_count=1).numpy()
            fcs_t = ref.style_transformer(fc_t, fs_t, 1)

        cj = jnp.asarray(content.transpose(0, 2, 3, 1))
        sj = jnp.asarray(style.transpose(0, 2, 3, 1))
        fc_j = swin_backbone_apply(params["swin"], cj, cfg.swin)
        fs_j = swin_backbone_apply(params["swin"], sj, cfg.swin)
        fcs_j = style_transformer_apply(
            params["style_transformer"], fc_j, fs_j, cfg.transformer, k=1)
        out_j = cnn_decoder_apply(params["decoder"], fcs_j, cfg.decoder)
        out_full = master_apply(params, cj, sj, cfg, k=1)

        fc_t_n = fc_t.numpy()  # torchvision swin gives NHWC already
        fcs_t_n = fcs_t.numpy()
        print(f"size {size}:")
        print(f"  swin fc   MAE {mae(fc_j, fc_t_n):.3e}   "
              f"(|ref| {np.abs(fc_t_n).mean():.3f})")
        print(f"  swin fs   MAE {mae(fs_j, fs_t.numpy()):.3e}")
        st_shape_t = fcs_t_n.shape
        print(f"  st out    MAE {mae(np.asarray(fcs_j).reshape(st_shape_t), fcs_t_n):.3e}   "
              f"(|ref| {np.abs(fcs_t_n).mean():.3f}) shapes {fcs_j.shape} vs {st_shape_t}")
        print(f"  decoder   MAE {mae(out_j, out_t.transpose(0, 2, 3, 1)):.3e}   "
              f"(|ref| {np.abs(out_t).mean():.3f})")
        print(f"  full      MAE {mae(out_full, out_t.transpose(0, 2, 3, 1)):.3e}")


if __name__ == "__main__":
    main()
