"""Minimal torchvision stand-in so the ACTUAL reference PyTorch code
(/root/reference/codes/*.py) can be imported and executed for matched-weight
parity tests (the image ships torch but not torchvision).

The reference only consumes three torchvision symbols at runtime
(reference: codes/style_transformer.py:7-12):
  * torchvision.ops.misc.MLP
  * torchvision.ops.stochastic_depth.StochasticDepth
  * torchvision.transforms (module object only; used in __main__ blocks)
plus name-imports from torchvision.models in codes/utils.py:7 that are never
called unless a weight download is attempted (we pre-save the .pt files).

MLP / StochasticDepth are reimplemented here with torchvision's exact
semantics (public torchvision source, BSD): MLP is a Sequential of
[Linear, (norm), act, Dropout]* + [Linear, Dropout] so state-dict keys are
.0/.3 for one hidden layer; StochasticDepth row/batch-mode survival scaling.
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn


class MLP(torch.nn.Sequential):
    """torchvision.ops.misc.MLP with identical layer layout / key scheme."""

    def __init__(self, in_channels, hidden_channels, norm_layer=None,
                 activation_layer=torch.nn.ReLU, inplace=None, bias=True,
                 dropout=0.0):
        params = {} if inplace is None else {"inplace": inplace}
        layers = []
        in_dim = in_channels
        for hidden_dim in hidden_channels[:-1]:
            layers.append(torch.nn.Linear(in_dim, hidden_dim, bias=bias))
            if norm_layer is not None:
                layers.append(norm_layer(hidden_dim))
            layers.append(activation_layer(**params))
            layers.append(torch.nn.Dropout(dropout, **params))
            in_dim = hidden_dim
        layers.append(torch.nn.Linear(in_dim, hidden_channels[-1], bias=bias))
        layers.append(torch.nn.Dropout(dropout, **params))
        super().__init__(*layers)


class Permute(torch.nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return torch.permute(x, self.dims)


def stochastic_depth(input: torch.Tensor, p: float, mode: str,
                     training: bool = True) -> torch.Tensor:
    if p < 0.0 or p > 1.0:
        raise ValueError(f"drop probability has to be between 0 and 1, got {p}")
    if mode not in ["batch", "row"]:
        raise ValueError(f"mode has to be either 'batch' or 'row', got {mode}")
    if not training or p == 0.0:
        return input
    survival_rate = 1.0 - p
    if mode == "row":
        size = [input.shape[0]] + [1] * (input.ndim - 1)
    else:
        size = [1] * input.ndim
    noise = torch.empty(size, dtype=input.dtype, device=input.device)
    noise = noise.bernoulli_(survival_rate)
    if survival_rate > 0.0:
        noise.div_(survival_rate)
    return input * noise


class StochasticDepth(nn.Module):
    def __init__(self, p: float, mode: str) -> None:
        super().__init__()
        self.p = p
        self.mode = mode

    def forward(self, input: torch.Tensor) -> torch.Tensor:
        return stochastic_depth(input, self.p, self.mode, self.training)


def _unavailable(name):
    def fn(*a, **kw):
        raise RuntimeError(
            f"torchvision.{name} is a test stub (no torchvision / no network); "
            "pre-save the weight files instead of downloading")
    return fn


def install() -> None:
    """Register the fake torchvision module tree in sys.modules (idempotent)."""
    if "torchvision" in sys.modules and getattr(
            sys.modules["torchvision"], "__tv_shim__", False):
        return

    tv = types.ModuleType("torchvision")
    tv.__tv_shim__ = True

    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.MLP = MLP
    misc.Permute = Permute
    sd_mod = types.ModuleType("torchvision.ops.stochastic_depth")
    sd_mod.StochasticDepth = StochasticDepth
    sd_mod.stochastic_depth = stochastic_depth
    ops.misc = misc
    ops.stochastic_depth = sd_mod
    ops.MLP = MLP
    ops.Permute = Permute
    ops.StochasticDepth = StochasticDepth

    transforms = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "CenterCrop", "RandomCrop", "ToTensor",
                 "Normalize", "ToPILImage"):
        setattr(transforms, name, _unavailable(f"transforms.{name}"))

    models = types.ModuleType("torchvision.models")
    models.swin_transformer = types.SimpleNamespace(
        swin_t=_unavailable("models.swin_t"),
        swin_s=_unavailable("models.swin_s"),
        swin_b=_unavailable("models.swin_b"),
        Swin_T_Weights=types.SimpleNamespace(IMAGENET1K_V1=None),
        Swin_S_Weights=types.SimpleNamespace(IMAGENET1K_V1=None),
        Swin_B_Weights=types.SimpleNamespace(IMAGENET1K_V1=None),
    )
    models.vgg19 = _unavailable("models.vgg19")
    models.vgg19_bn = _unavailable("models.vgg19_bn")
    models.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    models.VGG19_BN_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)

    tv.ops = ops
    tv.transforms = transforms
    tv.models = models

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc
    sys.modules["torchvision.ops.stochastic_depth"] = sd_mod
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models


def import_reference_codes():
    """Import the reference package (/root/reference) with the shim installed.

    Returns the `codes` package namespace. The reference inserts its project
    root into sys.path itself (codes/loss.py:8-9); we add it up front so
    `import codes.x` works. Read-only import — nothing in /root/reference is
    executed beyond module tops (all demos are __main__-guarded).
    """
    install()
    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import codes.style_transformer  # noqa: F401
    import codes.decoder  # noqa: F401
    import codes.loss  # noqa: F401
    import codes.full_model  # noqa: F401
    import codes
    return codes
