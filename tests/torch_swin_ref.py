"""Raw-torch oracle of torchvision's swin_{t,s,b} `features[:4]` cut, with
torchvision's exact state-dict key scheme ("0.0"=patch conv, "0.2"=patch norm,
"1.{b}.*"=stage-1 blocks with FUSED attn.qkv, "2.*"=PatchMerging,
"3.{b}.*"=stage-2 blocks).

Purpose: activation-level validation of utils/convert.convert_swin_backbone +
models/swin.py against the real torchvision layout (torchvision itself is not
installed in this image and its pretrained weights are unreachable — no
network). Semantics reimplemented from the public torchvision source
(torchvision/models/swin_transformer.py, BSD-3): W-MSA/SW-MSA with fused qkv,
per-window relative-position bias, shift masking, PatchMerging even/odd
gather, MLP with exact-erf GELU. This file is test-support only.
"""

from __future__ import annotations

from typing import List

import torch
import torch.nn.functional as F
from torch import nn

from tests.tv_shim import MLP, Permute, StochasticDepth


def _relative_position_index(window: List[int]) -> torch.Tensor:
    ch = torch.arange(window[0])
    cw = torch.arange(window[1])
    coords = torch.stack(torch.meshgrid(ch, cw, indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += window[0] - 1
    rel[:, :, 1] += window[1] - 1
    rel[:, :, 0] *= 2 * window[1] - 1
    return rel.sum(-1).flatten()


def tv_shifted_window_attention(
        x: torch.Tensor, qkv_weight: torch.Tensor, proj_weight: torch.Tensor,
        relative_position_bias: torch.Tensor, window_size: List[int],
        num_heads: int, shift_size: List[int], qkv_bias: torch.Tensor,
        proj_bias: torch.Tensor) -> torch.Tensor:
    """torchvision v1 shifted_window_attention (eval mode, fused qkv)."""
    b, h, w, c = x.shape
    pad_r = (window_size[1] - w % window_size[1]) % window_size[1]
    pad_b = (window_size[0] - h % window_size[0]) % window_size[0]
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, ph, pw, _ = x.shape

    shift_size = list(shift_size)
    if window_size[0] >= ph:
        shift_size[0] = 0
    if window_size[1] >= pw:
        shift_size[1] = 0

    if sum(shift_size) > 0:
        x = torch.roll(x, shifts=(-shift_size[0], -shift_size[1]), dims=(1, 2))

    nw = (ph // window_size[0]) * (pw // window_size[1])
    x = x.view(b, ph // window_size[0], window_size[0],
               pw // window_size[1], window_size[1], c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(
        b * nw, window_size[0] * window_size[1], c)

    qkv = F.linear(x, qkv_weight, qkv_bias)
    qkv = qkv.reshape(x.size(0), x.size(1), 3, num_heads,
                      c // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (c // num_heads) ** -0.5
    attn = q.matmul(k.transpose(-2, -1))
    attn = attn + relative_position_bias

    if sum(shift_size) > 0:
        attn_mask = x.new_zeros((ph, pw))
        h_slices = ((0, -window_size[0]), (-window_size[0], -shift_size[0]),
                    (-shift_size[0], None))
        w_slices = ((0, -window_size[1]), (-window_size[1], -shift_size[1]),
                    (-shift_size[1], None))
        count = 0
        for hs in h_slices:
            for ws in w_slices:
                attn_mask[hs[0]:hs[1], ws[0]:ws[1]] = count
                count += 1
        attn_mask = attn_mask.view(ph // window_size[0], window_size[0],
                                   pw // window_size[1], window_size[1])
        attn_mask = attn_mask.permute(0, 2, 1, 3).reshape(
            nw, window_size[0] * window_size[1])
        attn_mask = attn_mask.unsqueeze(1) - attn_mask.unsqueeze(2)
        attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
        attn = attn.view(b, nw, num_heads, x.size(1), x.size(1))
        attn = attn + attn_mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, x.size(1), x.size(1))

    attn = F.softmax(attn, dim=-1)
    x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), x.size(1), c)
    x = F.linear(x, proj_weight, proj_bias)

    x = x.view(b, ph // window_size[0], pw // window_size[1],
               window_size[0], window_size[1], c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
    if sum(shift_size) > 0:
        x = torch.roll(x, shifts=(shift_size[0], shift_size[1]), dims=(1, 2))
    return x[:, :h, :w, :].contiguous()


class TVShiftedWindowAttention(nn.Module):
    """torchvision ShiftedWindowAttention (fused qkv; keys qkv/proj/
    relative_position_bias_table/relative_position_index)."""

    def __init__(self, dim, window_size, shift_size, num_heads,
                 qkv_bias=True, proj_bias=True):
        super().__init__()
        self.window_size = list(window_size)
        self.shift_size = list(shift_size)
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim, bias=proj_bias)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size[0] - 1) * (2 * window_size[1] - 1),
                        num_heads))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)
        self.register_buffer("relative_position_index",
                             _relative_position_index(self.window_size))

    def forward(self, x):
        n = self.window_size[0] * self.window_size[1]
        bias = self.relative_position_bias_table[
            self.relative_position_index].view(n, n, -1)
        bias = bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        return tv_shifted_window_attention(
            x, self.qkv.weight, self.proj.weight, bias, self.window_size,
            self.num_heads, self.shift_size, self.qkv.bias, self.proj.bias)


class TVSwinBlock(nn.Module):
    """torchvision SwinTransformerBlock (keys norm1/attn/norm2/mlp)."""

    def __init__(self, dim, num_heads, window_size, shift_size,
                 mlp_ratio=4.0, stochastic_depth_prob=0.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TVShiftedWindowAttention(dim, window_size, shift_size,
                                             num_heads)
        self.stochastic_depth = StochasticDepth(stochastic_depth_prob, "row")
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLP(dim, [int(dim * mlp_ratio), dim],
                       activation_layer=nn.GELU, inplace=None, dropout=0.0)

    def forward(self, x):
        x = x + self.stochastic_depth(self.attn(self.norm1(x)))
        x = x + self.stochastic_depth(self.mlp(self.norm2(x)))
        return x


class TVPatchMerging(nn.Module):
    """torchvision PatchMerging (keys reduction/norm)."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        _, h, w, _ = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], dim=-1)
        return self.reduction(self.norm(x))


def build_tv_swin_features(embed_dim=128, depths=(2, 2), num_heads=(4, 8),
                           window_size=(7, 7), mlp_ratio=4.0,
                           stochastic_depth_probs=(0.0, 0.0, 0.0, 0.0),
                           seed=0) -> nn.Sequential:
    """Random-init torchvision-layout swin features[:4]: the same Sequential
    the reference torch.saves/loads (codes/utils.py:85-102). Input NCHW image,
    output NHWC (B, H/8, W/8, 2*embed_dim)."""
    torch.manual_seed(seed)
    patch_embed = nn.Sequential(
        nn.Conv2d(3, embed_dim, kernel_size=4, stride=4),
        Permute([0, 2, 3, 1]),
        nn.LayerNorm(embed_dim),
    )
    sd_idx = 0
    stages = []
    for stage in range(2):
        dim = embed_dim * (2 ** stage)
        blocks = []
        for b in range(depths[stage]):
            shift = [window_size[0] // 2, window_size[1] // 2] if b % 2 else [0, 0]
            blocks.append(TVSwinBlock(
                dim, num_heads[stage], list(window_size), shift, mlp_ratio,
                stochastic_depth_probs[sd_idx]))
            sd_idx += 1
        stages.append(nn.Sequential(*blocks))
    return nn.Sequential(patch_embed, stages[0], TVPatchMerging(embed_dim),
                         stages[1])
