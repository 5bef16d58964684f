"""Raw-torch oracle of torchvision's swin_{t,s,b} `features[:4]` cut, with
torchvision's exact state-dict key scheme ("0.0"=patch conv, "0.2"=patch norm,
"1.{b}.*"=stage-1 blocks with FUSED attn.qkv, "2.*"=PatchMerging,
"3.{b}.*"=stage-2 blocks).

Purpose: activation-level validation of utils/convert.convert_swin_backbone +
models/swin.py against the real torchvision layout (torchvision itself is not
installed in this image and its pretrained weights are unreachable — no
network). Semantics reimplemented from the public torchvision source,
version-pinned to **torchvision v0.15.2**, file
`torchvision/models/swin_transformer.py` (BSD-3). Each function/class below
cites the symbol it mirrors in that file; a per-statement correspondence
audit is inline. Known deliberate omissions (all identity in eval mode /
at the swin-v1 call sites the reference uses):

  * `logit_scale` (swin-v2 cosine attention) and the v2 qkv-bias k-zeroing
    branch of `shifted_window_attention` — swin v1 passes logit_scale=None.
  * `attention_dropout`/`dropout` F.dropout calls — 0.0 in eval.
  * `torch.fx.wrap` registrations and `_log_api_usage_once` telemetry.

Init faithfulness: torchvision's `SwinTransformer.__init__` ends with a
whole-model loop applying `trunc_normal_(std=0.02)` to every `nn.Linear`
weight and zeroing its bias — overriding the per-block MLP xavier init of
`SwinTransformerBlock.__init__`. `build_tv_swin_features` replicates that
final loop, so oracle weight magnitudes match a real random-init torchvision
model (activation parity itself is init-independent: both sides run the same
converted weights). This file is test-support only.
"""

from __future__ import annotations

from typing import List

import torch
import torch.nn.functional as F
from torch import nn

from tests.tv_shim import MLP, Permute, StochasticDepth


def _relative_position_index(window: List[int]) -> torch.Tensor:
    """= torchvision `ShiftedWindowAttention.define_relative_position_index`
    (v0.15.2), statement for statement: meshgrid(ij) coords -> flatten ->
    pairwise difference -> permute(1,2,0) -> shift both axes to start at 0 ->
    scale axis 0 by (2*Ww-1) -> sum -> flatten."""
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
    """= torchvision `shifted_window_attention` (v0.15.2), v1 eval mode.
    Statement audit vs the pinned source, in order: pad_r/pad_b to window
    multiples and F.pad; `shift_size.copy()` then zeroing when window >=
    padded dim (here `list(shift_size)` — same copy semantics); negative
    torch.roll; view->permute(0,1,3,2,4,5)->reshape window partition;
    F.linear fused qkv -> reshape (BnW, N, 3, heads, dh) -> permute
    (2,0,3,1,4); q scaled by (C//num_heads)**-0.5 BEFORE the matmul; bias
    added pre-mask; the 3x3 h/w-slice region-count mask with -100.0 fill
    (masked_fill(!=0, -100); the source's extra masked_fill(==0, 0.0) is a
    no-op on a zeros-init tensor and is omitted); softmax -> PV -> proj;
    inverse permute merge, positive roll, crop to (h, w). Omitted v2-only
    branches and dropouts are listed in the module docstring."""
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
    """= torchvision `ShiftedWindowAttention` (v0.15.2): fused qkv/proj
    Linears (both bias=True by default), bias table of shape
    ((2Wh-1)(2Ww-1), heads) zero-init then trunc_normal_(std=0.02)
    [`define_relative_position_bias_table`], index registered as a buffer.
    `get_relative_position_bias` (the forward's first step here) matches the
    module-level `_get_relative_position_bias`: table[index].view(N,N,-1)
    .permute(2,0,1).unsqueeze(0)."""

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
    """= torchvision `SwinTransformerBlock` (v0.15.2): norm1 -> attn ->
    StochasticDepth("row") residual; norm2 -> MLP(dim, [dim*ratio, dim],
    GELU) -> StochasticDepth residual. torchvision builds it with
    norm_layer=partial(nn.LayerNorm, eps=1e-5) — identical to the
    nn.LayerNorm default used here. The block's own MLP xavier_uniform_
    init is overridden by the model-level trunc_normal_ loop (see
    build_tv_swin_features), so it is not replicated here."""

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
    """= torchvision `PatchMerging` + `_patch_merging_pad` (v0.15.2):
    pad W,H to even; gather strides in (even-even, odd-even, even-odd,
    odd-odd) order; concat -> norm(4C) -> Linear(4C->2C, bias=False).
    Note the source normalizes BEFORE the reduction (norm then reduction),
    matching the forward below."""

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
    output NHWC (B, H/8, W/8, 2*embed_dim).

    Mirrors torchvision `SwinTransformer.__init__` (v0.15.2) for the first
    four `features` entries: patch-embed Sequential(Conv2d(3, E, k=4, s=4),
    Permute([0,2,3,1]), LayerNorm(E)); per-stage blocks with shift
    [0,0] for even and [Wh//2, Ww//2] for odd block index (swin_b window 7
    -> shift 3); PatchMerging between stages. Per-block stochastic-depth
    prob in the real model ramps as total_prob * block_id / (n_blocks-1)
    (swin_b: 0.5 * id/23 over 24 blocks -> 0, 0.0217, 0.0435, 0.0652 for
    the first four) — identity in eval mode, so tests default to 0; pass
    stochastic_depth_probs to replicate. The trailing init loop replicates
    the source's model-level init: trunc_normal_(std=0.02) on every Linear
    weight, zeros on every Linear bias (Conv2d keeps its default init —
    torchvision's loop matches nn.Linear only)."""
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
    model = nn.Sequential(patch_embed, stages[0], TVPatchMerging(embed_dim),
                          stages[1])
    # torchvision SwinTransformer.__init__ model-level init (v0.15.2):
    # overrides every nn.Linear, including the blocks' MLP xavier init.
    for m in model.modules():
        if isinstance(m, nn.Linear):
            nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                nn.init.zeros_(m.bias)
    return model
