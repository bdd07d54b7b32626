"""Torch implementation of the diffusers ``UNet2DModel`` spec (the subset
HFNet uses), with state-dict keys matching diffusers' public naming exactly.

Used by tests/test_ddpm_unet.py to pin ``models/nets/ddpm_unet.UNet2D`` and
``extra/converters.import_diffusers_unet2d``: ``diffusers`` itself is not
installed in this image, so the importer + numerics are validated against
this faithful torch rendering of the same published architecture
(diffusers models/unet_2d.py + unet_2d_blocks.py + resnet.py +
attention_processor.py). This exercises every convention the transfer
crosses: conv/linear weight transposes, GroupNorm axes, attention head
reshape order, skip-concat order, NCHW<->channels-last.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(timesteps, dim, flip_sin_to_cos=True, freq_shift=0.0,
                       max_period=10000.0):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half, dtype=torch.float32) / (half - freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, channels, head_dim, groups, eps=1e-5):
        super().__init__()
        self.heads = max(channels // head_dim, 1)
        self.dh = head_dim
        inner = self.heads * head_dim
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, inner)
        self.to_k = nn.Linear(channels, inner)
        self.to_v = nn.Linear(channels, inner)
        self.to_out = nn.ModuleList([nn.Linear(inner, channels)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).view(B, C, H * W).transpose(1, 2)  # [B,T,C]

        def heads(a):  # [B, T, inner] -> [B, heads, T, dh]
            return a.view(B, -1, self.heads, self.dh).permute(0, 2, 1, 3)

        q, k, v = heads(self.to_q(h)), heads(self.to_k(h)), heads(self.to_v(h))
        att = torch.softmax(
            (q @ k.transpose(-1, -2)).float() / math.sqrt(self.dh), dim=-1)
        o = (att.to(v.dtype) @ v).permute(0, 2, 1, 3).reshape(
            B, -1, self.heads * self.dh)
        o = self.to_out[0](o).transpose(1, 2).view(B, C, H, W)
        return o + x


class _Down(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, head_dim, attn,
                 add_downsample, layers):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin if j == 0 else cout, cout, temb_dim, groups)
            for j in range(layers)])
        if attn:
            self.attentions = nn.ModuleList([
                Attention(cout, head_dim, groups) for _ in range(layers)])
        else:
            self.attentions = None
        if add_downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=1)
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None

    def forward(self, x, temb):
        skips = []
        for j, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0].conv(x)
            skips.append(x)
        return x, skips


class _Up(nn.Module):
    def __init__(self, prev_out, skip_in, cout, temb_dim, groups, head_dim,
                 attn, add_upsample, layers):
        super().__init__()
        resnets = []
        for j in range(layers):
            res_skip = skip_in if j == layers - 1 else cout
            res_in = prev_out if j == 0 else cout
            resnets.append(ResnetBlock2D(res_in + res_skip, cout,
                                         temb_dim, groups))
        self.resnets = nn.ModuleList(resnets)
        if attn:
            self.attentions = nn.ModuleList([
                Attention(cout, head_dim, groups) for _ in range(layers)])
        else:
            self.attentions = None
        if add_upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None

    def forward(self, x, skips, temb):
        for j, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _Mid(nn.Module):
    def __init__(self, ch, temb_dim, groups, head_dim):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, temb_dim, groups),
            ResnetBlock2D(ch, ch, temb_dim, groups)])
        self.attentions = nn.ModuleList([Attention(ch, head_dim, groups)])

    def forward(self, x, temb):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x)
        return self.resnets[1](x, temb)


class TorchUNet2D(nn.Module):
    """diffusers.UNet2DModel (layers_per_block=2, conv resampling)."""

    def __init__(self, block_out_channels=(8, 16), in_channels=1,
                 out_channels=1, attn_down=(False, True),
                 attn_up=(True, False), norm_num_groups=4, head_dim=8,
                 layers_per_block=2):
        super().__init__()
        blocks = tuple(block_out_channels)
        n = len(blocks)
        temb_dim = blocks[0] * 4
        self.block0 = blocks[0]
        self.conv_in = nn.Conv2d(in_channels, blocks[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(blocks[0], temb_dim)
        self.time_embedding.linear_2 = nn.Linear(temb_dim, temb_dim)
        downs, cin = [], blocks[0]
        for i, ch in enumerate(blocks):
            downs.append(_Down(cin, ch, temb_dim, norm_num_groups, head_dim,
                               attn_down[i], i < n - 1, layers_per_block))
            cin = ch
        self.down_blocks = nn.ModuleList(downs)
        self.mid_block = _Mid(blocks[-1], temb_dim, norm_num_groups,
                              head_dim)
        rev = blocks[::-1]
        ups, prev = [], blocks[-1]
        for i, ch in enumerate(rev):
            skip_in = rev[min(i + 1, n - 1)]
            ups.append(_Up(prev, skip_in, ch, temb_dim, norm_num_groups,
                           head_dim, attn_up[i], i < n - 1,
                           layers_per_block + 1))
            prev = ch
        self.up_blocks = nn.ModuleList(ups)
        self.conv_norm_out = nn.GroupNorm(norm_num_groups, blocks[0],
                                          eps=1e-5)
        self.conv_out = nn.Conv2d(blocks[0], out_channels, 3, padding=1)

    def forward(self, x, t):
        temb = timestep_embedding(t, self.block0)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for block in self.down_blocks:
            h, s = block(h, temb)
            skips.extend(s)
        h = self.mid_block(h, temb)
        per_up = len(self.up_blocks[0].resnets)
        for block in self.up_blocks:
            take, skips = skips[-per_up:], skips[:-per_up]
            h = block(h, take, temb)
        return self.conv_out(F.silu(self.conv_norm_out(h)))
