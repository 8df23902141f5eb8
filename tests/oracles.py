"""Torch oracle models for golden-parity testing.

The reference validates its port against the original Python models with
tensor diffs (NeuralCodecs.Diagnostics/TensorComparison.cs:34-82). We do the
same in reverse: these torch modules implement the documented reference
semantics (SNAC topology, RVQ argmin, RoPE windowed attention) in [B, C, T]
layout, share state-dict naming with neuralcodecs_tpu models, and serve as
the numeric ground truth for the JAX rebuild. Weight-norm is pre-folded
(plain conv weights), matching our import-time folding.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class SnakeT(nn.Module):
    def __init__(self, channels: int):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        a = self.alpha
        return torch.where(a == 0, x, x + torch.sin(a * x) ** 2 / torch.where(a == 0, torch.ones_like(a), a))


class ConvT(nn.Module):
    """Plain conv named like a folded WNConv1d (single 'weight'/'bias')."""

    def __init__(self, cin, cout, k, stride=1, padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, stride, padding, dilation, groups, bias=bias)

    def forward(self, x):
        return self.conv(x)


class ConvTransposeT(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, output_padding=0, groups=1):
        super().__init__()
        self.conv = nn.ConvTranspose1d(cin, cout, k, stride, padding, output_padding,
                                       groups=groups)

    def forward(self, x):
        return self.conv(x)


class ResidualUnitT(nn.Module):
    def __init__(self, dim, dilation=1, kernel=7, groups=1):
        super().__init__()
        pad = (kernel - 1) * dilation // 2
        self.block = nn.Sequential(
            SnakeT(dim),
            nn.Conv1d(dim, dim, kernel, padding=pad, dilation=dilation, groups=groups),
            SnakeT(dim),
            nn.Conv1d(dim, dim, 1),
        )

    def forward(self, x):
        y = self.block(x)
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class EncoderBlockT(nn.Module):
    def __init__(self, out_dim, stride, groups=1):
        super().__init__()
        in_dim = out_dim // 2
        self.block = nn.Sequential(
            ResidualUnitT(in_dim, 1, groups=groups),
            ResidualUnitT(in_dim, 3, groups=groups),
            ResidualUnitT(in_dim, 9, groups=groups),
            SnakeT(in_dim),
            nn.Conv1d(in_dim, out_dim, 2 * stride, stride=stride,
                      padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class LocalMHAT(nn.Module):
    def __init__(self, dim, window_size=32, dim_head=64):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.heads = dim // dim_head
        self.window = window_size
        self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
        self.to_out = nn.Linear(dim, dim, bias=False)
        inv_freq = 1.0 / (10000 ** (torch.arange(0, dim_head, 2).float() / dim_head))
        self.register_buffer("inv_freq", inv_freq, persistent=False)

    def forward(self, x):
        b, c, t = x.shape
        residual = x
        h = self.norm(x.transpose(1, 2))
        windows = t // self.window
        q, k, v = self.to_qkv(h).chunk(3, dim=-1)

        def rearrange(a):
            a = a.reshape(b, windows, self.window, self.heads, -1)
            return a.permute(0, 3, 1, 2, 4)  # B,H,W,S,D

        q, k, v = rearrange(q), rearrange(k), rearrange(v)
        tpos = torch.arange(self.window).float()
        freqs = torch.einsum("i,j->ij", tpos, self.inv_freq)
        freqs = torch.cat([freqs, freqs], dim=-1)

        def rot_half(a):
            half = a.shape[-1] // 2
            return torch.cat([-a[..., half:], a[..., :half]], dim=-1)

        q = q * freqs.cos() + rot_half(q) * freqs.sin()
        k = k * freqs.cos() + rot_half(k) * freqs.sin()
        attn = F.scaled_dot_product_attention(q, k, v)
        out = attn.permute(0, 2, 3, 1, 4).reshape(b, windows * self.window, c)
        out = self.to_out(out)
        return out.transpose(1, 2) + residual


class VectorQuantizerT(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim, stride=1):
        super().__init__()
        self.stride = stride
        self.in_proj = ConvT(input_dim, codebook_dim, 1)
        self.out_proj = ConvT(codebook_dim, input_dim, 1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def decode_latents(self, latents):
        b, d, t = latents.shape
        enc = latents.transpose(1, 2).reshape(-1, d)
        cb = self.codebook.weight
        dist = (enc.pow(2).sum(1, keepdim=True)
                + cb.pow(2).sum(1, keepdim=True).t()
                - 2 * enc @ cb.t())
        idx = dist.argmin(1).reshape(b, t)
        return self.codebook(idx).transpose(1, 2), idx

    def forward(self, z):
        if self.stride > 1:
            z = F.avg_pool1d(z, self.stride, self.stride)
        z_e = self.in_proj(z)
        z_q, idx = self.decode_latents(z_e)
        z_q = self.out_proj(z_q)
        if self.stride > 1:
            z_q = z_q.repeat_interleave(self.stride, dim=-1)
        return z_q, idx


class SNACOracle(nn.Module):
    """Full SNAC round-trip oracle with folded weights, noise disabled."""

    def __init__(self, cfg):
        super().__init__()
        latent = cfg.encoder_dim * (1 << len(cfg.encoder_rates))

        layers = [ConvT(1, cfg.encoder_dim, 7, padding=3)]
        dim = cfg.encoder_dim
        for stride in cfg.encoder_rates:
            dim *= 2
            groups = dim // 2 if cfg.depthwise else 1
            layers.append(EncoderBlockT(dim, stride, groups))
        if cfg.attn_window_size:
            layers.append(LocalMHAT(dim, cfg.attn_window_size))
        layers.append(ConvT(dim, dim, 7, padding=3, groups=dim if cfg.depthwise else 1))
        self.encoder = nn.Sequential(*layers)

        self.quantizers = nn.ModuleList([
            VectorQuantizerT(latent, cfg.codebook_size, cfg.codebook_dim, s)
            for s in cfg.vq_strides
        ])

        dec = []
        if cfg.depthwise:
            dec += [ConvT(latent, latent, 7, padding=3, groups=latent),
                    ConvT(latent, cfg.decoder_dim, 1)]
        else:
            dec.append(ConvT(latent, cfg.decoder_dim, 7, padding=3))
        if cfg.attn_window_size:
            dec.append(LocalMHAT(cfg.decoder_dim, cfg.attn_window_size))
        out_dim = cfg.decoder_dim
        for i, rate in enumerate(cfg.decoder_rates):
            in_dim = cfg.decoder_dim // (1 << i)
            out_dim = cfg.decoder_dim // (1 << (i + 1))
            groups = out_dim if cfg.depthwise else 1
            blk = [SnakeT(in_dim),
                   ConvTransposeT(in_dim, out_dim, 2 * rate, stride=rate,
                                  padding=math.ceil(rate / 2), output_padding=rate % 2)]
            # noise disabled (deterministic oracle)
            blk += [ResidualUnitT(out_dim, d, groups=groups) for d in (1, 3, 9)]
            dec.append(nn.Sequential(*blk))
        dec += [SnakeT(out_dim), ConvT(out_dim, 1, 7, padding=3), nn.Tanh()]
        self.decoder = nn.Sequential(*dec)

    @torch.no_grad()
    def forward(self, audio):
        z = self.encoder(audio)
        z_q = torch.zeros_like(z)
        residual = z
        codes = []
        for vq in self.quantizers:
            q, idx = vq(residual)
            residual = residual - q
            z_q = z_q + q
            codes.append(idx)
        return self.decoder(z_q), codes


class DACVectorQuantizerT(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim):
        super().__init__()
        self.in_proj = ConvT(input_dim, codebook_dim, 1)
        self.out_proj = ConvT(codebook_dim, input_dim, 1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def forward(self, z):
        z_e = self.in_proj(z)
        b, d, t = z_e.shape
        enc = z_e.transpose(1, 2).reshape(-1, d)
        cb = self.codebook.weight
        dist = (enc.pow(2).sum(1, keepdim=True)
                + cb.pow(2).sum(1, keepdim=True).t()
                - 2 * enc @ cb.t())
        idx = dist.argmin(1).reshape(b, t)
        z_q = self.codebook(idx).transpose(1, 2)
        commit = F.mse_loss(z_e, z_q.detach(), reduction="none").mean([1, 2])
        cb_loss = F.mse_loss(z_q, z_e.detach(), reduction="none").mean([1, 2])
        return self.out_proj(z_q), commit, cb_loss, idx, z_e


class DACOracle(nn.Module):
    """DAC round-trip oracle (folded weights), reference Models/DAC.cs semantics."""

    def __init__(self, cfg):
        super().__init__()
        latent = cfg.latent_dim or cfg.encoder_dim * (1 << len(cfg.encoder_rates))

        layers = [ConvT(1, cfg.encoder_dim, 7, padding=3)]
        dim = cfg.encoder_dim
        for stride in cfg.encoder_rates:
            dim *= 2
            layers.append(EncoderBlockT(dim, stride))
        layers += [SnakeT(dim), ConvT(dim, latent, 3, padding=1)]
        self.encoder = nn.Sequential(*layers)

        self.quantizers = nn.ModuleList([
            DACVectorQuantizerT(latent, cfg.codebook_size, cfg.codebook_dim)
            for _ in range(cfg.n_codebooks)
        ])

        dec = [ConvT(latent, cfg.decoder_dim, 7, padding=3)]
        out_dim = cfg.decoder_dim
        for i, rate in enumerate(cfg.decoder_rates):
            in_dim = cfg.decoder_dim // (1 << i)
            out_dim = cfg.decoder_dim // (1 << (i + 1))
            dec.append(nn.Sequential(
                SnakeT(in_dim),
                ConvTransposeT(in_dim, out_dim, 2 * rate, stride=rate,
                               padding=math.ceil(rate / 2)),
                ResidualUnitT(out_dim, 1),
                ResidualUnitT(out_dim, 3),
                ResidualUnitT(out_dim, 9),
            ))
        dec += [SnakeT(out_dim), ConvT(out_dim, 1, 7, padding=3), nn.Tanh()]
        self.decoder = nn.Sequential(*dec)

    @torch.no_grad()
    def forward(self, audio):
        z = self.encoder(audio)
        z_q = torch.zeros_like(z)
        residual = z
        codes = []
        for vq in self.quantizers:
            q, _, _, idx, _ = vq(residual)
            residual = residual - q
            z_q = z_q + q
            codes.append(idx)
        return self.decoder(z_q), torch.stack(codes, 1)
