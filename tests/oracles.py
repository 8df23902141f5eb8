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


class NoiseBlockT(nn.Module):
    """Decoder noise injection (state-dict structure only: at eval the noise
    term has zero mean, and the deterministic oracles never sample it)."""

    def __init__(self, dim):
        super().__init__()
        self.linear = ConvT(dim, dim, 1, bias=False)

    def forward(self, x):
        return x  # eval-time identity (E[noise] = 0)


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
        # upstream SNAC/DAC ViT-VQGAN lookup: L2-normalize encodings and
        # codebook before the distance (the C# reference comments but omits
        # this, VectorQuantizer.cs:125-134 — PARITY.md "Known divergences");
        # the selected index still embeds to the UN-normalized entry
        enc_n, cb_n = F.normalize(enc), F.normalize(cb)
        dist = (enc_n.pow(2).sum(1, keepdim=True)
                + cb_n.pow(2).sum(1, keepdim=True).t()
                - 2 * enc_n @ cb_n.t())
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
            if getattr(cfg, "noise", False):
                # forward is identity (eval-time noise has zero mean); only
                # the state-dict structure matters for key-set fixtures
                blk.append(NoiseBlockT(out_dim))
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
        # normalized ViT-VQGAN lookup (see VectorQuantizerT.decode_latents)
        enc_n, cb_n = F.normalize(enc), F.normalize(cb)
        dist = (enc_n.pow(2).sum(1, keepdim=True)
                + cb_n.pow(2).sum(1, keepdim=True).t()
                - 2 * enc_n @ cb_n.t())
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


# ---------------------------------------------------------------------------
# Encodec oracle
# ---------------------------------------------------------------------------

class SConv1dT(nn.Module):
    """Stream-aware conv with the reference's causal/asymmetric padding."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, causal=False,
                 pad_mode="reflect", group_norm=False):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, stride, 0, dilation)
        self.k, self.stride, self.dilation = k, stride, dilation
        self.causal, self.pad_mode = causal, pad_mode
        self.norm = nn.GroupNorm(1, cout) if group_norm else None

    @staticmethod
    def _extra(length, eff_k, stride, pad_total):
        n_frames = (length - eff_k + pad_total) / stride + 1
        ideal = (math.ceil(n_frames) - 1) * stride + (eff_k - pad_total)
        return ideal - length

    def _pad(self, x, left, right):
        mode = "constant" if self.pad_mode == "zero" else self.pad_mode
        if mode == "reflect" and x.shape[-1] <= max(left, right):
            extra = max(left, right) - x.shape[-1] + 1
            x = F.pad(x, (0, extra))
        return F.pad(x, (left, right), mode=mode)

    def forward(self, x):
        eff_k = (self.k - 1) * self.dilation + 1
        pad_total = eff_k - self.stride
        extra = self._extra(x.shape[-1], eff_k, self.stride, pad_total)
        if self.causal:
            x = self._pad(x, pad_total, extra)
        else:
            right = pad_total // 2
            x = self._pad(x, pad_total - right, right + extra)
        out = self.conv(x)
        return self.norm(out) if self.norm is not None else out


class SConvTr1dT(nn.Module):
    def __init__(self, cin, cout, k, stride=1, causal=False,
                 trim_right_ratio=1.0, group_norm=False):
        super().__init__()
        self.conv = nn.ConvTranspose1d(cin, cout, k, stride)
        self.pad_total = k - stride
        self.causal = causal
        self.trim_right_ratio = trim_right_ratio
        self.norm = nn.GroupNorm(1, cout) if group_norm else None

    def forward(self, x):
        y = self.conv(x)
        if self.norm is not None:
            y = self.norm(y)
        if self.causal:
            right = math.ceil(self.pad_total * self.trim_right_ratio)
            left = self.pad_total - right
        else:
            right = self.pad_total // 2
            left = self.pad_total - right
        return y[..., left: y.shape[-1] - right]


class SEANetResnetBlockT(nn.Module):
    def __init__(self, dim, k_res=3, dilation=1, causal=False, compress=2,
                 group_norm=False):
        super().__init__()
        hidden = dim // compress
        self.block = nn.Sequential(
            nn.ELU(), SConv1dT(dim, hidden, k_res, dilation=dilation,
                               causal=causal, group_norm=group_norm),
            nn.ELU(), SConv1dT(hidden, dim, 1, causal=causal, group_norm=group_norm),
        )
        self.shortcut = SConv1dT(dim, dim, 1, causal=causal, group_norm=group_norm)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SLSTMT(nn.Module):
    def __init__(self, dim, layers=2):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, layers)

    def forward(self, x):
        perm = x.permute(2, 0, 1)
        out, _ = self.lstm(perm)
        return (out + perm).permute(1, 2, 0)


class _CodebookT(nn.Module):
    def __init__(self, size, dim):
        super().__init__()
        self.embed = nn.Parameter(torch.randn(size, dim))


class _VQT(nn.Module):
    def __init__(self, size, dim):
        super().__init__()
        self.codebook = _CodebookT(size, dim)


class _QuantT(nn.Module):
    def __init__(self, n_q, size, dim):
        super().__init__()
        self.layers = nn.ModuleList([_VQT(size, dim) for _ in range(n_q)])


class EncodecOracle(nn.Module):
    """SEANet + EMA-codebook RVQ round-trip oracle (inference path)."""

    def __init__(self, cfg, n_q):
        super().__init__()
        causal = cfg.use_causal_conv
        gn = cfg.norm_type == "time_group_norm"
        ratios = list(cfg.upsampling_ratios)
        nf = cfg.num_filters

        mult, idx, enc = 1, 0, []
        enc.append(SConv1dT(cfg.channels, nf, cfg.kernel_size, causal=causal,
                            group_norm=gn))
        for ratio in reversed(ratios):
            for j in range(cfg.num_residual_layers):
                enc.append(SEANetResnetBlockT(mult * nf, cfg.residual_kernel_size,
                                              cfg.dilation_growth_rate ** j,
                                              causal, cfg.compress, gn))
            enc.append(nn.ELU())
            enc.append(SConv1dT(mult * nf, mult * nf * 2, ratio * 2, stride=ratio,
                                causal=causal, group_norm=gn))
            mult *= 2
        enc.append(SLSTMT(mult * nf, cfg.num_lstm_layers))
        enc.append(nn.ELU())
        enc.append(SConv1dT(mult * nf, cfg.hidden_size, cfg.last_kernel_size,
                            causal=causal, group_norm=gn))
        self.encoder = nn.Sequential(*enc)

        self.quantizer = _QuantT(n_q, cfg.codebook_size, cfg.codebook_dim)

        dec = [SConv1dT(cfg.hidden_size, mult * nf, cfg.kernel_size, causal=causal,
                        group_norm=gn),
               SLSTMT(mult * nf, cfg.num_lstm_layers)]
        for ratio in ratios:
            dec.append(nn.ELU())
            dec.append(SConvTr1dT(mult * nf, mult * nf // 2, ratio * 2, stride=ratio,
                                  causal=causal, trim_right_ratio=cfg.trim_right_ratio,
                                  group_norm=gn))
            for j in range(cfg.num_residual_layers):
                dec.append(SEANetResnetBlockT(mult * nf // 2, cfg.residual_kernel_size,
                                              cfg.dilation_growth_rate ** j,
                                              causal, cfg.compress, gn))
            mult //= 2
        dec.append(nn.ELU())
        dec.append(SConv1dT(nf, cfg.channels, cfg.last_kernel_size, causal=causal,
                            group_norm=gn))
        self.decoder = nn.Sequential(*dec)

    @torch.no_grad()
    def forward(self, x):
        emb = self.encoder(x)                       # [B, D, T]
        residual = emb.transpose(1, 2)              # [B, T, D]
        codes, quantized = [], torch.zeros_like(residual)
        for vq in self.quantizer.layers:
            cb = vq.codebook.embed
            flat = residual.reshape(-1, residual.shape[-1])
            dist = (flat.pow(2).sum(1, keepdim=True)
                    + cb.pow(2).sum(1, keepdim=True).t()
                    - 2 * flat @ cb.t())
            idx = dist.argmin(-1).reshape(residual.shape[:2])
            q = cb[idx]
            residual = residual - q
            quantized = quantized + q
            codes.append(idx)
        out = self.decoder(quantized.transpose(1, 2))
        return out, torch.stack(codes, 1)


# ---------------------------------------------------------------------------
# Encodec language-model oracle (original-encodec trained-graph semantics)
# ---------------------------------------------------------------------------

def _lm_sin_embedding(positions, dim, max_period=10000.0):
    half = dim // 2
    adim = torch.arange(half, dtype=torch.float32).view(1, 1, -1)
    phase = positions.float() / (max_period ** (adim / (half - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)


class _LMLayerT(nn.Module):
    """Post-norm torch TransformerEncoderLayer with canonical
    nn.MultiheadAttention (the module the trained encodec LM used)."""

    def __init__(self, d, heads, hidden):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.linear1 = nn.Linear(d, hidden)
        self.linear2 = nn.Linear(hidden, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, x, attn_mask):
        a, _ = self.self_attn(x, x, x, attn_mask=attn_mask,
                              need_weights=False)
        x = self.norm1(x + a)
        h = self.linear2(F.gelu(self.linear1(x)))
        return self.norm2(x + h)


class _LMTransformerT(nn.Module):
    def __init__(self, d, heads, hidden, n_layers, norm_in):
        super().__init__()
        self.norm_in = nn.LayerNorm(d) if norm_in else None
        self.layers = nn.ModuleList(
            [_LMLayerT(d, heads, hidden) for _ in range(n_layers)])


class EncodecLMOracle(nn.Module):
    """Full-sequence LM forward with the banded past-context mask
    (independent torch expression of EncodecLanguageModel.cs:259-300 /
    StreamingTransformerEncoderLayer.cs:179-220, using the TRAINED graph:
    each layer consumes the previous layer's OUTPUT)."""

    def __init__(self, card, n_q, d, heads, hidden, n_layers, past_context):
        super().__init__()
        self.past_context = past_context
        self.emb = nn.ModuleList([nn.Embedding(card + 1, d) for _ in range(n_q)])
        self.transformer = _LMTransformerT(d, heads, hidden, n_layers, True)
        self.linears = nn.ModuleList([nn.Linear(d, card) for _ in range(n_q)])

    @torch.no_grad()
    def forward(self, indices):
        """indices: [B, K, T] (+1-shifted codes) -> probas [B, card, K, T]."""
        b, k, t = indices.shape
        x = sum(self.emb[i](indices[:, i]) for i in range(k))   # [B, T, D]
        if self.transformer.norm_in is not None:
            x = self.transformer.norm_in(x)
        positions = torch.arange(t).view(1, -1, 1)
        x = x + _lm_sin_embedding(positions, x.shape[-1])
        delta = torch.arange(t).view(-1, 1) - torch.arange(t).view(1, -1)
        attn_mask = ~((delta >= 0) & (delta <= self.past_context))  # True=masked
        for layer in self.transformer.layers:
            x = layer(x, attn_mask)
        outs = [torch.softmax(lin(x), dim=-1) for lin in self.linears]
        return torch.stack(outs, dim=1).permute(0, 3, 1, 2)     # [B,card,K,T]
