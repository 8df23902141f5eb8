"""SNAC — Multi-Scale Neural Audio Codec, TPU-native.

Rebuild of the reference's SNAC stack
(/root/reference/NeuralCodecs.Torch/Models/SNAC.cs:19-309 and
 Modules/SNAC/{Encoder,EncoderBlock,Decoder,DecoderBlock,VectorQuantizer,
 ResidualVectorQuantizer}.cs). Topology:

  pad → Encoder (WNConv1d k7 → 4×[3 dilated ResUnits + Snake + strided conv]
        → optional LocalMHA → depthwise WNConv1d k7)
      → multi-scale RVQ (per-stage stride pooling, L2-argmin codebooks)
      → Decoder (depthwise conv pair → optional LocalMHA →
        N×[Snake → ConvTranspose → Noise → 3 ResUnits] → Snake → conv → tanh)
      → trim to input length.

TPU-first choices: channels-last activations, weight-norm folded at import,
the whole round-trip is ONE jitted function (the reference crosses the
host↔device boundary per call, Models/SNAC.cs:269-280), and the codebook
search runs the fused Pallas argmin kernel on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.models.layers import (
    LocalMHA,
    NoiseBlock,
    Params,
    ResidualUnit,
    Sequential,
    Snake1d,
    StateDict,
    Tanh,
    WNConv1d,
    WNConvTranspose1d,
)
from neuralcodecs_tpu.models.snac.config import SNACConfig
from neuralcodecs_tpu.ops.chunking import (
    conv_stack_receptive_field,
    decoder_receptive_field_frames,
    plan_chunks,
    split_chunks,
    stitch_chunks,
)
from neuralcodecs_tpu.ops.vq import codebook_lookup, cosine_argmin_codes


class _EncoderBlock(Sequential):
    """3×ResidualUnit(dil 1/3/9) + Snake + strided conv (EncoderBlock.cs:27-55)."""

    def __init__(self, prefix: str, out_dim: int, stride: int, groups: int):
        in_dim = out_dim // 2
        super().__init__([
            ResidualUnit(f"{prefix}.block.0", in_dim, dilation=1, groups=groups),
            ResidualUnit(f"{prefix}.block.1", in_dim, dilation=3, groups=groups),
            ResidualUnit(f"{prefix}.block.2", in_dim, dilation=9, groups=groups),
            Snake1d(f"{prefix}.block.3", in_dim),
            WNConv1d(f"{prefix}.block.4", in_dim, out_dim, 2 * stride,
                     stride=stride, padding=-(-stride // 2)),
        ])


class _DecoderBlock(Sequential):
    """Snake → ConvTranspose(k=2s, outPad=s%2) → Noise? → 3×ResUnit
    (DecoderBlock.cs:29-70)."""

    def __init__(self, prefix: str, in_dim: int, out_dim: int, stride: int,
                 noise: bool, groups: int):
        layers: list = [
            Snake1d(f"{prefix}.block.0", in_dim),
            WNConvTranspose1d(f"{prefix}.block.1", in_dim, out_dim, 2 * stride,
                              stride=stride, padding=-(-stride // 2),
                              output_padding=stride % 2),
        ]
        idx = 2
        self.noise_block: NoiseBlock | None = None
        if noise:
            self.noise_block = NoiseBlock(f"{prefix}.block.{idx}", out_dim)
            layers.append(self.noise_block)
            idx += 1
        for dilation in (1, 3, 9):
            layers.append(ResidualUnit(f"{prefix}.block.{idx}", out_dim,
                                       dilation=dilation, groups=groups))
            idx += 1
        super().__init__(layers)

    def __call__(self, params: Params, x: jax.Array,
                 rng: jax.Array | None = None) -> jax.Array:
        for layer in self.layers:
            if layer is self.noise_block:
                x = layer(params, x, rng)
            else:
                x = layer(params, x)
        return x


class _VectorQuantizer:
    """One RVQ stage: stride pool → in_proj → argmin codebook → out_proj →
    repeat_interleave (VectorQuantizer.cs:82-157)."""

    def __init__(self, prefix: str, input_dim: int, codebook_size: int,
                 codebook_dim: int, stride: int):
        self.prefix = prefix
        self.stride = stride
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.in_proj = WNConv1d(f"{prefix}.in_proj", input_dim, codebook_dim, 1)
        self.out_proj = WNConv1d(f"{prefix}.out_proj", codebook_dim, input_dim, 1)

    def init(self, key: jax.Array, params: Params) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        self.in_proj.init(k1, params)
        self.out_proj.init(k2, params)
        params[f"{self.prefix}.codebook.weight"] = jax.random.normal(
            k3, (self.codebook_size, self.codebook_dim), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        self.in_proj.convert(sd, params)
        self.out_proj.convert(sd, params)
        params[f"{self.prefix}.codebook.weight"] = jnp.asarray(
            sd[f"{self.prefix}.codebook.weight"])

    def forward(self, params: Params, z: jax.Array) -> tuple[jax.Array, jax.Array]:
        """z: [B, T, C] residual at full frame rate -> (z_q [B,T,C], codes [B,T/s])."""
        if self.stride > 1:
            b, t, c = z.shape
            z = z.reshape(b, t // self.stride, self.stride, c).mean(axis=2)
        z_e = self.in_proj(params, z).astype(jnp.float32)
        codebook = params[f"{self.prefix}.codebook.weight"]
        # upstream SNAC's ViT-VQGAN normalized lookup (the C# reference
        # comments but omits the normalization, VectorQuantizer.cs:125-134;
        # PARITY.md "Known divergences")
        codes = cosine_argmin_codes(z_e, codebook)
        z_q = codebook_lookup(codes, codebook).astype(z_e.dtype)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
        z_q = self.out_proj(params, z_q)
        if self.stride > 1:
            z_q = jnp.repeat(z_q, self.stride, axis=1)
        return z_q, codes

    def decode_code(self, params: Params, codes: jax.Array) -> jax.Array:
        """codes [B, T/s] -> z_q contribution [B, T, C] (FromCodes path)."""
        codebook = params[f"{self.prefix}.codebook.weight"]
        z_p = codebook_lookup(codes, codebook)
        z_q = self.out_proj(params, z_p)
        if self.stride > 1:
            z_q = jnp.repeat(z_q, self.stride, axis=1)
        return z_q


class SNAC:
    """Public SNAC codec. API mirrors the reference model class
    (Models/SNAC.cs: forward/Encode/Decode/ProcessAudio)."""

    def __init__(self, config: SNACConfig | None = None, *,
                 params: Params | None = None, seed: int = 0,
                 compute_dtype=None, decoder_dtype=None):
        self.config = config or SNACConfig()
        # bf16 compute halves HBM traffic (~2x speed) at ~47 dB SNR vs the
        # f32 path; f32 is the default for the >60 dB parity gate.
        # decoder_dtype=bf16 with compute_dtype=f32 is the mixed mode: the
        # encoder + RVQ stay f32 (code indices bit-exact) and only the
        # HBM-bound decoder runs bf16.
        self.compute_dtype = compute_dtype or jnp.float32
        self.decoder_dtype = decoder_dtype or self.compute_dtype
        cfg = self.config
        self.hop_length = cfg.hop_length
        latent = cfg.resolved_latent_dim

        # ---- encoder (Encoder.cs:26-69) ----
        enc_layers: list = [WNConv1d("encoder.block.0", 1, cfg.encoder_dim, 7, padding=3)]
        dim = cfg.encoder_dim
        idx = 1
        for stride in cfg.encoder_rates:
            dim *= 2
            groups = dim // 2 if cfg.depthwise else 1
            enc_layers.append(_EncoderBlock(f"encoder.block.{idx}", dim, stride, groups))
            idx += 1
        if cfg.attn_window_size:
            enc_layers.append(LocalMHA(f"encoder.block.{idx}", dim,
                                       window_size=cfg.attn_window_size))
            idx += 1
        final_groups = dim if cfg.depthwise else 1
        enc_layers.append(WNConv1d(f"encoder.block.{idx}", dim, dim, 7,
                                   padding=3, groups=final_groups))
        self.encoder = Sequential(enc_layers)

        # ---- quantizer (ResidualVectorQuantizer.cs:69-135) ----
        self.quantizers = [
            _VectorQuantizer(f"quantizer.quantizers.{i}", latent,
                             cfg.codebook_size, cfg.codebook_dim, stride)
            for i, stride in enumerate(cfg.vq_strides)
        ]

        # ---- decoder (Decoder.cs:31-86) ----
        dec_layers: list = []
        idx = 0
        if cfg.depthwise:
            dec_layers.append(WNConv1d(f"decoder.model.{idx}", latent, latent, 7,
                                       padding=3, groups=latent))
            idx += 1
            dec_layers.append(WNConv1d(f"decoder.model.{idx}", latent, cfg.decoder_dim, 1))
            idx += 1
        else:
            dec_layers.append(WNConv1d(f"decoder.model.{idx}", latent, cfg.decoder_dim, 7,
                                       padding=3))
            idx += 1
        if cfg.attn_window_size:
            dec_layers.append(LocalMHA(f"decoder.model.{idx}", cfg.decoder_dim,
                                       window_size=cfg.attn_window_size))
            idx += 1
        out_dim = cfg.decoder_dim
        self.decoder_blocks: list[_DecoderBlock] = []
        for i, rate in enumerate(cfg.decoder_rates):
            in_dim = cfg.decoder_dim // (1 << i)
            out_dim = cfg.decoder_dim // (1 << (i + 1))
            groups = out_dim if cfg.depthwise else 1
            block = _DecoderBlock(f"decoder.model.{idx}", in_dim, out_dim, rate,
                                  cfg.noise, groups)
            self.decoder_blocks.append(block)
            dec_layers.append(block)
            idx += 1
        dec_layers.append(Snake1d(f"decoder.model.{idx}", out_dim))
        idx += 1
        dec_layers.append(WNConv1d(f"decoder.model.{idx}", out_dim, 1, 7, padding=3))
        idx += 1
        dec_layers.append(Tanh())
        self.decoder = Sequential(dec_layers)

        self._modules = [self.encoder, *self.quantizers, self.decoder]
        # staged chunked execution (ops/chunking.py, mirrors DAC): the long-T
        # narrow-C early encoder / decoder tail run chunk-batched with small
        # per-stage halos; the deep stages (incl. LocalMHA) stay unchunked so
        # attention windows and the RVQ see the exact full stream.
        n_eb = max(len(cfg.encoder_rates) - 1, 0)
        self._enc_early = Sequential(enc_layers[: 1 + n_eb])
        self._enc_late = Sequential(enc_layers[1 + n_eb:])
        self._enc_early_ratio = int(np.prod(cfg.encoder_rates[:n_eb])) if n_eb else 1
        rf_early = conv_stack_receptive_field(
            7, list(cfg.encoder_rates[:n_eb]), last_kernel=None)
        self._enc_early_halo = -(-rf_early // self._enc_early_ratio) + 2

        first_block_idx = next(
            (i for i, l in enumerate(dec_layers) if isinstance(l, _DecoderBlock)),
            len(dec_layers))
        self._dec_head_layers = dec_layers[: first_block_idx + 1]
        self._dec_tail_layers = dec_layers[first_block_idx + 1:]
        self._dec_head_ratio = cfg.decoder_rates[0] if cfg.decoder_rates else 1
        self._dec_tail_ratio = self.hop_length // self._dec_head_ratio
        self._dec_tail_halo = decoder_receptive_field_frames(
            list(cfg.decoder_rates[1:]), include_input_conv=False)
        self.params: Params = params if params is not None else self.init_params(seed)

    # ------------------------------------------------------------------ params

    def init_params(self, seed: int = 0) -> Params:
        params: Params = {}
        keys = jax.random.split(jax.random.key(seed), len(self._modules))
        for module, key in zip(self._modules, keys):
            module.init(key, params)
        return params

    def load_state_dict(self, sd: StateDict) -> "SNAC":
        """Import a folded torch state dict (hubertsiuzdak/snac naming)."""
        params: Params = {}
        for module in self._modules:
            module.convert(sd, params)
        self.params = params
        return self

    # ----------------------------------------------------------------- compute

    def _pad_length(self, length: int) -> int:
        pad_to = self.config.pad_to
        return -(-length // pad_to) * pad_to

    def _rvq(self, params: Params, z: jax.Array):
        """Residual VQ sweep over all stages: (z_q, codes list). Callers
        that only need the codes rely on jit DCE-ing the unused z_q sum."""
        residual = z.astype(jnp.float32)
        z_q = jnp.zeros_like(residual)
        codes = []
        for vq in self.quantizers:
            z_q_i, codes_i = vq.forward(params, residual)
            residual = residual - z_q_i
            z_q = z_q + z_q_i
            codes.append(codes_i)
        return z_q, codes

    def _run_layers(self, layers, params: Params, x: jax.Array,
                    rng: jax.Array | None):
        """Run decoder-style layers, splitting the noise rng per block;
        returns (x, remaining rng) so staged callers can thread it."""
        for layer in layers:
            if isinstance(layer, _DecoderBlock):
                sub = None
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                x = layer(params, x, sub)
            else:
                x = layer(params, x)
        return x, rng

    def _encode_fn(self, params: Params, audio: jax.Array) -> list[jax.Array]:
        """audio: [B, T, 1] already padded -> list of code arrays."""
        z = self.encoder(params, audio.astype(self.compute_dtype))
        return self._rvq(params, z)[1]

    def _decode_fn(self, params: Params, codes: Sequence[jax.Array],
                   rng: jax.Array | None) -> jax.Array:
        z_q = self.quantizers[0].decode_code(params, codes[0])
        for vq, c in zip(self.quantizers[1:], codes[1:]):
            z_q = z_q + vq.decode_code(params, c)
        return self._run_decoder(params, z_q, rng).astype(jnp.float32)

    def _run_decoder(self, params: Params, z_q: jax.Array,
                     rng: jax.Array | None) -> jax.Array:
        x, _ = self._run_layers(self.decoder.layers, params,
                                z_q.astype(self.decoder_dtype), rng)
        return x

    def _forward_fn(self, params: Params, audio: jax.Array,
                    rng: jax.Array | None) -> tuple[jax.Array, list[jax.Array]]:
        """Full round-trip on padded [B, T, 1] audio (Models/SNAC.cs:91-106)."""
        z = self.encoder(params, audio.astype(self.compute_dtype))
        z_q, codes = self._rvq(params, z)
        audio_hat = self._run_decoder(params, z_q, rng).astype(jnp.float32)
        return audio_hat, codes

    # ------------------------------------------------- chunked-batch execution

    def _auto_chunks(self, samples: int) -> int:
        """Largest chunk count (<=8) whose overlap windows still pay off."""
        for n in (8, 4, 2):
            enc_ok = plan_chunks(samples // self._enc_early_ratio,
                                 n, self._enc_early_halo) is not None
            dec_ok = plan_chunks(
                samples // self.hop_length * self._dec_head_ratio,
                n, self._dec_tail_halo) is not None
            if enc_ok and dec_ok:
                return n
        return 1

    def _encoder_staged(self, params: Params, audio: jax.Array,
                        n_chunks: int) -> jax.Array:
        """Encoder with the long-T early stages chunk-batched; exact. The
        late stage (last block + LocalMHA + depthwise conv) runs on the full
        stitched stream, so attention windows are identical to unchunked."""
        f_early = audio.shape[1] // self._enc_early_ratio
        plan = plan_chunks(f_early, n_chunks, self._enc_early_halo)
        x = audio.astype(self.compute_dtype)
        if plan is None:
            return self.encoder(params, x)
        chunks = split_chunks(x, plan, scale=self._enc_early_ratio)
        h = self._enc_early(params, chunks)
        return self._enc_late(params, stitch_chunks(h, plan))

    def _run_decoder_staged(self, params: Params, z_q: jax.Array,
                            rng: jax.Array | None, n_chunks: int) -> jax.Array:
        """Decoder head (convs + LocalMHA + first block) unchunked, narrow
        long-T tail chunk-batched. With noise enabled the chunked tail draws
        a different (still i.i.d.) noise pattern than unchunked."""
        x, rng = self._run_layers(self._dec_head_layers, params,
                                  z_q.astype(self.decoder_dtype), rng)
        plan = plan_chunks(x.shape[1], n_chunks, self._dec_tail_halo)
        if plan is None:
            x, _ = self._run_layers(self._dec_tail_layers, params, x, rng)
            return x
        x, _ = self._run_layers(self._dec_tail_layers, params,
                                split_chunks(x, plan), rng)
        return stitch_chunks(x, plan, scale=self._dec_tail_ratio)

    def _forward_chunked_fn(self, params: Params, audio: jax.Array,
                            rng: jax.Array | None, n_chunks: int):
        if n_chunks <= 1:
            return self._forward_fn(params, audio, rng)
        z = self._encoder_staged(params, audio, n_chunks)
        z_q, codes = self._rvq(params, z)
        audio_hat = self._run_decoder_staged(params, z_q, rng,
                                             n_chunks).astype(jnp.float32)
        return audio_hat, codes

    def _encode_chunked_fn(self, params: Params, audio: jax.Array,
                           n_chunks: int) -> list[jax.Array]:
        if n_chunks <= 1:
            return self._encode_fn(params, audio)
        z = self._encoder_staged(params, audio, n_chunks)
        return self._rvq(params, z)[1]

    def _decode_chunked_fn(self, params: Params, codes: Sequence[jax.Array],
                           rng: jax.Array | None, n_chunks: int) -> jax.Array:
        z_q = self.quantizers[0].decode_code(params, codes[0])
        for vq, c in zip(self.quantizers[1:], codes[1:]):
            z_q = z_q + vq.decode_code(params, c)
        return self._run_decoder_staged(params, z_q, rng,
                                        n_chunks).astype(jnp.float32)

    # ------------------------------------------------------------- public API

    @functools.cached_property
    def _jit_forward(self):
        return jax.jit(self._forward_chunked_fn, static_argnames=("n_chunks",))

    @functools.cached_property
    def _jit_encode(self):
        return jax.jit(self._encode_chunked_fn, static_argnames=("n_chunks",))

    @functools.cached_property
    def _jit_decode(self):
        return jax.jit(self._decode_chunked_fn, static_argnames=("n_chunks",))

    def _prepare(self, audio: np.ndarray | jax.Array) -> tuple[jax.Array, int]:
        """[T] | [B, T] | [B, 1, T] -> padded [B, T', 1] + original length."""
        a = jnp.asarray(audio, dtype=jnp.float32)
        if a.ndim == 1:
            a = a[None, :]
        elif a.ndim == 3:  # reference [B, C, T] layout
            a = a[:, 0, :]
        length = a.shape[-1]
        padded = self._pad_length(length)
        a = jnp.pad(a, ((0, 0), (0, padded - length)))
        return a[..., None], length

    def _noise_rng(self, rng: jax.Array | None) -> jax.Array | None:
        if not self.config.noise:
            return None
        return rng if rng is not None else jax.random.key(0)

    def forward(self, audio, rng: jax.Array | None = None):
        """Round-trip: returns (audio_hat [B, T], codes list)."""
        a, length = self._prepare(audio)
        n = self._auto_chunks(a.shape[1])
        audio_hat, codes = self._jit_forward(self.params, a,
                                             self._noise_rng(rng), n)
        return audio_hat[:, :length, 0], codes

    def encode(self, audio) -> list[jax.Array]:
        """Audio -> list of per-stage code index arrays [B, frames_i]."""
        a, _ = self._prepare(audio)
        n = self._auto_chunks(a.shape[1])
        return self._jit_encode(self.params, a, n)

    def decode(self, codes: Sequence, rng: jax.Array | None = None) -> jax.Array:
        codes = [jnp.asarray(c, dtype=jnp.int32) for c in codes]
        codes = [c[None, :] if c.ndim == 1 else c for c in codes]
        samples = codes[-1].shape[-1] * self.hop_length  # stride-1 stage is last
        n = self._auto_chunks(samples)
        audio = self._jit_decode(self.params, codes, self._noise_rng(rng), n)
        return audio[:, :, 0]

    def process_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Resample-if-needed + round-trip; mirrors SNAC.ProcessAudio
        (Models/SNAC.cs:255-284)."""
        from neuralcodecs_tpu.diagnostics.context import get_diagnostics

        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.config.sample_rate:
            from neuralcodecs_tpu.dsp.resample import linear_resample

            audio = np.asarray(linear_resample(audio, sample_rate, self.config.sample_rate))
        diag = get_diagnostics()
        if diag.enabled:
            # staged execution so the context sees per-phase timings + codes
            # (DiagnosticsContext.cs:121-151 hand-wires the same way)
            diag.log_tensor("snac", "input", audio)
            with diag.track_scope("snac.encode"):
                codes = [np.asarray(c) for c in self.encode(audio)]
            for i, c in enumerate(codes):
                diag.log_tensor("snac.encode", f"codes_{i}", c)
            with diag.track_scope("snac.decode"):
                out = np.asarray(self.decode(codes))
            diag.log_tensor("snac.decode", "audio_out", out)
            return out[0, : audio.shape[-1]]
        out, _ = self.forward(audio)
        return np.asarray(out[0] if out.ndim == 2 else out)


def _factory(config: SNACConfig, **kwargs) -> SNAC:
    return SNAC(config, **kwargs)


registry.register("snac", _factory, SNACConfig)
