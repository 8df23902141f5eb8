"""DAC — Descript Audio Codec, TPU-native.

Rebuild of /root/reference/NeuralCodecs.Torch/Models/DAC.cs:20-389 and
Modules/DAC/{Encoder,EncoderBlock,Decoder,DecoderBlock,VectorQuantizer,
ResidualVectorQuantizer}.cs. Shares the conv block family with SNAC
(models/layers.py) — the reference keeps duplicate per-family copies.

Differences from SNAC: no attention, no VQ strides, no noise blocks, latent
projection conv (k3) at the encoder tail, 9-32 codebooks, and VQ
commitment/codebook losses + quantizer dropout for training
(ResidualVectorQuantizer.cs:105-206).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.models.dac.config import DACConfig
from neuralcodecs_tpu.models.layers import (
    Params,
    ResidualUnit,
    Sequential,
    Snake1d,
    StateDict,
    Tanh,
    WNConv1d,
    WNConvTranspose1d,
)
from neuralcodecs_tpu.ops.chunking import (
    conv_stack_receptive_field,
    decoder_receptive_field_frames,
    plan_chunks,
    split_chunks,
    stitch_chunks,
)
from neuralcodecs_tpu.ops.vq import codebook_lookup, cosine_argmin_codes


class _EncoderBlock(Sequential):
    def __init__(self, prefix: str, dim: int, stride: int):
        super().__init__([
            ResidualUnit(f"{prefix}.block.0", dim // 2, dilation=1),
            ResidualUnit(f"{prefix}.block.1", dim // 2, dilation=3),
            ResidualUnit(f"{prefix}.block.2", dim // 2, dilation=9),
            Snake1d(f"{prefix}.block.3", dim // 2),
            WNConv1d(f"{prefix}.block.4", dim // 2, dim, 2 * stride,
                     stride=stride, padding=-(-stride // 2)),
        ])


class _DecoderBlock(Sequential):
    def __init__(self, prefix: str, in_dim: int, out_dim: int, stride: int):
        super().__init__([
            Snake1d(f"{prefix}.block.0", in_dim),
            WNConvTranspose1d(f"{prefix}.block.1", in_dim, out_dim, 2 * stride,
                              stride=stride, padding=-(-stride // 2)),
            ResidualUnit(f"{prefix}.block.2", out_dim, dilation=1),
            ResidualUnit(f"{prefix}.block.3", out_dim, dilation=3),
            ResidualUnit(f"{prefix}.block.4", out_dim, dilation=9),
        ])


class _VectorQuantizer:
    """One RVQ stage with commitment/codebook losses
    (Modules/DAC/VectorQuantizer.cs:64-125)."""

    def __init__(self, prefix: str, input_dim: int, codebook_size: int, codebook_dim: int):
        self.prefix = prefix
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

    def forward(self, params: Params, z: jax.Array):
        """z: [B, T, C] -> (z_q, commit_loss [B], codebook_loss [B], codes, z_e)."""
        z_e = self.in_proj(params, z).astype(jnp.float32)
        codebook = params[f"{self.prefix}.codebook.weight"]
        # upstream descript-audio-codec's ViT-VQGAN normalized lookup,
        # validated bit-exact vs the independent transformers DacModel
        # (tests/test_cross_transformers.py). The C# reference comments
        # but omits the normalization (VectorQuantizer.cs:110-118);
        # PARITY.md "Known divergences".
        codes = cosine_argmin_codes(z_e, codebook)
        z_q = codebook_lookup(codes, codebook).astype(jnp.float32)
        commit = jnp.mean(
            (z_e - jax.lax.stop_gradient(z_q)) ** 2, axis=(1, 2))
        codebook_loss = jnp.mean(
            (z_q - jax.lax.stop_gradient(z_e)) ** 2, axis=(1, 2))
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        z_q = self.out_proj(params, z_q)
        return z_q, commit, codebook_loss, codes, z_e

    def decode_code(self, params: Params, codes: jax.Array) -> jax.Array:
        codebook = params[f"{self.prefix}.codebook.weight"]
        return self.out_proj(params, codebook_lookup(codes, codebook))


class DAC:
    """Public DAC codec (API mirrors Models/DAC.cs)."""

    def __init__(self, config: DACConfig | None = None, *,
                 params: Params | None = None, seed: int = 0,
                 compute_dtype=None, decoder_dtype=None):
        self.config = config or DACConfig()
        self.compute_dtype = compute_dtype or jnp.float32
        # mixed mode: f32 encoder+RVQ (bit-exact codes) with a bf16 decoder
        # (the decoder dominates HBM traffic at 44.1 kHz)
        self.decoder_dtype = decoder_dtype or self.compute_dtype
        cfg = self.config
        self.hop_length = cfg.hop_length
        latent = cfg.resolved_latent_dim

        enc_layers: list = [WNConv1d("encoder.block.0", 1, cfg.encoder_dim, 7, padding=3)]
        dim = cfg.encoder_dim
        idx = 1
        for stride in cfg.encoder_rates:
            dim *= 2
            enc_layers.append(_EncoderBlock(f"encoder.block.{idx}", dim, stride))
            idx += 1
        enc_layers.append(Snake1d(f"encoder.block.{idx}", dim))
        enc_layers.append(WNConv1d(f"encoder.block.{idx + 1}", dim, latent, 3, padding=1))
        self.encoder = Sequential(enc_layers)
        # staged split for chunked execution: the early stages carry the
        # long-T narrow-C work (chunk-worthy, small receptive field); the
        # last block onward runs at <=1/64 rate (cheap, deep RF — unchunked)
        n_early_blocks = max(len(cfg.encoder_rates) - 1, 0)
        self._enc_early = Sequential(enc_layers[: 1 + n_early_blocks])
        self._enc_late = Sequential(enc_layers[1 + n_early_blocks:])
        self._enc_early_ratio = int(np.prod(cfg.encoder_rates[:n_early_blocks])) \
            if n_early_blocks else 1

        self.quantizers = [
            _VectorQuantizer(f"quantizer.quantizers.{i}", latent,
                             cfg.codebook_size, cfg.codebook_dim)
            for i in range(cfg.n_codebooks)
        ]

        dec_layers: list = [WNConv1d("decoder.model.0", latent, cfg.decoder_dim, 7, padding=3)]
        out_dim = cfg.decoder_dim
        for i, rate in enumerate(cfg.decoder_rates):
            in_dim = cfg.decoder_dim // (1 << i)
            out_dim = cfg.decoder_dim // (1 << (i + 1))
            dec_layers.append(_DecoderBlock(f"decoder.model.{i + 1}", in_dim, out_dim, rate))
        n = len(cfg.decoder_rates)
        dec_layers.append(Snake1d(f"decoder.model.{n + 1}", out_dim))
        dec_layers.append(WNConv1d(f"decoder.model.{n + 2}", out_dim, 1, 7, padding=3))
        dec_layers.append(Tanh())
        self.decoder = Sequential(dec_layers)
        # staged split (mirror of the encoder's): in-conv + first block run
        # unchunked (short T, wide C); the tail (long T, narrow C) chunks
        n_dec_head_blocks = min(1, len(cfg.decoder_rates))
        self._dec_head = Sequential(dec_layers[: 1 + n_dec_head_blocks])
        self._dec_tail = Sequential(dec_layers[1 + n_dec_head_blocks:])
        self._dec_head_ratio = int(np.prod(cfg.decoder_rates[:n_dec_head_blocks])) \
            if n_dec_head_blocks else 1
        self._dec_tail_ratio = self.hop_length // self._dec_head_ratio

        self._modules = [self.encoder, *self.quantizers, self.decoder]
        # chunked-batch execution (ops/chunking.py): one stream-level split
        # into n overlapping windows replaces XLA's per-conv space-to-batch
        # re-chunking; exact (halo >= receptive field, edge-clamped windows).
        # Halos are per-STAGE: the chunked early encoder / decoder tail have
        # shallow receptive fields, so the overlap overhead stays ~2%.
        n_eb = max(len(cfg.encoder_rates) - 1, 0)
        rf_early = conv_stack_receptive_field(
            7, list(cfg.encoder_rates[:n_eb]), last_kernel=None)
        # halo in early-output frames (rate = _enc_early_ratio), aligned up
        self._enc_early_halo = -(-rf_early // self._enc_early_ratio) + 2
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

    def load_state_dict(self, sd: StateDict) -> "DAC":
        params: Params = {}
        for module in self._modules:
            module.convert(sd, params)
        self.params = params
        return self

    # ----------------------------------------------------------------- compute

    def _rvq(self, params: Params, z: jax.Array, n_quantizers: int | None,
             dropout_mask: jax.Array | None = None):
        """Residual VQ over all stages (ResidualVectorQuantizer.cs:105-206).

        dropout_mask: optional [B] int array of per-example active-stage
        counts (training-time quantizer dropout); None = all stages active.
        """
        residual = z.astype(jnp.float32)
        z_q = jnp.zeros_like(residual)
        codes, latents = [], []
        commit_total = jnp.zeros((), jnp.float32)
        codebook_total = jnp.zeros((), jnp.float32)
        n_stages = len(self.quantizers)
        limit = n_quantizers if n_quantizers is not None else n_stages
        for i, vq in enumerate(self.quantizers):
            if i >= limit and dropout_mask is None:
                break
            z_q_i, commit_i, cb_i, codes_i, z_e_i = vq.forward(params, residual)
            if dropout_mask is not None:
                active = (i < dropout_mask).astype(jnp.float32)  # [B]
                z_q = z_q + z_q_i * active[:, None, None]
                commit_total = commit_total + jnp.mean(commit_i * active)
                codebook_total = codebook_total + jnp.mean(cb_i * active)
            else:
                z_q = z_q + z_q_i
                commit_total = commit_total + jnp.mean(commit_i)
                codebook_total = codebook_total + jnp.mean(cb_i)
            residual = residual - z_q_i
            codes.append(codes_i)
            latents.append(z_e_i)
        codes_arr = jnp.stack(codes, axis=1)              # [B, Nq, T]
        latents_arr = jnp.concatenate(latents, axis=-1)   # [B, T, Nq*D]
        return z_q, codes_arr, latents_arr, commit_total, codebook_total

    def _encode_fn(self, params: Params, audio: jax.Array, n_quantizers: int | None):
        z = self.encoder(params, audio.astype(self.compute_dtype))
        return self._rvq(params, z, n_quantizers)

    def _forward_fn(self, params: Params, audio: jax.Array, n_quantizers: int | None):
        z_q, codes, latents, commit, cb = self._encode_fn(params, audio, n_quantizers)
        audio_hat = self.decoder(params, z_q.astype(self.decoder_dtype)).astype(jnp.float32)
        return {
            "audio": audio_hat,
            "z": z_q,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commit,
            "vq/codebook_loss": cb,
        }

    def forward_train(self, params: Params, audio: jax.Array, rng: jax.Array):
        """Training forward with quantizer dropout
        (ResidualVectorQuantizer.cs:220-237: a quantizer_dropout fraction of
        the batch trains with a random number of active stages)."""
        cfg = self.config
        z = self.encoder(params, audio.astype(self.compute_dtype))
        b = audio.shape[0]
        n_stages = len(self.quantizers)
        dropout_mask = jnp.full((b,), n_stages + 1, jnp.int32)
        if cfg.quantizer_dropout > 0:
            n_dropout = int(b * cfg.quantizer_dropout)
            random_counts = jax.random.randint(rng, (b,), 1, n_stages + 1)
            row = jnp.arange(b)
            dropout_mask = jnp.where(row < n_dropout, random_counts, dropout_mask)
        z_q, codes, latents, commit, cb = self._rvq(params, z, None, dropout_mask)
        audio_hat = self.decoder(params, z_q)
        return {
            "audio": audio_hat,
            "z": z_q,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commit,
            "vq/codebook_loss": cb,
        }

    def _decode_fn(self, params: Params, z_q: jax.Array) -> jax.Array:
        return self.decoder(params, z_q.astype(self.decoder_dtype)).astype(jnp.float32)

    # ------------------------------------------------- chunked-batch execution

    def _auto_chunks(self, frames: int) -> int:
        """Largest chunk count (<=8) whose overlap windows still pay off."""
        for n in (8, 4, 2):
            enc_ok = plan_chunks(frames * (self.hop_length // self._enc_early_ratio),
                                 n, self._enc_early_halo) is not None
            dec_ok = plan_chunks(frames * self._dec_head_ratio,
                                 n, self._dec_tail_halo) is not None
            if enc_ok and dec_ok:
                return n
        return 1

    def _encoder_staged(self, params: Params, audio: jax.Array,
                        n_chunks: int) -> jax.Array:
        """Encoder with the long-T early stages chunk-batched; exact."""
        f_early = audio.shape[1] // self._enc_early_ratio
        plan = plan_chunks(f_early, n_chunks, self._enc_early_halo)
        x = audio.astype(self.compute_dtype)
        if plan is None:
            return self.encoder(params, x)
        chunks = split_chunks(x, plan, scale=self._enc_early_ratio)
        h = self._enc_early(params, chunks)
        h = stitch_chunks(h, plan)
        return self._enc_late(params, h)

    def _decode_chunked_fn(self, params: Params, z_q: jax.Array,
                           n_chunks: int) -> jax.Array:
        """z_q [1, F, D] -> audio [1, F*hop, 1]; the in-conv + first block
        run unchunked (short T), the narrow long-T tail chunk-batched;
        exact (see ops/chunking.py)."""
        h = self._dec_head(params, z_q.astype(self.decoder_dtype))
        plan = plan_chunks(h.shape[1], n_chunks, self._dec_tail_halo)
        if plan is None:
            return self._dec_tail(params, h).astype(jnp.float32)
        chunks = split_chunks(h, plan)
        y = self._dec_tail(params, chunks).astype(jnp.float32)
        return stitch_chunks(y, plan, scale=self._dec_tail_ratio)

    def _forward_chunked_fn(self, params: Params, audio: jax.Array,
                            n_quantizers: int | None, n_chunks: int):
        """Whole round-trip with stage-level chunking; audio [1, T, 1] with
        T % hop == 0. Falls back to the unchunked graph when chunking cannot
        pay (short audio / batch input)."""
        if n_chunks <= 1:
            return self._forward_fn(params, audio, n_quantizers)
        z = self._encoder_staged(params, audio, n_chunks)
        z_q, codes, latents, commit, cb = self._rvq(params, z, n_quantizers)
        audio_hat = self._decode_chunked_fn(params, z_q, n_chunks)
        return {
            "audio": audio_hat,
            "z": z_q,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commit,
            "vq/codebook_loss": cb,
        }

    def _encode_chunked_fn(self, params: Params, audio: jax.Array,
                           n_quantizers: int | None, n_chunks: int):
        if n_chunks <= 1:
            return self._encode_fn(params, audio, n_quantizers)
        z = self._encoder_staged(params, audio, n_chunks)
        return self._rvq(params, z, n_quantizers)

    def _from_latents_fn(self, params: Params, latents: jax.Array):
        """Continuous latents [B, T, sum(D_i)] -> (z_q, codes)
        (RVQ.FromLatents, ResidualVectorQuantizer.cs:240-297): slice each
        stage's codebook_dim span, re-quantize, sum projections."""
        dims = np.cumsum([0] + [vq.codebook_dim for vq in self.quantizers])
        n_stages = int(np.searchsorted(dims, latents.shape[-1], side="right")) - 1
        z_q = None
        codes = []
        for i in range(n_stages):
            vq = self.quantizers[i]
            z_e = latents[..., dims[i]: dims[i + 1]].astype(jnp.float32)
            codebook = params[f"{vq.prefix}.codebook.weight"]
            stage_codes = cosine_argmin_codes(z_e, codebook)
            z_p = codebook_lookup(stage_codes, codebook)
            contrib = vq.out_proj(params, z_p)
            z_q = contrib if z_q is None else z_q + contrib
            codes.append(stage_codes)
        return z_q, jnp.stack(codes, axis=1)

    def from_latents(self, latents) -> jax.Array:
        """Latents (cat of per-stage z_e) -> decoded audio (DAC.FromLatents)."""
        z_q, _ = jax.jit(self._from_latents_fn)(self.params, jnp.asarray(latents))
        n = self._auto_chunks(z_q.shape[1])
        return self._jit_decode(self.params, z_q, n)[:, :, 0]

    def _from_codes_fn(self, params: Params, codes: jax.Array) -> jax.Array:
        """codes: [B, Nq, T] -> z_q [B, T, C] (RVQ.FromCodes :211-297)."""
        z_q = self.quantizers[0].decode_code(params, codes[:, 0])
        for i in range(1, codes.shape[1]):
            z_q = z_q + self.quantizers[i].decode_code(params, codes[:, i])
        return z_q

    # ------------------------------------------------------------- public API

    @functools.cached_property
    def _jit_forward(self):
        return jax.jit(self._forward_chunked_fn,
                       static_argnames=("n_quantizers", "n_chunks"))

    @functools.cached_property
    def _jit_encode(self):
        return jax.jit(self._encode_chunked_fn,
                       static_argnames=("n_quantizers", "n_chunks"))

    @functools.cached_property
    def _jit_decode(self):
        return jax.jit(self._decode_chunked_fn, static_argnames=("n_chunks",))

    @functools.cached_property
    def _jit_from_codes(self):
        return jax.jit(self._from_codes_fn)

    def _prepare(self, audio) -> tuple[jax.Array, int]:
        a = jnp.asarray(audio, dtype=jnp.float32)
        if a.ndim == 1:
            a = a[None, :]
        elif a.ndim == 3:
            a = a[:, 0, :]
        length = a.shape[-1]
        padded = -(-length // self.hop_length) * self.hop_length
        a = jnp.pad(a, ((0, 0), (0, padded - length)))
        return a[..., None], length

    def forward(self, audio, n_quantizers: int | None = None) -> dict[str, Any]:
        a, length = self._prepare(audio)
        n = self._auto_chunks(a.shape[1] // self.hop_length)
        out = self._jit_forward(self.params, a, n_quantizers, n)
        out["audio"] = out["audio"][:, :length, 0]
        return out

    def encode(self, audio, n_quantizers: int | None = None):
        """Returns (z_q, codes [B,Nq,T], latents, commit_loss, codebook_loss)."""
        a, _ = self._prepare(audio)
        n = self._auto_chunks(a.shape[1] // self.hop_length)
        return self._jit_encode(self.params, a, n_quantizers, n)

    def decode(self, z_q: jax.Array) -> jax.Array:
        """Latents [B, T, C] -> audio [B, T*hop]."""
        z_q = jnp.asarray(z_q)
        n = self._auto_chunks(z_q.shape[1])
        return self._jit_decode(self.params, z_q, n)[:, :, 0]

    def from_codes(self, codes) -> jax.Array:
        """Code indices [B, Nq, T] -> decoded audio [B, T*hop] (DAC.FromCodes)."""
        codes = jnp.asarray(codes, dtype=jnp.int32)
        if codes.ndim == 2:
            codes = codes[None]
        z_q = self._jit_from_codes(self.params, codes)
        n = self._auto_chunks(z_q.shape[1])
        return self._jit_decode(self.params, z_q, n)[:, :, 0]

    def encode_to_file(self, audio, path) -> None:
        """Encode audio and persist the codes as a .dac artifact
        (counterpart of the reference's DACFile workflow)."""
        from neuralcodecs_tpu.models.dac.dacfile import save_dac_file

        _, codes, _, _, _ = self.encode(audio)
        save_dac_file(path, [np.asarray(codes)], self.config)

    def decode_from_file(self, path) -> jax.Array:
        """Decode audio from a .dac artifact."""
        from neuralcodecs_tpu.models.dac.dacfile import load_dac_file

        codes, _ = load_dac_file(path)
        return self.from_codes(codes[0])

    def process_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        from neuralcodecs_tpu.diagnostics.context import get_diagnostics

        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.config.sample_rate:
            from neuralcodecs_tpu.dsp.resample import resample_poly

            audio = np.asarray(resample_poly(audio, sample_rate, self.config.sample_rate))
        diag = get_diagnostics()
        if diag.enabled:
            diag.log_tensor("dac", "input", audio)
            with diag.track_scope("dac.encode"):
                z_q, codes, latents, _, _ = self.encode(audio)
                z_q = np.asarray(z_q)
            diag.log_tensor("dac.encode", "codes", np.asarray(codes))
            diag.log_tensor("dac.encode", "latents", np.asarray(latents))
            with diag.track_scope("dac.decode"):
                out = np.asarray(self.decode(z_q))
            diag.log_tensor("dac.decode", "audio_out", out)
            return out[0, : audio.shape[-1]]
        out = self.forward(audio)
        return np.asarray(out["audio"][0])


def _factory(config: DACConfig, **kwargs) -> DAC:
    return DAC(config, **kwargs)


registry.register("dac", _factory, DACConfig)
