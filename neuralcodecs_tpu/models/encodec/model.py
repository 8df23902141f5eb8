"""Encodec — streaming neural audio codec, TPU-native.

Rebuild of /root/reference/NeuralCodecs.Torch/Models/Encodec.cs:21-507:
chunked encode (1 s segments with overlap for the 48 kHz preset), per-frame
volume normalization with transmitted scales, SEANet encoder/decoder with
streaming LSTM, EMA-codebook RVQ with bandwidth→n_q selection, and
triangular overlap-add decode recombination.

TPU design: the per-frame encode and decode paths are single jitted
functions (cached per frame length — only the final partial chunk differs);
the host loop merely slices segments and stacks results.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import CodecError, LoadError
from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.dsp.overlap import linear_overlap_add
from neuralcodecs_tpu.models.encodec.config import EncodecConfig
from neuralcodecs_tpu.models.encodec.quantize import ResidualVectorQuantizer
from neuralcodecs_tpu.models.encodec.seanet import SEANetDecoder, SEANetEncoder
from neuralcodecs_tpu.models.layers import Params, StateDict


class EncodedFrame(NamedTuple):
    """(codes [B, n_q, T_frames], scale [B, 1] | None) — EncodedFrame.cs:9."""

    codes: jax.Array
    scale: jax.Array | None


def _normalize_source_names(sd: StateDict) -> StateDict:
    """Map original-encodec / C#-reference key spellings onto ours."""
    out = {}
    for key, value in sd.items():
        key = key.replace("encoder.model.", "encoder.layers.")
        key = key.replace("decoder.model.", "decoder.layers.")
        # time_group_norm checkpoints nest the GroupNorm under the Norm(Conv)
        # wrapper: NormConv1d.norm (NormConv1d.cs) -> our flat ".norm."
        key = key.replace(".conv.norm.", ".norm.")
        key = key.replace(".convtr.norm.", ".norm.")
        key = key.replace(".conv.conv.", ".conv.")
        key = key.replace(".convtr.convtr.", ".conv.")
        key = key.replace("quantizer.vq.layers.", "quantizer.layers.")
        key = key.replace("._codebook.", ".codebook.")
        out[key] = value
    return out


def _pad_rows8(x: jax.Array, value: float = 0.0):
    """Pad the leading (chunk-batch) axis up to a multiple of 8.

    Chunk batches that are not a multiple of 8 rows hit an XLA slow path
    at the 48k shapes — measured round 5: 10 chunks cost MORE than 16
    (50.7 vs 44.6 ms; PERF.md "Encodec-48k single stream") — so every
    batched chunk dispatch pads with dummy rows and drops them from the
    result (row-independent math: codes/outputs of real rows unchanged).
    Returns (padded, original_rows)."""
    rows = x.shape[0]
    pad = (-rows) % 8 if rows > 8 else 0
    if not pad:
        return x, rows
    filler = jnp.full((pad, *x.shape[1:]), value, x.dtype)
    return jnp.concatenate([x, filler], axis=0), rows


class Encodec:
    """Public Encodec codec (API mirrors Models/Encodec.cs)."""

    def __init__(self, config: EncodecConfig | None = None, *,
                 params: Params | None = None, seed: int = 0,
                 compute_dtype=None, decoder_dtype=None):
        # mixed mode mirrors SNAC/DAC: f32 encoder + RVQ keep code indices
        # bit-exact while the HBM/FLOP-heavy decoder runs bf16
        self.compute_dtype = compute_dtype or jnp.float32
        self.decoder_dtype = decoder_dtype or self.compute_dtype
        self.config = config or EncodecConfig()
        cfg = self.config
        if cfg.bandwidth is not None and cfg.bandwidth not in cfg.target_bandwidths:
            raise CodecError(
                f"Invalid bandwidth {cfg.bandwidth}. "
                f"Select one of {cfg.target_bandwidths}")
        self.bandwidth = cfg.bandwidth

        self.encoder = SEANetEncoder(
            "encoder.layers",
            channels=cfg.channels, dimension=cfg.hidden_size,
            n_filters=cfg.num_filters, n_residual_layers=cfg.num_residual_layers,
            ratios=cfg.upsampling_ratios, kernel_size=cfg.kernel_size,
            last_kernel_size=cfg.last_kernel_size,
            residual_kernel_size=cfg.residual_kernel_size,
            dilation_base=cfg.dilation_growth_rate, causal=cfg.use_causal_conv,
            norm_type=cfg.norm_type, pad_mode=cfg.pad_mode,
            compress=cfg.compress, lstm=cfg.num_lstm_layers)
        self.decoder = SEANetDecoder(
            "decoder.layers",
            channels=cfg.channels, dimension=cfg.hidden_size,
            n_filters=cfg.num_filters, n_residual_layers=cfg.num_residual_layers,
            ratios=cfg.upsampling_ratios, kernel_size=cfg.kernel_size,
            last_kernel_size=cfg.last_kernel_size,
            residual_kernel_size=cfg.residual_kernel_size,
            dilation_base=cfg.dilation_growth_rate, causal=cfg.use_causal_conv,
            norm_type=cfg.norm_type, pad_mode=cfg.pad_mode,
            compress=cfg.compress, lstm=cfg.num_lstm_layers,
            trim_right_ratio=cfg.trim_right_ratio)

        self.hop_length = self.encoder.hop_length
        self.frame_rate = math.ceil(cfg.sample_rate / self.hop_length)
        # reference: nQ = 1000·max(bw) / (ceil(sr/hop)·10)  (Encodec.cs:41-44);
        # floor at 1 so low-bandwidth/tiny configs never build a zero-codebook
        # quantizer (matches num_quantizers_for_bandwidth's clamp).
        n_q = max(1, int(1000 * max(cfg.target_bandwidths)
                         / (math.ceil(cfg.sample_rate / self.hop_length) * 10)))
        self.quantizer = ResidualVectorQuantizer(
            "quantizer", cfg.codebook_dim, n_q, cfg.codebook_size)
        self.bits_per_codebook = int(math.log2(cfg.codebook_size))
        if 2 ** self.bits_per_codebook != cfg.codebook_size:
            raise CodecError("Quantizer bins must be a power of 2")

        self._modules = [self.encoder, self.decoder, self.quantizer]
        self.params: Params = params if params is not None else self.init_params(seed)

    # ------------------------------------------------------------------ state

    @property
    def num_codebooks(self) -> int:
        return self.quantizer.num_quantizers

    @property
    def segment_length(self) -> int | None:
        return self.config.chunk_length

    @property
    def segment_stride(self) -> int | None:
        return self.config.chunk_stride

    def init_params(self, seed: int = 0) -> Params:
        params: Params = {}
        for module, k in zip(self._modules,
                             jax.random.split(jax.random.key(seed), len(self._modules))):
            module.init(k, params)
        return params

    def load_state_dict(self, sd: StateDict) -> "Encodec":
        sd = _normalize_source_names(sd)
        params: Params = {}
        for module in self._modules:
            module.convert(sd, params)
        self.params = params
        return self

    def set_target_bandwidth(self, bandwidth: float) -> None:
        """Encodec.SetTargetBandwidth (Models/Encodec.cs:409-419)."""
        if bandwidth not in self.config.target_bandwidths:
            raise CodecError(
                f"This model doesn't support the bandwidth {bandwidth} kbps. "
                f"Select one of {self.config.target_bandwidths} kbps")
        self.bandwidth = bandwidth

    # ----------------------------------------------------------------- compute

    @functools.lru_cache(maxsize=None)
    def _encode_frame_fn(self, n_q: int, normalize: bool):
        def fn(params: Params, x: jax.Array):
            """x: [B, T, C] -> (codes [B, n_q, frames], scale [B,1] | None)."""
            scale = None
            if normalize:
                mono = jnp.mean(x, axis=-1, keepdims=True)          # [B, T, 1]
                volume = jnp.sqrt(jnp.mean(mono**2, axis=1, keepdims=True))
                scale = volume + 1e-8                                # [B, 1, 1]
                x = x / scale
                scale = scale[:, 0, :]                               # [B, 1]
            emb = self.encoder(params, x.astype(self.compute_dtype))
            codes = self.quantizer.encode(params, emb.astype(jnp.float32), n_q)
            return codes, scale

        return jax.jit(fn)

    @functools.cached_property
    def _decode_frame_fn(self):
        def fn(params: Params, codes: jax.Array, scale: jax.Array | None):
            emb = self.quantizer.decode(params, codes)
            out = self.decoder(params, emb.astype(self.decoder_dtype))
            out = out.astype(jnp.float32)                            # [B, T, C]
            if scale is not None:
                out = out * scale[:, :, None]
            return out

        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _stream_roundtrip_fn(self, n_full: int, tail_len: int, n_q: int):
        """ONE jitted device call for a full chunked round-trip: in-jit
        framing, per-frame normalize, batched encode of ALL full chunks,
        RVQ, batched decode, scale restore, triangular overlap-add and
        weight renormalization — the tail partial chunk included in the
        same program when present (VERDICT r4 #4: the reference runs this
        as a host loop of per-chunk calls, Models/Encodec.cs:259-285 +
        AudioTensorDSP.cs:161-269 LinearOverlapAdd; here the whole stream
        is a single XLA program, so the serial-LSTM wall is paid once for
        all chunks instead of per dispatch).

        Exactness: the per-chunk math is the same code the frames API
        traces (`_encode_frame_fn`/`_decode_frame_fn` bodies); only the
        batching layout and the OLA summation order differ (float-order
        level). Tested against decode(encode(x)) in
        tests/test_streaming.py::test_stream_roundtrip_fastpath_matches_frames.
        """
        def _tri_np(frame_length: int) -> np.ndarray:
            # dsp.overlap._tri_weight, in pure numpy (jnp constants become
            # tracers under an enclosing jit trace)
            t = np.linspace(0.0, 1.0, frame_length + 2)[1:-1]
            return (0.5 - np.abs(t - 0.5)).astype(np.float32)

        segment = self.segment_length
        stride = self.segment_stride
        normalize = self.config.normalize
        assert segment is not None and n_full >= 1

        def _roundtrip_chunk(params, chunk):
            """chunk [N, T, C] -> decoded [N, T_out, C] (normalize+scale
            inside — mirrors _encode_frame_fn/_decode_frame_fn)."""
            scale = None
            if normalize:
                mono = jnp.mean(chunk, axis=-1, keepdims=True)
                volume = jnp.sqrt(jnp.mean(mono**2, axis=1, keepdims=True))
                scale = volume + 1e-8                          # [N, 1, 1]
                chunk = chunk / scale
            emb = self.encoder(params, chunk.astype(self.compute_dtype))
            codes = self.quantizer.encode(params, emb.astype(jnp.float32), n_q)
            emb = self.quantizer.decode(params, codes)
            out = self.decoder(params, emb.astype(self.decoder_dtype))
            out = out.astype(jnp.float32)
            if scale is not None:
                out = out * scale
            return out

        def fn(params: Params, x: jax.Array) -> jax.Array:
            # x: [B, T, C] with T = stride*(n_full-1) + segment + tail_len
            batch = x.shape[0]
            # static slices, chunk-major (the ordering encode() produces);
            # NOT an advanced-indexing gather — a [n*seg] index gather costs
            # ~10 ms on the TPU scalar core at the 48k shape (measured r5),
            # slices+concat are pure layout
            frames = jnp.concatenate(
                [x[:, k * stride: k * stride + segment, :]
                 for k in range(n_full)], axis=0)       # [n*B, seg, C]
            # row-count padding: chunk batches that are not a multiple of 8
            # hit an XLA slow path at this shape (measured r5: n=10 chunks
            # cost MORE than n=16 — 50.7 vs 44.6 ms; 8/16/32 are clean), so
            # pad with zero chunks and drop them after decode
            rows = frames.shape[0]
            pad_rows = (-rows) % 8 if rows > 8 else 0
            if pad_rows:
                frames = jnp.concatenate(
                    [frames, jnp.zeros((pad_rows, *frames.shape[1:]),
                                       frames.dtype)], axis=0)
            out = _roundtrip_chunk(params, frames)      # [n*B, seg_out, C]
            if pad_rows:
                out = out[:rows]
            seg_out = out.shape[1]
            w_np = _tri_np(seg_out)
            w = jnp.asarray(w_np, out.dtype)
            weighted = (out * w[None, :, None]).reshape(
                n_full, batch, seg_out, out.shape[-1])
            tail_out = None
            if tail_len:
                tail = x[:, n_full * stride: n_full * stride + tail_len, :]
                tail_out = _roundtrip_chunk(params, tail)   # [B, t_out, C]
                t_out = tail_out.shape[1]
                total = n_full * stride + t_out
            else:
                total = stride * (n_full - 1) + seg_out
            acc = jnp.zeros((batch, total, out.shape[-1]), out.dtype)
            wsum = np.zeros((total,), np.float32)
            for k in range(n_full):                     # static unroll
                off = k * stride
                acc = acc.at[:, off: off + seg_out, :].add(weighted[k])
                wsum[off: off + seg_out] += w_np
            if tail_out is not None:
                off = n_full * stride
                # partial frames take the TRUNCATED full-frame triangle
                # (linear_overlap_add `weight_full[:t]`, matching
                # AudioTensorDSP.cs LinearOverlapAdd), not a fresh short one
                wt_np = w_np[: tail_out.shape[1]]
                acc = acc.at[:, off: off + tail_out.shape[1], :].add(
                    tail_out * jnp.asarray(wt_np, out.dtype)[None, :, None])
                wsum[off: off + tail_out.shape[1]] += wt_np
            wsum = np.maximum(wsum, 1e-10)
            return acc / jnp.asarray(wsum)[None, :, None]

        return jax.jit(fn)

    # ------------------------------------------------------------- public API

    def _prepare(self, audio) -> jax.Array:
        """Accept [T], [C, T], [B, C, T] (reference layout) -> [B, T, C]."""
        a = jnp.asarray(audio, jnp.float32)
        if a.ndim == 1:
            a = a[None, None, :]
        elif a.ndim == 2:
            a = a[None, :, :]
        if a.shape[1] != self.config.channels:
            raise CodecError(
                f"Expected {self.config.channels} channels, got {a.shape[1]}")
        return jnp.swapaxes(a, 1, 2)

    def encode(self, audio) -> list[EncodedFrame]:
        """Audio -> encoded frames (chunking per Models/Encodec.cs:259-285).

        TPU optimization over the reference's sequential chunk loop: all
        full-length chunks are stacked into ONE batched device call (chunks
        are independent — per-frame normalization included); only a final
        partial chunk takes a second call."""
        x = self._prepare(audio)
        batch, length, channels = x.shape
        segment = self.segment_length or length
        stride = self.segment_stride or length
        n_q = self.quantizer.num_quantizers_for_bandwidth(self.frame_rate,
                                                          self.bandwidth)
        fn = self._encode_frame_fn(n_q, self.config.normalize)
        offsets = list(range(0, length, stride))
        full = [o for o in offsets if o + segment <= length]
        partial = [o for o in offsets if o + segment > length]

        frames: dict[int, EncodedFrame] = {}
        if full:
            stacked = jnp.concatenate(
                [x[:, o: o + segment, :] for o in full], axis=0)
            stacked, rows = _pad_rows8(stacked)
            codes, scale = fn(self.params, stacked)
            for i, offset in enumerate(full):
                sl = slice(i * batch, (i + 1) * batch)
                frames[offset] = EncodedFrame(
                    codes[sl], None if scale is None else scale[sl])
        for offset in partial:
            chunk = x[:, offset: length, :]
            codes, scale = fn(self.params, chunk)
            frames[offset] = EncodedFrame(codes, scale)
        return [frames[o] for o in offsets]

    def decode(self, frames: Sequence[EncodedFrame]) -> jax.Array:
        """Encoded frames -> audio [B, C, T] (Models/Encodec.cs:213-235)."""
        if not frames:
            raise CodecError("No frames provided to decode")
        if self.segment_length is None:
            if len(frames) != 1:
                raise CodecError("Expected single frame when no segmentation is used")
            out = self._decode_frame_fn(self.params, frames[0].codes, frames[0].scale)
            return jnp.swapaxes(out, 1, 2)
        # batch equal-length frames through one device call
        decoded: list = [None] * len(frames)
        by_len: dict[int, list[int]] = {}
        for i, f in enumerate(frames):
            by_len.setdefault(f.codes.shape[-1], []).append(i)
        for idx_list in by_len.values():
            group = [frames[i] for i in idx_list]
            batch = group[0].codes.shape[0]
            codes = jnp.concatenate([f.codes for f in group], axis=0)
            scale = (None if group[0].scale is None
                     else jnp.concatenate([f.scale for f in group], axis=0))
            codes, rows = _pad_rows8(codes)
            if scale is not None and codes.shape[0] != scale.shape[0]:
                scale, _ = _pad_rows8(scale, value=1.0)
            out = self._decode_frame_fn(self.params, codes, scale)
            for j, i in enumerate(idx_list):
                decoded[i] = jnp.swapaxes(
                    out[j * batch: (j + 1) * batch], 1, 2)
        return linear_overlap_add(decoded, self.segment_stride)

    def forward(self, audio) -> jax.Array:
        """Round-trip; output trimmed to input length (Models/Encodec.cs:150).

        Chunked configs (48 kHz) take the single-call fast path: the whole
        stream — framing, normalize, encode, RVQ, decode, scale,
        overlap-add — is ONE jitted XLA program (`_stream_roundtrip_fn`),
        so the serial-LSTM latency is paid once for all chunks. Falls back
        to the frames API for layouts the fused program doesn't cover
        (multiple partial tails — possible only for very short inputs)."""
        x = self._prepare(audio)
        length = x.shape[1]
        segment, stride = self.segment_length, self.segment_stride
        if segment is not None and length >= segment:
            offsets = list(range(0, length, stride))
            full = [o for o in offsets if o + segment <= length]
            partial = [o for o in offsets if o + segment > length]
            contiguous = full == [k * stride for k in range(len(full))]
            if full and len(partial) <= 1 and contiguous:
                tail_len = (length - partial[0]) if partial else 0
                n_q = self.quantizer.num_quantizers_for_bandwidth(
                    self.frame_rate, self.bandwidth)
                fn = self._stream_roundtrip_fn(len(full), tail_len, n_q)
                out = fn(self.params, x)                 # [B, total, C]
                return jnp.swapaxes(out, 1, 2)[..., :length]
        out = self.decode(self.encode(audio))
        return out[..., : x.shape[1]]

    def process_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """1-D [T] or [C, T] in -> same channel layout out ([C, T] for the
        stereo 48k model; duplicates a mono input across the model's
        channels, as the reference's stereo examples do)."""
        from neuralcodecs_tpu.diagnostics.context import get_diagnostics

        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.config.sample_rate:
            from neuralcodecs_tpu.dsp.resample import resample_poly

            audio = np.asarray(resample_poly(audio, sample_rate, self.config.sample_rate))
        channels = self.config.channels
        if channels > 1:
            if audio.ndim == 1:
                audio = np.broadcast_to(audio, (channels, audio.shape[-1]))
            elif audio.shape[0] == 1:
                audio = np.broadcast_to(audio, (channels, audio.shape[-1]))
        diag = get_diagnostics()
        if diag.enabled:
            x = self._prepare(audio)
            diag.log_tensor("encodec", "input", audio)
            with diag.track_scope("encodec.encode"):
                frames = self.encode(audio)
                jax.block_until_ready([f.codes for f in frames])
            for i, f in enumerate(frames):
                diag.log_tensor("encodec.encode", f"frame_{i}_codes",
                                np.asarray(f.codes))
            with diag.track_scope("encodec.decode"):
                out = np.asarray(self.decode(frames))[..., : x.shape[1]]
            diag.log_tensor("encodec.decode", "audio_out", out)
            return self._squeeze_out(out)
        out = self.forward(audio)
        return self._squeeze_out(np.asarray(out))

    def _squeeze_out(self, out: np.ndarray) -> np.ndarray:
        """[B, C, T] -> [C, T] (stereo) or [T] (mono)."""
        if out.ndim == 3:
            return out[0] if out.shape[1] > 1 else out[0, 0]
        return out

    # ---- language model ------------------------------------------------------

    _LM_CHECKPOINTS = {
        24000: "https://dl.fbaipublicfiles.com/encodec/v0/encodec_lm_24khz-1608e3c0.th",
        48000: "https://dl.fbaipublicfiles.com/encodec/v0/encodec_lm_48khz-7add9fc3.th",
    }

    def get_language_model(self, download: bool = True):
        """Lazy LM construction (+ optional pretrained download), mirroring
        Encodec.GetLanguageModel (Models/Encodec.cs:303-340)."""
        if getattr(self, "_lm", None) is not None:
            return self._lm
        from neuralcodecs_tpu.models.encodec.lm import (
            EncodecLanguageModel,
            EncodecLMConfig,
        )

        lm_config = EncodecLMConfig(
            codebook_size=self.config.codebook_size,
            num_codebooks=self.num_codebooks,
            dimension=200, num_heads=8, num_layers=5,
            past_context=int(3.5 * self.frame_rate),
        )
        lm = EncodecLanguageModel(lm_config)
        if download:
            url = self._LM_CHECKPOINTS.get(self.config.sample_rate)
            if url is not None:
                # Do NOT swallow failures (ADVICE r1, medium): an .ecdc
                # stream arithmetic-coded against a random-init LM decodes to
                # garbage on any peer with the real weights, silently.
                from neuralcodecs_tpu.core.importer import import_checkpoint
                from neuralcodecs_tpu.core.loader import LoadOptions, ModelLoader

                try:
                    path = ModelLoader().resolve(url, LoadOptions())
                    lm.load_state_dict(import_checkpoint(path))
                except Exception as exc:
                    raise LoadError(
                        f"Pretrained Encodec LM could not be loaded from {url}; "
                        "refusing to continue with a random-init LM (streams "
                        "would be undecodable by peers). Pass download=False "
                        "or set_language_model() to opt into an untrained LM."
                    ) from exc
        self._lm = lm
        return lm

    def set_language_model(self, lm) -> None:
        self._lm = lm

    # ---- compression entry points (ecdc) ------------------------------------

    def compress(self, audio, use_lm: bool = False, lm=None,
                 lm_batch: int = 1) -> bytes:
        """Compress audio to the .ecdc container format."""
        from neuralcodecs_tpu.models.encodec.compressor import compress

        return compress(self, audio, use_lm=use_lm, lm=lm, lm_batch=lm_batch)

    def compress_batch(self, audios, use_lm: bool = False, lm=None,
                       lm_batch: int | None = None) -> list[bytes]:
        """Compress independent waveforms, sharing each LM step's device
        dispatch across streams (see compressor.compress_batch)."""
        from neuralcodecs_tpu.models.encodec.compressor import compress_batch

        return compress_batch(self, audios, use_lm=use_lm, lm=lm,
                              lm_batch=lm_batch)

    def decompress(self, data: bytes, lm=None) -> jax.Array:
        from neuralcodecs_tpu.models.encodec.compressor import decompress

        return decompress(self, data, lm=lm)

    def decompress_batch(self, blobs, lm=None) -> list:
        from neuralcodecs_tpu.models.encodec.compressor import decompress_batch

        return decompress_batch(self, blobs, lm=lm)


def _factory(config: EncodecConfig, **kwargs) -> Encodec:
    return Encodec(config, **kwargs)


registry.register("encodec", _factory, EncodecConfig)
