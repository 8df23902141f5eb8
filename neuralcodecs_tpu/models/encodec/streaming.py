"""Low-latency streaming Encodec sessions (causal models).

The reference carries streaming state in its SLSTM (SLSTM.cs:11-130) and
uses causal convs precisely so the 24 kHz model can stream, but never
exposes a chunk-in/chunk-out API. This module does, TPU-first: the per-chunk
step is ONE jitted function whose carried state is a pytree of conv input
tails (SConv1d causal left context), transpose-conv overlap tails, and LSTM
(h, c) — so a live stream costs one host↔device crossing per chunk and the
concatenated chunk outputs are EXACTLY the full-signal forward (bit-level
float equality is not guaranteed across different chunk sizes, but the
computation graph per sample is identical; verified to float tolerance in
tests/test_streaming.py).

Requirements: ``use_causal_conv=True``, no time_group_norm, no per-frame
normalization, unsegmented model (the 24 kHz preset satisfies all).
"""

from __future__ import annotations

import weakref

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import CodecError

# The per-chunk step functions are pure in (params, chunk, state) — only the
# carried state is per-session — so their jits are cached per model (and per
# n_q for the encoder). Without this, every new session (e.g. every TCP
# connection of cli/stream_serve.py) would retrace and recompile.
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _model_cache(model) -> dict:
    try:
        return _JIT_CACHE[model]
    except KeyError:
        cache: dict = {}
        _JIT_CACHE[model] = cache
        return cache


def _check_streamable(model) -> None:
    cfg = model.config
    if not cfg.use_causal_conv:
        raise CodecError("streaming requires a causal model (24 kHz preset)")
    if cfg.normalize:
        raise CodecError("streaming does not support per-frame normalization")
    if cfg.norm_type == "time_group_norm":
        raise CodecError("time_group_norm normalizes over the whole chunk; "
                         "not streamable")
    if model.segment_length is not None:
        raise CodecError("streaming applies to unsegmented models")


class StreamingEncoder:
    """Chunked audio in -> RVQ codes out, with carried state.

    >>> enc = StreamingEncoder(model, n_q=8)
    >>> for chunk in chunks:              # [T] with T % hop_length == 0
    ...     codes = enc.push(chunk)       # [B, n_q, T/hop]
    """

    def __init__(self, model, n_q: int | None = None):
        _check_streamable(model)
        self.model = model
        self.hop = model.encoder.hop_length
        self.n_q = n_q or model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth)
        self._state = None

        cache = _model_cache(model)
        key = ("enc", self.n_q)
        if key not in cache:
            n_q_static = self.n_q

            @jax.jit
            def first(params, x):
                emb, state = model.encoder.stream(params, x, None)
                return model.quantizer.encode(
                    params, emb.astype(jnp.float32), n_q_static), state

            @jax.jit
            def step(params, x, state):
                emb, state = model.encoder.stream(params, x, state)
                return model.quantizer.encode(
                    params, emb.astype(jnp.float32), n_q_static), state

            cache[key] = (first, step)
        self._first, self._step = cache[key]

    def push(self, audio_chunk) -> jax.Array:
        """audio_chunk: [T] | [B, T] | [B, T, C], T % hop_length == 0."""
        x = jnp.asarray(audio_chunk, jnp.float32)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[:, :, None]
        if x.shape[1] % self.hop:
            raise CodecError(
                f"chunk length {x.shape[1]} must be a multiple of the hop "
                f"({self.hop})")
        if self._state is None:
            codes, self._state = self._first(self.model.params, x)
        else:
            codes, self._state = self._step(self.model.params, x, self._state)
        return codes

    def reset(self) -> None:
        self._state = None


class StreamingDecoder:
    """Chunked RVQ codes in -> audio out, with carried state."""

    def __init__(self, model):
        _check_streamable(model)
        self.model = model
        self._state = None

        cache = _model_cache(model)
        if "dec" not in cache:
            @jax.jit
            def first(params, codes):
                emb = model.quantizer.decode(params, codes)
                return model.decoder.stream(params, emb, None)

            @jax.jit
            def step(params, codes, state):
                emb = model.quantizer.decode(params, codes)
                return model.decoder.stream(params, emb, state)

            cache["dec"] = (first, step)
        self._first, self._step = cache["dec"]

    def push(self, codes) -> jax.Array:
        """codes: [B, n_q, F] -> audio [B, F*hop, channels]."""
        codes = jnp.asarray(codes, jnp.int32)
        if self._state is None:
            audio, self._state = self._first(self.model.params, codes)
        else:
            audio, self._state = self._step(self.model.params, codes,
                                            self._state)
        return audio

    def reset(self) -> None:
        self._state = None


def stream_roundtrip(model, audio: np.ndarray, chunk_samples: int):
    """Convenience: push audio through paired streaming encode+decode
    sessions chunk by chunk; returns (audio_out [B, T, C], codes list).

    A ragged tail is zero-padded up to the hop grid, pushed as a final
    (shorter) chunk, and the emitted audio is trimmed back to the input
    length — nothing is dropped."""
    enc = StreamingEncoder(model)
    dec = StreamingDecoder(model)
    hop = enc.hop
    if chunk_samples % hop:
        raise CodecError(f"chunk_samples must be a multiple of {hop}")
    x = np.asarray(audio, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    t = x.shape[1]
    outs, codes_all = [], []
    for off in range(0, t, chunk_samples):
        chunk = x[:, off: off + chunk_samples]
        if chunk.shape[1] % hop:
            pad = hop - chunk.shape[1] % hop
            chunk = np.pad(chunk, ((0, 0), (0, pad)))
        codes = enc.push(chunk)
        codes_all.append(codes)
        outs.append(dec.push(codes))
    return jnp.concatenate(outs, axis=1)[:, :t], codes_all
