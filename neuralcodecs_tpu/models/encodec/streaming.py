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

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import CodecError


def _model_cache(model) -> dict:
    """Per-model cache of the jitted per-chunk step functions.

    They are pure in (params, chunk, state) — only the carried state is
    per-session — so caching them per model (and per n_q for the encoder)
    means new sessions (e.g. every TCP connection of cli/stream_serve.py)
    never retrace. Stored as an attribute ON the model so the cache dies
    with the model: a global WeakKeyDictionary cannot work here because the
    cached closures strongly reference the model they close over, which
    would keep the weak key alive forever (self-pinning leak)."""
    cache = getattr(model, "_streaming_jit_cache", None)
    if cache is None:
        cache = {}
        model._streaming_jit_cache = cache
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


def _decompose(total: int, blocks: tuple[int, ...]) -> list[int]:
    """Split ``total`` units into a largest-first greedy sequence of block
    sizes from ``blocks`` (descending, last element 1 so any total is
    representable)."""
    out: list[int] = []
    rem = total
    for b in blocks:
        while rem >= b:
            out.append(b)
            rem -= b
    return out


def _norm_blocks(block_hops) -> tuple[int, ...] | None:
    if not block_hops:
        return None
    blocks = tuple(sorted({int(h) for h in block_hops if int(h) >= 1},
                          reverse=True))
    return blocks if blocks and blocks[-1] == 1 else blocks + (1,)


class StreamingEncoder:
    """Chunked audio in -> RVQ codes out, with carried state.

    >>> enc = StreamingEncoder(model, n_q=8)
    >>> for chunk in chunks:              # [T] with T % hop_length == 0
    ...     codes = enc.push(chunk)       # [B, n_q, T/hop]

    ``block_hops`` (optional, e.g. ``(8, 1)``) bounds the set of compiled
    steady-state chunk shapes: after the first push, every chunk is split
    greedily into sub-steps of those sizes (in hops), so a server
    accepting arbitrary client chunk sizes compiles a fixed trace set
    (precompiled by :meth:`warm`) instead of one per distinct client
    shape. Steady-state decomposition is exact — the carried conv tails
    make the concatenated sub-step outputs equal the single-chunk
    outputs. The FIRST push always runs whole: its left padding reflects
    the chunk's own samples (SConv1d small-input fallback), so splitting
    it would change boundary content; an unusual first-chunk size
    therefore pays one lazy compile at session start, never mid-stream.
    """

    def __init__(self, model, n_q: int | None = None, block_hops=None):
        _check_streamable(model)
        self.model = model
        self.hop = model.encoder.hop_length
        self.n_q = n_q or model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth)
        self.block_hops = _norm_blocks(block_hops)
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
        n_hops = x.shape[1] // self.hop
        if (self.block_hops is None or self._state is None
                or n_hops in self.block_hops):
            return self._push_block(x)
        outs, off = [], 0
        for nh in _decompose(n_hops, self.block_hops):
            outs.append(self._push_block(x[:, off: off + nh * self.hop]))
            off += nh * self.hop
        return jnp.concatenate(outs, axis=-1)

    def _push_block(self, x) -> jax.Array:
        if self._state is None:
            codes, self._state = self._first(self.model.params, x)
        else:
            codes, self._state = self._step(self.model.params, x, self._state)
        return codes

    def warm(self) -> None:
        """Precompile the first-chunk and steady-state traces for every
        block size (throwaway state; a live session is untouched)."""
        saved = self._state
        try:
            for nh in self.block_hops or (1,):
                self._state = None
                z = jnp.zeros((1, nh * self.hop, 1), jnp.float32)
                self._push_block(z)                       # first-chunk jit
                jax.block_until_ready(self._push_block(z))  # steady-state jit
        finally:
            self._state = saved

    def reset(self) -> None:
        self._state = None


class StreamingDecoder:
    """Chunked RVQ codes in -> audio out, with carried state.

    ``block_hops`` works as in :class:`StreamingEncoder`, counted in code
    frames (1 frame -> ``hop_length`` output samples)."""

    def __init__(self, model, block_hops=None):
        _check_streamable(model)
        self.model = model
        self.block_hops = _norm_blocks(block_hops)
        self._default_n_q = model.quantizer.num_quantizers_for_bandwidth(
            model.frame_rate, model.bandwidth)
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
        frames = codes.shape[-1]
        if (self.block_hops is None or self._state is None
                or frames in self.block_hops):
            return self._push_block(codes)
        outs, off = [], 0
        for nf in _decompose(frames, self.block_hops):
            outs.append(self._push_block(codes[..., off: off + nf]))
            off += nf
        return jnp.concatenate(outs, axis=1)

    def _push_block(self, codes) -> jax.Array:
        if self._state is None:
            audio, self._state = self._first(self.model.params, codes)
        else:
            audio, self._state = self._step(self.model.params, codes,
                                            self._state)
        return audio

    def warm(self, n_q: int | None = None) -> None:
        """Precompile first + steady traces per block size for one ``n_q``
        (default: the model bandwidth's). Other ``n_q`` values still
        compile lazily — there is one trace set per distinct ``n_q``."""
        n_q = n_q or self._default_n_q
        saved = self._state
        try:
            for nf in self.block_hops or (1,):
                self._state = None
                z = jnp.zeros((1, n_q, nf), jnp.int32)
                self._push_block(z)
                jax.block_until_ready(self._push_block(z))
        finally:
            self._state = saved

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
