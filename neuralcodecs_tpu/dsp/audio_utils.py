"""Host-side audio utilities: PCM conversion, channel ops, simple DSP.

Counterpart of the reference's Core audio utils
(/root/reference/NeuralCodecs.Core/Utils/AudioUtils.cs:3-377 — byte↔float
PCM, interleave/deinterleave, mono mixdown, linear resample, array
normalization) and the masking helpers in AudioTensorDSP.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# PCM conversion (AudioUtils byte<->float)
# ---------------------------------------------------------------------------

def pcm16_to_float(data: bytes | np.ndarray) -> np.ndarray:
    arr = np.frombuffer(data, np.int16) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.int16)
    return arr.astype(np.float32) / 32768.0


def float_to_pcm16(audio: np.ndarray) -> bytes:
    clipped = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    return (clipped * 32767.0).astype(np.int16).tobytes()


def pcm24_to_float(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, np.uint8).reshape(-1, 3)
    ints = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16))
    ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
    return ints.astype(np.float32) / float(1 << 23)


def pcm32_to_float(data: bytes) -> np.ndarray:
    return np.frombuffer(data, np.int32).astype(np.float32) / 2147483648.0


# ---------------------------------------------------------------------------
# Channel layout (AudioUtils interleave/deinterleave/mixdown)
# ---------------------------------------------------------------------------

def interleave(channels: np.ndarray) -> np.ndarray:
    """[C, T] -> interleaved [T*C]."""
    return np.asarray(channels).T.reshape(-1)


def deinterleave(data: np.ndarray, num_channels: int) -> np.ndarray:
    """interleaved [T*C] -> [C, T]."""
    return np.asarray(data).reshape(-1, num_channels).T


def to_mono(audio: np.ndarray) -> np.ndarray:
    """[C, T] -> [T] mean mixdown."""
    audio = np.asarray(audio)
    return audio.mean(axis=0) if audio.ndim > 1 else audio


# ---------------------------------------------------------------------------
# dB / mel conversions (Core/Utils/MathUtils.cs)
# ---------------------------------------------------------------------------

def db_to_linear(db):
    return 10.0 ** (np.asarray(db) / 20.0)


def linear_to_db(linear, floor: float = 1e-12):
    return 20.0 * np.log10(np.maximum(np.asarray(linear), floor))


# ---------------------------------------------------------------------------
# Spectral masking (AudioTensorDSP masking helpers)
# ---------------------------------------------------------------------------

def mask_time(spec: jax.Array, key: jax.Array, max_width: int,
              num_masks: int = 1, value: float = 0.0) -> jax.Array:
    """Zero random time stripes of a [..., F, T] spectrogram (SpecAugment)."""
    t = spec.shape[-1]
    for i in range(num_masks):
        key, k1, k2 = jax.random.split(key, 3)
        width = jax.random.randint(k1, (), 1, max(max_width, 2))
        start = jax.random.randint(k2, (), 0, max(t - max_width, 1))
        idx = jnp.arange(t)
        mask = (idx >= start) & (idx < start + width)
        spec = jnp.where(mask, value, spec)
    return spec


def mask_frequency(spec: jax.Array, key: jax.Array, max_width: int,
                   num_masks: int = 1, value: float = 0.0) -> jax.Array:
    """Zero random frequency stripes of a [..., F, T] spectrogram."""
    f = spec.shape[-2]
    for i in range(num_masks):
        key, k1, k2 = jax.random.split(key, 3)
        width = jax.random.randint(k1, (), 1, max(max_width, 2))
        start = jax.random.randint(k2, (), 0, max(f - max_width, 1))
        idx = jnp.arange(f)[:, None]
        mask = (idx >= start) & (idx < start + width)
        spec = jnp.where(mask, value, spec)
    return spec
