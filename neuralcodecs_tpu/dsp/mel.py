"""Mel filterbanks, mel spectrograms, MFCC — precomputed-matmul formulation.

Counterpart of the reference's MelSpectrogram/MFCC path
(/root/reference/NeuralCodecs.Torch/AudioTools/AudioTensorDSP.cs:595-702,
MelFilterbank :840-896, DCTMatrix :900-915, MathUtils Hz↔mel :104-116).
The filterbank is a host-precomputed [n_mels, n_freqs] matrix applied as one
MXU matmul over the magnitude spectrogram — the TPU-native form of the
reference's per-filter loops.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.stft import stft


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    """HTK mel scale (MathUtils.HertzToMel: 2595·log10(1+f/700))."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=64)
def mel_filterbank(
    sample_rate: int,
    n_mels: int,
    n_fft: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1] with Slaney area norm
    (AudioTensorDSP.MelFilterbank :840-896)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    lower = hz_pts[:-2][:, None]
    center = hz_pts[1:-1][:, None]
    upper = hz_pts[2:][:, None]
    f = fft_freqs[None, :]
    up_slope = (f - lower) / np.maximum(center - lower, 1e-10)
    down_slope = (upper - f) / np.maximum(upper - center, 1e-10)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # the reference uses half-open intervals [left, center), [center, right):
    # at f == center the down slope (=1) applies either way, so max/min matches.
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@partial(jax.jit, static_argnames=("sample_rate", "n_mels", "n_fft", "hop_length",
                                   "window_type", "f_min", "f_max", "power", "center"))
def mel_spectrogram(
    audio: jax.Array,
    sample_rate: int,
    n_mels: int = 80,
    n_fft: int = 2048,
    hop_length: int = 512,
    window_type: str = "hann",
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 1.0,
    center: bool = True,
) -> jax.Array:
    """[..., T] -> mel spectrogram [..., n_mels, frames].

    power=1 gives magnitude-mel (the reference MelSpectrogramLoss uses
    magnitude with MelPow=1, Config/DAC/DACConfig.cs:149)."""
    spec = stft(audio, n_fft=n_fft, hop_length=hop_length,
                window_type=window_type, center=center)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    fb = jnp.asarray(mel_filterbank(sample_rate, n_mels, n_fft, f_min, f_max))
    return jnp.einsum("mf,...ft->...mt", fb, mag,
                      preferred_element_type=jnp.float32)


@lru_cache(maxsize=16)
def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_mfcc, n_mels] (AudioTensorDSP.DCTMatrix)."""
    mel_idx = np.arange(n_mels)
    mfcc_idx = np.arange(n_mfcc)[:, None]
    m = np.cos(mfcc_idx * (2 * mel_idx + 1) * np.pi / (2 * n_mels))
    m *= np.sqrt(2.0 / n_mels)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


@partial(jax.jit, static_argnames=("sample_rate", "n_mfcc", "n_mels", "n_fft",
                                   "hop_length", "log_offset"))
def mfcc(
    audio: jax.Array,
    sample_rate: int,
    n_mfcc: int = 40,
    n_mels: int = 80,
    n_fft: int = 2048,
    hop_length: int = 512,
    log_offset: float = 1e-6,
) -> jax.Array:
    """[..., T] -> MFCC [..., n_mfcc, frames] (AudioTensorDSP.MFCC :408)."""
    mel = mel_spectrogram(audio, sample_rate, n_mels=n_mels, n_fft=n_fft,
                          hop_length=hop_length, power=2.0)
    log_mel = jnp.log(mel + log_offset)
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels))
    return jnp.einsum("cm,...mt->...ct", dct, log_mel,
                      preferred_element_type=jnp.float32)
