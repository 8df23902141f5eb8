"""Reconstruction losses on audio: L1, multi-scale mel/STFT, SI-SDR.

Counterparts:
  * MelSpectrogramLoss (/root/reference/.../Modules/DAC/MelSpectrogramLoss.cs:29-137)
    — per scale: log-mel L1 (clamp→pow→log10) + raw-mag L1.
  * SISDRLoss (SISDRLoss.cs:9-165) — scale-invariant SDR in dB.
  * L1Loss (L1Loss.cs).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.mel import mel_spectrogram
from neuralcodecs_tpu.dsp.stft import stft


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


@partial(jax.jit, static_argnames=("sample_rate", "n_mels", "window_lengths",
                                   "clamp_eps", "mag_weight", "log_weight",
                                   "pow", "window_type"))
def mel_spectrogram_loss(
    x: jax.Array,
    y: jax.Array,
    sample_rate: int,
    n_mels: Sequence[int] = (150, 80),
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,  # noqa: A002 — reference parameter name
    window_type: str = "hann",
) -> jax.Array:
    """Multi-scale mel L1 between estimate x and reference y ([..., T])."""
    loss = jnp.zeros((), jnp.float32)
    for nm, wl in zip(n_mels, window_lengths):
        x_mel = mel_spectrogram(x, sample_rate, n_mels=nm, n_fft=wl,
                                hop_length=wl // 4, window_type=window_type)
        y_mel = mel_spectrogram(y, sample_rate, n_mels=nm, n_fft=wl,
                                hop_length=wl // 4, window_type=window_type)
        log_x = jnp.log10(jnp.clip(x_mel, clamp_eps) ** pow)
        log_y = jnp.log10(jnp.clip(y_mel, clamp_eps) ** pow)
        loss = loss + log_weight * l1_loss(log_x, log_y)
        loss = loss + mag_weight * l1_loss(x_mel, y_mel)
    return loss


@partial(jax.jit, static_argnames=("window_lengths", "clamp_eps", "mag_weight",
                                   "log_weight"))
def multi_scale_stft_loss(
    x: jax.Array,
    y: jax.Array,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
) -> jax.Array:
    """Multi-scale STFT magnitude loss (MultiScaleSTFTLossConfig defaults)."""
    loss = jnp.zeros((), jnp.float32)
    for wl in window_lengths:
        x_mag = jnp.abs(stft(x, n_fft=wl, hop_length=wl // 4))
        y_mag = jnp.abs(stft(y, n_fft=wl, hop_length=wl // 4))
        loss = loss + log_weight * l1_loss(
            jnp.log10(jnp.clip(x_mag, clamp_eps) ** 2.0),
            jnp.log10(jnp.clip(y_mag, clamp_eps) ** 2.0))
        loss = loss + mag_weight * l1_loss(x_mag, y_mag)
    return loss


@partial(jax.jit, static_argnames=("scaling", "zero_mean", "clip_min", "reduction"))
def sisdr_loss(
    estimates: jax.Array,
    references: jax.Array,
    scaling: bool = True,
    zero_mean: bool = True,
    clip_min: float | None = None,
    reduction: str = "mean",
    eps: float = 1e-8,
) -> jax.Array:
    """Negative SI-SDR in dB of estimates vs references, shape [..., T]."""
    est = estimates.reshape(-1, estimates.shape[-1]).astype(jnp.float32)
    ref = references.reshape(-1, references.shape[-1]).astype(jnp.float32)
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    if scaling:
        scale = (jnp.sum(est * ref, axis=-1, keepdims=True) + eps) / (
            jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)
    else:
        scale = jnp.ones_like(ref[:, :1])
    target = scale * ref
    error = est - target
    t_pow = jnp.sum(target * target, axis=-1)
    e_pow = jnp.sum(error * error, axis=-1)
    loss = -10.0 * jnp.log10(t_pow / (e_pow + eps) + eps)
    if clip_min is not None:
        loss = jnp.clip(loss, clip_min)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
