"""STFT / ISTFT as jit-able XLA ops.

Counterpart of the reference's tensor DSP STFT path
(/root/reference/NeuralCodecs.Torch/AudioTools/AudioTensorDSP.cs:716-833 and
ISTFT :124), which wraps torch.stft. Semantics are pinned to
``torch.stft(center=..., pad_mode='reflect', onesided=True)`` so mel/SNR
metrics are comparable with the reference (SURVEY hard-part #7).

Formulation: framing is a gather (XLA turns the [frames, n_fft] index grid
into an efficient strided load), windowing is fused elementwise, and the FFT
runs as one batched rfft over the frame axis — no host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class STFTParams:
    """Counterpart of AudioTools/STFTParams.cs:8-64."""

    window_length: int = 2048
    hop_length: int = 512
    window_type: str = "hann"
    center: bool = True
    match_stride: bool = False
    padding_mode: str = "reflect"


def get_window(window_type: str, window_length: int) -> np.ndarray:
    """Window lookup (AudioTensorDSP.GetWindow :97-114). Periodic windows to
    match torch.hann_window defaults."""
    n = window_length
    t = np.arange(n)
    wt = window_type.lower()
    if wt == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * t / n)
    elif wt == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * t / n)
    elif wt == "blackman":
        w = (0.42 - 0.5 * np.cos(2 * np.pi * t / n)
             + 0.08 * np.cos(4 * np.pi * t / n))
    elif wt == "bartlett":
        w = 1.0 - np.abs(2.0 * t / n - 1.0)
    elif wt == "sqrt_hann":
        w = np.sqrt(0.5 - 0.5 * np.cos(2 * np.pi * t / n))
    elif wt == "average":
        w = np.full(n, 1.0 / n)
    elif wt == "ones":
        w = np.ones(n)
    else:
        raise ValueError(f"Unsupported window type: {window_type}")
    return w.astype(np.float32)


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[..., T] -> [..., frames, frame_length] via strided gather."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return jnp.take(x, jnp.asarray(idx), axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "window_type", "center",
                                   "pad_mode"))
def stft(
    audio: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    window_type: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """[..., T] -> complex [..., n_fft//2+1, frames] (torch.stft layout)."""
    audio = jnp.asarray(audio, jnp.float32)
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
        audio = jnp.pad(audio, pad_widths, mode=pad_mode)
    window = jnp.asarray(get_window(window_type, n_fft))
    frames = _frame(audio, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., frames, freq]
    return jnp.swapaxes(spec, -1, -2)     # [..., freq, frames]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "window_type", "center",
                                   "length"))
def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    window_type: str = "hann",
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with windowed overlap-add (torch.istft semantics).

    spec: complex [..., freq, frames] -> [..., T].
    """
    spec = jnp.swapaxes(spec, -1, -2)  # [..., frames, freq]
    window = jnp.asarray(get_window(window_type, n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # [..., frames, n_fft]

    n_frames = frames.shape[-2]
    t_total = n_fft + hop_length * (n_frames - 1)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))

    lead = frames.shape[:-2]
    flat_frames = frames.reshape(*lead, -1)
    out = jnp.zeros((*lead, t_total), jnp.float32)
    out = out.at[..., flat_idx].add(flat_frames)

    wsq = (window * window)[None, :].repeat(n_frames, axis=0).reshape(-1)
    norm = jnp.zeros(t_total, jnp.float32).at[flat_idx].add(wsq)
    out = out / jnp.maximum(norm, 1e-11)

    if center:
        out = out[..., n_fft // 2:]
        if length is not None:
            out = out[..., :length]
        else:
            out = out[..., : t_total - n_fft]
    elif length is not None:
        out = out[..., :length]
    return out


def compute_stft_padding(length: int, window_length: int, hop_length: int,
                         match_stride: bool) -> tuple[int, int]:
    """Padding so frame count aligns to hop multiples when match_stride=True.

    Mirrors AudioSignal.ComputeStftPadding
    (/root/reference/.../AudioTools/AudioSignal.cs:640)."""
    if match_stride:
        assert hop_length == window_length // 4, \
            "match_stride requires hop == window//4"
        right_pad = -(-length // hop_length) * hop_length - length
        pad = (window_length - hop_length) // 2
        return right_pad + pad, pad
    return 0, 0
