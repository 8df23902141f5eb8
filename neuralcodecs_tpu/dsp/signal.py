"""AudioSignal: batched audio container with DSP methods.

Counterpart of /root/reference/NeuralCodecs.Torch/AudioTools/AudioSignal.cs
(1,345 LoC): wraps [B, C, T] samples + sample rate with STFT/mel/loudness/
normalize/resample/effects/batch utilities and WAV I/O. Here the container
is a thin pytree-compatible wrapper over a jnp array — every method returns
a new AudioSignal (functional style), and the compute stays on device.
"""

from __future__ import annotations

import dataclasses

import wave
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.stft import STFTParams, istft, stft
from neuralcodecs_tpu.dsp.mel import mel_spectrogram, mfcc
from neuralcodecs_tpu.dsp.loudness import integrated_loudness, normalize_loudness
from neuralcodecs_tpu.dsp.resample import resample_poly


@dataclasses.dataclass
class AudioInfo:
    """Basic stream facts (AudioTools/AudioInfo.cs:7-12)."""

    duration: float
    num_frames: int
    sample_rate: float


class AudioSignal:
    """[B, C, T] audio + sample rate."""

    def __init__(self, audio, sample_rate: int,
                 stft_params: STFTParams | None = None):
        a = jnp.asarray(audio, jnp.float32)
        if a.ndim == 1:
            a = a[None, None, :]
        elif a.ndim == 2:
            a = a[None, :, :]
        self.audio_data = a
        self.sample_rate = int(sample_rate)
        self.stft_params = stft_params or STFTParams()

    # ------------------------------------------------------------------- I/O

    @classmethod
    def load(cls, path: str | Path, offset: float = 0.0,
             duration: float | None = None) -> "AudioSignal":
        """Read a WAV file (16/24/32-bit PCM or float32)."""
        path = Path(path)
        with wave.open(str(path), "rb") as f:
            sr = f.getframerate()
            channels = f.getnchannels()
            width = f.getsampwidth()
            start = int(offset * sr)
            f.setpos(min(start, f.getnframes()))
            count = f.getnframes() - start
            if duration is not None:
                count = min(count, int(duration * sr))
            raw = f.readframes(count)
        if width == 2:
            data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
        elif width == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            ints = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16))
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            data = ints.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"Unsupported WAV sample width: {width}")
        data = data.reshape(-1, channels).T  # [C, T]
        return cls(data, sr)

    def write(self, path: str | Path) -> None:
        """Write 16-bit PCM WAV."""
        a = np.asarray(self.audio_data[0])  # [C, T]
        pcm = np.clip(a.T, -1.0, 1.0)
        pcm = (pcm * 32767.0).astype(np.int16)
        with wave.open(str(path), "wb") as f:
            f.setnchannels(a.shape[0])
            f.setsampwidth(2)
            f.setframerate(self.sample_rate)
            f.writeframes(pcm.tobytes())

    # ------------------------------------------------------------ properties

    @property
    def batch_size(self) -> int:
        return self.audio_data.shape[0]

    @property
    def num_channels(self) -> int:
        return self.audio_data.shape[1]

    @property
    def signal_length(self) -> int:
        return self.audio_data.shape[2]

    @property
    def info(self) -> "AudioInfo":
        """Stream facts record (AudioTools/AudioInfo.cs)."""
        return AudioInfo(duration=self.signal_duration,
                         num_frames=self.signal_length,
                         sample_rate=float(self.sample_rate))

    @property
    def signal_duration(self) -> float:
        return self.signal_length / self.sample_rate

    # ------------------------------------------------------------------- DSP

    def stft(self, **overrides) -> jax.Array:
        """Complex STFT [B, C, F, frames] (AudioSignal.STFT :1049-1100)."""
        p = self.stft_params
        return stft(self.audio_data,
                    n_fft=overrides.get("window_length", p.window_length),
                    hop_length=overrides.get("hop_length", p.hop_length),
                    window_type=overrides.get("window_type", p.window_type),
                    center=overrides.get("center", p.center))

    def istft(self, spec: jax.Array, length: int | None = None) -> "AudioSignal":
        p = self.stft_params
        audio = istft(spec, n_fft=p.window_length, hop_length=p.hop_length,
                      window_type=p.window_type, center=p.center,
                      length=length or self.signal_length)
        return AudioSignal(audio, self.sample_rate, self.stft_params)

    def mel_spectrogram(self, n_mels: int = 80, **overrides) -> jax.Array:
        p = self.stft_params
        return mel_spectrogram(
            self.audio_data, self.sample_rate, n_mels=n_mels,
            n_fft=overrides.get("window_length", p.window_length),
            hop_length=overrides.get("hop_length", p.hop_length),
            window_type=overrides.get("window_type", p.window_type),
            f_min=overrides.get("mel_fmin", 0.0),
            f_max=overrides.get("mel_fmax", None))

    def mfcc(self, n_mfcc: int = 40, n_mels: int = 80) -> jax.Array:
        p = self.stft_params
        return mfcc(self.audio_data, self.sample_rate, n_mfcc=n_mfcc,
                    n_mels=n_mels, n_fft=p.window_length,
                    hop_length=p.hop_length)

    def loudness(self) -> jax.Array:
        """Integrated LUFS per batch item (AudioSignal.Loudness :847)."""
        return integrated_loudness(self.audio_data, self.sample_rate)

    def normalize(self, target_db: float = -24.0) -> "AudioSignal":
        out = normalize_loudness(self.audio_data, self.sample_rate, target_db)
        return AudioSignal(out, self.sample_rate, self.stft_params)

    def resample(self, target_rate: int) -> "AudioSignal":
        if target_rate == self.sample_rate:
            return self
        out = resample_poly(self.audio_data, self.sample_rate, target_rate)
        return AudioSignal(out, target_rate, self.stft_params)

    def to_mono(self) -> "AudioSignal":
        return AudioSignal(jnp.mean(self.audio_data, axis=1, keepdims=True),
                           self.sample_rate, self.stft_params)

    def peak_normalize(self, peak: float = 1.0) -> "AudioSignal":
        m = jnp.max(jnp.abs(self.audio_data), axis=(1, 2), keepdims=True)
        return AudioSignal(self.audio_data / jnp.maximum(m, 1e-9) * peak,
                           self.sample_rate, self.stft_params)

    def preemphasis(self, coef: float = 0.85) -> "AudioSignal":
        a = self.audio_data
        out = jnp.concatenate([a[..., :1], a[..., 1:] - coef * a[..., :-1]], axis=-1)
        return AudioSignal(out, self.sample_rate, self.stft_params)

    # -------------------------------------------------------- batch/slicing

    def excerpt(self, offset: float, duration: float) -> "AudioSignal":
        start = int(offset * self.sample_rate)
        length = int(duration * self.sample_rate)
        return AudioSignal(self.audio_data[..., start:start + length],
                           self.sample_rate, self.stft_params)

    def windows(self, window_duration: float,
                hop_duration: float) -> Iterable["AudioSignal"]:
        """Iterate fixed-length windows (AudioSignalExtensions.cs:9-101)."""
        w = int(window_duration * self.sample_rate)
        h = int(hop_duration * self.sample_rate)
        for start in range(0, max(self.signal_length - w + 1, 1), h):
            yield AudioSignal(self.audio_data[..., start:start + w],
                              self.sample_rate, self.stft_params)

    @staticmethod
    def batch(signals: Sequence["AudioSignal"],
              pad: bool = True) -> "AudioSignal":
        """Stack signals into one batch, right-padding to the longest."""
        if not signals:
            raise ValueError("No signals to batch")
        sr = signals[0].sample_rate
        if any(s.sample_rate != sr for s in signals):
            raise ValueError("All signals must share a sample rate")
        max_t = max(s.signal_length for s in signals)
        rows = []
        for s in signals:
            a = s.audio_data
            if a.shape[-1] < max_t:
                if not pad:
                    raise ValueError("Signals differ in length and pad=False")
                a = jnp.pad(a, ((0, 0), (0, 0), (0, max_t - a.shape[-1])))
            rows.append(a)
        return AudioSignal(jnp.concatenate(rows, axis=0), sr,
                           signals[0].stft_params)

    def concat(self, other: "AudioSignal") -> "AudioSignal":
        if other.sample_rate != self.sample_rate:
            other = other.resample(self.sample_rate)
        return AudioSignal(
            jnp.concatenate([self.audio_data, other.audio_data], axis=-1),
            self.sample_rate, self.stft_params)

    # --------------------------------------------------------- arithmetic ops

    def _coerce(self, other):
        return other.audio_data if isinstance(other, AudioSignal) else other

    def __add__(self, other):
        return AudioSignal(self.audio_data + self._coerce(other),
                           self.sample_rate, self.stft_params)

    def __sub__(self, other):
        return AudioSignal(self.audio_data - self._coerce(other),
                           self.sample_rate, self.stft_params)

    def __mul__(self, other):
        return AudioSignal(self.audio_data * self._coerce(other),
                           self.sample_rate, self.stft_params)

    __rmul__ = __mul__

    def __len__(self) -> int:
        return self.batch_size

    def __repr__(self) -> str:
        return (f"AudioSignal(batch={self.batch_size}, channels="
                f"{self.num_channels}, duration={self.signal_duration:.3f}s, "
                f"sr={self.sample_rate})")
