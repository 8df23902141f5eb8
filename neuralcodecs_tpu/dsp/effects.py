"""Audio effects: compressor, delay, distortion, flanger, filters, reverb,
tremolo, chorus, phaser, pitch shift.

Counterpart of /root/reference/NeuralCodecs.Torch/AudioTools/
{AudioTensorEffects,AudioSignalEffects}.cs. All operate on [B, C, T] float
arrays; recursive elements use the lax.scan filter kernels in dsp/filters.py
instead of the reference's per-sample host loops.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.filters import (
    allpass_filter,
    comb_filter,
    fir_filter,
    one_pole_follower,
    variable_delay_line,
)


def _as_bct(audio: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    a = jnp.asarray(audio, jnp.float32)
    orig = a.shape
    if a.ndim == 1:
        a = a[None, None, :]
    elif a.ndim == 2:
        a = a[None, :, :]
    return a, orig


def _restore(a: jax.Array, orig: tuple[int, ...]) -> jax.Array:
    return a.reshape(orig) if len(orig) < 3 else a


def apply_compressor(audio, sample_rate: int, threshold: float = -20.0,
                     ratio: float = 4.0, attack_time: float = 0.005,
                     release_time: float = 0.050, makeup_gain: float = 0.0):
    """Feed-forward compressor with envelope follower
    (AudioTensorEffects.ApplyCompressor :23-58)."""
    a, orig = _as_bct(audio)
    threshold_lin = 10.0 ** (threshold / 20.0)
    attack_gain = 1.0 - math.exp(-1.0 / max(int(attack_time * sample_rate), 1))
    release_gain = 1.0 - math.exp(-1.0 / max(int(release_time * sample_rate), 1))
    envelope = one_pole_follower(a, attack_gain, release_gain)
    reduction = jnp.where(
        envelope > threshold_lin,
        (envelope / threshold_lin) ** (1.0 / ratio - 1.0),
        1.0)
    makeup = 10.0 ** (makeup_gain / 20.0)
    return _restore(a * reduction * makeup, orig)


def apply_delay(audio, sample_rate: int, delay_time: float = 0.3,
                feedback: float = 0.3, wet_level: float = 0.3,
                dry_level: float = 0.7):
    """Feedback delay (AudioTensorEffects.ApplyDelay :60-85).

    The ideal delay-line recursion w[n] = x[n-D] + fb·w[n-D] expands to a
    finite geometric series of shifted copies — fully vectorized, no scan.
    """
    a, orig = _as_bct(audio)
    d = max(int(delay_time * sample_rate), 1)
    t = a.shape[-1]
    wet = jnp.zeros_like(a)
    gain = 1.0
    shift = d
    while shift < t:
        wet = wet.at[..., shift:].add(gain * a[..., : t - shift])
        gain *= feedback
        shift += d
        if gain < 1e-6:
            break
    return _restore(dry_level * a + wet_level * wet, orig)


def apply_distortion(audio, amount: float = 0.5, wet_level: float = 1.0):
    """tanh waveshaper (AudioTensorEffects.ApplyDistortion :87-94)."""
    a, orig = _as_bct(audio)
    processed = jnp.tanh(a * (1 + amount * 10))
    return _restore(processed * wet_level + a * (1 - wet_level), orig)


def apply_flanger(audio, sample_rate: int, rate: float = 0.5,
                  depth: float = 0.002, feedback: float = 0.7,
                  wet_level: float = 0.7):
    """LFO-modulated fractional delay (AudioTensorEffects.ApplyFlanger)."""
    a, orig = _as_bct(audio)
    t = a.shape[-1]
    time = jnp.arange(t, dtype=jnp.float32) / sample_rate
    max_delay = max(int(depth * sample_rate), 1)
    lfo = max_delay * 0.5 * (1 + jnp.sin(2 * jnp.pi * rate * time))
    wet = variable_delay_line(a, lfo, max_delay, feedback)
    return _restore((1 - wet_level) * a + wet_level * wet, orig)


def _windowed_sinc(order: int, norm_cutoff: float, highpass: bool) -> np.ndarray:
    """Hamming-windowed sinc prototype (ApplyHigh/LowPassFilter :128-205)."""
    order = order + 1 if order % 2 == 0 else order
    n = np.arange(-(order // 2), order // 2 + 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        sinc = np.where(n == 0, 2 * norm_cutoff,
                        np.sin(2 * np.pi * norm_cutoff * n) / (n * np.pi))
    if highpass:
        h = -sinc
        h[order // 2] += 1.0
    else:
        h = sinc
    window = 0.54 - 0.46 * np.cos(2 * np.pi * (n + order // 2) / order)
    h = h * window
    h = h / np.abs(h).sum() if highpass else h / h.sum()
    return h.astype(np.float32)


def apply_highpass(audio, sample_rate: int, cutoff_freq: float = 1000.0,
                   filter_order: int = 51):
    a, orig = _as_bct(audio)
    h = _windowed_sinc(filter_order, cutoff_freq / sample_rate, highpass=True)
    return _restore(fir_filter(a, jnp.asarray(h)), orig)


def apply_lowpass(audio, sample_rate: int, cutoff_freq: float = 1000.0,
                  filter_order: int = 51):
    a, orig = _as_bct(audio)
    h = _windowed_sinc(filter_order, cutoff_freq / sample_rate, highpass=False)
    return _restore(fir_filter(a, jnp.asarray(h)), orig)


_COMB_DELAYS = (1557, 1617, 1491, 1422, 1277, 1356, 1188, 1116)
_ALLPASS_DELAYS = (225, 556, 441, 341)


def apply_reverb(audio, room_size: float = 0.8, damping: float = 0.5,
                 wet_level: float = 0.3, dry_level: float = 0.7):
    """Schroeder reverberator: 8 damped combs + 4 allpasses
    (AudioTensorEffects.ApplyReverb :207-278)."""
    a, orig = _as_bct(audio)
    room_size = float(np.clip(room_size, 0, 1))
    damping = float(np.clip(damping, 0, 1))
    feedback = room_size * 0.84
    wet = jnp.zeros_like(a)
    for delay in _COMB_DELAYS:
        wet = wet + comb_filter(a, delay, feedback, damping)
    for delay in _ALLPASS_DELAYS:
        wet = allpass_filter(wet, delay, 0.5)
    return _restore(dry_level * a + wet_level * wet, orig)


def apply_tremolo(audio, sample_rate: int, rate: float = 5.0,
                  depth: float = 0.5):
    """Amplitude LFO (AudioTensorEffects.ApplyTremolo :280-295)."""
    a, orig = _as_bct(audio)
    t = a.shape[-1]
    time = jnp.arange(t, dtype=jnp.float32) / sample_rate
    lfo = 1 - depth + depth * jnp.sin(2 * jnp.pi * rate * time)
    return _restore(a * lfo, orig)


def apply_chorus(audio, sample_rate: int, rate: float = 1.5,
                 depth: float = 0.007, voices: int = 3, wet_level: float = 0.5):
    """Multi-voice modulated delay (AudioSignalEffects.cs chorus)."""
    a, orig = _as_bct(audio)
    t = a.shape[-1]
    time = jnp.arange(t, dtype=jnp.float32) / sample_rate
    max_delay = max(int(depth * sample_rate), 1)
    wet = jnp.zeros_like(a)
    for v in range(voices):
        phase = 2 * jnp.pi * v / voices
        lfo = max_delay * 0.5 * (1 + jnp.sin(2 * jnp.pi * rate * time + phase))
        wet = wet + variable_delay_line(a, lfo, max_delay, 0.0)
    wet = wet / voices
    return _restore((1 - wet_level) * a + wet_level * wet, orig)


def apply_phaser(audio, sample_rate: int, rate: float = 0.5,
                 depth: float = 0.7, stages: int = 4, wet_level: float = 0.5):
    """Cascaded sweeping first-order allpass sections
    (AudioSignalEffects.cs phaser)."""
    a, orig = _as_bct(audio)
    t = a.shape[-1]
    time = jnp.arange(t, dtype=jnp.float32) / sample_rate
    # sweep center 200..2000 Hz
    freq = 200.0 * (10.0 ** (depth * (0.5 + 0.5 * jnp.sin(2 * jnp.pi * rate * time))))
    coeff = (jnp.tan(jnp.pi * freq / sample_rate) - 1) / (
        jnp.tan(jnp.pi * freq / sample_rate) + 1)
    lead = a.shape[:-1]
    xt = jnp.swapaxes(a.reshape(-1, t), 0, 1)  # [T, N]

    def stage_scan(x_tn):
        def step(z, inputs):
            x_n, c = inputs
            y = c * x_n + z
            z_new = x_n - c * y
            return z_new, y

        _, y = jax.lax.scan(step, jnp.zeros(x_tn.shape[1], a.dtype), (x_tn, coeff))
        return y

    y = xt
    for _ in range(stages):
        y = stage_scan(y)
    wet = jnp.swapaxes(y, 0, 1).reshape(*lead, t)
    return _restore((1 - wet_level) * a + wet_level * wet, orig)


def apply_pitch_shift(audio, sample_rate: int, semitones: float = 0.0):
    """Resampling pitch shift (AudioSignalEffects.cs pitch shift): shift by
    rate change, then time-correct back to the original length."""
    if abs(semitones) < 1e-9:
        return jnp.asarray(audio, jnp.float32)
    from neuralcodecs_tpu.dsp.resample import linear_resample

    a, orig = _as_bct(audio)
    factor = 2.0 ** (semitones / 12.0)
    shifted = linear_resample(a, sample_rate, max(int(sample_rate / factor), 1))
    out = linear_resample(shifted, max(int(sample_rate / factor), 1), sample_rate)
    t = a.shape[-1]
    if out.shape[-1] < t:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, t - out.shape[-1])])
    return _restore(out[..., :t], orig)
