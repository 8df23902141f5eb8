"""ITU-R BS.1770-4 loudness measurement (K-weighting + gated LUFS).

Counterpart of /root/reference/NeuralCodecs.Torch/AudioTools/LoudnessMeter.cs:
K-weighting high-shelf + high-pass biquads (coefficients :41-53), 400 ms
blocks at 75 % overlap, absolute (-70 LUFS) and relative (-10 dB) gating.
Biquads run as lax.scan kernels; block unfolding is a strided gather.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.filters import biquad

GAIN_FACTOR = 0.11512925464970229  # ln(10) / 20

# BS.1770 pre-filter coefficients at 48 kHz (LoudnessMeter.cs:41-53)
_HIGH_SHELF_B = (1.53512485958697, -2.69169618940638, 1.19839281085285)
_HIGH_SHELF_A = (1.0, -1.69065929318241, 0.73248077421585)
_HIGH_PASS_B = (1.0, -2.0, 1.0)
_HIGH_PASS_A = (1.0, -1.99004745483398, 0.99007225036621)

#: per-channel weights: L, R, C, Ls, Rs
_K_WEIGHTS = np.array([1.0, 1.0, 1.0, 1.41, 1.41], np.float32)


def k_weighting(audio: jax.Array) -> jax.Array:
    """Apply the K pre-filter chain to [..., T]."""
    x = biquad(audio, jnp.asarray(_HIGH_SHELF_B), jnp.asarray(_HIGH_SHELF_A))
    return biquad(x, jnp.asarray(_HIGH_PASS_B), jnp.asarray(_HIGH_PASS_A))


@partial(jax.jit, static_argnames=("sample_rate", "block_size"))
def integrated_loudness(audio: jax.Array, sample_rate: int = 44100,
                        block_size: float = 0.400) -> jax.Array:
    """Gated integrated loudness in LUFS of [B, C, T] (or [C, T] / [T])."""
    a = jnp.asarray(audio, jnp.float32)
    if a.ndim == 1:
        a = a[None, None, :]
    elif a.ndim == 2:
        a = a[None, :, :]
    b, c, t = a.shape
    weights = jnp.asarray(_K_WEIGHTS[:c])

    filtered = k_weighting(a)
    kernel = int(block_size * sample_rate)
    stride = int(kernel * 0.25)  # 75 % overlap
    if t < kernel:
        pad = kernel - t
        filtered = jnp.pad(filtered, ((0, 0), (0, 0), (0, pad)))
        t = kernel
    n_blocks = 1 + (t - kernel) // stride
    idx = (np.arange(n_blocks)[:, None] * stride + np.arange(kernel)[None, :])
    blocks = jnp.take(filtered, jnp.asarray(idx), axis=-1)  # [B, C, n_blocks, K]

    z = jnp.sum(blocks * blocks, axis=-1) / kernel          # [B, C, n_blocks]
    weighted = jnp.sum(weights[None, :, None] * z, axis=1)  # [B, n_blocks]
    l_blocks = -0.691 + 10.0 * jnp.log10(jnp.maximum(weighted, 1e-12))

    # absolute gate at -70 LUFS
    abs_mask = l_blocks > -70.0
    denom = jnp.maximum(jnp.sum(abs_mask, axis=-1), 1)
    z_abs = jnp.sum(jnp.where(abs_mask[:, None, :], z, 0.0), axis=-1) / denom[:, None]
    gamma_r = (-0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(z_abs * weights[None, :], axis=-1), 1e-12))) - 10.0

    both = abs_mask & (l_blocks > gamma_r[:, None])
    denom = jnp.maximum(jnp.sum(both, axis=-1), 1)
    z_gated = jnp.sum(jnp.where(both[:, None, :], z, 0.0), axis=-1) / denom[:, None]
    z_gated = jnp.nan_to_num(z_gated)
    lufs = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(weights[None, :] * z_gated, axis=-1), 1e-12))
    return lufs  # [B]


def normalize_loudness(audio: jax.Array, sample_rate: int,
                       target_db: float = -24.0) -> jax.Array:
    """Gain audio to a target LUFS (LoudnessMeter.NormalizeAudio :198)."""
    a = jnp.asarray(audio, jnp.float32)
    ref_db = integrated_loudness(a, sample_rate)
    gain = jnp.exp((target_db - ref_db) * GAIN_FACTOR)
    shape = [-1] + [1] * (a.ndim - 1)
    if a.ndim == 1:
        return a * gain[0]
    return a * gain.reshape(shape[: a.ndim])
