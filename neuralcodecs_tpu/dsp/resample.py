"""Resampling ops.

`linear_resample` matches the reference's host-side linear interpolator
(SNAC.ResampleAudio, /root/reference/NeuralCodecs.Torch/Models/SNAC.cs:287-313,
and AudioUtils.Resample, Core/Utils/AudioUtils.cs) but runs on device.
`resample_poly` is the quality path: windowed-sinc polyphase resampling as a
strided conv1d — the op TPUs are fastest at.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("src_rate", "dst_rate"))
def linear_resample(audio: jax.Array, src_rate: int, dst_rate: int) -> jax.Array:
    """Linear-interpolation resampling over the last axis."""
    audio = jnp.asarray(audio, jnp.float32)
    if src_rate == dst_rate:
        return audio
    n_in = audio.shape[-1]
    n_out = int(n_in * dst_rate / src_rate)
    ratio = dst_rate / src_rate
    pos = jnp.arange(n_out, dtype=jnp.float32) / ratio
    idx = jnp.clip(pos.astype(jnp.int32), 0, n_in - 1)
    frac = pos - idx.astype(jnp.float32)
    nxt = jnp.clip(idx + 1, 0, n_in - 1)
    left = jnp.take(audio, idx, axis=-1)
    right = jnp.take(audio, nxt, axis=-1)
    # match the reference's tail behavior: hold the last sample
    frac = jnp.where(idx >= n_in - 1, 0.0, frac)
    return left * (1.0 - frac) + right * frac


def _kaiser_sinc_filter(num_zeros: int, precision: int, rolloff: float) -> np.ndarray:
    """Windowed-sinc lowpass prototype for polyphase resampling."""
    taps = 2 * num_zeros * precision + 1
    t = (np.arange(taps) - (taps - 1) / 2) / precision
    window = np.kaiser(taps, beta=14.769656459379492)
    h = rolloff * np.sinc(rolloff * t) * window
    return h.astype(np.float32)


@partial(jax.jit, static_argnames=("src_rate", "dst_rate", "num_zeros"))
def resample_poly(audio: jax.Array, src_rate: int, dst_rate: int,
                  num_zeros: int = 24) -> jax.Array:
    """High-quality polyphase resampling of [..., T] via strided conv.

    Equivalent role to the reference's NAudio WDL resampler
    (Core/Utils/NAudioUtils.cs) but expressed as a conv1d so it runs fused
    on device.
    """
    audio = jnp.asarray(audio, jnp.float32)
    if src_rate == dst_rate:
        return audio
    g = math.gcd(src_rate, dst_rate)
    up, down = dst_rate // g, src_rate // g
    rolloff = min(1.0, up / down) * 0.945
    # prototype sampled at 1/up spacing: per-phase DC gain is already 1, so
    # no zero-stuffing gain compensation is needed
    h = _kaiser_sinc_filter(num_zeros, up, rolloff)
    # upsample by `up` (zero-stuffing), filter, downsample by `down`:
    # expressed as conv with lhs_dilation=up, window_stride=down.
    lead_shape = audio.shape[:-1]
    x = audio.reshape(-1, audio.shape[-1])[..., None]  # [B, T, 1]
    taps = h.shape[0]
    pad = taps // 2
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(h)[:, None, None],  # [K, 1, 1]
        window_strides=(down,),
        # extra `down` right-pad guarantees ceil coverage of the final frame
        padding=[(pad, pad + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[..., 0]
    n_out = int(audio.shape[-1] * up / down)
    return y[:, :n_out].reshape(*lead_shape, -1)
