"""Delay-pattern machinery for Dia's multi-channel code streams.

Rebuild of /root/reference/NeuralCodecs.Torch/Modules/Dia/AudioUtils.cs:19-176:
channel c is shifted right by delay[c] steps (BOS fills the head, PAD the
tail); revert shifts left. Pure vectorized gathers — no index-table
precomputation needed since XLA fuses the take_along_axis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def apply_audio_delay(audio: jax.Array, pad_value: int, bos_value: int,
                      delay_pattern: Sequence[int]) -> jax.Array:
    """audio: [B, T, C] int -> delayed [B, T, C].

    out[b, t, c] = BOS            if t < delay[c]
                 = audio[b, t - delay[c], c]  otherwise (clamped)
    (AudioUtils.BuildDelayIndices/ApplyAudioDelay :19-94.)
    """
    b, t, c = audio.shape
    delay = jnp.asarray(delay_pattern, jnp.int32)
    t_idx = jnp.arange(t, dtype=jnp.int32)[None, :, None] - delay[None, None, :]
    gathered = jnp.take_along_axis(
        audio, jnp.broadcast_to(jnp.clip(t_idx, 0, t - 1), (b, t, c)), axis=1)
    out = jnp.where(t_idx < 0, bos_value, gathered)
    return jnp.where(t_idx >= t, pad_value, out)


def revert_audio_delay(audio: jax.Array, pad_value: int,
                       delay_pattern: Sequence[int],
                       original_t: int | None = None) -> jax.Array:
    """Invert apply_audio_delay: out[b,t,c] = audio[b, t + delay[c], c]
    (AudioUtils.BuildRevertIndices/RevertAudioDelay :108-176)."""
    b, t, c = audio.shape
    t_cap = original_t if original_t is not None else t
    delay = jnp.asarray(delay_pattern, jnp.int32)
    t_idx = jnp.arange(t, dtype=jnp.int32)[None, :, None] + delay[None, None, :]
    gathered = jnp.take_along_axis(
        audio, jnp.broadcast_to(jnp.minimum(t_idx, t - 1), (b, t, c)), axis=1)
    return jnp.where(t_idx >= t_cap, pad_value, gathered)
