"""Windowed overlap-add recombination for chunked codecs.

Counterpart of DSP.LinearOverlapAdd
(/root/reference/NeuralCodecs.Torch/AudioTools/AudioTensorDSP.cs:161-269):
triangular weights w(t) = 0.5 - |t/(T+1) - 0.5| per frame, summed and
renormalized. Frames may have different lengths (the final partial chunk).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _tri_weight(frame_length: int, dtype=jnp.float32) -> jax.Array:
    t = np.linspace(0.0, 1.0, frame_length + 2)[1:-1]
    return jnp.asarray(0.5 - np.abs(t - 0.5), dtype=dtype)


def linear_overlap_add(frames: Sequence[jax.Array], stride: int) -> jax.Array:
    """frames: list of [..., T_i] arrays; consecutive frames offset by stride."""
    if not frames:
        raise ValueError("At least one frame is required")
    first = frames[0]
    lead_shape = first.shape[:-1]
    total = stride * (len(frames) - 1) + frames[-1].shape[-1]
    out = jnp.zeros((*lead_shape, total), first.dtype)
    sum_w = jnp.zeros((total,), first.dtype)
    weight_full = _tri_weight(first.shape[-1], first.dtype)
    offset = 0
    for frame in frames:
        t = frame.shape[-1]
        w = weight_full[:t]
        out = out.at[..., offset:offset + t].add(frame * w)
        sum_w = sum_w.at[offset:offset + t].add(w)
        offset += stride
    sum_w = jnp.maximum(sum_w, 1e-10)
    return out / sum_w
