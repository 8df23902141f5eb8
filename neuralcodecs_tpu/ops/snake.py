"""Snake activation: x + sin²(αx)/α with a learnable per-channel α.

Counterpart of Snake1d in the reference
(/root/reference/NeuralCodecs.Torch/Modules/SNAC/Snake1d.cs:54-63), which
computes ``where(α==0, x, x + sin²(αx)/α)``. On TPU this is a pure VPU
elementwise chain that XLA fuses into the surrounding convs; the explicit
`cuda.synchronize()` the reference needs does not exist here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Apply snake activation on channels-last input.

    x: [..., C]; alpha: [C] (broadcast over leading dims).
    Matches the reference's α==0 guard exactly (identity at α=0, which is
    also the true limit of sin²(αx)/α).
    """
    alpha = alpha.astype(x.dtype)
    s = jnp.sin(alpha * x)
    safe_alpha = jnp.where(alpha == 0, jnp.ones_like(alpha), alpha)
    return jnp.where(alpha == 0, x, x + (s * s) / safe_alpha)
