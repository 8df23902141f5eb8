"""GAN losses for codec training (LS-GAN + feature matching).

Counterpart of GANLoss in the reference
(/root/reference/NeuralCodecs.Torch/Modules/DAC/GANLoss.cs:9-104). The
discriminator is any callable returning a list of feature maps per scale
with the final element being the logits (the reference's Tensor[] contract).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

DiscOutputs = Sequence[Sequence[jax.Array]]  # per scale: [feat0, ..., logits]


def discriminator_loss(fake_outputs: DiscOutputs, real_outputs: DiscOutputs) -> jax.Array:
    """0.5·(E[D(fake)²] + E[(1-D(real))²]) summed over scales
    (GANLoss.DiscriminatorLoss)."""
    loss = jnp.zeros((), jnp.float32)
    for fake, real in zip(fake_outputs, real_outputs):
        d_fake, d_real = fake[-1], real[-1]
        loss = loss + 0.5 * (jnp.mean(d_fake**2) + jnp.mean((1.0 - d_real) ** 2))
    return loss


def generator_loss(fake_outputs: DiscOutputs) -> jax.Array:
    """E[(1-D(fake))²] summed over scales (GANLoss.GeneratorLoss)."""
    loss = jnp.zeros((), jnp.float32)
    for fake in fake_outputs:
        loss = loss + jnp.mean((1.0 - fake[-1]) ** 2)
    return loss


def feature_matching_loss(fake_outputs: DiscOutputs, real_outputs: DiscOutputs) -> jax.Array:
    """L1 between intermediate discriminator features (real side detached)."""
    loss = jnp.zeros((), jnp.float32)
    for fake, real in zip(fake_outputs, real_outputs):
        for f, r in zip(fake[:-1], real[:-1]):
            loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss
