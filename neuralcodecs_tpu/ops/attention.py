"""Attention ops: windowed local MHA with rotary embeddings.

Counterpart of the reference's LocalMHA / SinusoidalEmbedding / RotaryEmbedding
(/root/reference/NeuralCodecs.Torch/Modules/SNAC/LocalMHA.cs:78-115,
 SinusoidalEmbedding.cs:33-106, RotaryEmbedding.cs:16-68).

TPU-first shape strategy: the fixed attention windows (32 frames in SNAC) are
independent, so they are folded into the batch dimension — one big batched
SDPA over [B·W, S, H, Dh] that XLA maps straight onto the MXU. No masks, no
ring structure needed (survey §5 long-context note).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sinusoidal_freqs(seq_len: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Rotary frequency table [seq_len, dim]: cat(t⊗inv_freq, t⊗inv_freq).

    inv_freq = 1 / 10000^(arange(0, dim, 2)/dim), matching
    SinusoidalEmbedding.forward (use_xpos=False ⇒ scale ≡ 1).
    """
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [S, dim/2]
    freqs = np.concatenate([freqs, freqs], axis=-1)  # [S, dim]
    return jnp.asarray(freqs, dtype=dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    """[-x2, x1] rotation over the last dim (RotaryEmbedding.RotateHalf)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, freqs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Apply rotary embeddings to q, k of shape [..., S, Dh]; scale ≡ 1."""
    cos = jnp.cos(freqs).astype(q.dtype)
    sin = jnp.sin(freqs).astype(q.dtype)
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q, k


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         mask: jax.Array | None = None, is_causal: bool = False) -> jax.Array:
    """Scaled dot-product attention over [B, T, H, Dh] (torch SDPA parity).

    Counterpart of AttentionUtils.ScaledDotProductAttention
    (/root/reference/NeuralCodecs.Torch/Utils/AttentionUtils.cs:24-122).
    Softmax in f32 for stability regardless of compute dtype.
    """
    dh = q.shape[-1]
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if is_causal:
        t, s = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((t, s), dtype=bool), k=s - t)
        logits = jnp.where(causal, logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", weights, v)


def local_mha(
    x: jax.Array,
    *,
    norm_scale: jax.Array,
    norm_bias: jax.Array,
    qkv_weight: jax.Array,
    out_weight: jax.Array,
    window_size: int,
    num_heads: int,
    use_rope: bool = True,
) -> jax.Array:
    """Windowed multi-head self-attention with residual, channels-last.

    x: [B, T, C] with T divisible by window_size (the SNAC pre-pad guarantees
    this, Models/SNAC.cs:70-80). qkv_weight: [C, 3C]; out_weight: [C, C]
    (both bias-free, LocalMHA.cs:63-64).
    """
    b, t, c = x.shape
    residual = x
    h = layer_norm(x, norm_scale, norm_bias)
    qkv = jnp.dot(h, qkv_weight, preferred_element_type=h.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    w = t // window_size
    dh = c // num_heads

    def to_windows(a: jax.Array) -> jax.Array:
        # [B, T, C] -> [B·W, S, H, Dh]
        a = a.reshape(b, w, window_size, num_heads, dh)
        return a.reshape(b * w, window_size, num_heads, dh)

    q, k, v = to_windows(q), to_windows(k), to_windows(v)

    if use_rope:
        freqs = sinusoidal_freqs(window_size, dh, dtype=jnp.float32)
        # broadcast freqs over heads: [S, Dh] applied to [BW, S, H, Dh]
        q, k = apply_rope(q, k, freqs[None, :, None, :])

    out = sdpa(q, k, v)  # [BW, S, H, Dh]
    out = out.reshape(b, w * window_size, num_heads * dh)
    out = jnp.dot(out, out_weight, preferred_element_type=out.dtype)
    return out + residual
