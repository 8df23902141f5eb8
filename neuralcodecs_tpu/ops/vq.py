"""Vector-quantization codebook search: L2 argmin over HBM-resident codebooks.

Counterpart of the reference's DecodeLatents distance search
(/root/reference/NeuralCodecs.Torch/Modules/SNAC/VectorQuantizer.cs:115-141
and Modules/DAC/VectorQuantizer.cs:99-125, Modules/Encodec/EuclideanCodebook.cs:155-182):
dist = ‖x‖² + ‖e‖² − 2·x·e, argmin over codebook entries.

Two lookup flavors: `l2_argmin_codes` (plain euclidean — Encodec's
EuclideanCodebook) and `cosine_argmin_codes` (ViT-VQGAN normalized lookup —
SNAC/DAC factorized codebooks; see its docstring for the reference port-bug
note, PARITY.md "Known divergences" #12).

Two device paths:
  * `l2_argmin_codes` — pure-XLA formulation (a thin MXU matmul + argmin).
    The ‖x‖² term is dropped: it is constant per row and cannot change the
    argmin, saving one fused reduction.
  * `neuralcodecs_tpu.ops.pallas.codebook.l2_argmin_pallas` — fused Pallas
    kernel that never materializes the [T, N] distance matrix in HBM.
Dispatch picks Pallas on TPU for aligned shapes, XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def l2_argmin_codes(latents: jax.Array, codebook: jax.Array, *,
                    use_pallas: bool | None = None) -> jax.Array:
    """Nearest-codebook-entry indices.

    latents: [..., D] float; codebook: [N, D] float. Returns int32 [...].
    Ties break toward the lower index (torch.argmin semantics).
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    shape = latents.shape[:-1]
    d = latents.shape[-1]
    flat = latents.reshape(-1, d)
    if use_pallas:
        try:
            from neuralcodecs_tpu.ops.pallas.codebook import l2_argmin_pallas

            return l2_argmin_pallas(flat, codebook).reshape(shape)
        except Exception:  # pragma: no cover — fall back on any lowering issue
            pass
    return _l2_argmin_xla(flat, codebook).reshape(shape)


@functools.partial(jax.jit, static_argnames=())
def _l2_argmin_xla(flat: jax.Array, codebook: jax.Array) -> jax.Array:
    flat = flat.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    # scores = ‖e‖² − 2 x·e  (the ‖x‖² row constant is argmin-invariant)
    e_sq = jnp.sum(codebook * codebook, axis=-1)  # [N]
    cross = jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)  # [T, N]
    scores = e_sq[None, :] - 2.0 * cross
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization over the last axis.

    Matches torch.nn.functional.normalize(p=2, dim=-1): x / max(‖x‖, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cosine_argmin_codes(latents: jax.Array, codebook: jax.Array, *,
                        use_pallas: bool | None = None) -> jax.Array:
    """Nearest codebook entry under the ViT-VQGAN **normalized** lookup:
    both encodings and codebook rows are L2-normalized before the distance,
    turning euclidean distance into cosine similarity.

    This is the lookup the upstream descript-audio-codec (and SNAC, which
    adapts its VQ) actually runs — validated bit-exact against the
    independent HF-transformers DacModel (tests/test_cross_transformers.py).
    The C# reference *comments* the normalization but never applies it
    (Modules/DAC/VectorQuantizer.cs:110-118 and
    Modules/SNAC/VectorQuantizer.cs:125-134 compute plain L2 on the raw
    tensors) — a port bug we deliberately do not reproduce, recorded in
    PARITY.md "Known divergences". Encodec's EuclideanCodebook keeps the
    plain `l2_argmin_codes` (upstream encodec does not normalize).

    The returned indices embed to the UN-normalized codebook entries
    (`codebook_lookup` on the raw codebook), as upstream does."""
    return l2_argmin_codes(l2_normalize(latents), l2_normalize(codebook),
                           use_pallas=use_pallas)


def codebook_lookup(codes: jax.Array, codebook: jax.Array) -> jax.Array:
    """Embed code indices: [...,] int -> [..., D]. XLA lowers this gather well."""
    return jnp.take(codebook, codes, axis=0)


def quantize_st(latents: jax.Array, codebook: jax.Array, *,
                use_pallas: bool | None = None) -> tuple[jax.Array, jax.Array]:
    """Quantize with straight-through gradients.

    Returns (quantized [..., D] with gradient flowing to ``latents``, codes).
    """
    codes = l2_argmin_codes(latents, codebook, use_pallas=use_pallas)
    quantized = codebook_lookup(codes, codebook).astype(latents.dtype)
    quantized = latents + jax.lax.stop_gradient(quantized - latents)
    return quantized, codes
