"""Fused L2-argmin codebook-search Pallas kernel.

The RVQ hot loop of every codec in the zoo (SNAC 4096×8, DAC 1024×8,
Encodec 1024×128 codebooks — reference VectorQuantizer.DecodeLatents,
/root/reference/NeuralCodecs.Torch/Modules/SNAC/VectorQuantizer.cs:115-141).

Design: grid over row tiles of the flattened [T, D] latents; the full
codebook lives in VMEM (≤4096×128 f32 = 2 MB); each program computes
``scores = ‖e‖² − 2·x·eᵀ`` on the MXU and reduces with argmin on the VPU,
so the [T, N] score matrix never round-trips through HBM. Ties break to the
lower index (torch.argmin parity) via an explicit masked-iota min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _kernel(x_ref, cb_ref, esq_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)          # [R, D]
    cb = cb_ref[:].astype(jnp.float32)        # [N, D]
    e_sq = esq_ref[:].astype(jnp.float32)     # [1, N]
    cross = jax.lax.dot_general(
        x, cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [R, N]
    scores = e_sq - 2.0 * cross
    # torch.argmin tie-break parity: first minimal index wins.
    n = scores.shape[1]
    min_val = jnp.min(scores, axis=1, keepdims=True)            # [R, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)  # [R, N]
    masked = jnp.where(scores == min_val, col, n)
    idx = jnp.min(masked, axis=1).astype(jnp.int32)       # [R]
    out_ref[:] = idx.reshape(out_ref.shape)               # [8, R/8], row-major


@functools.partial(jax.jit, static_argnames=("row_tile",))
def l2_argmin_pallas(flat: jax.Array, codebook: jax.Array,
                     row_tile: int = _ROW_TILE) -> jax.Array:
    """flat: [T, D] float; codebook: [N, D] float -> int32 [T]."""
    t, d = flat.shape
    n = codebook.shape[0]
    flat = flat.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    e_sq = jnp.sum(codebook * codebook, axis=-1, keepdims=True).T  # [1, N]

    pad_t = (-t) % row_tile
    if pad_t:
        flat = jnp.pad(flat, ((0, pad_t), (0, 0)))
    padded_t = t + pad_t
    grid = (padded_t // row_tile,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        # Output laid out as [8·blocks, row_tile/8] so each program writes an
        # (8, row_tile/8) tile — 1-D s32 outputs with partial blocks trip
        # Mosaic/XLA layout tiling disagreements. Row-major reshape restores
        # the flat index order for free.
        out_specs=pl.BlockSpec((8, row_tile // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (8 * (padded_t // row_tile), row_tile // 8), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_t * n * d,
            bytes_accessed=padded_t * d * 4 + n * d * 4 + padded_t * 4,
            transcendentals=0,
        ),
    )(flat, codebook, e_sq)
    return out.reshape(-1)[:t]
