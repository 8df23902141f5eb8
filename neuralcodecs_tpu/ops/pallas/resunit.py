"""Fused residual-unit Pallas kernel for the SNAC/DAC conv stacks.

One ResidualUnit (snake → dilated conv k7 → snake → 1×1 conv → residual add,
reference Modules/SNAC/ResidualUnit.cs:25-60) costs XLA ~6 kernel launches
and ~6 full-tensor HBM round-trips. This kernel computes the whole unit in
one pass: a time tile (+dilation halo) is DMA'd from HBM into VMEM, snake
runs on the VPU, the dilated conv is 7 shifted fused-multiply-adds
(depthwise) or 7 accumulated MXU matmuls (dense), the 1×1 projection is one
MXU matmul, and only the final residual sum returns to HBM — ~6x less
memory traffic on the decoder's dominant tensors in theory.

STATUS: experimental, not wired into the model forward path. Measured on
v5e: XLA's own fusion already keeps the unfused chain near this part's
effective HBM bandwidth, and this kernel's serial per-program DMA (no
double buffering) plus 6-pass HIGHEST-precision MXU matmuls make it
0.65-0.92x of the XLA path. Revisit with double-buffered DMA and bf16
accumulate before enabling.

Halo tiles overlap, so the input stays in HBM (`memory_space=ANY`) and each
program issues its own async copy of [t·tile − pad, t·tile + tile + pad).

Supports groups == C (depthwise, the SNAC presets) and groups == 1 (DAC).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _snake(x, alpha):
    s = jnp.sin(alpha * x)
    safe = jnp.where(alpha == 0, 1.0, alpha)
    return jnp.where(alpha == 0, x, x + (s * s) / safe)


def _make_kernel(k: int, dilation: int, t_tile: int, c: int, depthwise: bool):
    pad = (k - 1) * dilation // 2
    pad_a = -(-pad // 8) * 8  # Mosaic DMA slices must be 8-aligned in sublanes
    halo_rows = t_tile + 2 * pad_a

    def kernel(x_hbm, a1_ref, wd_ref, bd_ref, a2_ref, w1_ref, b1_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(x_tile, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * t_tile, halo_rows), :], x_tile, sem)
            dma.start()
            dma.wait()
            x = x_tile[:]
            h = _snake(x, a1_ref[0, :])
            base = pad_a - pad
            acc = jnp.zeros((t_tile, c), jnp.float32)
            for tap_i in range(k):
                off = base + tap_i * dilation
                tap = h[off: off + t_tile, :]
                if depthwise:
                    acc = acc + tap * wd_ref[tap_i, :]
                else:
                    acc = acc + jax.lax.dot_general(
                        tap, wd_ref[tap_i],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            acc = acc + bd_ref[0, :]
            y = _snake(acc, a2_ref[0, :])
            z = jax.lax.dot_general(y, w1_ref[:],
                                    dimension_numbers=(((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
            z = z + b1_ref[0, :]
            out_ref[0, :, :] = x[pad_a: pad_a + t_tile, :] + z

        pl.run_scoped(
            body,
            x_tile=pltpu.VMEM((halo_rows, c), jnp.float32),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


def _pick_tile(t: int) -> int | None:
    """Largest multiple-of-8 divisor of t in [128, 2048], else None."""
    for tile in (512, 480, 384, 256, 240, 128):
        if t % tile == 0:
            return tile
    return None


def supported(t: int, c: int, k: int, dilation: int, groups: int,
              cout: int) -> bool:
    """Whether the fused kernel handles this residual-unit configuration."""
    if c != cout or c % 128 != 0:
        return False
    if groups not in (1, c):
        return False
    return _pick_tile(t) is not None


@functools.partial(jax.jit, static_argnames=("k", "dilation", "depthwise"))
def fused_residual_unit(x: jax.Array, alpha1: jax.Array, w_dilated: jax.Array,
                        b_dilated: jax.Array, alpha2: jax.Array,
                        w_pointwise: jax.Array, b_pointwise: jax.Array,
                        *, k: int, dilation: int, depthwise: bool) -> jax.Array:
    """x: [B, T, C] f32. w_dilated: [K, 1, C] HIO (depthwise) or [K, C, C];
    w_pointwise: [1, C, C]; biases/alphas [C]. Returns x + unit(x)."""
    b, t, c = x.shape
    t_tile = _pick_tile(t)
    assert t_tile is not None, f"no tile for T={t}"
    pad = (k - 1) * dilation // 2
    pad_a = -(-pad // 8) * 8
    x_padded = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad_a, pad_a), (0, 0)))

    wd = w_dilated.reshape(k, c) if depthwise else w_dilated
    w1 = w_pointwise.reshape(c, c)
    kernel = _make_kernel(k, dilation, t_tile, c, depthwise)

    return pl.pallas_call(
        kernel,
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo'd input, DMA'd manually
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, lambda i, j: (0,) * wd.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (c + (k * c if not depthwise else k)),
            bytes_accessed=2 * b * t * c * 4,
            transcendentals=2 * b * t * c,
        ),
    )(x_padded, alpha1.reshape(1, c), wd, b_dilated.reshape(1, c),
      alpha2.reshape(1, c), w1, b_pointwise.reshape(1, c))
