"""Fused residual-unit Pallas kernel for the SNAC/DAC conv stacks.

One ResidualUnit (snake → dilated conv k7 → snake → 1×1 conv → residual add,
reference Modules/SNAC/ResidualUnit.cs:25-60) costs XLA ~6 kernel launches
and ~6 full-tensor HBM round-trips. This kernel computes the whole unit in
one pass: a time tile (+dilation halo) is DMA'd from HBM into VMEM, snake
runs on the VPU, the dilated conv is 7 shifted fused-multiply-adds
(depthwise) or 7 accumulated MXU matmuls (dense), the 1×1 projection is one
MXU matmul, and only the final residual sum returns to HBM — ~6x less
memory traffic on the decoder's dominant tensors in theory.

Matmul precision: Mosaic lowers only DEFAULT and HIGHEST dot precisions, so
Precision.HIGH (the model's f32 default, 3-pass bf16) is hand-rolled: the
weights are split into bf16 hi+lo ONCE on the host (they are loop
constants), activations are split ONCE per tile after the first snake, and
each dot accumulates hi·hi + hi·lo + lo·hi in f32.

STATUS: experimental, not wired into the model forward path. Measured on
v5e after three rounds of rework (HIGHEST -> hand-rolled 3-pass HIGH dots;
weight hi/lo splits hoisted to the host; dense path rebuilt as a VMEM
im2col + one long-K dot): ~0.75-0.85x of XLA's fused chain on the
qualifying dense/depthwise shapes. The residual gap is structural: the
k=7 time-shifted tap reads are never 8-sublane-aligned, so Mosaic lowers
each as a sublane rotation of the whole tile (14 block rotations per tile
with hi/lo splits), which XLA's conv custom-call avoids with hardware
windowing. Serial per-program DMA is NOT the bottleneck (input+output DMA
is ~0.2 ms of a ~5 ms kernel on the DAC dense-384 shape). Kept as a
correct, documented baseline for future Mosaic work.

A related pitfall worth keeping in writing: under jit, XLA algebraically
folds the hi/lo split ``bf16(a - f32(bf16(a)))`` to ZERO (it models the
conversions as exact), silently degrading a hand-rolled 3-pass matmul to
single-pass bf16 — `_split_hi_lo(host=True)` guards the host-side splits
with an optimization barrier. Mosaic does not perform that rewrite.

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


def _split_hi_lo(a, host: bool = False):
    """f32 -> (bf16 hi, bf16 lo) with hi + lo ≈ a (3-pass HIGH operands).

    host=True inserts an optimization barrier: under jit, XLA algebraically
    folds ``bf16(a - f32(bf16(a)))`` to zero (it treats the conversions as
    exact), silently degrading the split to single-pass bf16. Mosaic does
    not perform that rewrite, so the in-kernel path needs no barrier."""
    hi = a.astype(jnp.bfloat16)
    if host:
        hi = jax.lax.optimization_barrier(hi)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """3-pass bf16 emulation of an f32 matmul (Precision.HIGH)."""
    dims = (((1,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _snake(x, alpha):
    s = jnp.sin(alpha * x)
    safe = jnp.where(alpha == 0, 1.0, alpha)
    return jnp.where(alpha == 0, x, x + (s * s) / safe)


def _make_kernel(k: int, dilation: int, t_tile: int, c: int, depthwise: bool):
    pad = (k - 1) * dilation // 2
    pad_a = -(-pad // 8) * 8  # Mosaic DMA slices must be 8-aligned in sublanes
    halo_rows = t_tile + 2 * pad_a

    def kernel(x_hbm, a1_ref, wd_hi_ref, wd_lo_ref, bd_ref, a2_ref,
               w1_hi_ref, w1_lo_ref, b1_ref, out_ref):
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
            if depthwise:
                for tap_i in range(k):
                    off = base + tap_i * dilation
                    acc = acc + h[off: off + t_tile, :] * wd_hi_ref[tap_i, :]
            else:
                # split the snaked activations ONCE; build the im2col block
                # in VMEM and run ONE [t_tile, k·C] x [k·C, C] 3-pass dot —
                # one long-K MXU pass instead of a 7-dot accumulate chain
                h_hi, h_lo = _split_hi_lo(h)
                taps_hi = jnp.concatenate(
                    [h_hi[base + ti * dilation: base + ti * dilation + t_tile, :]
                     for ti in range(k)], axis=1)
                taps_lo = jnp.concatenate(
                    [h_lo[base + ti * dilation: base + ti * dilation + t_tile, :]
                     for ti in range(k)], axis=1)
                acc = acc + _dot3(taps_hi, taps_lo,
                                  wd_hi_ref[:], wd_lo_ref[:])
            acc = acc + bd_ref[0, :]
            y = _snake(acc, a2_ref[0, :])
            y_hi, y_lo = _split_hi_lo(y)
            z = _dot3(y_hi, y_lo, w1_hi_ref[:], w1_lo_ref[:])
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

    # weight hi/lo splits are loop constants: compute them on the host side
    # of the kernel, not per time-tile
    if depthwise:
        wd_hi = w_dilated.reshape(k, c).astype(jnp.float32)
        wd_lo = jnp.zeros((1, 1), jnp.bfloat16)  # unused placeholder
    else:
        # [K, Cin, Cout] -> [K*Cin, Cout]: row blocks in tap order, matching
        # the kernel's lane-concatenated im2col activations
        wd_hi, wd_lo = _split_hi_lo(
            w_dilated.astype(jnp.float32).reshape(k * c, c), host=True)
    w1_hi, w1_lo = _split_hi_lo(w_pointwise.reshape(c, c).astype(jnp.float32), host=True)
    kernel = _make_kernel(k, dilation, t_tile, c, depthwise)

    return pl.pallas_call(
        kernel,
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # halo'd input, DMA'd manually
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wd_hi.shape, lambda i, j: (0,) * wd_hi.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wd_lo.shape, lambda i, j: (0,) * wd_lo.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
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
    )(x_padded, alpha1.reshape(1, c), wd_hi, wd_lo, b_dilated.reshape(1, c),
      alpha2.reshape(1, c), w1_hi, w1_lo, b_pointwise.reshape(1, c))
