"""Fused biquad (DF2T) Pallas kernel for the BS.1770 loudness pre-filter.

Same disease, same cure as `ops/pallas/envelope.py`: a biquad is a
2-state serial recurrence over every audio sample (reference
LoudnessMeter.cs applies two of them to the whole waveform before
gating), and under `lax.scan` each step pays XLA's while-loop dispatch
for ~6 VPU ops. This kernel grids over (lane blocks, time blocks),
carries (z1, z2) in VMEM scratch, and statically unrolls each time block
through [8, 128] register tiles (whole-block loads spill the vector
register file — measured on the envelope kernel).

Coefficients arrive via SMEM (not closed over statically) because the
callers run under jit — `integrated_loudness` traces `biquad` with
tracer coefficient arrays.

Per-step math matches `filters.biquad`'s scan step expression-for-
expression (bit-exact, pinned in tests):
    y  = b0*x + z1
    z1 = b1*x - a1*y + z2
    z2 = b2*x - a2*y
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# 128 measured equal to 256/512 on hardware (24 ms on [240128, 8], vs
# 762 ms for the lax.scan) and keeps the CPU-interpret CI test tractable
# (the Mosaic interpreter degrades superlinearly past ~128 unrolled steps
# per grid step on this kernel).
TIME_BLOCK = 128


def _make_kernel(tb: int):
    def kernel(coef_ref, x_ref, y_ref, z_s):
        t_blk = pl.program_id(1)

        @pl.when(t_blk == 0)
        def _():
            z_s[:] = jnp.zeros_like(z_s)

        b0, b1, b2 = coef_ref[0], coef_ref[1], coef_ref[2]
        a1, a2 = coef_ref[4], coef_ref[5]
        z1 = z_s[0:1, :]
        z2 = z_s[1:2, :]
        for blk in range(tb // 8):
            xt8 = x_ref[8 * blk:8 * blk + 8, :]
            rows = []
            for tt in range(8):                   # static unroll
                x_t = xt8[tt:tt + 1, :]
                y = b0 * x_t + z1
                z1_new = b1 * x_t - a1 * y + z2
                z2 = b2 * x_t - a2 * y
                z1 = z1_new
                rows.append(y)
            y_ref[8 * blk:8 * blk + 8, :] = jnp.concatenate(
                rows, axis=0).astype(y_ref.dtype)
        z_s[0:1, :] = z1
        z_s[1:2, :] = z2

    return kernel


@jax.jit
def biquad_pallas(xt: jax.Array, coefs: jax.Array) -> jax.Array:
    """DF2T biquad over time-major [T, N] f32, T % TIME_BLOCK == 0.

    coefs: [6] f32 = (b0, b1, b2, a0, a1, a2) with a0 == 1 (ignored) —
    the same normalized layout `filters.biquad` receives.
    """
    t, n = xt.shape
    tb = TIME_BLOCK
    return pl.pallas_call(
        _make_kernel(tb),
        grid=(pl.cdiv(n, LANE), t // tb),         # time innermost
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, LANE), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, LANE), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), xt.dtype),
        scratch_shapes=[pltpu.VMEM((2, LANE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=9 * t * n, bytes_accessed=2 * t * n * 4,
            transcendentals=0),
    )(coefs.astype(jnp.float32), xt)


def biquad_pallas_supported(t: int, n: int) -> bool:
    """Dispatch gate (mirrors envelope_pallas_supported)."""
    return t >= 4 * TIME_BLOCK and n <= 4096


_COMPILE_OK: dict[tuple, bool] = {}


def biquad_pallas_compiles(t: int, n: int, dtype) -> bool:
    """Memoized standalone-compile probe; see lstm.lstm_pallas_compiles
    for why a try/except at the call site cannot replace this."""
    t_pad = -(-t // TIME_BLOCK) * TIME_BLOCK
    key = (t_pad, n, jnp.dtype(dtype).name)
    ok = _COMPILE_OK.get(key)
    if ok is None:
        try:
            biquad_pallas.lower(
                jax.ShapeDtypeStruct((t_pad, n), dtype),
                jax.ShapeDtypeStruct((6,), jnp.float32),
            ).compile()
            ok = True
        except Exception:
            ok = False
        _COMPILE_OK[key] = ok
    return ok
