"""Fused one-pole envelope-follower Pallas kernel (compressor core).

The AudioTools compressor's envelope follower (reference
AudioTensorEffects.cs:23-45) is a per-sample serial recurrence over the
WHOLE waveform — 240k steps for a 10 s 24 kHz clip — and is the measured
wall of the DSP benchmark pipeline: inside `lax.scan`, every step pays
XLA's while-loop dispatch (~0.5 us) for ~4 VPU ops of actual math, and
the cost is batch-invariant (PERF.md "Other benchmark configs"). The
recurrence is non-linear (the attack/release coefficient switches on a
comparison against the running level), so an associative parallel scan
would change reference semantics — but the serial chain itself costs
only a few ns/step once the loop overhead is gone.

This kernel runs the whole recurrence in one Mosaic program: grid =
(lane blocks, time blocks) with time innermost, each grid step loading a
[TB, 128] block of |x| into VMEM, stepping the level carry through TB
samples with a statically unrolled loop (static row indices — no
per-step sublane rotates), and writing the [TB, 128] envelope block
back. The level carry lives in VMEM scratch and persists across time
blocks (TPU grid steps run sequentially on the core); it is reset at
t == 0 for each lane block.

Per-step math matches `filters.one_pole_follower`'s scan step exactly:
    gain  = where(x > level, attack, release)
    level = level + gain * (x - level)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# time-samples per grid step: large enough to amortize grid overhead,
# small enough that the statically-unrolled body stays compilable
TIME_BLOCK = 256


def _make_kernel(attack_gain: float, release_gain: float, tb: int):
    def kernel(x_ref, env_ref, level_s):
        t_blk = pl.program_id(1)

        @pl.when(t_blk == 0)
        def _():
            level_s[:] = jnp.zeros_like(level_s)

        # Work one [8, LANE] register tile at a time: loading the whole
        # [TB, LANE] block into values would blow the vector register
        # file (TB*LANE*4 = 128 KB at TB=256) and spill, and per-row
        # stores into the output ref are sub-tile read-modify-writes.
        # 8-row tiles keep live registers constant and make every
        # load/store tile-aligned; the recurrence itself is statically
        # unrolled inside each tile (static sublane indices, no rotates).
        level = level_s[:]                        # [1, LANE] f32
        for blk in range(tb // 8):
            xt8 = x_ref[8 * blk:8 * blk + 8, :]   # one aligned tile load
            rows = []
            for tt in range(8):                   # static unroll
                x_t = xt8[tt:tt + 1, :]
                gain = jnp.where(x_t > level, attack_gain, release_gain)
                level = level + gain * (x_t - level)
                rows.append(level)
            env_ref[8 * blk:8 * blk + 8, :] = jnp.concatenate(
                rows, axis=0).astype(env_ref.dtype)
        level_s[:] = level

    return kernel


@functools.partial(jax.jit, static_argnames=("attack_gain", "release_gain"))
def envelope_pallas(xt_abs: jax.Array, *, attack_gain: float,
                    release_gain: float) -> jax.Array:
    """Run the envelope recurrence over |x| in time-major layout.

    xt_abs: [T, N] f32 with T % TIME_BLOCK == 0 (pad + slice outside).
    Returns env [T, N] — the same contract as the scan in
    `filters.one_pole_follower` (level starts at 0).
    """
    t, n = xt_abs.shape
    tb = TIME_BLOCK
    n_blocks = pl.cdiv(n, LANE)
    return pl.pallas_call(
        _make_kernel(attack_gain, release_gain, tb),
        grid=(n_blocks, t // tb),                 # time innermost
        in_specs=[pl.BlockSpec((tb, LANE), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, LANE), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), xt_abs.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * t * n, bytes_accessed=2 * t * n * 4,
            transcendentals=0),
    )(xt_abs)


def envelope_pallas_supported(t: int, n: int) -> bool:
    """Dispatch gate: long enough that loop overhead dominates the scan,
    and a sane lane extent."""
    return t >= 4 * TIME_BLOCK and n <= 4096


_COMPILE_OK: dict[tuple, bool] = {}


def envelope_pallas_compiles(t: int, n: int, dtype, attack_gain: float,
                             release_gain: float) -> bool:
    """Memoized standalone-compile probe (same rationale as
    `lstm.lstm_pallas_compiles`): a Mosaic lowering failure inside the
    caller's jit would bypass any except-fallback, so probe here and keep
    the XLA scan when the kernel cannot lower on this backend."""
    t_pad = -(-t // TIME_BLOCK) * TIME_BLOCK
    key = (t_pad, n, jnp.dtype(dtype).name, attack_gain, release_gain)
    ok = _COMPILE_OK.get(key)
    if ok is None:
        try:
            envelope_pallas.lower(
                jax.ShapeDtypeStruct((t_pad, n), dtype),
                attack_gain=attack_gain,
                release_gain=release_gain,
            ).compile()
            ok = True
        except Exception:
            ok = False
        _COMPILE_OK[key] = ok
    return ok
