"""Fused LSTM-recurrence Pallas kernel for the Encodec SLSTM.

The SEANet SLSTM (reference SLSTM.cs:11-130) is the measured single-stream
wall of Encodec-48k: 150 timesteps x 4 layer-passes of latency-bound tiny
matmuls inside `lax.scan`, each step paying XLA's while-loop dispatch and
an HBM round-trip for the [B, H] carry. This kernel runs one whole layer
recurrence in a single Mosaic program: grid over T, the [H, 4H]
hidden-to-hidden weight VMEM-resident across all steps, (h, c) carried in
VMEM scratch (TPU grid steps execute sequentially on the core, so scratch
persists), and the hoisted input projection streamed in per-step blocks by
the Pallas pipeline. Gate math matches the XLA scan in `seanet.SLSTM`
bit-for-bit in structure (torch gate order i,f,g,o; f32 compute).

The input-to-hidden product for the whole sequence stays OUTSIDE the
kernel as one big MXU matmul per layer (same hoisting as the scan path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gx_ref, whh_ref, h0_ref, c0_ref, ys_ref, hf_ref, cf_ref,
            h_s, c_s):
    """One block of timesteps of the recurrence (grid position = block).

    gx_ref:  [TB, B, 4H] input-projection block (incl. biases)
    whh_ref: [H, 4H] hidden-to-hidden weight (VMEM-resident, all steps)
    h0/c0:   [B, H] initial state (streaming carry)
    ys_ref:  [TB, B, H] output block
    hf/cf:   [B, H] final state
    h_s/c_s: [B, H] f32 VMEM scratch carrying the recurrence

    Blocking TB timesteps per grid step amortizes the per-iteration
    pipeline overhead (measured ~10 us/grid step on v5e) across TB
    recurrence steps that run entirely in VMEM.
    """
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    # Hand-rolled 3-pass bf16 dot (Precision.HIGH, the model's f32 matmul
    # policy per ops/conv.py): Mosaic only lowers DEFAULT/HIGHEST, DEFAULT
    # is a single bf16 pass (~70x farther from the f64 truth than XLA's
    # B=1 VPU matvec over a 150-step recurrence — tests_tpu parity), and
    # HIGHEST's 6-pass emulation overflows scoped VMEM at this weight
    # size. The weight hi/lo split happens once per grid step (Mosaic does
    # not fold the bf16(w - f32(bf16(w))) residual the way XLA does).
    w = whh_ref[:].astype(jnp.float32)
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hdim = h_s.shape[-1]
    tb = ys_ref.shape[0]

    def step(t, carry):
        h_prev, c_prev = carry
        h_hi = h_prev.astype(jnp.bfloat16)
        h_lo = (h_prev - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        gates = (gx_ref[t].astype(jnp.float32)
                 + dot(h_hi, w_hi) + dot(h_lo, w_hi)
                 + dot(h_hi, w_lo))                          # [B, 4H]
        i = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
        f = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
        g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
        o = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        ys_ref[t] = h_new.astype(ys_ref.dtype)
        return h_new, c_new

    h_new, c_new = jax.lax.fori_loop(
        0, tb, step, (h_s[:], c_s[:]), unroll=True)
    h_s[:] = h_new
    c_s[:] = c_new

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        hf_ref[:] = h_new.astype(hf_ref.dtype)
        cf_ref[:] = c_new.astype(cf_ref.dtype)


def _time_block(t: int, b: int, four_h: int) -> int:
    """Largest divisor of T <= a VMEM-friendly cap: each grid step's gx
    block (TB * B * 4H f32, double-buffered) must stay well under VMEM."""
    cap = max(1, min(16, (2 * 1024 * 1024) // max(1, 4 * b * four_h)))
    tb = 1
    for d in range(1, cap + 1):
        if t % d == 0:
            tb = d
    return tb


@jax.jit
def lstm_scan_pallas(gates_x: jax.Array, w_hh: jax.Array,
                     h0: jax.Array, c0: jax.Array):
    """Run one LSTM layer recurrence over a precomputed input projection.

    gates_x: [T, B, 4H] (= x @ W_ih + b_ih + b_hh), w_hh: [H, 4H],
    h0/c0: [B, H]. Returns (ys [T, B, H], h_f [B, H], c_f [B, H]) in
    gates_x.dtype — the same contract as the `lax.scan` step in
    `seanet.SLSTM.__call__`.
    """
    t, b, four_h = gates_x.shape
    h = four_h // 4
    dt = gates_x.dtype
    tb = _time_block(t, b, four_h)
    return pl.pallas_call(
        _kernel,
        grid=(t // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, four_h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, four_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h), dt),
            jax.ShapeDtypeStruct((b, h), dt),
            jax.ShapeDtypeStruct((b, h), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * h * four_h,
            bytes_accessed=(t * b * four_h + h * four_h + 2 * t * b * h) * 4,
            transcendentals=4 * t * b * h,
        ),
    )(gates_x, w_hh, h0, c0)


def lstm_pallas_supported(b: int, h: int) -> bool:
    """Shape gate: the weight (f32 + its bf16 hi/lo 3-pass splits) and the
    per-step blocks must fit VMEM comfortably, and the lane dim must be
    128-aligned for clean tiling."""
    vmem = (4 + 2 + 2) * h * 4 * h + 4 * (4 * b * 4 * h) + 4 * (4 * b * h)
    return h % 128 == 0 and b <= 256 and vmem < 12 * 1024 * 1024


_COMPILE_OK: dict[tuple, bool] = {}


def lstm_pallas_compiles(t: int, b: int, four_h: int, dtype,
                         w_dtype=None, state_dtype=None) -> bool:
    """One-time-per-shape probe that the kernel actually Mosaic-compiles.

    A try/except around the traced kernel call only catches trace-time
    errors; a Mosaic lowering failure surfaces when the ENCLOSING jit
    compiles — outside any caller's except block — so the scan fallback
    would never trigger. Compiling the kernel standalone here (memoized
    per shape in-process, and by the persistent JAX compilation cache
    across processes) makes the fallback real: on a chip where the kernel
    cannot lower (e.g. smaller VMEM), the probe fails and the caller keeps
    the XLA scan.
    """
    h = four_h // 4
    w_dtype = dtype if w_dtype is None else w_dtype
    state_dtype = dtype if state_dtype is None else state_dtype
    key = (t, b, four_h, jnp.dtype(dtype).name, jnp.dtype(w_dtype).name,
           jnp.dtype(state_dtype).name)
    ok = _COMPILE_OK.get(key)
    if ok is None:
        try:
            lstm_scan_pallas.lower(
                jax.ShapeDtypeStruct((t, b, four_h), dtype),
                jax.ShapeDtypeStruct((h, four_h), w_dtype),
                jax.ShapeDtypeStruct((b, h), state_dtype),
                jax.ShapeDtypeStruct((b, h), state_dtype),
            ).compile()
            ok = True
        except Exception:
            ok = False
        _COMPILE_OK[key] = ok
    return ok
