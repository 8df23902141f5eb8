"""CI coverage for the fused biquad Pallas kernel (CPU interpret
mode): must match `filters.biquad`'s DF2T scan bit-for-bit (identical
per-step f32 expression)."""

import numpy as np

import jax
import jax.numpy as jnp


def _scan_ref(xt, b, a):
    b = jnp.asarray(b, jnp.float32)
    a = jnp.asarray(a, jnp.float32)

    def step(carry, x_n):
        z1, z2 = carry
        y = b[0] * x_n + z1
        z1_new = b[1] * x_n - a[1] * y + z2
        z2_new = b[2] * x_n - a[2] * y
        return (z1_new, z2_new), y

    n = xt.shape[1]
    init = (jnp.zeros(n, xt.dtype), jnp.zeros(n, xt.dtype))
    _, ys = jax.lax.scan(step, init, xt)
    return ys


# The BS.1770 K-weighting stage-1 shelf at 24 kHz (what the loudness
# meter actually feeds this kernel).
B = np.array([1.5308412300498355, -2.6509799951536985, 1.1690790799210682])
A = np.array([1.0, -1.6636551132560202, 0.7125954280732254])


def test_biquad_pallas_matches_scan_interpreted(rng):
    from jax.experimental.pallas import tpu as pltpu

    from neuralcodecs_tpu.ops.pallas.biquad import TIME_BLOCK, biquad_pallas

    t, n = 2 * TIME_BLOCK, 8
    x = jnp.asarray(rng.standard_normal((t, n)), jnp.float32)
    want = _scan_ref(x, B, A)
    with pltpu.force_tpu_interpret_mode():
        got = biquad_pallas(x, jnp.concatenate(
            [jnp.asarray(B, jnp.float32), jnp.asarray(A, jnp.float32)]))
    # On CPU the XLA scan contracts mul+add to FMA while the Mosaic
    # interpreter evaluates ops singly, so interpret-vs-scan differs by
    # ~1 ulp on a few samples. On hardware both paths round identically
    # and bit-equality is pinned (tests_tpu/test_tpu_parity.py).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_biquad_pallas_supported_gate():
    from neuralcodecs_tpu.ops.pallas.biquad import (
        TIME_BLOCK,
        biquad_pallas_supported,
    )

    assert biquad_pallas_supported(240000, 8)
    assert not biquad_pallas_supported(2 * TIME_BLOCK, 8)  # too short
    assert not biquad_pallas_supported(240000, 8192)       # lane extent


def test_biquad_dispatch_unchanged_on_cpu(rng):
    """On the CPU backend the public entry point must keep the scan path
    (goldens pin its exact output); this just exercises the gate code."""
    from neuralcodecs_tpu.dsp.filters import biquad

    x = jnp.asarray(rng.standard_normal((2, 3, 5000)), jnp.float32)
    y = biquad(x, jnp.asarray(B, jnp.float32), jnp.asarray(A, jnp.float32))
    want = _scan_ref(x.reshape(-1, 5000).swapaxes(0, 1), B, A)
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(want.swapaxes(0, 1).reshape(2, 3, -1)))
