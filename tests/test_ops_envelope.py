"""CI coverage for the fused envelope-follower Pallas kernel (CPU
interpret mode): must match the `one_pole_follower` scan bit-for-bit
(identical per-step f32 expression; measured bit-exact on hardware too,
tests_tpu/test_tpu_parity.py)."""

import numpy as np

import jax
import jax.numpy as jnp


def _scan_ref(xt, attack, release):
    def step(level, x_n):
        gain = jnp.where(x_n > level, attack, release)
        level = level + gain * (x_n - level)
        return level, level

    _, env = jax.lax.scan(step, jnp.zeros(xt.shape[1], xt.dtype), xt)
    return env


def test_envelope_pallas_matches_scan_interpreted(rng):
    from jax.experimental.pallas import tpu as pltpu

    from neuralcodecs_tpu.ops.pallas.envelope import (TIME_BLOCK,
                                                      envelope_pallas)

    t, n = 2 * TIME_BLOCK, 8
    x = jnp.asarray(np.abs(rng.standard_normal((t, n))), jnp.float32)
    a, r = 0.13, 0.003
    want = _scan_ref(x, a, r)
    with pltpu.force_tpu_interpret_mode():
        got = envelope_pallas(x, attack_gain=a, release_gain=r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_envelope_pallas_supported_gate():
    from neuralcodecs_tpu.ops.pallas.envelope import (
        TIME_BLOCK,
        envelope_pallas_supported,
    )

    assert envelope_pallas_supported(240000, 8)
    assert not envelope_pallas_supported(2 * TIME_BLOCK, 8)  # too short
    assert not envelope_pallas_supported(240000, 8192)       # lane extent


def test_one_pole_follower_dispatch_unchanged_on_cpu(rng):
    """On the CPU backend the public entry point must keep the scan path
    (goldens pin its exact output); this just exercises the gate code."""
    from neuralcodecs_tpu.dsp.filters import one_pole_follower

    x = jnp.asarray(rng.standard_normal((2, 3, 5000)), jnp.float32)
    env = one_pole_follower(x, 0.2, 0.01)
    want = _scan_ref(jnp.abs(x).reshape(-1, 5000).swapaxes(0, 1), 0.2, 0.01)
    np.testing.assert_array_equal(
        np.asarray(env), np.asarray(want.swapaxes(0, 1).reshape(2, 3, -1)))
