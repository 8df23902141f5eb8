"""CI coverage for the fused LSTM-recurrence Pallas kernel (CPU interpret
mode): the kernel's gate math must match the XLA scan in seanet.SLSTM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _scan_ref(gates_x, w_hh, h0, c0):
    def step(carry, gx):
        h_prev, c_prev = carry
        gates = gx + jnp.dot(h_prev, w_hh, preferred_element_type=gx.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hf, cf), ys = jax.lax.scan(step, (h0, c0), gates_x)
    return ys, hf, cf


@pytest.mark.parametrize("t,b", [(6, 1), (15, 4)])
def test_lstm_pallas_matches_scan_interpreted(rng, t, b):
    from jax.experimental.pallas import tpu as pltpu

    from neuralcodecs_tpu.ops.pallas.lstm import lstm_scan_pallas

    h = 128
    gx = jnp.asarray(0.3 * rng.standard_normal((t, b, 4 * h)), jnp.float32)
    whh = jnp.asarray(0.1 * rng.standard_normal((h, 4 * h)), jnp.float32)
    h0 = jnp.asarray(0.2 * rng.standard_normal((b, h)), jnp.float32)
    c0 = jnp.asarray(0.2 * rng.standard_normal((b, h)), jnp.float32)

    want_ys, want_hf, want_cf = _scan_ref(gx, whh, h0, c0)
    with pltpu.force_tpu_interpret_mode():
        got_ys, got_hf, got_cf = lstm_scan_pallas(gx, whh, h0, c0)
    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hf), np.asarray(want_hf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cf), np.asarray(want_cf),
                               rtol=1e-5, atol=1e-5)


def test_lstm_pallas_supported_gate():
    from neuralcodecs_tpu.ops.pallas.lstm import lstm_pallas_supported

    assert lstm_pallas_supported(1, 512)
    assert lstm_pallas_supported(64, 512)
    assert not lstm_pallas_supported(1, 500)      # lane misalignment
    assert not lstm_pallas_supported(8192, 512)   # VMEM blowout
