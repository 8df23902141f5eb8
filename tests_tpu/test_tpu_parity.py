"""Real-chip parity: TPU dispatch paths vs their portable formulations.

These pin the claims the CPU suite cannot check itself:
  * the Pallas L2-argmin codebook kernel is bit-exact vs the XLA
    formulation on the real codebook shapes (incl. torch tie-breaking);
  * the Pallas LSTM recurrence kernel matches the lax.scan step;
  * the Pallas envelope-follower kernel is bit-exact vs the scan;
  * the batched-LM entropy-coding invariants (row locality at a fixed
    executable shape) hold on the TPU backend, not just CPU;
  * stream-level chunked-batch execution is bit-exact on TPU.
"""

import numpy as np

import jax
import jax.numpy as jnp


def test_pallas_codebook_bit_exact(rng):
    from neuralcodecs_tpu.ops.vq import l2_argmin_codes

    for n, d, t in ((4096, 8, 1501), (1024, 8, 862), (1024, 128, 150)):
        latents = jnp.asarray(rng.standard_normal((1, t, d)), jnp.float32)
        codebook = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        xla = np.asarray(l2_argmin_codes(latents, codebook, use_pallas=False))
        pl_ = np.asarray(l2_argmin_codes(latents, codebook, use_pallas=True))
        np.testing.assert_array_equal(pl_, xla, err_msg=f"shape {(n, d, t)}")


def test_pallas_codebook_tie_break(rng):
    """Duplicate codebook rows: the kernel must pick the LOWEST index
    (torch argmin semantics), same as the XLA path."""
    from neuralcodecs_tpu.ops.vq import l2_argmin_codes

    base = rng.standard_normal((64, 8)).astype(np.float32)
    codebook = jnp.asarray(np.concatenate([base, base[:16]], axis=0))
    latents = jnp.asarray(rng.standard_normal((1, 333, 8)), jnp.float32)
    xla = np.asarray(l2_argmin_codes(latents, codebook, use_pallas=False))
    pl_ = np.asarray(l2_argmin_codes(latents, codebook, use_pallas=True))
    np.testing.assert_array_equal(pl_, xla)
    assert (xla < 64).all()  # ties resolved to the first duplicate


def test_pallas_lstm_matches_scan(rng):
    from neuralcodecs_tpu.ops.pallas.lstm import (lstm_pallas_supported,
                                                  lstm_scan_pallas)

    t, h = 150, 512
    w_hh = jnp.asarray(0.1 * rng.standard_normal((h, 4 * h)), jnp.float32)

    def scan_ref(gates_x, h0, c0):
        # mirrors seanet._lstm_recurrence's scan step, incl. the HIGH
        # (3-pass bf16) recurrence-dot policy
        def step(carry, gx):
            h_prev, c_prev = carry
            gates = gx + jnp.dot(h_prev, w_hh,
                                 preferred_element_type=gx.dtype,
                                 precision=jax.lax.Precision.HIGH)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = (jax.nn.sigmoid(f) * c_prev
                     + jax.nn.sigmoid(i) * jnp.tanh(g))
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_f, c_f), ys = jax.lax.scan(step, (h0, c0), gates_x)
        return ys, h_f, c_f

    def ref64(gx_np):
        """float64 host reference: the ground truth both f32 paths drift
        from (each with its own dot tiling/rounding; the drift compounds
        through 150 recurrence steps, so comparing the two f32 paths to
        each other is the wrong criterion at B=1)."""
        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        w = np.asarray(w_hh, np.float64)
        h_s = np.zeros((gx_np.shape[1], h))
        c_s = np.zeros((gx_np.shape[1], h))
        ys = []
        for gx_t in gx_np.astype(np.float64):
            gates = gx_t + h_s @ w
            i, f, g, o = np.split(gates, 4, axis=-1)
            c_s = sig(f) * c_s + sig(i) * np.tanh(g)
            h_s = sig(o) * np.tanh(c_s)
            ys.append(h_s)
        return np.stack(ys)

    for b in (1, 4):
        assert lstm_pallas_supported(b, h)
        gx = jnp.asarray(0.5 * rng.standard_normal((t, b, 4 * h)),
                         jnp.float32)
        h0 = jnp.zeros((b, h), jnp.float32)
        c0 = jnp.zeros((b, h), jnp.float32)
        ys_k, hf_k, cf_k = lstm_scan_pallas(gx, w_hh, h0, c0)
        ys_s, hf_s, cf_s = jax.jit(scan_ref)(gx, h0, c0)
        # Both paths run the recurrence dot at HIGH (3-pass bf16), but
        # XLA and the hand-rolled Mosaic split round the partial-product
        # sum in different orders (measured 2.6e-5 apart at B=4), so the
        # criterion is distance from the f64 ground truth, not from each
        # other: the kernel must be no worse than the scan's own drift.
        truth = ref64(np.asarray(gx))
        err_k = np.abs(np.asarray(ys_k, np.float64) - truth).max()
        err_s = np.abs(np.asarray(ys_s, np.float64) - truth).max()
        assert err_k <= max(2.0 * err_s, 1e-4), (b, err_k, err_s)
        np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_s),
                                   atol=1e-4, rtol=0)
        np.testing.assert_allclose(np.asarray(cf_k), np.asarray(cf_s),
                                   atol=1e-3, rtol=0)


def test_lm_row_locality_on_tpu(rng):
    """The batched .ecdc format guarantee (compressor.py docstring) must
    hold on the serving backend: at a fixed executable batch shape, rows
    are interchangeable and zero-padding rows are inert."""
    from neuralcodecs_tpu.models.encodec.lm import (EncodecLanguageModel,
                                                    EncodecLMConfig)

    lm = EncodecLanguageModel(EncodecLMConfig(), seed=0)
    b, k, t = 4, 8, 4
    seq = rng.integers(0, 1025, size=(b, k, t))

    def run(rows_src):
        state = lm.init_state(b)
        inp = np.zeros((b, k, 1), np.int64)
        outs = []
        for step in range(t):
            probas, state = lm.step(inp, state)
            outs.append(np.asarray(probas))
            inp = np.stack([rows_src[r][:, step:step + 1] for r in range(b)])
        return np.stack(outs)

    base = run([seq[i] for i in range(b)])
    perm = [2, 0, 3, 1]
    permuted = run([seq[p] for p in perm])
    for i, p in enumerate(perm):
        np.testing.assert_array_equal(permuted[:, i], base[:, p])
    zeros = np.zeros((k, t), np.int64)
    padded = run([seq[0], zeros, zeros, zeros])
    np.testing.assert_array_equal(padded[:, 0], base[:, 0])


def test_chunked_batch_matches_unchunked(rng):
    """Stream-level chunked-batch execution (ops/chunking.py) is bit-exact
    vs the monolithic forward on the TPU backend."""
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=24000, encoder_dim=16,
                     encoder_rates=[2, 4, 8, 8], decoder_dim=64,
                     decoder_rates=[8, 8, 4, 2], attn_window_size=None,
                     codebook_size=64, codebook_dim=8, vq_strides=[4, 2, 1],
                     noise=False, depthwise=True)
    model = SNAC(cfg)
    audio = (0.3 * rng.standard_normal(3 * 24000)).astype(np.float32)
    a, _length = model._prepare(audio)
    key = model._noise_rng(None)
    mono, codes_m = model._jit_forward(model.params, a, key, 1)
    chunked, codes_c = model._jit_forward(model.params, a, key,
                                          model._auto_chunks(a.shape[1]))
    assert model._auto_chunks(a.shape[1]) > 1  # the test must exercise it
    for cm, cc in zip(codes_m, codes_c):
        np.testing.assert_array_equal(np.asarray(cm), np.asarray(cc))
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(mono))


def test_envelope_pallas_bit_exact_on_tpu(rng):
    """The envelope-follower kernel (dsp compressor core) must be
    bit-exact vs the XLA scan on hardware — same per-step f32 expression,
    pure elementwise math (no dot-tiling ambiguity like the LSTM)."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.ops.pallas.envelope import envelope_pallas

    a, r = 0.13, 0.003

    def scan_ref(xt):
        def step(level, x_n):
            gain = jnp.where(x_n > level, a, r)
            level = level + gain * (x_n - level)
            return level, level

        _, env = jax.lax.scan(step, jnp.zeros(xt.shape[1], xt.dtype), xt)
        return env

    for t, n in ((2048, 8), (240128, 64)):
        x = jnp.asarray(np.abs(rng.standard_normal((t, n))), jnp.float32)
        got = np.asarray(envelope_pallas(x, attack_gain=a, release_gain=r))
        want = np.asarray(jax.jit(scan_ref)(x))
        np.testing.assert_array_equal(got, want, err_msg=f"shape {(t, n)}")


def test_biquad_pallas_bit_exact_on_tpu(rng):
    """The fused biquad kernel (BS.1770 K-weighting pre-filter) must be
    bit-exact vs the XLA scan on hardware — same per-step f32 DF2T
    expression, pure elementwise math."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.ops.pallas.biquad import biquad_pallas

    b = jnp.asarray([1.5308412300498355, -2.6509799951536985,
                     1.1690790799210682], jnp.float32)
    a = jnp.asarray([1.0, -1.6636551132560202, 0.7125954280732254],
                    jnp.float32)

    def scan_ref(xt):
        def step(carry, x_n):
            z1, z2 = carry
            y = b[0] * x_n + z1
            z1_new = b[1] * x_n - a[1] * y + z2
            z2_new = b[2] * x_n - a[2] * y
            return (z1_new, z2_new), y

        init = (jnp.zeros(xt.shape[1], xt.dtype),
                jnp.zeros(xt.shape[1], xt.dtype))
        _, ys = jax.lax.scan(step, init, xt)
        return ys

    for t, n in ((2048, 8), (240128, 64)):
        x = jnp.asarray(rng.standard_normal((t, n)), jnp.float32)
        got = np.asarray(biquad_pallas(x, jnp.concatenate([b, a])))
        want = np.asarray(jax.jit(scan_ref)(x))
        np.testing.assert_array_equal(got, want, err_msg=f"shape {(t, n)}")


def test_blocked_int8_dot_read_bounded_on_tpu(rng):
    """The int8-MXU-dot blocked KV read (kv_dot_int8) stays within its
    quantization bound vs the dequant blocked read ON HARDWARE — the CPU
    suite checks the same bound, but only the chip exercises the MXU's
    native int8 x int8 -> int32 path this code exists for."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.dia.layers import (
        KVCacheSlot, _blocked_decode_attn)

    b, max_t, nkv, nq, dh, block = 4, 1024, 4, 4, 128, 256
    k = jnp.asarray(rng.standard_normal((b, max_t, nkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, max_t, nkv, dh)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, 1, nq, dh)), jnp.float32)
    cache = KVCacheSlot.zeros(b, max_t, nkv, dh, quantized=True)
    cache = cache.prefill_write(k, v)
    for step in (3, 511, 1023):
        ref = np.asarray(_blocked_decode_attn(q, cache, jnp.int32(step),
                                              block))
        out = np.asarray(_blocked_decode_attn(q, cache, jnp.int32(step),
                                              block, int8_dot=True))
        err = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        assert err < 0.03, (step, err)


def test_stream_roundtrip_fastpath_on_tpu(rng):
    """The fused single-call Encodec stream round-trip (round 5) matches
    the frames API on the REAL chip, including the 8-row chunk-batch
    padding path (rows 10 -> 16) that only the TPU backend exercises
    with its own fusion/layout choices."""
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    cfg = EncodecConfig(
        sampling_rate=16000, channels=2, bandwidth=80.0,
        target_bandwidths=[20.0, 80.0], codebook_size=32, codebook_dim=16,
        hidden_size=16, num_filters=8, num_lstm_layers=2,
        num_residual_layers=1, upsampling_ratios=[4, 2],
        use_causal_conv=False, norm_type="time_group_norm",
        chunk_length_s=0.05, overlap=0.01, normalize=True)
    model = Encodec(cfg)
    n = int(cfg.sample_rate * 0.5)  # ~10 full chunks + tail -> padded rows
    audio = (0.3 * rng.standard_normal((cfg.channels, n))).astype(np.float32)
    want = np.asarray(model.decode(model.encode(audio)))[..., :n]
    got = np.asarray(model.forward(audio))
    assert got.shape == want.shape
    diff = np.abs(got - want)
    # TPU fusion reorders float accumulation more aggressively than CPU,
    # so a random-init near-tie VQ boundary can flip a code between the
    # one-program and frames executions; a flip's local magnitude is the
    # codebook distance (not small). The hardware contract is therefore
    # rate-based: overwhelmingly identical samples, rare localized flips.
    assert float(np.mean(diff > 1e-4)) < 0.05, float(np.mean(diff > 1e-4))
    assert float(np.median(diff)) < 1e-5, float(np.median(diff))
