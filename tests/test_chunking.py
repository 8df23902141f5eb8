"""Chunked-batch execution (ops/chunking.py): exactness vs the unchunked
graph, plan math, and edge behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralcodecs_tpu.models.dac import DAC, DACConfig
from neuralcodecs_tpu.ops.chunking import plan_chunks, split_chunks, stitch_chunks


def test_plan_covers_everything_once():
    plan = plan_chunks(862, 8, 16)
    assert plan is not None
    covered = []
    for a, l in zip(plan.abs_starts, plan.core_lens):
        covered.extend(range(a, a + l))
    assert covered == list(range(862))
    # edge windows clamp to the stream boundary (no zero halo)
    assert plan.starts[0] == 0
    assert plan.starts[-1] + plan.length == 862


def test_plan_alignment():
    plan = plan_chunks(3456, 8, 10, align=32)
    assert plan is not None
    assert all(s % 32 == 0 for s in plan.starts)
    assert all(a % 32 == 0 for a in plan.abs_starts[:-1])


def test_plan_refuses_short_streams():
    assert plan_chunks(100, 8, 16) is None
    assert plan_chunks(0, 8, 16) is None
    assert plan_chunks(862, 1, 16) is None


def test_split_stitch_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 862, 4)), jnp.float32)
    plan = plan_chunks(862, 8, 16)
    y = stitch_chunks(split_chunks(x, plan), plan)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_dac():
    return DAC(DACConfig(sample_rate=16000, encoder_dim=16,
                         encoder_rates=[2, 4, 8], decoder_dim=128,
                         decoder_rates=[8, 4, 2], n_codebooks=2,
                         codebook_size=64, codebook_dim=4))


@pytest.mark.slow
def test_dac_chunked_forward_matches_unchunked(tiny_dac):
    model = tiny_dac
    rng = np.random.default_rng(1)
    t = model.hop_length * 1600  # long enough for 8 chunks + halos
    audio = jnp.asarray(0.3 * rng.standard_normal((1, t, 1)), jnp.float32)

    ref = model._forward_fn(model.params, audio, None)
    n = model._auto_chunks(t // model.hop_length)
    assert n == 8
    out = model._forward_chunked_fn(model.params, audio, None, n)

    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(ref["codes"]))
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(ref["z"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["audio"]),
                               np.asarray(ref["audio"]), atol=1e-4, rtol=1e-4)


def test_dac_chunked_decode_matches_unchunked(tiny_dac):
    model = tiny_dac
    rng = np.random.default_rng(2)
    z_q = jnp.asarray(0.5 * rng.standard_normal((1, 1600, model.config.resolved_latent_dim)),
                      jnp.float32)
    ref = model._decode_fn(model.params, z_q)
    out = model._decode_chunked_fn(model.params, z_q, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_dac_full_topology_halos_are_sufficient():
    """Validate the receptive-field formulas on the REAL 44k topology
    (rates [2,4,8,8]/[8,8,4,2]) with tiny dims: chunked == unchunked."""
    model = DAC(DACConfig(sample_rate=44100, encoder_dim=8,
                          encoder_rates=[2, 4, 8, 8], decoder_dim=64,
                          decoder_rates=[8, 8, 4, 2], n_codebooks=2,
                          codebook_size=32, codebook_dim=4))
    rng = np.random.default_rng(7)
    t = model.hop_length * 880
    audio = jnp.asarray(0.3 * rng.standard_normal((1, t, 1)), jnp.float32)
    ref = model._forward_fn(model.params, audio, None)
    out = model._forward_chunked_fn(model.params, audio, None, 8)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(ref["codes"]))
    np.testing.assert_allclose(np.asarray(out["audio"]),
                               np.asarray(ref["audio"]), atol=1e-4, rtol=1e-4)


def test_dac_short_audio_falls_back(tiny_dac):
    model = tiny_dac
    rng = np.random.default_rng(3)
    audio = 0.3 * rng.standard_normal(model.hop_length * 20).astype(np.float32)
    out = model.forward(audio)  # must not raise; auto-chunks picks 1
    assert out["audio"].shape[-1] == audio.shape[-1]


def test_dac_batch_input_falls_back(tiny_dac):
    model = tiny_dac
    rng = np.random.default_rng(4)
    audio = 0.3 * rng.standard_normal((2, model.hop_length * 200)).astype(np.float32)
    out = model.forward(audio)
    assert out["audio"].shape[0] == 2


# ---------------------------------------------------------------- SNAC

from neuralcodecs_tpu.models.snac import SNAC, SNACConfig


@pytest.fixture(scope="module")
def tiny_snac():
    return SNAC(SNACConfig(sampling_rate=24000, encoder_dim=16,
                           encoder_rates=[2, 4, 8, 8], decoder_dim=128,
                           decoder_rates=[8, 8, 4, 2], attn_window_size=None,
                           codebook_size=64, codebook_dim=4,
                           vq_strides=[4, 2, 1], noise=False, depthwise=False))


@pytest.mark.slow
def test_snac_chunked_forward_matches_unchunked(tiny_snac):
    model = tiny_snac
    rng = np.random.default_rng(11)
    t = model.config.pad_to * max(1, 900 * 512 // model.config.pad_to)
    t = model.hop_length * 900
    t = model._pad_length(t)
    audio = jnp.asarray(0.3 * rng.standard_normal((1, t, 1)), jnp.float32)
    ref_audio, ref_codes = model._forward_fn(model.params, audio, None)
    n = model._auto_chunks(t)
    assert n == 8
    out_audio, out_codes = model._forward_chunked_fn(model.params, audio, None, n)
    for a, b in zip(out_codes, ref_codes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out_audio), np.asarray(ref_audio),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_snac_chunked_with_attention_and_noise():
    """Attention (late/head stages, unchunked) + noise must still run and
    match unchunked when rng is None; depthwise + attn is the 32k preset
    shape family."""
    model = SNAC(SNACConfig(sampling_rate=32000, encoder_dim=16,
                            encoder_rates=[2, 4, 8, 8], decoder_dim=128,
                            decoder_rates=[8, 8, 4, 2], attn_window_size=8,
                            codebook_size=32, codebook_dim=4,
                            vq_strides=[4, 2, 1], noise=True, depthwise=True))
    rng = np.random.default_rng(12)
    t = model._pad_length(model.hop_length * 8 * 110)
    audio = jnp.asarray(0.3 * rng.standard_normal((1, t, 1)), jnp.float32)
    ref_audio, ref_codes = model._forward_fn(model.params, audio, None)
    n = model._auto_chunks(t)
    assert n >= 2
    out_audio, out_codes = model._forward_chunked_fn(model.params, audio, None, n)
    for a, b in zip(out_codes, ref_codes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out_audio), np.asarray(ref_audio),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_snac_public_api_roundtrip_chunked(tiny_snac):
    model = tiny_snac
    rng = np.random.default_rng(13)
    audio = 0.3 * rng.standard_normal(model.hop_length * 900).astype(np.float32)
    out, codes = model.forward(audio)
    assert out.shape[-1] == audio.shape[-1]
    dec = model.decode(codes)
    assert dec.shape[-1] == model._pad_length(audio.shape[-1])


@pytest.mark.slow
def test_batched_chunked_matches_per_stream_snac(rng):
    """B>1 streams through the chunked path == each stream individually."""
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=16, encoder_rates=[2, 4],
                     decoder_dim=64, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=64, codebook_dim=8,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    model = SNAC(cfg)
    t = cfg.pad_to * 96
    batch = (0.3 * rng.standard_normal((3, t))).astype(np.float32)

    batched = model.encode(batch)
    for b in range(3):
        single = model.encode(batch[b])
        for stage, (sb, ss) in enumerate(zip(batched, single)):
            match = (np.asarray(sb[b]) == np.asarray(ss[0])).mean()
            assert match > 0.99, f"stream {b} stage {stage}: {match}"

    out_b, _ = model.forward(batch)
    out_0, _ = model.forward(batch[0])
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_0[0]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_batched_chunked_matches_per_stream_dac(rng):
    from neuralcodecs_tpu.models.dac import DAC, DACConfig

    cfg = DACConfig(sample_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                    decoder_dim=64, decoder_rates=[4, 2], n_codebooks=2,
                    codebook_size=32, codebook_dim=4)
    model = DAC(cfg)
    t = cfg.hop_length * 96 * 8
    batch = (0.3 * rng.standard_normal((2, t))).astype(np.float32)

    out_b = model.forward(batch)
    out_0 = model.forward(batch[0])
    match = (np.asarray(out_b["codes"][0]) == np.asarray(out_0["codes"][0])).mean()
    assert match > 0.99
    np.testing.assert_allclose(np.asarray(out_b["audio"][0]),
                               np.asarray(out_0["audio"][0]),
                               rtol=1e-4, atol=1e-5)


def test_plan_chunks_invariants_fuzz(rng):
    """Property fuzz: any accepted plan tiles [0, total) exactly with
    aligned, in-bounds windows."""
    from neuralcodecs_tpu.ops.chunking import plan_chunks

    checked = 0
    for _ in range(500):
        total = int(rng.integers(1, 5000))
        n = int(rng.integers(2, 12))
        halo = int(rng.integers(0, 400))
        align = int(rng.choice([1, 2, 4, 8, 16]))
        total = -(-total // align) * align  # model callers pad to the lattice
        plan = plan_chunks(total, n, halo, align)
        if plan is None:
            continue
        checked += 1
        cover = 0
        for w, off, length, abs_start in zip(plan.starts, plan.core_offs,
                                             plan.core_lens, plan.abs_starts):
            assert 0 <= w and w + plan.length <= total
            assert w % align == 0 and plan.length % align == 0
            if length:
                assert abs_start == cover  # cores tile left-to-right
                assert w + off == abs_start
                cover += length
        assert cover == total
        assert n * plan.length <= 1.5 * total  # inflation guard held
    assert checked > 50  # the fuzz actually exercised accepted plans


def test_split_stitch_identity_fuzz(rng):
    """split + stitch of the identity function reproduces the input for
    random shapes, scales and batch sizes."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.ops.chunking import (
        plan_chunks, split_chunks, stitch_chunks)

    done = 0
    for _ in range(60):
        total = int(rng.integers(64, 1500))
        n = int(rng.integers(2, 8))
        halo = int(rng.integers(0, 60))
        scale = int(rng.choice([1, 2, 4]))
        b = int(rng.choice([1, 2, 3]))
        plan = plan_chunks(total, n, halo)
        if plan is None:
            continue
        done += 1
        x = jnp.asarray(rng.standard_normal((b, total * scale, 3)), jnp.float32)
        y = stitch_chunks(split_chunks(x, plan, scale=scale), plan, scale=scale)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert done > 20
