"""Mesh / sharding / distributed-training tests on the 8-device CPU mesh."""

import numpy as np
import pytest

# Deep/expensive suite (VERDICT r4 #9): every test here stands up real
# servers / 8-device meshes / LM coding loops. Quick tier: -m 'not slow'.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.parallel.mesh import make_mesh, mesh_axes_for
from neuralcodecs_tpu.parallel.sharding import param_shardings, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2, "sp": 1}
    mesh = make_mesh(tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 2, "sp": 2}
    assert mesh_axes_for(8, "codec") == (8, 1, 1)
    assert mesh_axes_for(8, "tts") == (2, 4, 1)


def test_param_shardings_rules():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=4, tp=2)
    params = {
        "decoder.model.0.weight": jnp.zeros((7, 128, 512)),   # sharded on O
        "small.weight": jnp.zeros((7, 4, 8)),                 # too small
        "quantizer.codebook.weight": jnp.zeros((1024, 8)),    # codebook
        "decoder.model.0.bias": jnp.zeros((512,)),
    }
    s = param_shardings(mesh, params)
    assert s["decoder.model.0.weight"].spec == P(None, None, "tp")
    assert s["small.weight"].spec == P()
    assert s["quantizer.codebook.weight"].spec == P()
    assert s["decoder.model.0.bias"].spec == P("tp")


def test_dac_train_step_on_mesh(rng):
    """Full sharded DAC generator train step on dp=4 x tp=2."""
    import optax

    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.parallel.train import make_train_step

    mesh = make_mesh(dp=4, tp=2)
    cfg = DACConfig(sample_rate=16000, encoder_dim=16, encoder_rates=[2, 4],
                    decoder_dim=256, decoder_rates=[4, 2], n_codebooks=2,
                    codebook_size=32, codebook_dim=4)
    model = DAC(cfg)
    init_fn, step_fn = make_train_step(model, mesh, optax.adam(1e-4),
                                       sample_rate=16000)
    state = init_fn(model.params)
    audio = jnp.asarray(0.1 * rng.standard_normal((8, cfg.hop_length * 64, 1)),
                        jnp.float32)
    p0 = np.asarray(state.params["decoder.model.0.weight"]).copy()
    state, loss1 = step_fn(state, audio)
    state, loss2 = step_fn(state, audio)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    p1 = np.asarray(state.params["decoder.model.0.weight"])
    assert not np.allclose(p0, p1)  # optimizer actually updated the params


def test_time_sharded_encode_matches_unsharded(rng):
    """sp=8 halo-exchange encode must reproduce the unsharded codes."""
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig
    from neuralcodecs_tpu.parallel.timeshard import sharded_encode

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=16, encoder_rates=[2, 4],
                     decoder_dim=64, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=64, codebook_dim=8,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    model = SNAC(cfg)
    mesh = make_mesh(dp=1, tp=1, sp=8)
    t = cfg.pad_to * 8 * 64 + 37  # ragged length, shards >> receptive field
    audio = (0.3 * rng.standard_normal(t)).astype(np.float32)

    ref_codes = model.encode(audio)
    got_codes = sharded_encode(model, mesh, audio)
    assert len(got_codes) == len(ref_codes)
    for stage, (ref, got) in enumerate(zip(ref_codes, got_codes)):
        ref, got = np.asarray(ref), np.asarray(got)
        assert got.shape == ref.shape, (stage, got.shape, ref.shape)
        # a handful of argmin near-ties can flip from 1-ulp fusion-order
        # differences (the shard runs on a differently-shaped tensor);
        # structural misalignment would collapse the match rate entirely
        match = (ref == got).mean()
        assert match > 0.99, f"stage {stage}: only {match:.4f} codes match"


def test_discriminator_outputs(rng):
    from neuralcodecs_tpu.models.dac.discriminator import DACDiscriminator
    from neuralcodecs_tpu.losses.gan import (
        discriminator_loss, feature_matching_loss, generator_loss)

    disc = DACDiscriminator(periods=(2, 3), fft_sizes=(512,), seed=0)
    real = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    fake = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    real_out = disc(disc.params, real)
    fake_out = disc(disc.params, fake)
    assert len(real_out) == 3  # 2 MPD + 1 MRD
    for sub in real_out:
        assert len(sub) >= 2  # feats + logits
    d_loss = float(discriminator_loss(fake_out, real_out))
    g_loss = float(generator_loss(fake_out))
    fm = float(feature_matching_loss(fake_out, real_out))
    assert np.isfinite(d_loss) and np.isfinite(g_loss) and np.isfinite(fm)


def test_time_sharded_encode_windowed_attention(rng):
    """sp=8 encode with LocalMHA: window-aligned halos must reproduce the
    unsharded codes (windows are block-local, LocalMHA.cs:87-96)."""
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig
    from neuralcodecs_tpu.parallel.timeshard import sharded_encode

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=16, encoder_rates=[2, 4],
                     decoder_dim=64, decoder_rates=[4, 2],
                     attn_window_size=4, codebook_size=64, codebook_dim=8,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    model = SNAC(cfg)
    mesh = make_mesh(dp=1, tp=1, sp=8)
    t = cfg.pad_to * 8 * 64 + 37
    audio = (0.3 * rng.standard_normal(t)).astype(np.float32)

    ref_codes = model.encode(audio)
    got_codes = sharded_encode(model, mesh, audio)
    assert len(got_codes) == len(ref_codes)
    for stage, (ref, got) in enumerate(zip(ref_codes, got_codes)):
        ref, got = np.asarray(ref), np.asarray(got)
        assert got.shape == ref.shape, (stage, got.shape, ref.shape)
        match = (ref == got).mean()
        assert match > 0.99, f"stage {stage}: only {match:.4f} codes match"


def test_ema_codebook_dp_psum_matches_single_device(rng):
    """The dp-sharded EMA codebook update (psum-ed batch statistics,
    quantize.py ema_update dp_axis) must equal the single-device update on
    the same global batch — the distributed sync the reference leaves as a
    TODO (EuclideanCodebook.cs:292)."""
    from jax.sharding import PartitionSpec as P

    from neuralcodecs_tpu.models.encodec.quantize import EuclideanCodebook

    cb = EuclideanCodebook("vq", dim=8, codebook_size=16)
    params = {}
    cb.init(jax.random.key(0), params)
    state = cb.state_from_params(params)
    flat_x = jnp.asarray(rng.standard_normal((8 * 24, 8)), jnp.float32)
    codes = cb.quantize(params, flat_x)

    ref = cb.ema_update(state, flat_x, codes)

    mesh = make_mesh(dp=8)
    sharded = jax.jit(jax.shard_map(
        lambda s, x, c: cb.ema_update(s, x, c, dp_axis="dp"),
        mesh=mesh, in_specs=(P(), P("dp"), P("dp")), out_specs=P()))
    got = sharded(state, flat_x, codes)
    np.testing.assert_allclose(np.asarray(got.embed), np.asarray(ref.embed),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.cluster_size),
                               np.asarray(ref.cluster_size),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.embed_avg),
                               np.asarray(ref.embed_avg),
                               rtol=1e-6, atol=1e-6)


def test_sharded_train_state_checkpoint_restore(rng, tmp_path):
    """Save a dp x tp TrainState and restore it with shardings preserved
    (restore straight onto mesh devices), then resume a step."""
    pytest.importorskip("orbax.checkpoint")
    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.parallel.checkpoint import (restore_train_state,
                                                      save_train_state)
    from neuralcodecs_tpu.parallel.train import make_train_step

    mesh = make_mesh(dp=4, tp=2)
    cfg = DACConfig(sample_rate=16000, encoder_dim=16, encoder_rates=[2, 4],
                    decoder_dim=256, decoder_rates=[4, 2], n_codebooks=2,
                    codebook_size=32, codebook_dim=4)
    model = DAC(cfg)
    init_fn, step_fn = make_train_step(model, mesh, sample_rate=16000)
    state = init_fn(model.params)
    audio = jnp.asarray(0.1 * rng.standard_normal((8, cfg.hop_length * 64, 1)),
                        jnp.float32)
    state, _ = step_fn(state, audio)

    save_train_state(state, tmp_path / "ckpt")
    restored = restore_train_state(tmp_path / "ckpt", template=state)
    assert int(restored.step) == int(state.step)
    for key in ("decoder.model.0.weight", "encoder.block.0.weight"):
        np.testing.assert_array_equal(np.asarray(restored.params[key]),
                                      np.asarray(state.params[key]))
        assert restored.params[key].sharding == state.params[key].sharding
    # the restored state is steppable on the same mesh
    _, loss = step_fn(restored, audio)
    assert np.isfinite(float(loss))


def test_tp_dia_int4_matches_unsharded():
    """Greedy Dia generation with int4-quantized weights sharded tensor-
    parallel (packed nibbles column/row-sharded, group scales following)
    matches the unsharded int4 model's codes exactly — GSPMD resharding
    around the nibble unpack and even/odd split must not change math."""
    from neuralcodecs_tpu.models.dia import Dia
    from neuralcodecs_tpu.models.dia.config import (
        DiaConfig, DiaDataConfig, DiaDecoderConfig, DiaEncoderConfig)
    from neuralcodecs_tpu.parallel.sharding import dia_param_shardings

    cfg = DiaConfig(
        tgt_vocab_size=36,
        data=DiaDataConfig(text_length=16, audio_length=24, channels=3,
                           audio_eos_value=32, audio_pad_value=33,
                           audio_bos_value=34, delay_pattern=[0, 1, 2]),
        encoder=DiaEncoderConfig(n_layer=2, n_embd=32, n_hidden=64, n_head=2,
                                 head_dim=16),
        decoder=DiaDecoderConfig(n_layer=2, n_embd=32, n_hidden=64,
                                 gqa_query_heads=4, kv_heads=2, gqa_head_dim=8,
                                 cross_query_heads=2, cross_head_dim=16))
    dia = Dia(cfg, seed=0).quantize_int4(group_size=8)
    ref_codes, ref_len = dia.generate_codes(
        ["[S1]hello", "[S2]ok"], max_tokens=20, seed=3, temperature=0.0)

    mesh = make_mesh(dp=4, tp=2)
    shardings = dia_param_shardings(mesh, dia.params)
    from jax.sharding import PartitionSpec as P
    # the quantized kernels actually shard (not silently replicated)
    assert shardings[
        "decoder.layers.0.self_attention.q_proj.weight_q4"].spec == P(None, "tp")
    assert shardings[
        "decoder.layers.0.self_attention.o_proj.weight_q4"].spec == P("tp", None)
    dia.params = {k: jax.device_put(v, shardings[k])
                  for k, v in dia.params.items()}
    tp_codes, tp_len = dia.generate_codes(
        ["[S1]hello", "[S2]ok"], max_tokens=20, seed=3, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(tp_len))
    np.testing.assert_array_equal(np.asarray(ref_codes), np.asarray(tp_codes))
