"""Export, model zoo, training checkpoints, adversarial training step."""

import numpy as np
import pytest

# Deep/expensive suite (VERDICT r4 #9): every test here stands up real
# servers / 8-device meshes / LM coding loops. Quick tier: -m 'not slow'.
pytestmark = pytest.mark.slow

import jax.numpy as jnp

from neuralcodecs_tpu.core.export import load_pretrained, save_pretrained
from neuralcodecs_tpu.core.zoo import load_zoo_model, zoo_models


def test_save_load_pretrained_roundtrip(tmp_path, rng):
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=16, encoder_rates=[2, 3],
                     decoder_dim=64, decoder_rates=[3, 2], attn_window_size=None,
                     codebook_size=64, codebook_dim=8, vq_strides=[2, 1],
                     noise=False, depthwise=False)
    model = SNAC(cfg)
    save_pretrained(model, tmp_path / "snac")
    loaded = load_pretrained(tmp_path / "snac")
    assert type(loaded).__name__ == "SNAC"
    assert loaded.config.encoder_rates == [2, 3]
    audio = rng.standard_normal(cfg.pad_to * 2).astype(np.float32)
    ref, ref_codes = model.forward(audio)
    got, got_codes = loaded.forward(audio)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    for rc, gc in zip(ref_codes, got_codes):
        np.testing.assert_array_equal(np.asarray(rc), np.asarray(gc))


def test_zoo_registry():
    names = zoo_models()
    assert "snac_24khz" in names and "encodec_48khz" in names
    assert "dia_1.6b" in names
    with pytest.raises(Exception):
        load_zoo_model("nonexistent_model")


def test_train_checkpoint_roundtrip(tmp_path, rng):
    import optax

    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.parallel.checkpoint import (
        restore_train_state, save_train_state)
    from neuralcodecs_tpu.parallel.mesh import make_mesh
    from neuralcodecs_tpu.parallel.train import make_train_step

    mesh = make_mesh(dp=8)
    cfg = DACConfig(sample_rate=16000, encoder_dim=8, encoder_rates=[2, 2],
                    decoder_dim=32, decoder_rates=[2, 2], n_codebooks=2,
                    codebook_size=16, codebook_dim=4)
    model = DAC(cfg)
    init_fn, step_fn = make_train_step(model, mesh, optax.adam(1e-4),
                                       sample_rate=16000)
    state = init_fn(model.params)
    audio = jnp.asarray(0.1 * rng.standard_normal((8, cfg.hop_length * 32, 1)),
                        jnp.float32)
    state, _ = step_fn(state, audio)
    save_train_state(state, tmp_path / "ckpt")
    restored = restore_train_state(tmp_path / "ckpt", template=state)
    assert int(restored.step) == int(state.step)
    for k in state.params:
        np.testing.assert_array_equal(np.asarray(state.params[k]),
                                      np.asarray(restored.params[k]))
    # training continues from the restored state
    restored, loss = step_fn(restored, audio)
    assert np.isfinite(float(loss))


def test_gan_train_step(rng):
    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.models.dac.discriminator import DACDiscriminator
    from neuralcodecs_tpu.parallel.mesh import make_mesh
    from neuralcodecs_tpu.parallel.train import make_gan_train_step

    mesh = make_mesh(dp=8)
    cfg = DACConfig(sample_rate=16000, encoder_dim=8, encoder_rates=[2, 2],
                    decoder_dim=32, decoder_rates=[2, 2], n_codebooks=2,
                    codebook_size=16, codebook_dim=4)
    model = DAC(cfg)
    disc = DACDiscriminator(periods=(2, 3), fft_sizes=(128,), seed=1)
    init_fn, step_fn = make_gan_train_step(model, disc, mesh,
                                           sample_rate=16000)
    states = init_fn()
    audio = jnp.asarray(0.1 * rng.standard_normal((8, cfg.hop_length * 32, 1)),
                        jnp.float32)
    states, metrics = step_fn(states, audio)
    for key in ("gen/total", "gen/mel", "gen/adv", "gen/feat", "disc/total"):
        assert np.isfinite(float(metrics[key])), key
    states, metrics2 = step_fn(states, audio)
    assert int(states[0].step) == 2


def test_dac_forward_train_quantizer_dropout(rng):
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.dac import DAC, DACConfig

    cfg = DACConfig(sample_rate=16000, encoder_dim=8, encoder_rates=[2, 2],
                    decoder_dim=32, decoder_rates=[2, 2], n_codebooks=4,
                    codebook_size=16, codebook_dim=4, quantizer_dropout=0.5)
    model = DAC(cfg)
    audio = jnp.asarray(0.1 * rng.standard_normal((4, cfg.hop_length * 8, 1)),
                        jnp.float32)
    out = jax.jit(model.forward_train)(model.params, audio, jax.random.key(0))
    assert out["codes"].shape[1] == 4  # all stages computed
    assert np.isfinite(float(out["vq/commitment_loss"]))
    # gradient flows through the dropout-masked forward
    loss_fn = lambda p: jnp.mean(
        model.forward_train(p, audio, jax.random.key(0))["audio"] ** 2)
    grads = jax.grad(loss_fn)(model.params)
    g = np.asarray(grads["decoder.model.0.weight"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_train_step_remat(rng):
    import optax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.parallel.mesh import make_mesh
    from neuralcodecs_tpu.parallel.train import make_train_step

    mesh = make_mesh(dp=8)
    cfg = DACConfig(sample_rate=16000, encoder_dim=8, encoder_rates=[2, 2],
                    decoder_dim=32, decoder_rates=[2, 2], n_codebooks=2,
                    codebook_size=16, codebook_dim=4)
    model = DAC(cfg)
    init_fn, step_fn = make_train_step(model, mesh, optax.adam(1e-4),
                                       sample_rate=16000, remat=True)
    state = init_fn(model.params)
    audio = jnp.asarray(0.1 * rng.standard_normal((8, cfg.hop_length * 32, 1)),
                        jnp.float32)
    state, loss = step_fn(state, audio)
    assert np.isfinite(float(loss))


def test_save_pretrained_sharded_roundtrip(tmp_path, rng):
    """Sharded export (HF index layout) loads back bit-exact."""
    from neuralcodecs_tpu.core.export import load_pretrained, save_pretrained
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                     decoder_dim=32, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=32, codebook_dim=4,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    model = SNAC(cfg, seed=3)
    out = tmp_path / "snac_sharded"
    save_pretrained(model, out, max_shard_bytes=64 * 1024)
    shards = sorted(p.name for p in out.glob("model-*.safetensors"))
    assert len(shards) > 1
    assert (out / "model.safetensors.index.json").is_file()
    assert not (out / "model.safetensors").exists()

    loaded = load_pretrained(out)
    assert set(loaded.params) == set(model.params)
    for k in model.params:
        np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                      np.asarray(model.params[k]))
