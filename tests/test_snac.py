"""SNAC golden-parity tests against the torch oracle + API smoke tests."""

import re

import numpy as np
import pytest
import torch

from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

from oracles import SNACOracle


def tiny_config(**over):
    """Small SNAC for fast tests: same topology laws, reduced dims."""
    base = dict(
        sampling_rate=24000,
        encoder_dim=16,
        encoder_rates=[2, 3],
        decoder_dim=64,
        decoder_rates=[3, 2],
        attn_window_size=None,
        codebook_size=64,
        codebook_dim=8,
        vq_strides=[2, 1],
        noise=False,
        depthwise=False,
    )
    base.update(over)
    return SNACConfig(**base)


def oracle_state_dict(oracle: torch.nn.Module) -> dict:
    """Rename the oracle's module tree to the reference checkpoint naming."""
    out = {}
    for k, v in oracle.state_dict().items():
        k = re.sub(r"^encoder\.(\d+)", r"encoder.block.\1", k)
        k = re.sub(r"^decoder\.(\d+)\.(\d+)", r"decoder.model.\1.block.\2", k)
        k = re.sub(r"^decoder\.(\d+)", r"decoder.model.\1", k)
        k = re.sub(r"^quantizers\.", "quantizer.quantizers.", k)
        k = k.replace(".conv.", ".")
        out[k] = v.numpy()
    return out


@pytest.mark.parametrize("cfg_kwargs", [
    {},                                             # plain
    {"depthwise": True},                            # depthwise convs
    {"attn_window_size": 8, "encoder_dim": 32,
     "decoder_dim": 128, "depthwise": True},        # with LocalMHA (dim_head=64)
])
def test_snac_matches_torch_oracle(rng, cfg_kwargs):
    cfg = tiny_config(**cfg_kwargs)
    torch.manual_seed(0)
    oracle = SNACOracle(cfg).eval()
    sd = oracle_state_dict(oracle)

    model = SNAC(cfg).load_state_dict(sd)

    n = cfg.pad_to * 3 + 17  # non-multiple length exercises pad/trim
    audio = (0.3 * rng.standard_normal(n)).astype(np.float32)

    # the oracle takes pre-padded audio (reference SNAC.Preprocess, SNAC.cs:70-80)
    padded = np.zeros((-(-n // cfg.pad_to)) * cfg.pad_to, np.float32)
    padded[:n] = audio
    with torch.no_grad():
        ref_audio, ref_codes = oracle(torch.from_numpy(padded).reshape(1, 1, -1))

    got_audio, got_codes = model.forward(audio)

    # RVQ code indices must match bit-exactly (BASELINE parity gate)
    for i, (rc, gc) in enumerate(zip(ref_codes, got_codes)):
        match = (rc.numpy() == np.asarray(gc)).mean()
        assert match == 1.0, f"stage {i} code mismatch rate {1 - match:.4f}"

    ref = ref_audio.numpy()[0, 0, :n]
    got = np.asarray(got_audio)[0]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_snac_encode_decode_roundtrip_codes(rng):
    cfg = tiny_config()
    model = SNAC(cfg)
    audio = rng.standard_normal(cfg.pad_to * 2).astype(np.float32)
    codes = model.encode(audio)
    assert len(codes) == len(cfg.vq_strides)
    # frames at stage i = T / (hop * stride_i)
    hop = cfg.hop_length
    t_frames = cfg.pad_to * 2 // hop
    for c, s in zip(codes, cfg.vq_strides):
        assert c.shape == (1, t_frames // s)
        assert int(np.max(np.asarray(c))) < cfg.codebook_size
    audio_hat = model.decode(codes)
    assert audio_hat.shape == (1, cfg.pad_to * 2)
    assert np.all(np.isfinite(np.asarray(audio_hat)))


def test_snac_24khz_preset_shapes():
    cfg = SNACConfig.snac_24khz()
    assert cfg.hop_length == 512
    assert cfg.pad_to == 512 * 4
    assert cfg.resolved_latent_dim == 48 * 16


def test_snac_noise_path_is_deterministic_per_seed(rng):
    cfg = tiny_config(noise=True)
    model = SNAC(cfg)
    audio = rng.standard_normal(cfg.pad_to).astype(np.float32)
    a1, _ = model.forward(audio)
    a2, _ = model.forward(audio)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    import jax
    a3, _ = model.forward(audio, rng=jax.random.key(123))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_snac_process_audio_resamples(rng):
    cfg = tiny_config()
    model = SNAC(cfg)
    audio = rng.standard_normal(8000).astype(np.float32)
    out = model.process_audio(audio, sample_rate=16000)
    # 16k -> 24k: 1.5x samples
    assert abs(out.shape[-1] - 12000) < 4


def test_snac_mixed_precision_codes_bit_exact(rng):
    """decoder_dtype=bf16 must not change RVQ code indices (encoder+VQ stay
    f32); decoded audio stays close to the f32 path."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.snac import SNAC
    cfg = tiny_config()
    f32 = SNAC(cfg, seed=0)
    mixed = SNAC(cfg, seed=0, decoder_dtype=jnp.bfloat16)
    audio = (0.3 * rng.standard_normal(cfg.hop_length * 6)).astype(np.float32)
    out_f, codes_f = f32.forward(audio)
    out_m, codes_m = mixed.forward(audio)
    for cf, cm in zip(codes_f, codes_m):
        np.testing.assert_array_equal(np.asarray(cf), np.asarray(cm))
    assert out_m.dtype == np.float32 or out_m.dtype == jnp.float32
    err = np.abs(np.asarray(out_f) - np.asarray(out_m)).max()
    assert err < 0.1, f"bf16 decoder drifted too far: {err}"
