"""DAC golden-parity tests against the torch oracle + API smoke tests."""

import re

import numpy as np
import torch

from neuralcodecs_tpu.models.dac import DAC, DACConfig

from oracles import DACOracle


def tiny_config(**over):
    base = dict(
        sample_rate=16000,
        encoder_dim=16,
        encoder_rates=[2, 4],
        decoder_dim=64,
        decoder_rates=[4, 2],
        n_codebooks=3,
        codebook_size=32,
        codebook_dim=4,
    )
    base.update(over)
    return DACConfig(**base)


def oracle_state_dict(oracle: torch.nn.Module) -> dict:
    out = {}
    for k, v in oracle.state_dict().items():
        k = re.sub(r"^encoder\.(\d+)", r"encoder.block.\1", k)
        k = re.sub(r"^decoder\.(\d+)\.(\d+)", r"decoder.model.\1.block.\2", k)
        k = re.sub(r"^decoder\.(\d+)", r"decoder.model.\1", k)
        k = re.sub(r"^quantizers\.", "quantizer.quantizers.", k)
        k = k.replace(".conv.", ".")
        out[k] = v.numpy()
    return out


def test_dac_matches_torch_oracle(rng):
    cfg = tiny_config()
    torch.manual_seed(0)
    oracle = DACOracle(cfg).eval()
    model = DAC(cfg).load_state_dict(oracle_state_dict(oracle))

    n = cfg.hop_length * 10 + 5
    audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
    # oracle takes pre-padded audio (reference DAC.Preprocess, DAC.cs:141-154)
    padded = np.zeros((-(-n // cfg.hop_length)) * cfg.hop_length, np.float32)
    padded[:n] = audio
    with torch.no_grad():
        ref_audio, ref_codes = oracle(torch.from_numpy(padded).reshape(1, 1, -1))

    out = model.forward(audio)
    got_codes = np.asarray(out["codes"])
    assert (got_codes == ref_codes.numpy()).all(), "RVQ code indices must be bit-exact"
    np.testing.assert_allclose(np.asarray(out["audio"])[0], ref_audio.numpy()[0, 0, :n],
                               rtol=1e-3, atol=1e-4)


def test_dac_from_codes_roundtrip(rng):
    cfg = tiny_config()
    model = DAC(cfg)
    audio = rng.standard_normal(cfg.hop_length * 8).astype(np.float32)
    out = model.forward(audio)
    rec = model.from_codes(out["codes"])
    # decoding from codes must equal the round-trip decode exactly
    np.testing.assert_allclose(np.asarray(rec)[:, :out["audio"].shape[-1]],
                               np.asarray(out["audio"]), rtol=1e-5, atol=1e-6)


def test_dac_n_quantizers_subset(rng):
    cfg = tiny_config()
    model = DAC(cfg)
    audio = rng.standard_normal(cfg.hop_length * 4).astype(np.float32)
    z_q, codes, latents, commit, cb = model.encode(audio, n_quantizers=2)
    assert codes.shape[1] == 2
    assert latents.shape[-1] == 2 * cfg.codebook_dim


def test_dac_losses_finite(rng):
    cfg = tiny_config()
    model = DAC(cfg)
    audio = rng.standard_normal(cfg.hop_length * 4).astype(np.float32)
    out = model.forward(audio)
    assert np.isfinite(float(out["vq/commitment_loss"]))
    assert np.isfinite(float(out["vq/codebook_loss"]))


def test_dac_from_latents_matches_roundtrip(rng):
    """FromLatents re-quantizes the concatenated stage latents
    (reference RVQ.FromLatents :240-297)."""
    cfg = tiny_config()
    model = DAC(cfg)
    audio = rng.standard_normal(cfg.hop_length * 6).astype(np.float32)
    z_q, codes, latents, _, _ = model.encode(audio)
    rec_from_latents = model.from_latents(latents)
    rec_direct = model.decode(z_q)
    np.testing.assert_allclose(np.asarray(rec_from_latents),
                               np.asarray(rec_direct), rtol=1e-4, atol=1e-5)
