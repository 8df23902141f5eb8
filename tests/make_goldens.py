"""Generate the frozen golden fixtures in tests/goldens/ (run ONCE, by hand).

    python tests/make_goldens.py

The goldens pin three things against silent drift (conv padding math,
argmin tie-breaks, entropy-coder framing — SURVEY hard-parts #1-3):

- ``snac_golden.npz``  — torch-oracle SNAC weights (real 44.1 kHz stride
  pattern [2,3,8,8] incl. the odd-stride transpose conv, depthwise convs,
  LocalMHA, vq_strides [8,4,2,1], codebook 4096) + input audio + the
  oracle's RVQ code indices and decoded audio.
- ``dac_golden.npz``   — torch-oracle DAC weights (real 44 kHz strides
  [2,4,8,8], 9 codebooks of 1024) + input + oracle codes + decoded audio.
- ``ecdc_golden.npz``  — tiny-Encodec weights + LM weights + input audio +
  the exact .ecdc byte streams (raw bit-packed AND LM/arithmetic-coded)
  this repo produced at generation time.

test_goldens.py then asserts, WITHOUT torch, that the current
implementation reproduces the codes bit-exactly, the audio to float
tolerance, and the .ecdc bytes exactly. Regenerate only when a deliberate
format/semantics change is made — and say so in the commit message.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
GOLDEN_DIR = HERE / "goldens"

SEED = 20260816


def snac_golden_config():
    """Reduced dims, REAL 44.1 kHz structure: strides [2,3,8,8] (odd-stride
    transpose conv + output_padding), depthwise convs, LocalMHA, vq_strides
    [8,4,2,1], 4096-entry codebooks."""
    from neuralcodecs_tpu.models.snac import SNACConfig

    return SNACConfig(
        sampling_rate=44100, encoder_dim=8, encoder_rates=[2, 3, 8, 8],
        decoder_dim=128, decoder_rates=[8, 8, 3, 2], attn_window_size=8,
        codebook_size=4096, codebook_dim=8, vq_strides=[8, 4, 2, 1],
        noise=False, depthwise=True)


def dac_golden_config():
    """Reduced dims, REAL 44 kHz structure: strides [2,4,8,8], 9 codebooks."""
    from neuralcodecs_tpu.models.dac import DACConfig

    return DACConfig(
        sample_rate=44100, encoder_dim=8, encoder_rates=[2, 4, 8, 8],
        decoder_dim=128, decoder_rates=[8, 8, 4, 2], n_codebooks=9,
        codebook_size=1024, codebook_dim=8)


def ecdc_golden_models():
    from test_encodec import tiny_config

    from neuralcodecs_tpu.models.encodec import Encodec
    from neuralcodecs_tpu.models.encodec.lm import (
        EncodecLanguageModel, EncodecLMConfig)

    cfg = tiny_config()
    model = Encodec(cfg, seed=SEED % (2**31))
    lm_cfg = EncodecLMConfig(codebook_size=cfg.codebook_size,
                             num_codebooks=model.num_codebooks,
                             dimension=32, num_heads=4, num_layers=2,
                             past_context=16)
    lm = EncodecLanguageModel(lm_cfg, seed=SEED % (2**31))
    return model, lm


def make_snac_golden() -> None:
    import torch

    from oracles import SNACOracle
    from test_snac import oracle_state_dict

    cfg = snac_golden_config()
    torch.manual_seed(SEED)
    oracle = SNACOracle(cfg).eval()
    sd = oracle_state_dict(oracle)

    rng = np.random.default_rng(SEED)
    n = cfg.pad_to * 2 + 123
    audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
    padded = np.zeros((-(-n // cfg.pad_to)) * cfg.pad_to, np.float32)
    padded[:n] = audio
    with torch.no_grad():
        ref_audio, ref_codes = oracle(torch.from_numpy(padded).reshape(1, 1, -1))

    payload = {f"sd/{k}": v for k, v in sd.items()}
    payload["audio"] = audio
    payload["decoded"] = ref_audio.numpy()[0, 0].astype(np.float32)
    for i, c in enumerate(ref_codes):
        payload[f"codes/{i}"] = c.numpy().astype(np.int16)
    np.savez_compressed(GOLDEN_DIR / "snac_golden.npz", **payload)
    print(f"snac_golden: {len(sd)} tensors, audio {n}, "
          f"codes {[tuple(c.shape) for c in ref_codes]}")


def make_dac_golden() -> None:
    import torch

    from oracles import DACOracle
    from test_dac import oracle_state_dict

    cfg = dac_golden_config()
    torch.manual_seed(SEED + 1)
    oracle = DACOracle(cfg).eval()
    sd = oracle_state_dict(oracle)

    rng = np.random.default_rng(SEED + 1)
    n = cfg.hop_length * 24 + 77
    audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
    padded = np.zeros((-(-n // cfg.hop_length)) * cfg.hop_length, np.float32)
    padded[:n] = audio
    with torch.no_grad():
        ref_audio, ref_codes = oracle(torch.from_numpy(padded).reshape(1, 1, -1))

    payload = {f"sd/{k}": v for k, v in sd.items()}
    payload["audio"] = audio
    payload["decoded"] = ref_audio.numpy()[0, 0].astype(np.float32)
    payload["codes"] = ref_codes.numpy().astype(np.int16)
    np.savez_compressed(GOLDEN_DIR / "dac_golden.npz", **payload)
    print(f"dac_golden: {len(sd)} tensors, audio {n}, codes {tuple(ref_codes.shape)}")


def make_ecdc_golden() -> None:
    model, lm = ecdc_golden_models()

    rng = np.random.default_rng(SEED + 2)
    audio = (0.3 * rng.standard_normal(1600)).astype(np.float32)
    blob_raw = model.compress(audio, use_lm=False)
    blob_lm = model.compress(audio, use_lm=True, lm=lm)

    payload = {f"sd/{k}": np.asarray(v) for k, v in model.params.items()}
    payload.update({f"lm/{k}": np.asarray(v) for k, v in lm.params.items()})
    payload["audio"] = audio
    payload["blob_raw"] = np.frombuffer(blob_raw, dtype=np.uint8)
    payload["blob_lm"] = np.frombuffer(blob_lm, dtype=np.uint8)
    np.savez_compressed(GOLDEN_DIR / "ecdc_golden.npz", **payload)
    print(f"ecdc_golden: raw {len(blob_raw)} B, lm {len(blob_lm)} B")




def dia_golden_model():
    from test_dia import tiny_config

    from neuralcodecs_tpu.models.dia import Dia

    return Dia(tiny_config(), seed=SEED % (2**31))


def make_dia_golden() -> None:
    """Freeze a tiny-Dia generation (codes) to pin the whole while_loop
    generation path: CFG, sampling, EOS/delay-pattern bookkeeping."""
    model = dia_golden_model()
    codes, lengths = model.generate_codes(["[S1]golden fixture"],
                                          max_tokens=24, seed=7)
    payload = {f"sd/{k}": np.asarray(v) for k, v in model.params.items()}
    payload["codes"] = np.asarray(codes).astype(np.int16)
    payload["lengths"] = np.asarray(lengths).astype(np.int32)
    np.savez_compressed(GOLDEN_DIR / "dia_golden.npz", **payload)
    print(f"dia_golden: codes {tuple(np.asarray(codes).shape)}, "
          f"lengths {np.asarray(lengths).tolist()}")


# ---------------------------------------------------------------- full-size

FULLSIZE_SECONDS = 0.5


def fullsize_input(sample_rate: int) -> np.ndarray:
    """Deterministic 0.5 s test signal: two tones + seeded noise floor.
    Regenerated identically by the test — not stored in the fixture."""
    n = int(sample_rate * FULLSIZE_SECONDS)
    t = np.arange(n) / sample_rate
    rng = np.random.default_rng(SEED)
    x = (0.4 * np.sin(2 * np.pi * 220.0 * t)
         + 0.2 * np.sin(2 * np.pi * 3001.0 * t)
         + 0.02 * rng.standard_normal(n))
    return x.astype(np.float32)


def make_fullsize_golden() -> None:
    """Freeze FULL-dimension SNAC-24k and DAC-44k forwards from seeded
    random weights (VERDICT r2 #7): the dim-reduced goldens above pin
    structure, but f32 accumulation behavior at the real 1024+-wide layers
    is only pinned by running the real widths. No weights are stored —
    models are rebuilt in-test from the same seed; the fixture freezes only
    the RVQ code indices and a 64x-decimated copy of the decoded audio.

    Regenerate ONLY under the test environment (JAX_PLATFORMS=cpu with
    ``--xla_force_host_platform_device_count=8``, as conftest.py sets): the
    virtual device count changes XLA's CPU partitioning and therefore f32
    summation order, which can flip near-tie argmins in the deeper RVQ
    stages (observed: 2/396 DAC codes differ 1-device vs 8-device)."""
    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    payload: dict[str, np.ndarray] = {}

    snac = SNAC(SNACConfig.snac_24khz(), seed=SEED % (2**31))
    audio = fullsize_input(snac.config.sample_rate)
    audio_hat, codes = snac.forward(audio)
    for i, c in enumerate(codes):
        payload[f"snac/codes/{i}"] = np.asarray(c).astype(np.int32)
    payload["snac/decoded_dec64"] = np.asarray(audio_hat)[0, ::64].astype(np.float32)

    dac = DAC(DACConfig.dac_44khz(), seed=SEED % (2**31))
    audio = fullsize_input(dac.config.sample_rate)
    out = dac.forward(audio)
    payload["dac/codes"] = np.asarray(out["codes"]).astype(np.int32)
    payload["dac/decoded_dec64"] = np.asarray(out["audio"])[0, ::64].astype(np.float32)

    np.savez_compressed(GOLDEN_DIR / "fullsize_golden.npz", **payload)
    print("fullsize_golden:",
          {k: tuple(v.shape) for k, v in payload.items()})


if __name__ == "__main__":
    GOLDEN_DIR.mkdir(exist_ok=True)
    make_snac_golden()
    make_dac_golden()
    make_ecdc_golden()
    make_dia_golden()
    make_fullsize_golden()
    for p in sorted(GOLDEN_DIR.glob("*.npz")):
        print(f"{p.name}: {p.stat().st_size / 1e6:.2f} MB")
