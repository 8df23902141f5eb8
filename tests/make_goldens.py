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


def dia_ladder_model():
    """Tiny Dia with STRUCTURED weights for the serving-ladder golden
    (VERDICT r4 #10): the seeded init is reshaped so quantization error
    behaves like it does on trained weights instead of iid noise —
    per-output-channel scale diversity (log-uniform 0.5..2.0: stresses the
    int8 per-vector grid the way trained channels with unequal magnitudes
    do) plus a low-rank component at 0.5x the layer RMS (gives attention
    heads preferred directions, so KV reads concentrate instead of
    averaging out the cache's quantization noise)."""
    from test_dia import tiny_config

    from neuralcodecs_tpu.models.dia import Dia

    cfg = tiny_config()
    cfg.data.audio_length = 64
    model = Dia(cfg, seed=SEED % (2**31))
    rng = np.random.default_rng(SEED)
    structured = {}
    for name, v in model.params.items():
        arr = np.asarray(v)
        if arr.ndim >= 2 and "embedding" not in name:
            flat = arr.reshape(-1, arr.shape[-1])
            rms = float(np.sqrt(np.mean(flat**2))) or 1.0
            u = rng.standard_normal((flat.shape[0], 1))
            w = rng.standard_normal((1, flat.shape[1]))
            lowrank = (u / max(np.linalg.norm(u), 1e-9)) @ (
                w / max(np.linalg.norm(w), 1e-9))
            flat = flat + 0.5 * rms * np.sqrt(flat.size) * lowrank
            scales = np.exp(rng.uniform(np.log(0.5), np.log(2.0),
                                        size=(1, flat.shape[-1])))
            arr = (flat * scales).reshape(arr.shape).astype(arr.dtype)
        structured[name] = arr
    import jax.numpy as jnp

    model.params = {k: jnp.asarray(v) for k, v in structured.items()}
    return model


DIA_LADDER_TEXTS = ["[S1]serving ladder golden", "[S2]second row"]
DIA_LADDER_KW = dict(max_tokens=64, seed=11, temperature=1.2, top_k=32)


def make_dia_ladder_golden() -> None:
    """Freeze the FULL serving ladder's output (int8 KV cache + blocked
    KV read + int8-MXU dots) from structured weights:

    - quality gate: the GREEDY (temperature=0) ladder generation must
      track the f32 full-read greedy baseline exactly for a minimum
      number of steps per row (first-divergence floor). Full-sequence
      match rate is stored but NOT gated: any autoregressive flip —
      greedy included — diverges permanently, so sequence match measures
      WHERE the first near-tie flipped, not how well the ladder tracks.
      On these structured-but-synthetic tiny weights near-ties are dense
      (measured: first flips at steps 9/16 of 61); real trained weights
      have far wider logit gaps, which is what the real-weight parity
      pack (tools/parity_pack.py) is for.
    - regression pin: the ladder's codes at the SERVING sampling settings
      (temperature 1.2, top-k) frozen exactly, plus the greedy pair.
    """
    model = dia_ladder_model()
    greedy_kw = dict(DIA_LADDER_KW, temperature=0.0)
    ref, ref_len = model.generate_codes(DIA_LADDER_TEXTS, **greedy_kw)
    model.enable_int8_kv_cache()
    model.kv_read_block = 16   # divides the 64-token buffer
    model.kv_dot_int8 = True
    ladder, ladder_len = model.generate_codes(DIA_LADDER_TEXTS, **greedy_kw)
    ref_np, lad_np = np.asarray(ref), np.asarray(ladder)
    n = min(ref_np.shape[1], lad_np.shape[1])
    match = float(np.mean(ref_np[:, :n] == lad_np[:, :n]))
    first_div = []
    for b in range(ref_np.shape[0]):
        eq = (ref_np[b, :n] == lad_np[b, :n]).all(axis=-1)
        first_div.append(int(np.argmin(eq)) if not eq.all() else n)
    served, served_len = model.generate_codes(DIA_LADDER_TEXTS,
                                              **DIA_LADDER_KW)
    payload = {f"sd/{k}": np.asarray(v) for k, v in model.params.items()}
    payload["ref_codes"] = np.asarray(ref).astype(np.int16)
    payload["ref_lengths"] = np.asarray(ref_len).astype(np.int32)
    payload["ladder_codes"] = np.asarray(ladder).astype(np.int16)
    payload["ladder_lengths"] = np.asarray(ladder_len).astype(np.int32)
    payload["served_codes"] = np.asarray(served).astype(np.int16)
    payload["served_lengths"] = np.asarray(served_len).astype(np.int32)
    payload["greedy_match_rate"] = np.float64(match)
    payload["first_divergence_steps"] = np.asarray(first_div, np.int32)
    np.savez_compressed(GOLDEN_DIR / "dia_ladder_golden.npz", **payload)
    print(f"dia_ladder_golden: greedy ladder-vs-baseline match {match:.4f}, "
          f"first divergence {first_div}, "
          f"served codes {tuple(np.asarray(served).shape)}")


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
    make_dia_ladder_golden()
    make_fullsize_golden()
    for p in sorted(GOLDEN_DIR.glob("*.npz")):
        print(f"{p.name}: {p.stat().st_size / 1e6:.2f} MB")
