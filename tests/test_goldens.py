"""Frozen-golden parity gates (torch-free).

The fixtures in tests/goldens/ were generated once by make_goldens.py from
the torch oracles (SNAC/DAC) and from this repo's own tiny Encodec (+LM)
with fixed seeds. These tests assert the CURRENT implementation still
reproduces them — bit-exact RVQ codes, float-tolerance decoded audio, and
byte-exact .ecdc streams — so conv-padding math, argmin tie-breaks, and the
entropy-coder framing (SURVEY hard-parts #1-3; reference anchors
Modules/SNAC/VectorQuantizer.cs:115-141, Modules/Encodec/SConv1d.cs:245-274,
Modules/Encodec/BinaryIO.cs:40-100) can never drift silently.

If one of these fails after an INTENTIONAL semantics/format change,
regenerate with `python tests/make_goldens.py` and say so in the commit.
"""

from pathlib import Path

import numpy as np
import pytest

from make_goldens import (
    dac_golden_config,
    ecdc_golden_models,
    snac_golden_config,
)

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"


def _load(name: str) -> dict[str, np.ndarray]:
    with np.load(GOLDEN_DIR / name) as z:
        return {k: z[k] for k in z.files}


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    noise = np.mean((ref - got) ** 2)
    return float(10 * np.log10(np.mean(ref ** 2) / max(noise, 1e-20)))


def test_snac_golden_codes_and_audio():
    from neuralcodecs_tpu.models.snac import SNAC

    g = _load("snac_golden.npz")
    sd = {k[3:]: g[k] for k in g if k.startswith("sd/")}
    model = SNAC(snac_golden_config()).load_state_dict(sd)

    audio_hat, codes = model.forward(g["audio"])
    n_stages = len(model.config.vq_strides)
    assert n_stages == 4
    for i in range(n_stages):
        ref = g[f"codes/{i}"].astype(np.int32)
        got = np.asarray(codes[i])
        np.testing.assert_array_equal(got, ref, err_msg=f"stage {i} codes drifted")

    ref_audio = g["decoded"][: g["audio"].shape[0]]
    got_audio = np.asarray(audio_hat)[0]
    np.testing.assert_allclose(got_audio, ref_audio, rtol=1e-3, atol=1e-4)
    assert _snr_db(ref_audio, got_audio) > 55.0


def test_dac_golden_codes_and_audio():
    from neuralcodecs_tpu.models.dac import DAC

    g = _load("dac_golden.npz")
    sd = {k[3:]: g[k] for k in g if k.startswith("sd/")}
    model = DAC(dac_golden_config()).load_state_dict(sd)

    out = model.forward(g["audio"])
    np.testing.assert_array_equal(np.asarray(out["codes"][0]),
                                  g["codes"][0].astype(np.int32))
    ref_audio = g["decoded"][: g["audio"].shape[0]]
    got_audio = np.asarray(out["audio"])[0]
    np.testing.assert_allclose(got_audio, ref_audio, rtol=1e-3, atol=1e-4)
    assert _snr_db(ref_audio, got_audio) > 55.0


def test_ecdc_golden_bytes_frozen():
    """The .ecdc container + bit-packer + LM/arithmetic-coder byte streams
    must be reproduced EXACTLY from the frozen weights."""
    import jax.numpy as jnp

    g = _load("ecdc_golden.npz")
    model, lm = ecdc_golden_models()
    # assign the frozen weights (guards against PRNG-init drift too — a
    # mismatch here means seeded init changed, which also invalidates zoo
    # determinism assumptions)
    for k in model.params:
        np.testing.assert_array_equal(
            np.asarray(model.params[k]), g[f"sd/{k}"],
            err_msg=f"seeded init drifted for {k}")
    model.params = {k: jnp.asarray(g[f"sd/{k}"]) for k in model.params}
    lm.params = {k: jnp.asarray(g[f"lm/{k}"]) for k in lm.params}

    audio = g["audio"]
    blob_raw = model.compress(audio, use_lm=False)
    assert blob_raw == g["blob_raw"].tobytes(), "raw .ecdc bytes drifted"
    blob_lm = model.compress(audio, use_lm=True, lm=lm)
    assert blob_lm == g["blob_lm"].tobytes(), "LM .ecdc bytes drifted"

    # and both frozen streams must still decode to the direct decode output
    direct = np.asarray(model.decode(model.encode(audio)))[..., :audio.shape[0]]
    out_raw = np.asarray(model.decompress(g["blob_raw"].tobytes()))
    out_lm = np.asarray(model.decompress(g["blob_lm"].tobytes(), lm=lm))
    np.testing.assert_allclose(out_raw, direct, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_lm, direct, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["snac_golden.npz", "dac_golden.npz",
                                  "ecdc_golden.npz"])
def test_golden_fixtures_exist(name):
    assert (GOLDEN_DIR / name).exists(), (
        f"{name} missing — run `python tests/make_goldens.py`")


def test_dia_golden_generation_frozen():
    """The whole-loop Dia generation (CFG + sampling + EOS/delay pattern)
    must reproduce the frozen codes from the same weights and seed."""
    import jax.numpy as jnp

    from make_goldens import dia_golden_model

    g = _load("dia_golden.npz")
    model = dia_golden_model()
    for k in model.params:
        np.testing.assert_array_equal(
            np.asarray(model.params[k]), g[f"sd/{k}"],
            err_msg=f"seeded Dia init drifted for {k}")
    model.params = {k: jnp.asarray(g[f"sd/{k}"]) for k in model.params}
    codes, lengths = model.generate_codes(["[S1]golden fixture"],
                                          max_tokens=24, seed=7)
    np.testing.assert_array_equal(np.asarray(codes).astype(np.int16),
                                  g["codes"])
    np.testing.assert_array_equal(np.asarray(lengths).astype(np.int32),
                                  g["lengths"])


@pytest.mark.slow
def test_fullsize_golden_codes_and_audio():
    """Full-dimension SNAC-24k + DAC-44k forwards from seeded weights
    (VERDICT r2 #7): pins f32 accumulation at the real 1024+-wide layers.
    Weights are rebuilt in-test from the frozen seed (nothing large stored);
    the fixture freezes RVQ code indices exactly and the decoded audio at a
    64x decimation to float tolerance."""
    from make_goldens import SEED, fullsize_input

    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    g = _load("fullsize_golden.npz")

    snac = SNAC(SNACConfig.snac_24khz(), seed=SEED % (2**31))
    audio_hat, codes = snac.forward(fullsize_input(snac.config.sample_rate))
    for i, c in enumerate(codes):
        np.testing.assert_array_equal(
            np.asarray(c), g[f"snac/codes/{i}"],
            err_msg=f"full-size SNAC stage {i} codes drifted")
    np.testing.assert_allclose(np.asarray(audio_hat)[0, ::64],
                               g["snac/decoded_dec64"], rtol=1e-3, atol=1e-4)

    dac = DAC(DACConfig.dac_44khz(), seed=SEED % (2**31))
    out = dac.forward(fullsize_input(dac.config.sample_rate))
    np.testing.assert_array_equal(np.asarray(out["codes"]), g["dac/codes"],
                                  err_msg="full-size DAC codes drifted")
    np.testing.assert_allclose(np.asarray(out["audio"])[0, ::64],
                               g["dac/decoded_dec64"], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_dia_serving_ladder_golden():
    """The FULL Dia serving ladder (int8 KV cache + blocked KV read +
    int8-MXU dots, VERDICT r4 #10) pinned from structured weights:

    - the ladder's greedy and serving-temperature code sequences must
      reproduce the frozen golden exactly (any numeric drift in the
      quantized cache/read/dot path fails here);
    - quality gate with a fixed threshold: the ladder tracks the f32
      full-read greedy baseline exactly for >= 8 steps per row before
      the first near-tie flip (sequence-level match CASCADES after one
      flip, so the gate is divergence onset, not whole-sequence rate —
      see make_goldens.make_dia_ladder_golden docstring).
    """
    import jax.numpy as jnp

    from make_goldens import (DIA_LADDER_KW, DIA_LADDER_TEXTS,
                              dia_ladder_model)

    g = _load("dia_ladder_golden.npz")
    model = dia_ladder_model()
    for k in model.params:  # structured-weight derivation must not drift
        np.testing.assert_array_equal(
            np.asarray(model.params[k]), g[f"sd/{k}"],
            err_msg=f"structured Dia init drifted for {k}")
    model.params = {k: jnp.asarray(g[f"sd/{k}"]) for k in model.params}
    model.enable_int8_kv_cache()
    model.kv_read_block = 16
    model.kv_dot_int8 = True
    # ladder actually engaged (not silently gated off)
    assert model._resolve_kv_block(64) == 16
    assert model._resolve_kv_dot(64) is True

    greedy_kw = dict(DIA_LADDER_KW, temperature=0.0)
    ladder, lengths = model.generate_codes(DIA_LADDER_TEXTS, **greedy_kw)
    np.testing.assert_array_equal(np.asarray(ladder).astype(np.int16),
                                  g["ladder_codes"])
    np.testing.assert_array_equal(np.asarray(lengths).astype(np.int32),
                                  g["ladder_lengths"])
    served, served_len = model.generate_codes(DIA_LADDER_TEXTS,
                                              **DIA_LADDER_KW)
    np.testing.assert_array_equal(np.asarray(served).astype(np.int16),
                                  g["served_codes"])
    np.testing.assert_array_equal(np.asarray(served_len).astype(np.int32),
                                  g["served_lengths"])

    # fixed-threshold quality gate, recomputed (not trusted from the file)
    ref, lad = g["ref_codes"], g["ladder_codes"]
    n = min(ref.shape[1], lad.shape[1])
    for b in range(ref.shape[0]):
        eq = (ref[b, :n] == lad[b, :n]).all(axis=-1)
        first_div = int(np.argmin(eq)) if not eq.all() else n
        assert first_div >= 8, (
            f"row {b}: serving ladder diverges from the f32 baseline at "
            f"step {first_div} (< 8) — quantized-read quality regressed")
