"""AudioTools layer tests: effects, loudness, AudioSignal, DACFile."""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralcodecs_tpu.dsp import effects
from neuralcodecs_tpu.dsp.filters import biquad, comb_filter
from neuralcodecs_tpu.dsp.loudness import integrated_loudness, normalize_loudness
from neuralcodecs_tpu.dsp.signal import AudioSignal


def tone(freq=440.0, sr=16000, seconds=0.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_biquad_matches_scipy_style_reference(rng):
    """Biquad vs direct difference-equation evaluation."""
    x = rng.standard_normal(200).astype(np.float32)
    b = np.array([0.2, 0.3, 0.1], np.float32)
    a = np.array([1.0, -0.5, 0.25], np.float32)
    ref = np.zeros_like(x)
    for n in range(len(x)):
        ref[n] = (b[0] * x[n] + (b[1] * x[n - 1] if n >= 1 else 0)
                  + (b[2] * x[n - 2] if n >= 2 else 0)
                  - (a[1] * ref[n - 1] if n >= 1 else 0)
                  - (a[2] * ref[n - 2] if n >= 2 else 0))
    got = np.asarray(biquad(jnp.asarray(x), jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_compressor_reduces_loud_passages():
    sr = 16000
    x = np.concatenate([tone(sr=sr, amp=0.05), tone(sr=sr, amp=0.9)])
    out = np.asarray(effects.apply_compressor(x, sr, threshold=-20.0, ratio=8.0))
    # loud part compressed, quiet part (below threshold) untouched
    loud_in = np.abs(x[10000:]).max()
    loud_out = np.abs(out[10000:]).max()
    assert loud_out < loud_in * 0.7
    np.testing.assert_allclose(out[:6000], x[:6000], atol=1e-4)


def test_delay_creates_echo():
    sr = 8000
    x = np.zeros(4000, np.float32)
    x[0] = 1.0
    out = np.asarray(effects.apply_delay(x, sr, delay_time=0.1, feedback=0.5,
                                         wet_level=1.0, dry_level=0.0))
    d = int(0.1 * sr)
    assert abs(out[d] - 1.0) < 1e-5      # first echo
    assert abs(out[2 * d] - 0.5) < 1e-5  # feedback echo
    assert abs(out[0]) < 1e-6


def test_distortion_bounds_output(rng):
    x = (3 * rng.standard_normal(1000)).astype(np.float32)
    out = np.asarray(effects.apply_distortion(x, amount=0.9))
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_lowpass_attenuates_high_freq():
    sr = 16000
    lo, hi = tone(200, sr), tone(6000, sr)
    x = lo + hi
    out = np.asarray(effects.apply_lowpass(x, sr, cutoff_freq=1000.0))
    # high tone should be strongly attenuated, low preserved
    def power(sig, f):
        t = np.arange(len(sig)) / sr
        return abs(np.mean(sig * np.exp(-2j * np.pi * f * t)))
    assert power(out, 6000) < 0.05 * power(x, 6000)
    assert power(out, 200) > 0.8 * power(x, 200)


def test_reverb_and_tremolo_run(rng):
    sr = 8000
    x = tone(sr=sr, seconds=0.25)
    rev = np.asarray(effects.apply_reverb(x, room_size=0.5, wet_level=0.4))
    assert rev.shape == x.shape and np.isfinite(rev).all()
    trem = np.asarray(effects.apply_tremolo(x, sr, rate=4.0, depth=0.8))
    assert trem.shape == x.shape
    # exact formula: x * (1 - depth + depth*sin(2*pi*rate*t))
    t = np.arange(len(x)) / sr
    lfo = 1 - 0.8 + 0.8 * np.sin(2 * np.pi * 4.0 * t)
    np.testing.assert_allclose(trem, x * lfo.astype(np.float32), atol=1e-5)


def test_flanger_chorus_phaser_pitchshift_run():
    sr = 8000
    x = tone(sr=sr, seconds=0.2)
    for out in (effects.apply_flanger(x, sr), effects.apply_chorus(x, sr),
                effects.apply_phaser(x, sr),
                effects.apply_pitch_shift(x, sr, semitones=3)):
        out = np.asarray(out)
        assert out.shape == x.shape and np.isfinite(out).all()


def test_integrated_loudness_tracks_gain():
    sr = 48000
    x = tone(997, sr, 2.0, amp=0.25)
    l1 = float(integrated_loudness(x, sr)[0])
    l2 = float(integrated_loudness(2 * x, sr)[0])
    assert 5.5 < l2 - l1 < 6.5  # +6 dB gain → +6 LU
    normalized = np.asarray(normalize_loudness(x, sr, target_db=-24.0))
    l3 = float(integrated_loudness(normalized, sr)[0])
    assert abs(l3 + 24.0) < 1.0


def test_audio_signal_roundtrip(tmp_path, rng):
    sr = 16000
    sig = AudioSignal(tone(sr=sr), sr)
    assert sig.batch_size == 1 and sig.num_channels == 1
    assert abs(sig.signal_duration - 0.5) < 1e-3
    path = tmp_path / "tone.wav"
    sig.write(path)
    loaded = AudioSignal.load(path)
    assert loaded.sample_rate == sr
    np.testing.assert_allclose(np.asarray(loaded.audio_data),
                               np.asarray(sig.audio_data), atol=2e-4)


def test_audio_signal_dsp_methods():
    sr = 16000
    sig = AudioSignal(tone(sr=sr), sr)
    spec = sig.stft()
    assert spec.shape[-2] == sig.stft_params.window_length // 2 + 1
    rec = sig.istft(spec)
    np.testing.assert_allclose(np.asarray(rec.audio_data),
                               np.asarray(sig.audio_data), atol=1e-4)
    mel = sig.mel_spectrogram(n_mels=40)
    assert mel.shape[-2] == 40
    mono = AudioSignal(np.stack([tone(sr=sr), tone(660, sr)]), sr).to_mono()
    assert mono.num_channels == 1
    res = sig.resample(24000)
    assert res.sample_rate == 24000
    assert abs(res.signal_length - sig.signal_length * 1.5) < 4


def test_audio_signal_batch_and_windows():
    sr = 8000
    s1 = AudioSignal(tone(sr=sr, seconds=0.5), sr)
    s2 = AudioSignal(tone(sr=sr, seconds=0.3), sr)
    batch = AudioSignal.batch([s1, s2])
    assert batch.batch_size == 2
    assert batch.signal_length == s1.signal_length
    wins = list(s1.windows(0.1, 0.05))
    assert len(wins) > 5
    assert all(w.signal_length == int(0.1 * sr) for w in wins)


def test_dac_file_roundtrip(tmp_path, rng):
    from neuralcodecs_tpu.models.dac.config import DACConfig
    from neuralcodecs_tpu.models.dac.dacfile import load_dac_file, save_dac_file

    codes = [rng.integers(0, 1024, size=(1, 9, 50)).astype(np.int32)]
    cfg = DACConfig()
    path = tmp_path / "x.dac"
    save_dac_file(path, codes, cfg)
    loaded_codes, loaded_cfg = load_dac_file(path)
    np.testing.assert_array_equal(loaded_codes[0], codes[0])
    assert loaded_cfg.sample_rate == cfg.sample_rate
    assert loaded_cfg.n_codebooks == cfg.n_codebooks


def test_dac_file_rejects_malformed_input(rng):
    """The .dac parser is exposed to untrusted bytes (serve /decompress):
    every length field must be bounded before allocation and truncation
    must raise, never produce short arrays."""
    import pytest

    from neuralcodecs_tpu.models.dac.config import DACConfig
    from neuralcodecs_tpu.models.dac.dacfile import (
        dac_file_bytes, parse_dac_file)

    codes = [rng.integers(0, 1024, size=(1, 3, 20)).astype(np.int32)]
    good = dac_file_bytes(codes, DACConfig())
    back, _ = parse_dac_file(good)
    np.testing.assert_array_equal(back[0], codes[0])

    with pytest.raises(ValueError):
        parse_dac_file(b"NOPE" + good[4:])          # bad magic
    for cut in (2, 7, 11, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            parse_dac_file(good[:cut])              # truncations
    # unreasonable declared sizes must be rejected before allocation
    import struct
    with pytest.raises(ValueError):
        parse_dac_file(good[:8] + struct.pack("<I", 1 << 30) + good[12:])
    hdr_end = 12 + struct.unpack("<I", good[8:12])[0]
    with pytest.raises(ValueError):  # tensor count
        parse_dac_file(good[:hdr_end] + struct.pack("<I", 1 << 30)
                       + good[hdr_end + 4:])
    with pytest.raises(ValueError):  # tensor rank
        parse_dac_file(good[:hdr_end + 4] + struct.pack("<I", 99)
                       + good[hdr_end + 8:])
    # giant dims (python-int product, no overflow wrap) rejected
    dims_at = hdr_end + 8
    with pytest.raises(ValueError):
        parse_dac_file(good[:dims_at] + struct.pack("<q", 1 << 62)
                       + good[dims_at + 8:])


def test_pcm_conversions(rng):
    from neuralcodecs_tpu.dsp import audio_utils as au

    x = (rng.standard_normal(500) * 0.5).astype(np.float32)
    pcm = au.float_to_pcm16(x)
    back = au.pcm16_to_float(pcm)
    np.testing.assert_allclose(back, np.clip(x, -1, 1), atol=1e-4)
    stereo = rng.standard_normal((2, 100)).astype(np.float32)
    inter = au.interleave(stereo)
    np.testing.assert_array_equal(au.deinterleave(inter, 2), stereo)
    assert au.to_mono(stereo).shape == (100,)
    np.testing.assert_allclose(au.db_to_linear(au.linear_to_db(0.5)), 0.5,
                               rtol=1e-6)


def test_spec_masking(rng):
    import jax

    from neuralcodecs_tpu.dsp.audio_utils import mask_frequency, mask_time

    spec = np.abs(rng.standard_normal((40, 100))).astype(np.float32) + 0.1
    out_t = np.asarray(mask_time(spec, jax.random.key(0), max_width=10))
    out_f = np.asarray(mask_frequency(spec, jax.random.key(1), max_width=5))
    assert (out_t == 0).any(axis=0).sum() >= 1    # some time column zeroed
    assert (out_f == 0).all(axis=1).sum() >= 1    # some freq row zeroed


def test_conv_layer_norm_encodec():
    """layer_norm norm-type wires through the SEANet conv stack."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec.seanet import SConv1d

    layer = SConv1d("c", 4, 8, 3, norm_type="layer_norm")
    params = {}
    import jax

    layer.init(jax.random.key(0), params)
    assert "c.norm.weight" in params
    out = layer(params, jnp.ones((1, 32, 4)))
    assert out.shape[2] == 8
    assert np.isfinite(np.asarray(out)).all()


def test_audio_info_and_operation_result():
    from neuralcodecs_tpu.core.operations import CodecOperation, OperationResult
    from neuralcodecs_tpu.dsp.signal import AudioSignal

    sig = AudioSignal(np.zeros(24000, np.float32), 24000)
    info = sig.info
    assert info.num_frames == 24000 and abs(info.duration - 1.0) < 1e-9
    ok = OperationResult.from_success(info)
    assert ok.success and ok.result is info and ok.error is None
    err = OperationResult.from_error(RuntimeError("boom"))
    assert not err.success and "boom" in err.message
    assert CodecOperation.MODEL_LOADING.value == "model_loading"
