"""DSP parity tests: STFT/ISTFT vs torch, mel filterbank, resampling."""

import numpy as np
import pytest
import torch

from neuralcodecs_tpu.dsp.stft import stft, istft, get_window
from neuralcodecs_tpu.dsp.mel import mel_spectrogram, mel_filterbank, mfcc
from neuralcodecs_tpu.dsp.resample import linear_resample, resample_poly


@pytest.mark.parametrize("n_fft,hop,center", [
    (256, 64, True),
    (512, 128, True),
    (256, 64, False),
])
def test_stft_matches_torch(rng, n_fft, hop, center):
    x = rng.standard_normal(4096).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
        window=torch.hann_window(n_fft), center=center,
        pad_mode="reflect", return_complex=True,
    ).numpy()
    got = np.asarray(stft(x, n_fft=n_fft, hop_length=hop, center=center))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_istft_roundtrip(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    spec = stft(x, n_fft=256, hop_length=64, center=True)
    rec = np.asarray(istft(spec, n_fft=256, hop_length=64, center=True, length=4096))
    np.testing.assert_allclose(rec, x, rtol=1e-4, atol=1e-5)


def test_window_types_match_torch():
    for name, fn in [("hann", torch.hann_window), ("hamming", torch.hamming_window),
                     ("blackman", torch.blackman_window),
                     ("bartlett", torch.bartlett_window)]:
        ref = fn(128, periodic=True).numpy()
        got = get_window(name, 128)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(24000, 80, 1024)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_spectrogram_batch(rng):
    x = rng.standard_normal((2, 3, 2048)).astype(np.float32)
    mel = np.asarray(mel_spectrogram(x, 24000, n_mels=40, n_fft=512, hop_length=128))
    assert mel.shape[:3] == (2, 3, 40)
    assert np.isfinite(mel).all() and (mel >= 0).all()


def test_mfcc_shape(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    out = np.asarray(mfcc(x, 16000, n_mfcc=13, n_mels=40, n_fft=512, hop_length=128))
    assert out.shape[0] == 13
    assert np.isfinite(out).all()


def test_linear_resample_identity_and_ratio(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(linear_resample(x, 16000, 16000)), x)
    y = np.asarray(linear_resample(x, 16000, 24000))
    assert y.shape[-1] == 1500


def test_resample_poly_preserves_tone(rng):
    """A 440 Hz tone resampled 16k->24k must stay a 440 Hz tone."""
    sr1, sr2 = 16000, 24000
    t1 = np.arange(8000) / sr1
    x = np.sin(2 * np.pi * 440.0 * t1).astype(np.float32)
    y = np.asarray(resample_poly(x, sr1, sr2))
    assert y.shape[-1] == 12000
    t2 = np.arange(y.shape[-1]) / sr2
    expected = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
    # ignore filter edge transients
    sl = slice(500, -500)
    err = np.sqrt(np.mean((y[sl] - expected[sl]) ** 2))
    assert err < 1e-2, err
