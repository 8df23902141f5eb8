"""CLI parser and visualization tests."""

import numpy as np

from neuralcodecs_tpu.cli.main import build_parser
from neuralcodecs_tpu.cli.visualize import (
    audio_stats,
    compare_spectrograms,
    save_spectrogram,
)


def test_parser_subcommands():
    parser = build_parser()
    args = parser.parse_args(["roundtrip", "--input", "a.wav", "--output",
                              "b.wav", "--codec", "dac"])
    assert args.codec == "dac" and args.fn.__name__ == "cmd_roundtrip"
    args = parser.parse_args(["compress", "--input", "a.wav", "--output",
                              "b.ecdc", "--lm", "--bandwidth", "6"])
    assert args.lm and args.bandwidth == 6.0
    args = parser.parse_args(["tts", "--text", "[S1]x", "--output", "t.wav"])
    assert args.fn.__name__ == "cmd_tts"
    args = parser.parse_args(["interactive"])
    assert args.fn.__name__ == "cmd_interactive"


def test_spectrogram_outputs(tmp_path, rng):
    sr = 8000
    t = np.arange(4000) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    save_spectrogram(tone, sr, tmp_path / "spec.ppm")
    raw = (tmp_path / "spec.ppm").read_bytes()
    assert raw.startswith(b"P6\n")
    stats = compare_spectrograms(tone, 0.5 * tone, sr, tmp_path)
    assert abs(stats["snr_db"] - 6.02) < 0.1
    assert (tmp_path / "compare_diff.ppm").exists()
    s = audio_stats(tone, sr)
    assert abs(s["duration_s"] - 0.5) < 1e-6
