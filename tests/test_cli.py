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


def test_cli_roundtrip_with_diagnostics(tmp_path, rng, capsys):
    """--diagnostics routes per-stage stats through DiagnosticsContext and
    prints a summary; errors surface as OperationResult JSON on stderr."""
    import wave

    from neuralcodecs_tpu.cli.main import main
    from neuralcodecs_tpu.diagnostics.context import (
        NullDiagnosticsContext, set_diagnostics)
    from neuralcodecs_tpu.models.snac import SNACConfig

    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)).astype(np.float32)
    wav_in = tmp_path / "in.wav"
    with wave.open(str(wav_in), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())

    # patch in a tiny preset so the test stays fast
    tiny = lambda: SNACConfig(  # noqa: E731
        sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
        decoder_dim=32, decoder_rates=[4, 2], attn_window_size=None,
        codebook_size=32, codebook_dim=4, vq_strides=[2, 1],
        noise=False, depthwise=False)
    import neuralcodecs_tpu.cli.main as cli_main
    orig = cli_main._load_codec

    def load_tiny(codec, model_path, preset):
        from neuralcodecs_tpu.models.snac import SNAC
        return SNAC(tiny())

    cli_main._load_codec = load_tiny
    try:
        rc = main(["roundtrip", "--input", str(wav_in),
                   "--output", str(tmp_path / "out.wav"), "--diagnostics"])
    finally:
        cli_main._load_codec = orig
        set_diagnostics(NullDiagnosticsContext())
    assert rc == 0
    err = capsys.readouterr().err
    assert "Diagnostics summary" in err
    assert "snac.encode" in err and "snac.decode" in err


def test_cli_error_reports_operation_result(tmp_path, capsys):
    from neuralcodecs_tpu.cli.main import main

    rc = main(["roundtrip", "--input", str(tmp_path / "missing.wav"),
               "--output", str(tmp_path / "out.wav")])
    assert rc == 1
    err = capsys.readouterr().err
    import json
    line = [l for l in err.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["success"] is False
    assert rec["operation"] == "encoding"


def test_loader_try_load_returns_operation_result(tmp_path):
    from neuralcodecs_tpu.core.loader import LoadOptions, ModelLoader
    from neuralcodecs_tpu.core.events import LoadErrorEvent

    loader = ModelLoader()
    seen: list[LoadErrorEvent] = []
    loader.on_error(seen.append)
    result = loader.try_load("snac", str(tmp_path / "nope.pt"),
                             options=LoadOptions())
    assert result.success is False
    assert result.error is not None and seen and seen[0].fatal


def test_cli_compress_decompress_roundtrip(tmp_path, rng, capsys):
    """Full .ecdc flow through the CLI: wav -> compress -> decompress -> wav."""
    import wave

    import neuralcodecs_tpu.cli.main as cli_main
    from neuralcodecs_tpu.cli.main import main
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 330 * np.arange(sr // 4) / sr)).astype(np.float32)
    wav_in = tmp_path / "in.wav"
    with wave.open(str(wav_in), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())

    cfg = EncodecConfig(
        sampling_rate=16000, channels=1, bandwidth=20.0,
        target_bandwidths=[20.0], codebook_size=32, codebook_dim=16,
        hidden_size=16, num_filters=8, num_lstm_layers=1,
        num_residual_layers=1, upsampling_ratios=[4, 2],
        use_causal_conv=True, norm_type="weight_norm")
    # one shared instance so compress and decompress agree on weights
    tiny = Encodec(cfg, seed=0)
    orig = cli_main._load_codec
    cli_main._load_codec = lambda codec, model_path, preset: tiny
    try:
        ecdc = tmp_path / "out.ecdc"
        rc = main(["compress", "--input", str(wav_in), "--output", str(ecdc)])
        assert rc == 0
        stats = capsys.readouterr().out.strip().splitlines()[-1]
        import json as _json
        rec = _json.loads(stats)
        assert rec["bytes"] == ecdc.stat().st_size and rec["ratio"] > 1
        rc = main(["decompress", "--input", str(ecdc),
                   "--output", str(tmp_path / "rec.wav")])
        assert rc == 0
        with wave.open(str(tmp_path / "rec.wav"), "rb") as w:
            assert w.getframerate() == sr
            assert w.getnframes() > 0
    finally:
        cli_main._load_codec = orig


def test_cli_validate(tmp_path, capsys):
    import neuralcodecs_tpu.cli.main as cli_main
    from neuralcodecs_tpu.cli.main import main
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                     decoder_dim=32, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=32, codebook_dim=4,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    orig = cli_main._load_codec
    cli_main._load_codec = lambda codec, model_path, preset: SNAC(cfg)
    try:
        rc = main(["validate", "--codec", "snac"])
    finally:
        cli_main._load_codec = orig
    assert rc == 0
    import json as _json
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["success"] and rec["architecture"] == "snac"
    assert rec["params"] > 0


def test_cli_zoo_and_tts_prompt_flag(capsys):
    from neuralcodecs_tpu.cli.main import build_parser, main

    rc = main(["zoo"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "snac" in out and "encodec" in out

    args = build_parser().parse_args(
        ["tts", "--text", "[S1]x", "--output", "t.wav",
         "--audio-prompt", "voice.wav"])
    assert args.audio_prompt == "voice.wav"
