"""HTTP serving endpoint tests (localhost, ephemeral port)."""

import http.client
import io
import json
import wave

import numpy as np

from neuralcodecs_tpu.cli.serve import CodecServer, _array_to_wav, _wav_to_array


def _tiny_snac():
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                     decoder_dim=32, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=32, codebook_dim=4,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    return SNAC(cfg)


def _wav_bytes(sr=16000, seconds=0.25):
    t = np.arange(int(sr * seconds)) / sr
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return _array_to_wav(tone, sr)


def test_wav_helpers_roundtrip():
    raw = _wav_bytes()
    audio, sr = _wav_to_array(raw)
    assert sr == 16000 and audio.shape[0] == 1  # [C, T]
    again, sr2 = _wav_to_array(_array_to_wav(audio, sr))
    np.testing.assert_allclose(again, audio, atol=1e-4)
    # stereo round-trips channel-count too
    stereo = np.stack([audio[0], -audio[0]])
    back, _ = _wav_to_array(_array_to_wav(stereo, sr))
    assert back.shape[0] == 2
    np.testing.assert_allclose(back, stereo, atol=1e-4)


def test_serve_roundtrip_encode_decode():
    server = CodecServer(_tiny_snac(), "snac", port=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert resp.status == 200 and health["status"] == "ok"
        assert health["sample_rate"] == 16000

        body = _wav_bytes()
        conn.request("POST", "/roundtrip", body=body,
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = resp.read()
        with wave.open(io.BytesIO(out), "rb") as f:
            assert f.getframerate() == 16000
            assert f.getnframes() > 0

        conn.request("POST", "/encode", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        enc = json.loads(resp.read())
        assert len(enc["codes"]) == 2  # two vq stages

        conn.request("POST", "/decode",
                     body=json.dumps({"codes": enc["codes"]}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read()), "rb") as f:
            assert f.getnframes() > 0
    finally:
        server.shutdown()


def test_serve_rejects_bad_input():
    server = CodecServer(_tiny_snac(), "snac", port=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("POST", "/roundtrip", body=b"not a wav file")
        resp = conn.getresponse()
        assert resp.status == 400
        err = json.loads(resp.read())
        assert "error" in err

        conn.request("POST", "/nothing", body=b"{}")
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()

        conn.request("POST", "/decode", body=b"{ bad json")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()


def test_serve_dia_tts_route():
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_dia import tiny_config

    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.models.dia import Dia

    dia = Dia(tiny_config(), seed=0)
    dac_cfg = DACConfig(encoder_dim=8, encoder_rates=[2, 2], decoder_dim=32,
                        decoder_rates=[2, 2], n_codebooks=3, codebook_size=1024,
                        codebook_dim=4, sample_rate=44100)
    dia.set_dac_model(DAC(dac_cfg))

    server = CodecServer(dia, "dia", port=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        conn.request("POST", "/tts",
                     body=json.dumps({"text": "[S1]hi", "max_tokens": 16}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read()), "rb") as f:
            assert f.getnframes() > 0
            assert f.getframerate() == dia.config.sample_rate
    finally:
        server.shutdown()


def test_serve_encodec_stereo_normalized():
    """48k-style stereo+normalize model must serve: roundtrip keeps both
    channels, /encode exposes scales, /decode applies them."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_encodec import tiny_config

    from neuralcodecs_tpu.models.encodec import Encodec

    cfg = tiny_config(channels=2, normalize=True, use_causal_conv=False,
                      norm_type="time_group_norm")
    server = CodecServer(Encodec(cfg), "encodec", port=0)
    server.warmup()
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        sr = cfg.sample_rate
        t = np.arange(sr // 8) / sr
        stereo = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                           0.25 * np.sin(2 * np.pi * 220 * t)]).astype(np.float32)
        body = _array_to_wav(stereo, sr)

        conn.request("POST", "/roundtrip", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read())) as f:
            assert f.getnchannels() == 2

        conn.request("POST", "/encode", body=body)
        resp = conn.getresponse()
        enc = json.loads(resp.read())
        assert resp.status == 200
        assert enc["scales"] is not None  # normalize=True exposes scales

        conn.request("POST", "/decode", body=json.dumps(
            {"codes": enc["codes"], "scales": enc["scales"]}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read())) as f:
            assert f.getnchannels() == 2
            out = np.frombuffer(f.readframes(f.getnframes()),
                                dtype="<i2").astype(np.float32) / 32768.0
        # scale denormalization restores the input's loudness scale: the
        # random-weight codec reconstructs noise, but RMS must be in the
        # same order of magnitude as the (scaled) input, not unit-RMS
        assert np.sqrt((out ** 2).mean()) < 1.5
    finally:
        server.shutdown()


def test_serve_concurrent_requests_are_consistent():
    """8 concurrent identical /roundtrip requests must all succeed and
    return identical bytes (device lock serializes accelerator work under
    the threaded server)."""
    import concurrent.futures

    server = CodecServer(_tiny_snac(), "snac", port=0)
    server.warmup()
    server.start_background()
    try:
        body = _wav_bytes()

        def one(_):
            conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                              timeout=120)
            conn.request("POST", "/roundtrip", body=body)
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            return resp.status, data

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(one, range(8)))
        assert all(st == 200 for st, _ in results)
        first = results[0][1]
        assert all(data == first for _, data in results)
    finally:
        server.shutdown()
