"""HTTP serving endpoint tests (localhost, ephemeral port)."""

import http.client
import io
import json
import wave

import numpy as np
import pytest

from neuralcodecs_tpu.cli.serve import CodecServer, _array_to_wav, _wav_to_array

# Deep/expensive suite (VERDICT r4 #9): every test here stands up real
# servers / 8-device meshes / LM coding loops. Quick tier: -m 'not slow'.
pytestmark = pytest.mark.slow


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


def test_serve_metrics_route():
    """GET /metrics reports per-route counts, error counts, and latency
    percentiles; errors increment the error counter."""
    server = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=5.0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        body = _wav_bytes()
        for _ in range(2):
            conn.request("POST", "/roundtrip", body=body,
                         headers={"Content-Type": "audio/wav"})
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
        conn.request("POST", "/roundtrip", body=b"not a wav")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        m = json.loads(resp.read())
        rt = m["routes"]["/roundtrip"]
        assert rt["count"] == 3 and rt["errors"] == 1
        assert rt["p50_ms"] is not None and rt["max_ms"] >= rt["p50_ms"]
        assert m["uptime_s"] >= 0
        assert m["batcher"]["batches"] >= 2  # two device batches observed
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

    # capped generation-buffer bucket: requests within the cap use the
    # small bucket, oversize requests fall back to the model ceiling
    server = CodecServer(dia, "dia", port=0, dia_token_bucket=16)
    assert server._dia_token_bucket(8) == 16
    assert server._dia_token_bucket(24) == dia.config.data.audio_length
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        for max_tokens in (16, 24):  # in-cap and oversize-fallback paths
            conn.request("POST", "/tts", body=json.dumps(
                {"text": "[S1]hi", "max_tokens": max_tokens}).encode())
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
    the threaded server; batching disabled so every request takes the exact
    same compiled path)."""
    import concurrent.futures

    server = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=0)
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


def _fire_concurrent(port, n, body):
    """n concurrent /roundtrip requests; returns (wall_s, [(status, bytes)])."""
    import concurrent.futures
    import time

    def one(_):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/roundtrip", body=body)
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        return resp.status, data

    with concurrent.futures.ThreadPoolExecutor(max_workers=n) as pool:
        start = time.perf_counter()
        results = list(pool.map(one, range(n)))
        wall = time.perf_counter() - start
    return wall, results


def test_serve_microbatch_coalesces_and_matches_serialized():
    """Concurrent /roundtrip requests must be coalesced into batched device
    calls (observed batch sizes > 1) and produce audio matching the
    serialized (batching-off) server to float tolerance."""
    body = _wav_bytes()
    batched = CodecServer(_tiny_snac(), "snac", port=0,
                          batch_window_ms=100.0, max_batch=8)
    serial = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=0)
    batched.warmup(), serial.warmup()
    batched.start_background(), serial.start_background()
    try:
        _, got = _fire_concurrent(batched.port, 8, body)
        _, ref = _fire_concurrent(serial.port, 1, body)
        assert all(st == 200 for st, _ in got)
        assert max(batched.batcher.observed_batches) >= 2, \
            batched.batcher.observed_batches
        ref_audio, _ = _wav_to_array(ref[0][1])
        for _, data in got:
            audio, _ = _wav_to_array(data)
            np.testing.assert_allclose(audio, ref_audio, atol=2e-3)
    finally:
        batched.shutdown()
        serial.shutdown()


def test_serve_microbatch_throughput_beats_serialized():
    """Aggregate served throughput with micro-batching must beat the
    serialized server on the same concurrent load. On this 1-CPU-core test
    host the device call itself is compute-bound (a B=8 batch costs ~8x a
    B=1 call), so batching can only reclaim per-request dispatch overhead —
    measured ~1.3-1.8x; the assertion uses a conservative 1.15x. On the TPU
    chip the per-stream call is latency-bound and the same path measures
    >=2x (PERF.md 'Served aggregate')."""
    body = _wav_bytes(seconds=0.064)
    batched = CodecServer(_tiny_snac(), "snac", port=0,
                          batch_window_ms=200.0, max_batch=8)
    serial = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=0)
    batched.warmup(), serial.warmup()
    batched.start_background(), serial.start_background()
    try:
        _fire_concurrent(batched.port, 8, body)  # warm batched shapes
        _fire_concurrent(serial.port, 8, body)
        # wall-clock assertion on a shared CI host: re-measure once before
        # failing so a transient load spike cannot flake the suite
        for attempt in (0, 1):
            wall_b = min(_fire_concurrent(batched.port, 8, body)[0]
                         for _ in range(5))
            wall_s = min(_fire_concurrent(serial.port, 8, body)[0]
                         for _ in range(5))
            if wall_b < wall_s / 1.15:
                break
        assert wall_b < wall_s / 1.15, (
            f"batched {wall_b*1e3:.1f} ms not faster than "
            f"serialized {wall_s*1e3:.1f} ms / 1.15")
    finally:
        batched.shutdown()
        serial.shutdown()


def test_serve_tts_batched_route():
    """POST /tts with a 'texts' list returns one base64 WAV per text from a
    single batched generation call."""
    import base64
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
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
        conn.request("POST", "/tts", body=json.dumps(
            {"texts": ["[S1]hi", "[S2]hello there"], "max_tokens": 16}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        payload = json.loads(resp.read())
        assert len(payload["wavs_b64"]) == 2
        for b64 in payload["wavs_b64"]:
            with wave.open(io.BytesIO(base64.b64decode(b64)), "rb") as f:
                assert f.getnframes() > 0
                assert f.getframerate() == dia.config.sample_rate

        # malformed 'texts' -> 400
        conn.request("POST", "/tts", body=json.dumps({"texts": []}).encode())
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        # a bare string must NOT be iterated into per-character requests
        conn.request("POST", "/tts",
                     body=json.dumps({"texts": "[S1]hi"}).encode())
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()


def test_serve_tts_microbatch_coalesces_singles():
    """Concurrent single-text /tts requests must coalesce into batched
    generate calls (observed batch sizes > 1); requests with a different
    max_tokens run as a separate group, never sharing the batch's EOS
    limit."""
    import concurrent.futures
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

    server = CodecServer(dia, "dia", port=0, batch_window_ms=200.0,
                         max_batch=8)
    server.start_background()
    try:
        def one(i):
            conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                              timeout=300)
            max_tokens = 8 if i == 3 else 16  # one odd-one-out group
            conn.request("POST", "/tts", body=json.dumps(
                {"text": f"[S1]request {i}", "max_tokens": max_tokens}
            ).encode())
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            return resp.status, data

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            results = list(pool.map(one, range(4)))
        assert all(st == 200 for st, _ in results)
        for _, data in results:
            with wave.open(io.BytesIO(data), "rb") as f:
                assert f.getnframes() > 0
                assert f.getframerate() == dia.config.sample_rate
        assert max(server.batcher.observed_batches) >= 2, \
            list(server.batcher.observed_batches)
    finally:
        server.shutdown()


def test_serve_dac_compress_decompress_routes():
    """DAC servers speak the .dac artifact over HTTP: /compress returns
    bytes that /decompress (and the file loader) accept; malformed bytes
    are a 400, not a traceback."""
    from neuralcodecs_tpu.models.dac import DAC, DACConfig
    from neuralcodecs_tpu.models.dac.dacfile import parse_dac_file

    cfg = DACConfig(encoder_dim=8, encoder_rates=[2, 2], decoder_dim=32,
                    decoder_rates=[2, 2], n_codebooks=3, codebook_size=64,
                    codebook_dim=4, sample_rate=16000)
    server = CodecServer(DAC(cfg), "dac", port=0, batch_window_ms=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=120)
        conn.request("POST", "/compress", body=_wav_bytes())
        resp = conn.getresponse()
        blob = resp.read()
        assert resp.status == 200
        codes, loaded_cfg = parse_dac_file(blob)
        assert codes[0].shape[1] == cfg.n_codebooks
        assert loaded_cfg.sample_rate == cfg.sample_rate

        conn.request("POST", "/decompress", body=blob)
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read()), "rb") as f:
            assert f.getframerate() == cfg.sample_rate
            assert f.getnframes() > 0

        conn.request("POST", "/decompress", body=b"not a dac artifact")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()


def test_serve_oversize_body_closes_connection():
    """A 413 reply never reads the request body, so the server must close
    the keep-alive connection instead of parsing those bytes as the next
    request (review r3)."""
    from neuralcodecs_tpu.cli import serve as serve_mod

    server = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("POST", "/roundtrip", body=b"x" * 16, headers={
            "Content-Length": str(serve_mod.MAX_BODY_BYTES + 1)})
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
        # server signalled close; a fresh connection still serves normally
        assert resp.getheader("Connection") == "close"
        conn2 = http.client.HTTPConnection("127.0.0.1", server.port,
                                           timeout=30)
        conn2.request("GET", "/healthz")
        assert conn2.getresponse().status == 200
    finally:
        server.shutdown()


def test_serve_metrics_route_table_is_bounded():
    """Unknown request paths share one '<other>' metrics bucket so a client
    spraying random paths cannot grow server memory (review r3)."""
    server = CodecServer(_tiny_snac(), "snac", port=0, batch_window_ms=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        for i in range(5):
            conn.request("POST", f"/no-such-route-{i}", body=b"{}")
            resp = conn.getresponse()
            assert resp.status == 404
            resp.read()
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        assert "<other>" in m["routes"]
        assert m["routes"]["<other>"]["count"] == 5
        assert not any(r.startswith("/no-such-route") for r in m["routes"])
    finally:
        server.shutdown()


def test_serve_compress_decompress_routes():
    """POST /compress (WAV -> .ecdc) and /decompress (.ecdc -> WAV) on an
    Encodec server; the returned container decodes to the same bytes the
    model produces directly."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_encodec import tiny_config

    from neuralcodecs_tpu.models.encodec import Encodec

    model = Encodec(tiny_config())
    server = CodecServer(model, "encodec", port=0, batch_window_ms=0)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=120)
        sr = model.config.sample_rate
        t = np.arange(sr // 8) / sr
        tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        body = _array_to_wav(tone, sr)

        conn.request("POST", "/compress", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        blob = resp.read()
        assert blob[:4] == b"ECDC"

        conn.request("POST", "/decompress", body=blob)
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read())) as f:
            served = np.frombuffer(f.readframes(f.getnframes()),
                                   dtype="<i2")
        direct = np.asarray(model.decompress(model.compress(tone)))[0, 0, :]
        expect = (np.clip(direct, -1, 1) * 32767.0).astype("<i2")
        np.testing.assert_array_equal(served, expect[: len(served)])

        # malformed container -> 400, not a 500 or a dead server
        conn.request("POST", "/decompress", body=b"not an ecdc stream")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        # query strings must not break route matching (parity w/ /compress)
        conn.request("POST", "/decompress?fmt=wav", body=blob)
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()

        # client-supplied lm_batch is bounded: a huge value must 400
        # instead of sizing allocations while holding the device lock
        conn.request("POST", "/compress?lm=1&lm_batch=1000000000", body=body)
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.request("POST", "/compress?lm=1&lm_batch=0", body=body)
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()


def test_serve_tts_stream_route():
    """/tts/stream chunks concatenate to the same PCM as one-shot /tts
    (modulo the whole-utterance slowdown resample, inert for short text)."""
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
    server = CodecServer(dia, "dia", port=0, dia_token_bucket=32)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
        conn.request("POST", "/tts", body=json.dumps(
            {"text": "[S1]hi", "max_tokens": 20}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        with wave.open(io.BytesIO(resp.read()), "rb") as f:
            ref_pcm = f.readframes(f.getnframes())

        conn.request("POST", "/tts/stream", body=json.dumps(
            {"text": "[S1]hi", "max_tokens": 20,
             "segment_tokens": 6}).encode())
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("X-Sample-Rate") == "44100"
        blob = resp.read()  # http.client decodes the chunked framing
        assert blob[:4] == b"RIFF" and blob[36:40] == b"data"
        stream_pcm = blob[44:]
        assert stream_pcm == ref_pcm

        # bad request before headers commit -> clean JSON error
        conn.request("POST", "/tts/stream", body=json.dumps(
            {"text": 5}).encode())
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()
