"""Streaming Encodec session tests: chunked == full forward."""

import numpy as np
import pytest

# Deep/expensive suite (VERDICT r4 #9): every test here stands up real
# servers / 8-device meshes / LM coding loops. Quick tier: -m 'not slow'.
pytestmark = pytest.mark.slow

from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

from test_encodec import tiny_config


def test_streaming_encode_matches_full(rng):
    model = Encodec(tiny_config())
    from neuralcodecs_tpu.models.encodec.streaming import StreamingEncoder

    hop = model.encoder.hop_length
    t = hop * 64
    audio = (0.3 * rng.standard_normal(t)).astype(np.float32)

    full_codes = np.asarray(model.encode(audio)[0].codes)

    enc = StreamingEncoder(model, n_q=full_codes.shape[1])
    got = []
    chunk = hop * 12
    for off in range(0, t, chunk):
        got.append(np.asarray(enc.push(audio[off: off + chunk])))
    got_codes = np.concatenate(got, axis=-1)
    assert got_codes.shape == full_codes.shape
    match = (got_codes == full_codes).mean()
    assert match > 0.99, f"streaming codes diverged: {match:.4f}"


def test_streaming_decode_matches_full(rng):
    model = Encodec(tiny_config())
    from neuralcodecs_tpu.models.encodec.streaming import StreamingDecoder

    frames = 48
    n_q = model.num_codebooks
    codes = rng.integers(0, model.config.codebook_size,
                         size=(1, n_q, frames)).astype(np.int32)
    import jax.numpy as jnp
    emb = model.quantizer.decode(model.params, jnp.asarray(codes))
    full = np.asarray(model.decoder(model.params, emb))

    dec = StreamingDecoder(model)
    outs = []
    for off in range(0, frames, 8):
        outs.append(np.asarray(dec.push(codes[:, :, off: off + 8])))
    got = np.concatenate(outs, axis=1)
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-5)


def test_streaming_roundtrip_and_reset(rng):
    from neuralcodecs_tpu.models.encodec.streaming import (
        StreamingEncoder, stream_roundtrip)

    model = Encodec(tiny_config())
    hop = model.encoder.hop_length
    audio = (0.3 * rng.standard_normal(hop * 32)).astype(np.float32)
    out, codes = stream_roundtrip(model, audio, chunk_samples=hop * 8)
    assert out.shape[1] == hop * 32
    assert len(codes) == 4
    assert np.isfinite(np.asarray(out)).all()

    enc = StreamingEncoder(model)
    c1 = np.asarray(enc.push(audio[: hop * 8]))
    enc.push(audio[hop * 8: hop * 16])
    enc.reset()
    c2 = np.asarray(enc.push(audio[: hop * 8]))
    np.testing.assert_array_equal(c1, c2)


def test_streaming_block_decomposition_matches_whole_chunk(rng):
    """``block_hops`` (the serving shape-bounding path) splits any
    hop-multiple chunk into a bounded set of compiled block shapes; the
    emitted codes/audio must match whole-chunk pushes, and ``warm()``
    must not disturb a live session's carried state."""
    from neuralcodecs_tpu.models.encodec.streaming import (
        StreamingDecoder, StreamingEncoder)

    model = Encodec(tiny_config())
    hop = model.encoder.hop_length
    audio = (0.3 * rng.standard_normal(hop * 23)).astype(np.float32)

    ref = StreamingEncoder(model)
    blocked = StreamingEncoder(model, block_hops=(4, 1))
    # first push runs whole in BOTH (exact-boundary semantics); the second
    # ragged chunk decomposes as 4+4+4+4 in the blocked session only
    ref_codes, got_codes = [], []
    for lo, hi in ((0, hop * 7), (hop * 7, hop * 23)):
        ref_codes.append(np.asarray(ref.push(audio[lo:hi])))
        got_codes.append(np.asarray(blocked.push(audio[lo:hi])))
        blocked.warm()  # mid-session warm must be a no-op for the stream
    ref_codes = np.concatenate(ref_codes, axis=-1)
    got_codes = np.concatenate(got_codes, axis=-1)
    match = (ref_codes == got_codes).mean()
    assert match > 0.99, f"blocked streaming codes diverged: {match:.4f}"

    # decoder: same first-whole/then-blocked contract, float-equal audio
    dec_ref = StreamingDecoder(model)
    dec_blk = StreamingDecoder(model, block_hops=(4, 1))
    dec_blk.warm()
    for sl in (slice(0, 7), slice(7, 23)):
        want = np.asarray(dec_ref.push(ref_codes[..., sl]))
        got = np.asarray(dec_blk.push(ref_codes[..., sl]))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_rejects_non_causal():
    from neuralcodecs_tpu.core.exceptions import CodecError
    from neuralcodecs_tpu.models.encodec.streaming import StreamingEncoder

    model = Encodec(tiny_config(use_causal_conv=False))
    with pytest.raises(CodecError):
        StreamingEncoder(model)


def test_streaming_rejects_bad_chunk(rng):
    from neuralcodecs_tpu.core.exceptions import CodecError
    from neuralcodecs_tpu.models.encodec.streaming import StreamingEncoder

    model = Encodec(tiny_config())
    enc = StreamingEncoder(model)
    with pytest.raises(CodecError):
        enc.push(rng.standard_normal(model.encoder.hop_length + 1)
                 .astype(np.float32))


# -- TCP streaming serving (cli/stream_serve.py) ------------------------------


def _stream_server(model):
    from neuralcodecs_tpu.cli.stream_serve import StreamingCodecServer

    srv = StreamingCodecServer(model, port=0)
    srv.warmup()
    srv.start_background()
    return srv


def test_stream_serve_roundtrip_matches_local_session(rng):
    """Audio pushed over TCP must equal the local streaming session output."""
    from neuralcodecs_tpu.cli.stream_serve import StreamClient
    from neuralcodecs_tpu.models.encodec.streaming import (
        StreamingDecoder, StreamingEncoder)

    model = Encodec(tiny_config())
    hop = model.encoder.hop_length
    audio = (0.3 * rng.standard_normal(hop * 24)).astype(np.float32)
    chunk = hop * 8

    enc, dec = StreamingEncoder(model), StreamingDecoder(model)
    want = np.concatenate(
        [np.asarray(dec.push(enc.push(audio[o: o + chunk])))[0, :, 0]
         for o in range(0, audio.size, chunk)])

    srv = _stream_server(model)
    try:
        cli = StreamClient("127.0.0.1", srv.port, "roundtrip", chunk)
        got = np.concatenate(
            [np.frombuffer(cli.push(audio[o: o + chunk]), "<f4")
             for o in range(0, audio.size, chunk)])
        assert cli.close() == b""
    finally:
        srv.shutdown()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stream_serve_encode_and_concurrent_sessions(rng):
    """Two interleaved encode sessions must not share state; codes match the
    local streaming encoder run per stream."""
    import struct

    from neuralcodecs_tpu.cli.stream_serve import StreamClient
    from neuralcodecs_tpu.models.encodec.streaming import StreamingEncoder

    model = Encodec(tiny_config())
    hop = model.encoder.hop_length
    chunk = hop * 6
    a = (0.3 * rng.standard_normal(chunk * 3)).astype(np.float32)
    b = (0.3 * rng.standard_normal(chunk * 3)).astype(np.float32)

    def local_codes(x):
        enc = StreamingEncoder(model)
        return [np.asarray(enc.push(x[o: o + chunk]))[0]
                for o in range(0, x.size, chunk)]

    want_a, want_b = local_codes(a), local_codes(b)

    srv = _stream_server(model)
    try:
        ca = StreamClient("127.0.0.1", srv.port, "encode", chunk)
        cb = StreamClient("127.0.0.1", srv.port, "encode", chunk)
        for i in range(3):  # interleave pushes across the two sessions
            for cli, x, want in ((ca, a, want_a), (cb, b, want_b)):
                raw = cli.push(x[i * chunk: (i + 1) * chunk])
                n_q, f = struct.unpack(">II", raw[:8])
                codes = np.frombuffer(raw[8:], ">i4").reshape(n_q, f)
                np.testing.assert_array_equal(codes, want[i])
        ca.close(), cb.close()
    finally:
        srv.shutdown()


def test_stream_serve_encode_pipes_into_decode(rng):
    """An encode session's framed codes fed to a decode session reproduce
    the local streaming round-trip audio."""
    import struct

    from neuralcodecs_tpu.cli.stream_serve import StreamClient
    from neuralcodecs_tpu.models.encodec.streaming import (
        StreamingDecoder, StreamingEncoder)

    model = Encodec(tiny_config())
    hop = model.encoder.hop_length
    chunk = hop * 8
    audio = (0.3 * rng.standard_normal(chunk * 2)).astype(np.float32)

    enc, dec = StreamingEncoder(model), StreamingDecoder(model)
    want = np.concatenate(
        [np.asarray(dec.push(enc.push(audio[o: o + chunk])))[0, :, 0]
         for o in range(0, audio.size, chunk)])

    srv = _stream_server(model)
    try:
        ce = StreamClient("127.0.0.1", srv.port, "encode", chunk)
        cd = StreamClient("127.0.0.1", srv.port, "decode", 0)
        got = []
        for o in range(0, audio.size, chunk):
            raw = ce.push(audio[o: o + chunk])
            n_q, f = struct.unpack(">II", raw[:8])
            codes = np.frombuffer(raw[8:], ">i4").reshape(n_q, f)
            got.append(np.frombuffer(cd.push_codes(codes), "<f4"))
        ce.close(), cd.close()
    finally:
        srv.shutdown()
    np.testing.assert_allclose(np.concatenate(got), want,
                               rtol=1e-5, atol=1e-6)


def test_stream_serve_decode_rejects_bad_codes_frame(rng):
    """Oversized n_q in a decode frame gets a framed error, not a crash."""
    from neuralcodecs_tpu.cli.stream_serve import StreamClient

    model = Encodec(tiny_config())
    srv = _stream_server(model)
    try:
        cli = StreamClient("127.0.0.1", srv.port, "decode", 0)
        bad = np.zeros((model.num_codebooks + 1, 4), np.int32)
        with pytest.raises(RuntimeError, match="bad codes frame"):
            cli.push_codes(bad)
    finally:
        srv.shutdown()


def test_cli_stream_command_roundtrip(tmp_path, rng, capsys):
    """`cli stream` pushes a WAV through a live server and writes audio
    identical to the local streaming sessions."""
    import json
    import wave

    from neuralcodecs_tpu.cli.main import main
    from neuralcodecs_tpu.dsp.signal import AudioSignal
    from neuralcodecs_tpu.models.encodec.streaming import (
        StreamingDecoder, StreamingEncoder)

    model = Encodec(tiny_config())  # 16 kHz, hop 8
    sr = model.config.sample_rate
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr // 4) / sr)
         ).astype(np.float32)
    wav_in = tmp_path / "in.wav"
    with wave.open(str(wav_in), "wb") as w:
        w.setnchannels(1), w.setsampwidth(2), w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())

    srv = _stream_server(model)
    wav_out = tmp_path / "out.wav"
    try:
        rc = main(["stream", "--port", str(srv.port), "--input", str(wav_in),
                   "--output", str(wav_out), "--chunk-ms", "50"])
    finally:
        srv.shutdown()
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["chunks"] == 5 and stats["chunk_samples"] == 800

    loaded = np.asarray(AudioSignal.load(str(wav_in)).audio_data[0, 0],
                        dtype=np.float32)
    enc, dec = StreamingEncoder(model), StreamingDecoder(model)
    want = np.concatenate(
        [np.asarray(dec.push(enc.push(loaded[o: o + 800])))[0, :, 0]
         for o in range(0, loaded.size, 800)])
    got = np.asarray(AudioSignal.load(str(wav_out)).audio_data[0, 0],
                     dtype=np.float32)
    assert got.size == want.size
    # output WAV is 16-bit quantized (write x32767, read /32768 — up to
    # ~1.5 LSB asymmetry); compare within 2 LSB
    np.testing.assert_allclose(got, want, atol=2 / 32767)


def test_stream_serve_rejects_bad_header(rng):
    """Malformed headers get a framed JSON error, not a hang or traceback."""
    from neuralcodecs_tpu.cli.stream_serve import StreamClient

    model = Encodec(tiny_config())
    srv = _stream_server(model)
    try:
        with pytest.raises(RuntimeError, match="bad header"):
            cli = StreamClient("127.0.0.1", srv.port, "roundtrip",
                               chunk_samples=7)  # not a hop multiple
            cli.push(np.zeros(7, np.float32))
    finally:
        srv.shutdown()


def test_stream_roundtrip_fastpath_matches_frames(rng):
    """The single-call fused stream round-trip (_stream_roundtrip_fn,
    VERDICT r4 #4) must reproduce the frames API decode(encode(x)) —
    per-frame normalize + scale restore + triangular OLA included — for
    full-coverage, tailed, and stereo/normalized layouts."""
    for over, n_sec in [
        (dict(chunk_length_s=0.05, overlap=0.01, normalize=True), 0.24),
        (dict(chunk_length_s=0.05, overlap=0.01, normalize=True), 0.25),
        (dict(chunk_length_s=0.05, overlap=0.25, normalize=False), 0.21),
        (dict(chunk_length_s=0.05, overlap=0.01, normalize=True,
              channels=2, use_causal_conv=False,
              norm_type="time_group_norm"), 0.23),
        # > 8 chunks: exercises the zero-chunk row padding (rows 10 -> 16)
        (dict(chunk_length_s=0.05, overlap=0.01, normalize=True), 0.5),
    ]:
        cfg = tiny_config(**over)
        model = Encodec(cfg)
        n = int(cfg.sample_rate * n_sec)
        audio = (0.3 * rng.standard_normal((cfg.channels, n))
                 ).astype(np.float32)
        want = np.asarray(model.decode(model.encode(audio)))[..., :n]
        got = np.asarray(model.forward(audio))
        assert got.shape == want.shape, (over, n_sec)
        # one-program fusion reorders float accumulation vs the frames
        # path (PARITY.md "Known divergences"): near-tie VQ boundaries can
        # flip, so bound the disagreement instead of demanding bit parity —
        # overwhelmingly identical, rare flips bounded in magnitude.
        diff = np.abs(got - want)
        assert float(diff.max()) < 1e-3, (over, n_sec, float(diff.max()))
        assert float(np.mean(diff > 1e-4)) < 0.02, (over, n_sec)
        # the fast path must actually have been taken (one full chunk min)
        assert model._stream_roundtrip_fn.cache_info().currsize > 0
