"""Streaming Encodec session tests: chunked == full forward."""

import numpy as np
import pytest

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
