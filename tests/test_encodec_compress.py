"""Entropy coding + .ecdc compression tests."""

import io

import numpy as np
import pytest

# Deep/expensive suite (VERDICT r4 #9): every test here stands up real
# servers / 8-device meshes / LM coding loops. Quick tier: -m 'not slow'.
pytestmark = pytest.mark.slow

from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig
from neuralcodecs_tpu.models.encodec.entropy import (
    ArithmeticCoder,
    ArithmeticDecoder,
    BitPacker,
    BitUnpacker,
    build_stable_quantized_cdf,
)
from neuralcodecs_tpu.models.encodec import ecdc

from test_encodec import tiny_config


def test_bit_packer_roundtrip(rng):
    for bits in (1, 5, 10, 24):
        values = rng.integers(0, 1 << bits, size=211)
        buf = io.BytesIO()
        packer = BitPacker(bits, buf)
        packer.push_many(values)
        packer.flush()
        buf.seek(0)
        unpacker = BitUnpacker(bits, buf)
        got = [unpacker.pull() for _ in range(len(values))]
        np.testing.assert_array_equal(got, values)


def test_arithmetic_coder_roundtrip(rng):
    """Range-code a random symbol stream against a random pdf per step."""
    card = 64
    n = 500
    pdfs = rng.random((n, card)).astype(np.float32) + 1e-3
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    symbols = np.array([rng.integers(0, card) for _ in range(n)])

    buf = io.BytesIO()
    coder = ArithmeticCoder(buf)
    cdfs = [build_stable_quantized_cdf(pdfs[i], coder.total_range_bits)
            for i in range(n)]
    for i in range(n):
        coder.push(int(symbols[i]), cdfs[i])
    coder.flush()

    buf.seek(0)
    decoder = ArithmeticDecoder(buf)
    got = [decoder.pull(cdfs[i]) for i in range(n)]
    np.testing.assert_array_equal(got, symbols)
    # entropy coding should beat flat packing on a skewed distribution
    assert len(buf.getvalue()) < n * 8


def test_cdf_builder_invariants(rng):
    pdf = rng.random(1024).astype(np.float32)
    pdf /= pdf.sum()
    cdf = build_stable_quantized_cdf(pdf, 24)
    assert cdf.shape == (1024,)
    assert cdf[-1] <= 1 << 24
    assert (np.diff(cdf) >= 2).all() and cdf[0] >= 2


def test_ecdc_header_roundtrip():
    buf = io.BytesIO()
    meta = {"m": "encodec_24khz", "al": 12345, "nc": 8, "lm": False, "ch": 1,
            "sr": 24000, "bw": 6.0}
    ecdc.write_header(buf, meta)
    buf.seek(0)
    got = ecdc.read_header(buf)
    ecdc.validate_metadata(got)
    assert got == meta
    # header is byte-compatible: magic + version + big-endian length
    raw = buf.getvalue()
    assert raw[:4] == b"ECDC" and raw[4] == 0
    assert int.from_bytes(raw[5:9], "big") == len(raw) - 9


def test_compress_roundtrip_bitpacking(rng):
    cfg = tiny_config()
    model = Encodec(cfg)
    audio = (0.3 * rng.standard_normal(1600)).astype(np.float32)
    blob = model.compress(audio, use_lm=False)
    frames = model.encode(audio)
    out = np.asarray(model.decompress(blob))
    direct = np.asarray(model.decode(frames))[..., :1600]
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)


def test_compress_roundtrip_lm(rng):
    """LM + arithmetic coding round-trip must be bit-exact on codes."""
    cfg = tiny_config()
    model = Encodec(cfg)
    lm = model.get_language_model(download=False)
    audio = (0.3 * rng.standard_normal(800)).astype(np.float32)
    blob = model.compress(audio, use_lm=True, lm=lm)
    out = np.asarray(model.decompress(blob))
    direct = np.asarray(model.decode(model.encode(audio)))[..., :800]
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)


def test_compress_roundtrip_lm_wider_than_stream(rng):
    """The pretrained 24 kHz LM predicts 32 codebook heads while a 6 kbps
    stream carries only n_q of them: compress/decompress must slice the
    LM output to the streamed count (regression: the full pdf matrix fed
    more cdf rows than symbols into the native coder — a segfault, since
    the C loop trusted the row count)."""
    from neuralcodecs_tpu.models.encodec.lm import (EncodecLanguageModel,
                                                    EncodecLMConfig)

    cfg = tiny_config()
    model = Encodec(cfg)
    n_q = model.num_codebooks
    lm = EncodecLanguageModel(
        EncodecLMConfig(codebook_size=cfg.codebook_size,
                        num_codebooks=n_q + 2, dimension=32,
                        num_heads=2, num_layers=1, past_context=8), seed=3)
    model.set_language_model(lm)
    audio = (0.3 * rng.standard_normal(800)).astype(np.float32)
    blob = model.compress(audio, use_lm=True)
    out = np.asarray(model.decompress(blob))
    direct = np.asarray(model.decode(model.encode(audio)))[..., :800]
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)


def test_lm_step_matches_full(rng):
    """Streaming rolling-buffer steps must equal the full-sequence forward."""
    from neuralcodecs_tpu.models.encodec.lm import EncodecLanguageModel, EncodecLMConfig

    cfg = EncodecLMConfig(codebook_size=16, num_codebooks=2, dimension=32,
                          num_heads=4, num_layers=2, past_context=8)
    lm = EncodecLanguageModel(cfg, seed=1)
    t = 12  # exceeds past_context: exercises the rolling window
    codes = rng.integers(0, 17, size=(1, 2, t))
    full = np.asarray(lm.forward_full(codes))

    state = lm.init_state(1)
    step_out = []
    for i in range(t):
        probas, state = lm.step(codes[:, :, i:i + 1], state)
        step_out.append(np.asarray(probas)[..., 0])
    stepped = np.stack(step_out, axis=-1)
    np.testing.assert_allclose(stepped, full, rtol=2e-3, atol=1e-5)


def test_native_entropy_matches_python(rng):
    """C++ range coder must be bit-exact with the Python implementation."""
    from neuralcodecs_tpu.native.entropy_native import (
        NativeArithmeticDecoder,
        available,
        encode_symbols,
    )
    from neuralcodecs_tpu.models.encodec.entropy import (
        build_stable_quantized_cdf_batch,
    )

    card, n = 32, 300
    pdfs = rng.random((n, card)).astype(np.float32) + 1e-3
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    symbols = rng.integers(0, card, size=n).astype(np.int32)
    cdfs = build_stable_quantized_cdf_batch(pdfs, 24)

    # python reference bytes
    buf = io.BytesIO()
    coder = ArithmeticCoder(buf)
    for i in range(n):
        coder.push(int(symbols[i]), cdfs[i])
    coder.flush()
    py_bytes = buf.getvalue()

    native_bytes = encode_symbols(cdfs, symbols)
    if available():
        assert native_bytes == py_bytes, "native encoder must be byte-exact"
    dec = NativeArithmeticDecoder(native_bytes)
    got = dec.pull_many(cdfs)
    np.testing.assert_array_equal(got, symbols)
    dec.close()


def test_cdf_batch_matches_scalar(rng):
    from neuralcodecs_tpu.models.encodec.entropy import (
        build_stable_quantized_cdf,
        build_stable_quantized_cdf_batch,
    )

    pdfs = rng.random((7, 64)).astype(np.float32)
    pdfs /= pdfs.sum(axis=1, keepdims=True)
    batch = build_stable_quantized_cdf_batch(pdfs, 24)
    for i in range(7):
        np.testing.assert_array_equal(batch[i],
                                      build_stable_quantized_cdf(pdfs[i], 24))


def test_compress_roundtrip_lm_chunked(rng):
    """Chunked (length-prefixed) LM compression round-trip."""
    cfg = tiny_config(chunk_length_s=0.05, overlap=0.01,
                      use_causal_conv=False)
    model = Encodec(cfg)
    lm = model.get_language_model(download=False)
    audio = (0.3 * rng.standard_normal(1800)).astype(np.float32)
    blob = model.compress(audio, use_lm=True, lm=lm)
    out = np.asarray(model.decompress(blob, lm=lm))
    direct = np.asarray(model.decode(model.encode(audio)))[..., :1800]
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)


def test_lm_torch_checkpoint_name_mapping(rng):
    """Original-encodec LM state dict ([out,in] torch linears) round-trips."""
    import torch as _torch

    from neuralcodecs_tpu.models.encodec.lm import (
        EncodecLanguageModel, EncodecLMConfig)

    cfg = EncodecLMConfig(codebook_size=16, num_codebooks=2, dimension=32,
                          num_heads=4, num_layers=1, past_context=8)
    lm = EncodecLanguageModel(cfg, seed=0)
    # fake torch checkpoint: transpose our [in,out] linears back to [out,in]
    sd = {}
    for k, v in lm.params.items():
        a = np.asarray(v)
        if k.endswith((".in_proj_weight", ".out_proj.weight", ".linear1.weight",
                       ".linear2.weight")) or (
                k.startswith("linears.") and k.endswith(".weight")):
            a = a.T.copy()
        sd[f"model.{k}"] = a
    lm2 = EncodecLanguageModel(cfg, seed=1).load_state_dict(sd)
    for k in lm.params:
        np.testing.assert_array_equal(np.asarray(lm.params[k]),
                                      np.asarray(lm2.params[k]))
    codes = rng.integers(0, 17, size=(1, 2, 4))
    np.testing.assert_allclose(np.asarray(lm.forward_full(codes)),
                               np.asarray(lm2.forward_full(codes)))


def test_lm_matches_torch_oracle(rng):
    """Full-sequence LM forward vs an independent torch implementation
    built from canonical nn.MultiheadAttention / LayerNorm modules (the
    trained-graph semantics the pretrained LM checkpoints assume)."""
    import torch as _torch

    from oracles import EncodecLMOracle

    from neuralcodecs_tpu.models.encodec.lm import (
        EncodecLanguageModel, EncodecLMConfig)

    card, n_q, d, heads, layers, past = 17, 3, 32, 4, 2, 6
    cfg = EncodecLMConfig(codebook_size=card, num_codebooks=n_q, dimension=d,
                          num_heads=heads, num_layers=layers,
                          hidden_scale=4.0, past_context=past)
    _torch.manual_seed(0)
    oracle = EncodecLMOracle(card, n_q, d, heads, int(d * 4.0), layers,
                             past).eval()

    # oracle state dict -> our names: the transformer prefix matches; the
    # per-codebook embeddings/linears are top-level in both
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    lm = EncodecLanguageModel(cfg, seed=1).load_state_dict(sd)

    t = 11  # > past_context: exercises the banded mask
    codes = rng.integers(0, card + 1, size=(2, n_q, t))
    with _torch.no_grad():
        ref = oracle(_torch.from_numpy(codes)).numpy()
    got = np.asarray(lm.forward_full(codes))
    assert got.shape == ref.shape == (2, card, n_q, t)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    # and the streaming path must agree with the oracle too
    state = lm.init_state(2)
    step_out = []
    for i in range(t):
        probas, state = lm.step(codes[:, :, i:i + 1], state)
        step_out.append(np.asarray(probas)[..., 0])
    stepped = np.stack(step_out, axis=-1)
    np.testing.assert_allclose(stepped, ref, rtol=2e-3, atol=1e-4)


def test_ecdc_header_rejects_malformed_input():
    """Untrusted .ecdc bytes must fail with ValueError, never raw
    struct/json errors (the blob may come off the network)."""
    cases = [
        b"",                                   # empty
        b"NOPE" + b"\x00" * 16,                # bad magic
        ecdc.MAGIC + b"\x07" + b"\x00" * 8,    # unknown version
        ecdc.MAGIC + b"\x00" + b"\x00\x00",    # truncated length
        ecdc.MAGIC + b"\x00" + (0x7FFFFFFF).to_bytes(4, "big"),  # huge length
        ecdc.MAGIC + b"\x00" + (10).to_bytes(4, "big") + b"short",  # short body
        ecdc.MAGIC + b"\x00" + (4).to_bytes(4, "big") + b"\xff\xfe\x00\x01",  # bad utf8/json
        ecdc.MAGIC + b"\x00" + (2).to_bytes(4, "big") + b"[]",  # not an object
    ]
    for raw in cases:
        with pytest.raises(ValueError):
            ecdc.read_header(io.BytesIO(raw))

    with pytest.raises(ValueError):
        ecdc.read_scale_values(io.BytesIO(b"\x00\x00"))          # truncated count
    with pytest.raises(ValueError):
        ecdc.read_scale_values(io.BytesIO((3).to_bytes(4, "big") + b"\x00" * 4))


def test_decompress_rejects_garbage(rng):
    from neuralcodecs_tpu.models.encodec import Encodec

    model = Encodec(tiny_config())
    for blob in (b"", b"garbage bytes", b"ECDC" + b"\x00" * 3):
        with pytest.raises(Exception) as exc_info:
            model.decompress(blob)
        assert not isinstance(exc_info.value, (KeyError, IndexError))


def test_lm_step_row_locality(rng):
    """The batched-LM format guarantee rests on row-locality: at a FIXED
    executable batch shape, each row's output depends only on that row's
    inputs (every LM op is row-local), so rows are interchangeable and
    padding rows are inert. Pin it: permuting rows permutes outputs
    bit-exactly, and replacing co-rows with zeros leaves a row unchanged."""
    from neuralcodecs_tpu.models.encodec.lm import (EncodecLanguageModel,
                                                    EncodecLMConfig)

    cfg = EncodecLMConfig(codebook_size=16, num_codebooks=3, dimension=32,
                          num_heads=2, num_layers=2, past_context=8)
    lm = EncodecLanguageModel(cfg, seed=1)
    b, k, t = 4, 3, 5
    seq = rng.integers(0, 17, size=(b, k, t))

    def run(rows_src):
        state = lm.init_state(b)
        inp = np.zeros((b, k, 1), np.int64)
        outs = []
        for step in range(t):
            probas, state = lm.step(inp, state)
            outs.append(np.asarray(probas))
            inp = np.stack([rows_src[r][:, step:step + 1] for r in range(b)])
        return np.stack(outs)

    base = run([seq[i] for i in range(b)])
    perm = [2, 0, 3, 1]
    permuted = run([seq[p] for p in perm])
    for i, p in enumerate(perm):
        np.testing.assert_array_equal(permuted[:, i], base[:, p])
    zeros = np.zeros((k, t), np.int64)
    padded = run([seq[0], zeros, zeros, zeros])
    np.testing.assert_array_equal(padded[:, 0], base[:, 0])


def test_compress_batch_lm_roundtrip(rng):
    """Batched LM compression: blobs decode individually (the decoder
    replays the loop at the recorded executable batch shape with padding
    rows) and via decompress_batch, both matching the direct codes."""
    cfg = tiny_config()
    model = Encodec(cfg)
    lm = model.get_language_model(download=False)
    audios = [(0.3 * rng.standard_normal(n)).astype(np.float32)
              for n in (800, 640, 800)]
    blobs = model.compress_batch(audios, use_lm=True, lm=lm)
    assert len(blobs) == 3
    header = ecdc.read_header(io.BytesIO(blobs[0]))
    assert header["lmb"] == 4  # next pow2 of 3 entries
    for blob, audio in zip(blobs, audios):
        out = np.asarray(model.decompress(blob, lm=lm))
        direct = np.asarray(model.decode(model.encode(audio)))
        np.testing.assert_allclose(out, direct[..., :len(audio)],
                                   rtol=1e-5, atol=1e-6)
    outs = model.decompress_batch(blobs, lm=lm)
    for out_b, blob in zip(outs, blobs):
        np.testing.assert_array_equal(np.asarray(out_b),
                                      np.asarray(model.decompress(blob, lm=lm)))


def test_compress_lm_frame_batched_chunked(rng):
    """lm_batch > 1 on a single segmented stream batches its own frames
    through the LM loop; round-trip stays exact."""
    cfg = tiny_config(chunk_length_s=0.05, overlap=0.01,
                      use_causal_conv=False)
    model = Encodec(cfg)
    lm = model.get_language_model(download=False)
    audio = (0.3 * rng.standard_normal(1800)).astype(np.float32)
    blob = model.compress(audio, use_lm=True, lm=lm, lm_batch=4)
    header = ecdc.read_header(io.BytesIO(blob))
    assert header["lmb"] == 4 and header["lp"]
    out = np.asarray(model.decompress(blob, lm=lm))
    direct = np.asarray(model.decode(model.encode(audio)))[..., :1800]
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)
    # batched decode of one multi-frame blob shares steps across frames too
    out_b = np.asarray(model.decompress_batch([blob], lm=lm)[0])
    np.testing.assert_array_equal(out_b, out)


def test_compress_batch_bitpacking_matches_single(rng):
    """Without the LM the batch API is pure convenience: bytes identical."""
    cfg = tiny_config()
    model = Encodec(cfg)
    audios = [(0.3 * rng.standard_normal(800)).astype(np.float32)
              for _ in range(2)]
    blobs = model.compress_batch(audios, use_lm=False)
    for blob, audio in zip(blobs, audios):
        assert blob == model.compress(audio, use_lm=False)
    outs = model.decompress_batch(blobs)
    for out_b, blob in zip(outs, blobs):
        np.testing.assert_array_equal(np.asarray(out_b),
                                      np.asarray(model.decompress(blob)))


def test_decompress_batch_mixed_bandwidths(rng):
    """decompress_batch groups LM frames by (executable shape, n_q):
    blobs compressed at different bandwidths (different code counts)
    decode together correctly."""
    cfg = tiny_config()
    model = Encodec(cfg)
    lm = model.get_language_model(download=False)
    a1 = (0.3 * rng.standard_normal(800)).astype(np.float32)
    a2 = (0.3 * rng.standard_normal(640)).astype(np.float32)
    model.set_target_bandwidth(20.0)
    b1 = model.compress(a1, use_lm=True, lm=lm)
    model.set_target_bandwidth(80.0)
    b2 = model.compress(a2, use_lm=True, lm=lm)
    refs = [np.asarray(model.decompress(b, lm=lm)) for b in (b1, b2)]
    outs = model.decompress_batch([b1, b2], lm=lm)
    for out_b, ref in zip(outs, refs):
        np.testing.assert_array_equal(np.asarray(out_b), ref)


def _rewrite_header(blob: bytes, **updates) -> bytes:
    """Re-emit a .ecdc blob with mutated header fields (tamper helper)."""
    stream = io.BytesIO(blob)
    metadata = ecdc.read_header(stream)
    metadata.update(updates)
    out = io.BytesIO()
    ecdc.write_header(out, metadata)
    out.write(stream.read())
    return out.getvalue()


def test_decompress_rejects_bad_lmb(rng):
    """'lmb' arrives from an untrusted header and sizes the decoder's
    allocations: out-of-range or non-numeric values must raise CodecError
    (not decode to silence, not attempt a giant allocation)."""
    from neuralcodecs_tpu.core.exceptions import CodecError

    model = Encodec(tiny_config())
    lm = model.get_language_model(download=False)
    audio = (0.3 * rng.standard_normal(800)).astype(np.float32)
    blob = model.compress(audio, use_lm=True, lm=lm)
    for bad in (-1, 0, 10**9, "abc", None):
        tampered = _rewrite_header(blob, lmb=bad)
        with pytest.raises(CodecError):
            model.decompress(tampered, lm=lm)
        with pytest.raises(CodecError):
            model.decompress_batch([tampered], lm=lm)


def test_compress_lm_batch_bounds(rng):
    """Explicit lm_batch outside [1, MAX_LM_BATCH] is a CodecError on the
    encode side too (symmetric with the decode-side header bound, so the
    library never writes a stream it would refuse to read)."""
    from neuralcodecs_tpu.core.exceptions import CodecError
    from neuralcodecs_tpu.models.encodec.compressor import MAX_LM_BATCH

    model = Encodec(tiny_config())
    lm = model.get_language_model(download=False)
    audio = (0.3 * rng.standard_normal(800)).astype(np.float32)
    for bad in (0, -4, MAX_LM_BATCH + 1):
        with pytest.raises(CodecError):
            model.compress(audio, use_lm=True, lm=lm, lm_batch=bad)


def test_compress_batch_empty_returns_empty():
    model = Encodec(tiny_config())
    assert model.compress_batch([], use_lm=False) == []
    assert model.compress_batch([], use_lm=True) == []
