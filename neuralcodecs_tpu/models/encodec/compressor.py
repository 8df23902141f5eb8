"""End-to-end .ecdc compression/decompression.

Rebuild of EncodecCompressor
(/root/reference/NeuralCodecs.Torch/Modules/Encodec/EncodecCompressor.cs:12-431):
header + per-frame [scales][entropy-coded codes]. Two payload codecs:
  * bit packing (no LM): fully vectorizable; packed on host from a single
    device fetch of the whole code tensor;
  * LM + arithmetic coding: the serial per-timestep loop runs on host, with
    the jitted LM step the only device work (SURVEY §3.3 boundary note).

Batched LM coding (TPU-first extension, absent from the reference): the
per-timestep loop is inherently serial PER STREAM, but independent streams
(and the independent frames of one segmented stream — the LM state resets
per frame) can share each step's device dispatch by stacking them as rows
of one batched LM call. The LM is row-local (every op — embedding, dense,
attention over the row's own past, softmax — computes each batch row from
that row's inputs only), so row r of a batch-B step equals the same stream
in any row of any other batch-B step bit-for-bit; what is NOT bit-stable is
changing the executable batch SHAPE (XLA lowers B=1 differently from B>=2;
measured 4e-5 divergence on TPU). Entropy coding amplifies any pdf
difference into a corrupted stream, so the executable batch used at encode
time is recorded in the header ("lmb") and decode replays the loop at that
exact shape, padding unused rows. Streams without the marker decode on the
original one-row path, keeping old files and goldens bit-identical.
"""

from __future__ import annotations

import io
import math
import struct

import numpy as np

import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import CodecError
from neuralcodecs_tpu.models.encodec import ecdc
from neuralcodecs_tpu.models.encodec.entropy import (
    BitPacker,
    BitUnpacker,
)

# executable-batch ceiling for grouped LM coding: past this, the per-step
# host work (CDF build + range coding) outweighs the amortized dispatch
DEFAULT_MAX_LM_BATCH = 16

# hard ceiling on the executable LM batch shape, enforced symmetrically on
# encode (so every stream the library writes is one it will read back) and
# on decode (where "lmb" arrives from an untrusted header and sizes
# lm.init_state / per-step buffers — ~1 MB of LM state per row for the
# pretrained 24 kHz LM, so an unbounded value is a memory-exhaustion vector)
MAX_LM_BATCH = 64


def _lmb_from_metadata(metadata) -> int:
    """Validated executable LM batch shape from an untrusted .ecdc header."""
    raw = metadata.get("lmb", 1)
    try:
        lmb = int(raw)
    except (TypeError, ValueError):
        raise CodecError(f"Invalid 'lmb' in stream header: {raw!r}")
    if not 1 <= lmb <= MAX_LM_BATCH:
        raise CodecError(
            f"'lmb' in stream header out of range [1, {MAX_LM_BATCH}]: {lmb}")
    return lmb


def _model_name(model) -> str:
    return f"encodec_{model.config.sample_rate // 1000}khz"


def _next_pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length()


def _lm_encode_entries(lm, entries: list[np.ndarray], lmb: int) -> list[bytes]:
    """Arithmetic-code independent code streams through the LM in batches.

    entries: [K, T_i] int code arrays (equal K); every group of <= ``lmb``
    entries shares one batch-``lmb`` LM loop (shorter rows idle once done).
    Returns one range-coder payload per entry. ``lmb`` is the executable
    batch shape — the decoder must replay at the same shape (see module
    docstring).
    """
    from neuralcodecs_tpu.models.encodec.entropy import (
        build_stable_quantized_cdf_batch,
    )
    from neuralcodecs_tpu.native.entropy_native import encode_symbols

    k = entries[0].shape[0]
    if any(c.shape[0] != k for c in entries):
        raise CodecError("All streams in one batch must share n_q")
    payloads: list[bytes] = []
    # Encoding is teacher-forced: every step's LM input comes from the KNOWN
    # codes, not from the previous step's output — so the whole step chain
    # can be dispatched ahead of the fetches. JAX's async dispatch pipelines
    # the device work; fetching through a small sliding window (rather than
    # all-at-end) bounds device-side probas accumulation and keeps one fetch
    # in flight, which remote-tunnel transports need for steady throughput.
    fetch_window = 8
    for g0 in range(0, len(entries), lmb):
        group = entries[g0:g0 + lmb]
        max_t = max(c.shape[1] for c in group)
        state = lm.init_state(lmb)
        inp = np.zeros((lmb, k, 1), np.int64)
        pending: list = []
        fetched: list[np.ndarray] = []
        for step in range(max_t):
            probas, state = lm.step(inp, state)
            # the LM predicts for ALL its configured codebooks (32 for the
            # pretrained 24k LM); keep only the k the model streams,
            # matching the per-codebook loop of the reference encoder
            pending.append(probas[:, :, :k, 0])              # [lmb, card, k]
            if len(pending) > fetch_window:
                fetched.append(np.asarray(pending.pop(0)))
            nxt = np.zeros((lmb, k, 1), np.int64)
            for j, codes in enumerate(group):
                if step < codes.shape[1]:
                    nxt[j] = codes[:, step:step + 1] + 1
            inp = nxt
        fetched.extend(np.asarray(p) for p in pending)
        for j, codes in enumerate(group):
            t_j = codes.shape[1]
            pdfs = np.concatenate([fetched[t][j].T for t in range(t_j)],
                                  axis=0)                    # (t,k) order
            cdfs = build_stable_quantized_cdf_batch(pdfs, 24)
            payloads.append(encode_symbols(cdfs, codes.T.reshape(-1), 24))
    return payloads


def _lm_decode_entries(lm, payloads: list[bytes], lengths: list[int],
                       k: int, lmb: int) -> list[np.ndarray]:
    """Inverse of :func:`_lm_encode_entries` at the same executable shape.

    Each row feeds back its own just-decoded symbols, so the pdf sequence
    reproduces the encoder's bit-for-bit (row-locality makes the other
    rows' contents — real co-streams at encode time, zero padding here —
    irrelevant).
    """
    from neuralcodecs_tpu.models.encodec.entropy import (
        build_stable_quantized_cdf_batch,
    )
    from neuralcodecs_tpu.native.entropy_native import NativeArithmeticDecoder

    out = [np.zeros((k, t), np.int64) for t in lengths]
    for g0 in range(0, len(payloads), lmb):
        idxs = list(range(g0, min(g0 + lmb, len(payloads))))
        decoders = [NativeArithmeticDecoder(payloads[i], 24) for i in idxs]
        state = lm.init_state(lmb)
        inp = np.zeros((lmb, k, 1), np.int64)
        max_t = max(lengths[i] for i in idxs)
        for step in range(max_t):
            probas, state = lm.step(inp, state)
            # slice the LM's codebook heads to the streamed count ON DEVICE
            # before fetching (the pretrained 24k LM predicts 32 heads; a
            # 6 kbps stream carries 8 — fetching the full tensor would move
            # 4x the bytes on this serial, transfer-bound loop). A slice
            # mismatch vs encode would desync or over-read the range coder.
            p = np.asarray(probas[:, :, :k, 0])              # [lmb, card, k]
            nxt = np.zeros((lmb, k, 1), np.int64)
            for j, i in enumerate(idxs):
                if step < lengths[i]:
                    cdfs = build_stable_quantized_cdf_batch(p[j].T, 24)
                    out[i][:, step] = decoders[j].pull_many(cdfs)
                    nxt[j] = out[i][:, step:step + 1] + 1
            inp = nxt
        for d in decoders:
            d.close()
    return out


def _build_stream(model, x: np.ndarray, frames, use_lm: bool,
                  payloads: list[bytes] | None, lmb: int) -> bytes:
    """Assemble one .ecdc container from encoded frames (+ LM payloads)."""
    out = io.BytesIO()
    metadata = {
        "m": _model_name(model),
        "al": int(x.shape[-1]),
        "nc": int(frames[0].codes.shape[1]),
        "lm": bool(use_lm),
        "ch": int(x.shape[0]),
        "sr": int(model.config.sample_rate),
    }
    if model.bandwidth is not None:
        metadata["bw"] = float(model.bandwidth)
    if use_lm and model.segment_length is not None:
        # Explicit format-deviation marker (ADVICE r1): segmented LM streams
        # length-prefix each frame payload (the range decoder cannot know the
        # encoder's flush-byte count, so back-to-back payloads are not
        # self-delimiting). The reference format has no such prefix; flagging
        # it in metadata keeps readers from mis-parsing and scopes the
        # byte-compatibility claim to unsegmented / no-LM streams.
        metadata["lp"] = True
    if use_lm and lmb > 1:
        # executable LM batch shape — decode must replay at this shape
        metadata["lmb"] = int(lmb)
    ecdc.write_header(out, metadata)

    for fi, (codes, scale) in enumerate(frames):
        if scale is not None:
            ecdc.write_scale_values(out, np.asarray(scale).reshape(-1))
        if use_lm:
            payload = payloads[fi]
            if model.segment_length is not None:
                # chunked streams: length-prefix each frame payload. (The
                # range decoder cannot know the encoder's flush-byte count,
                # so back-to-back frame payloads are not self-delimiting —
                # the reference's multi-frame+LM path shares this ambiguity.)
                out.write(struct.pack(">I", len(payload)))
            out.write(payload)
        else:
            codes_np = np.asarray(codes)[0]  # [K, T]
            packer = BitPacker(model.bits_per_codebook, out)
            # reference order: for t, for k (EncodecCompressor.cs:161-168)
            packer.push_many(codes_np.T.reshape(-1))
            packer.flush()
    return out.getvalue()


def _check_input(model, audio) -> np.ndarray:
    x = np.asarray(audio, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise CodecError("Only single waveform can be encoded (shape [C, T])")
    if x.shape[0] != model.config.channels:
        raise CodecError(
            f"Expected {model.config.channels} channels, got {x.shape[0]}")
    return x


def compress(model, audio, use_lm: bool = False, lm=None,
             lm_batch: int = 1) -> bytes:
    """Compress one waveform ([C, T] or [T]) to .ecdc bytes.

    ``lm_batch > 1`` batches the frames of a segmented stream through the
    LM loop ``lm_batch`` rows at a time (frames are independent LM streams
    — the state resets per frame), amortizing the per-step device dispatch.
    The executable shape is recorded in the header; see module docstring.
    """
    blobs = compress_batch(model, [audio], use_lm=use_lm, lm=lm,
                           lm_batch=lm_batch)
    return blobs[0]


def compress_batch(model, audios, use_lm: bool = False, lm=None,
                   lm_batch: int | None = None) -> list[bytes]:
    """Compress independent waveforms to .ecdc, sharing the LM loop.

    Every (stream, frame) pair is an independent entropy stream; with the
    LM enabled they are coded ``lm_batch`` at a time through one batched
    LM step per timestep — one device dispatch serves the whole group, so
    aggregate throughput scales ~linearly with the group size on a
    dispatch-bound (or weight-bound) step. Defaults to
    ``min(next_pow2(n_entries), DEFAULT_MAX_LM_BATCH)`` when more than one
    entry is in flight.
    """
    xs = [_check_input(model, a) for a in audios]
    if not xs:
        return []
    if use_lm and lm is None:
        lm = model.get_language_model()

    per_stream_frames = [model.encode(x) for x in xs]
    if not use_lm:
        return [_build_stream(model, x, frames, False, None, 1)
                for x, frames in zip(xs, per_stream_frames)]

    # flatten frames across streams: each is an independent LM stream
    entries: list[np.ndarray] = []
    for frames in per_stream_frames:
        for codes, _scale in frames:
            entries.append(np.asarray(codes)[0])             # [K, T]
    if lm_batch is None:
        lm_batch = (min(_next_pow2(len(entries)), DEFAULT_MAX_LM_BATCH)
                    if len(entries) > 1 else 1)
    if not 1 <= lm_batch <= MAX_LM_BATCH:
        raise CodecError(
            f"lm_batch must be in [1, {MAX_LM_BATCH}], got {lm_batch}")
    # The pdf stream MUST be computed with the exact same op sequence the
    # decoder will use (CDF quantization amplifies any numeric difference
    # into a corrupted stream), so encode walks the same jitted LM step
    # path — at the same executable batch shape — as decode.
    payloads = _lm_encode_entries(lm, entries, lm_batch)

    blobs = []
    fi = 0
    for x, frames in zip(xs, per_stream_frames):
        n = len(frames)
        blobs.append(_build_stream(model, x, frames, True,
                                   payloads[fi:fi + n], lm_batch))
        fi += n
    return blobs


def _parse_stream(model, data: bytes):
    """Read one .ecdc container -> (metadata, frame geometry, scales,
    payloads-or-unpacked-codes)."""
    stream = io.BytesIO(data)
    metadata = ecdc.read_header(stream)
    ecdc.validate_metadata(metadata)
    audio_length = int(metadata["al"])
    num_codebooks = int(metadata["nc"])
    use_lm = bool(metadata["lm"])
    if "bw" in metadata:
        model.set_target_bandwidth(float(metadata["bw"]))

    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    frame_meta = []  # (frame_length, scale | None)
    payloads = []    # bytes per frame (LM) or codes np (no LM)
    for offset in range(0, audio_length, segment_stride):
        this_len = min(audio_length - offset, segment_length)
        frame_length = int(math.ceil(
            this_len * model.frame_rate / model.config.sample_rate))
        scale = None
        if model.config.normalize:
            scale = jnp.asarray(ecdc.read_scale_values(stream),
                                jnp.float32).reshape(1, -1)
        if use_lm:
            if model.segment_length is not None:
                if not metadata.get("lp"):
                    raise CodecError(
                        "Segmented LM stream without the 'lp' length-prefix "
                        "marker — produced by an incompatible writer")
                (payload_len,) = struct.unpack(">I", stream.read(4))
                payloads.append(stream.read(payload_len))
            else:
                payloads.append(stream.read())
        else:
            codes_np = np.zeros((num_codebooks, frame_length), np.int64)
            unpacker = BitUnpacker(model.bits_per_codebook, stream)
            for step in range(frame_length):
                for kk in range(num_codebooks):
                    value = unpacker.pull()
                    if value is None:
                        raise CodecError("Stream ended too soon")
                    codes_np[kk, step] = value
            payloads.append(codes_np)
        frame_meta.append((frame_length, scale))
    return metadata, frame_meta, payloads


def _assemble_audio(model, metadata, frame_meta, codes_list):
    from neuralcodecs_tpu.models.encodec.model import EncodedFrame

    frames = [EncodedFrame(jnp.asarray(c)[None], scale)
              for c, (_len, scale) in zip(codes_list, frame_meta)]
    audio = model.decode(frames)
    return audio[..., : int(metadata["al"])]


def decompress(model, data: bytes, lm=None):
    """Decompress .ecdc bytes -> audio [B, C, T]."""
    metadata, frame_meta, payloads = _parse_stream(model, data)
    if not bool(metadata["lm"]):
        return _assemble_audio(model, metadata, frame_meta, payloads)
    if lm is None:
        lm = model.get_language_model()
    lmb = _lmb_from_metadata(metadata)
    k = int(metadata["nc"])
    codes_list = _lm_decode_entries(
        lm, payloads, [fl for fl, _ in frame_meta], k, lmb)
    return _assemble_audio(model, metadata, frame_meta, codes_list)


def decompress_batch(model, blobs, lm=None) -> list:
    """Decompress independent .ecdc byte strings, sharing the LM loop.

    LM frames are grouped by their recorded executable batch shape
    (``lmb``) and decoded together — within one group, every device step
    serves up to ``lmb`` frames across all input blobs.
    """
    parsed = [_parse_stream(model, b) for b in blobs]
    need_lm = any(bool(m["lm"]) for m, _f, _p in parsed)
    if need_lm and lm is None:
        lm = model.get_language_model()

    # group LM frames across blobs by (executable shape, n_q)
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for bi, (metadata, frame_meta, payloads) in enumerate(parsed):
        if not bool(metadata["lm"]):
            continue
        key = (_lmb_from_metadata(metadata), int(metadata["nc"]))
        for fi in range(len(frame_meta)):
            groups.setdefault(key, []).append((bi, fi))
    decoded: dict[tuple[int, int], np.ndarray] = {}
    for (lmb, k), members in groups.items():
        payloads = [parsed[bi][2][fi] for bi, fi in members]
        lengths = [parsed[bi][1][fi][0] for bi, fi in members]
        codes = _lm_decode_entries(lm, payloads, lengths, k, lmb)
        for (bi, fi), c in zip(members, codes):
            decoded[(bi, fi)] = c

    outs = []
    for bi, (metadata, frame_meta, payloads) in enumerate(parsed):
        if bool(metadata["lm"]):
            codes_list = [decoded[(bi, fi)] for fi in range(len(frame_meta))]
        else:
            codes_list = payloads
        # restore this blob's bandwidth before decoding its codes (the
        # shared parse pass may have switched it for a later blob)
        if "bw" in metadata:
            model.set_target_bandwidth(float(metadata["bw"]))
        outs.append(_assemble_audio(model, metadata, frame_meta, codes_list))
    return outs
