"""End-to-end .ecdc compression/decompression.

Rebuild of EncodecCompressor
(/root/reference/NeuralCodecs.Torch/Modules/Encodec/EncodecCompressor.cs:12-431):
header + per-frame [scales][entropy-coded codes]. Two payload codecs:
  * bit packing (no LM): fully vectorizable; packed on host from a single
    device fetch of the whole code tensor;
  * LM + arithmetic coding: the serial per-timestep loop runs on host, with
    the jitted LM step the only device work (SURVEY §3.3 boundary note).
"""

from __future__ import annotations

import io
import math

import numpy as np

import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import CodecError
from neuralcodecs_tpu.models.encodec import ecdc
from neuralcodecs_tpu.models.encodec.entropy import (
    BitPacker,
    BitUnpacker,
)


def _model_name(model) -> str:
    return f"encodec_{model.config.sample_rate // 1000}khz"


def compress(model, audio, use_lm: bool = False, lm=None) -> bytes:
    """Compress one waveform ([C, T] or [T]) to .ecdc bytes."""
    x = np.asarray(audio, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise CodecError("Only single waveform can be encoded (shape [C, T])")
    if x.shape[0] != model.config.channels:
        raise CodecError(f"Expected {model.config.channels} channels, got {x.shape[0]}")
    if use_lm and lm is None:
        lm = model.get_language_model()

    frames = model.encode(x)
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
    ecdc.write_header(out, metadata)

    for codes, scale in frames:
        if scale is not None:
            ecdc.write_scale_values(out, np.asarray(scale).reshape(-1))
        codes_np = np.asarray(codes)[0]  # [K, T]
        k, t = codes_np.shape
        if use_lm:
            # The pdf stream MUST be computed with the exact same op sequence
            # the decoder will use (CDF quantization amplifies any numeric
            # difference into a corrupted stream), so encode also walks the
            # jitted LM step path. The entropy coding itself is batched: pdfs
            # are accumulated and coded in ONE native range-coder call.
            from neuralcodecs_tpu.models.encodec.entropy import (
                build_stable_quantized_cdf_batch,
            )
            from neuralcodecs_tpu.native.entropy_native import encode_symbols

            state = lm.init_state(1)
            inp = np.zeros((1, k, 1), np.int64)
            pdf_steps = []
            for step in range(t):
                probas, state = lm.step(inp, state)
                inp = codes_np[None, :, step: step + 1] + 1
                # the LM predicts for ALL its configured codebooks (32 for
                # the pretrained 24k LM); keep only the k the model streams,
                # matching the per-codebook loop of the reference encoder
                pdf_steps.append(np.asarray(probas)[0, :, :k, 0].T)  # [k, card]
            pdfs = np.concatenate(pdf_steps, axis=0)                # (t,k) order
            cdfs = build_stable_quantized_cdf_batch(pdfs, 24)
            symbols = codes_np.T.reshape(-1)                        # (t,k) order
            payload = encode_symbols(cdfs, symbols, 24)
            if model.segment_length is not None:
                # chunked streams: length-prefix each frame payload. (The
                # range decoder cannot know the encoder's flush-byte count,
                # so back-to-back frame payloads are not self-delimiting —
                # the reference's multi-frame+LM path shares this ambiguity.)
                import struct

                out.write(struct.pack(">I", len(payload)))
            out.write(payload)
        else:
            packer = BitPacker(model.bits_per_codebook, out)
            # reference order: for t, for k (EncodecCompressor.cs:161-168)
            packer.push_many(codes_np.T.reshape(-1))
            packer.flush()
    return out.getvalue()


def decompress(model, data: bytes, lm=None):
    """Decompress .ecdc bytes -> audio [B, C, T]."""
    stream = io.BytesIO(data)
    metadata = ecdc.read_header(stream)
    ecdc.validate_metadata(metadata)
    audio_length = int(metadata["al"])
    num_codebooks = int(metadata["nc"])
    use_lm = bool(metadata["lm"])
    if "bw" in metadata:
        model.set_target_bandwidth(float(metadata["bw"]))
    if use_lm and lm is None:
        lm = model.get_language_model()

    from neuralcodecs_tpu.models.encodec.model import EncodedFrame

    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    frames = []
    for offset in range(0, audio_length, segment_stride):
        this_len = min(audio_length - offset, segment_length)
        frame_length = int(math.ceil(
            this_len * model.frame_rate / model.config.sample_rate))
        scale = None
        if model.config.normalize:
            scale = jnp.asarray(ecdc.read_scale_values(stream),
                                jnp.float32).reshape(1, -1)
        codes_np = np.zeros((num_codebooks, frame_length), np.int64)
        if use_lm:
            from neuralcodecs_tpu.models.encodec.entropy import (
                build_stable_quantized_cdf_batch,
            )
            from neuralcodecs_tpu.native.entropy_native import (
                NativeArithmeticDecoder,
            )

            if model.segment_length is not None:
                import struct

                if not metadata.get("lp"):
                    raise CodecError(
                        "Segmented LM stream without the 'lp' length-prefix "
                        "marker — produced by an incompatible writer")
                (payload_len,) = struct.unpack(">I", stream.read(4))
                payload = stream.read(payload_len)
            else:
                payload = stream.read()
            decoder = NativeArithmeticDecoder(payload, 24)
            state = lm.init_state(1)
            inp = np.zeros((1, num_codebooks, 1), np.int64)
            for step in range(frame_length):
                probas, state = lm.step(inp, state)
                # slice the LM's codebook heads to the streamed count (the
                # encode side does the same; a mismatch would desync or
                # over-read the range coder)
                probas_np = (np.asarray(probas)
                             [0, :, :num_codebooks, 0])         # [card, k]
                cdfs = build_stable_quantized_cdf_batch(probas_np.T, 24)
                symbols = decoder.pull_many(cdfs)
                codes_np[:, step] = symbols
                inp = codes_np[None, :, step: step + 1] + 1
            decoder.close()
        else:
            unpacker = BitUnpacker(model.bits_per_codebook, stream)
            for step in range(frame_length):
                for kk in range(num_codebooks):
                    value = unpacker.pull()
                    if value is None:
                        raise CodecError("Stream ended too soon")
                    codes_np[kk, step] = value
        frames.append(EncodedFrame(jnp.asarray(codes_np)[None], scale))
    audio = model.decode(frames)
    return audio[..., :audio_length]
