"""Benchmark: Dia 1.6B decode throughput — the reference's own headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes exactly one performance number: Dia TTS at ~40
tokens/s on an RTX 3090 (README.md:334-338); vs_baseline is measured
against it. ``--all`` additionally benchmarks the codec round-trips
(SNAC-24k, DAC-44k, Encodec-24k; target >500x realtime per chip, the
BASELINE.json north star — the reference publishes no codec numbers),
one JSON line each after the primary line.

Timing methodology: the axon remote-TPU platform's block_until_ready returns
before device work completes, so the only honest clock is a host fetch of a
scalar that data-depends on every iteration. We chain ITERS forwards inside
one jitted fori_loop (inputs perturbed by the running accumulator so XLA
cannot hoist the loop-invariant body) and fetch one float at the end; the
single tunnel round-trip is amortized over all iterations.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_forward(forward_fn, params, a, seconds: float, iters: int = 10,
                   repeats: int = 3, needs_key: bool = True) -> float:
    """Best-of xRT for a jittable forward, RTT-safe (chained fori_loop with
    input perturbed by the accumulator so XLA cannot hoist the body; one
    scalar fetch per repeat)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)

    @jax.jit
    def chained(params, a, key):
        def body(i, carry):
            acc, key = carry
            key, sub = jax.random.split(key)
            out = forward_fn(params, a * (1.0 + 1e-12 * acc),
                             sub if needs_key else None)
            return acc + jnp.sum(jnp.abs(out).astype(jnp.float32)), key

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros(()), key))
        return acc

    float(chained(params, a, key))  # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        float(chained(params, a, key))
        best = min(best, time.perf_counter() - start)
    return seconds * a.shape[0] * iters / best


def _emit(metric: str, xrt: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 500.0, 3),
    }))


def bench_snac(compute_dtype=None, decoder_dtype=None, batch: int = 1) -> float:
    import jax

    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    model = SNAC(SNACConfig.snac_24khz(), compute_dtype=compute_dtype,
                 decoder_dtype=decoder_dtype)
    cfg = model.config
    seconds = 10.0
    n = int(cfg.sample_rate * seconds)
    rng = np.random.default_rng(0)
    padded = -(-n // cfg.pad_to) * cfg.pad_to
    a = np.zeros((batch, padded, 1), np.float32)
    a[:, :n, 0] = 0.25 * rng.standard_normal((batch, n))
    a = jax.device_put(a)
    chunks = model._auto_chunks(padded)
    return _bench_forward(
        lambda p, x, k: model._forward_chunked_fn(p, x, k, chunks)[0],
        model.params, a, seconds, iters=10 if batch == 1 else 5)


def bench_dac(decoder_dtype=None, batch: int = 1) -> float:
    import jax

    from neuralcodecs_tpu.models.dac import DAC, DACConfig

    model = DAC(DACConfig.dac_44khz(), decoder_dtype=decoder_dtype)
    cfg = model.config
    seconds = 10.0
    n = int(cfg.sample_rate * seconds)
    rng = np.random.default_rng(0)
    padded = -(-n // cfg.hop_length) * cfg.hop_length
    a = np.zeros((batch, padded, 1), np.float32)
    a[:, :n, 0] = 0.25 * rng.standard_normal((batch, n))
    a = jax.device_put(a)
    chunks = model._auto_chunks(padded // cfg.hop_length)
    return _bench_forward(
        lambda p, x, k: model._forward_chunked_fn(p, x, None, chunks)["audio"],
        model.params, a, seconds, iters=5 if batch == 1 else 3,
        needs_key=False)


def bench_encodec(decoder_dtype=None) -> float:
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    model = Encodec(EncodecConfig.encodec_24khz(), decoder_dtype=decoder_dtype)
    seconds = 10.0
    n = int(model.config.sample_rate * seconds)
    rng = np.random.default_rng(0)
    a = jax.device_put(0.25 * rng.standard_normal((1, n, 1)).astype(np.float32))
    n_q = model.quantizer.num_quantizers_for_bandwidth(model.frame_rate, 6.0)

    def fwd(params, x, _key):
        codes, _ = (lambda emb: (model.quantizer.encode(params, emb, n_q), None))(
            model.encoder(params, x))
        emb = model.quantizer.decode(params, codes)
        out = model.decoder(params, emb.astype(model.decoder_dtype))
        return out.astype(jnp.float32)

    return _bench_forward(fwd, model.params, a, seconds, iters=5,
                          needs_key=False)


def bench_encodec48(decoder_dtype=None, batch: int = 4) -> float:
    """Encodec 48 kHz stereo (BASELINE.json config 3): 1 s segments (the
    model's chunking unit) round-tripped at 12 kbps through the jitted chunk
    path. Single-segment throughput is bound by the serial SLSTM scan (150
    steps x 4 layer-passes of latency-bound tiny matmuls), so per-chip
    throughput is reported both at the historical batch 4 and at a serving
    batch 64, where the scan latency amortizes across the whole batch."""
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    model = Encodec(EncodecConfig.encodec_48khz(), decoder_dtype=decoder_dtype)
    sr = model.config.sample_rate
    seconds = 1.0  # the 48k model is segmented into 1 s chunks
    rng = np.random.default_rng(0)
    a = jax.device_put(0.25 * rng.standard_normal(
        (batch, int(sr * seconds), model.config.channels)).astype(np.float32))
    n_q = model.quantizer.num_quantizers_for_bandwidth(model.frame_rate, 12.0)

    def fwd(params, x, _key):
        codes = model.quantizer.encode(params, model.encoder(params, x), n_q)
        out = model.decoder(params,
                            model.quantizer.decode(params, codes)
                            .astype(model.decoder_dtype))
        return out.astype(jnp.float32)

    return _bench_forward(fwd, model.params, a, seconds, iters=10,
                          needs_key=False)


def bench_dsp() -> float:
    """AudioTools batch DSP pipeline (BASELINE.json config 4): polyphase
    resample 44.1k->24k + mel spectrogram + compressor, one jitted chain
    over a batch of 10 s clips."""
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.dsp.effects import apply_compressor
    from neuralcodecs_tpu.dsp.mel import mel_spectrogram
    from neuralcodecs_tpu.dsp.resample import resample_poly

    # batch 64: the compressor's envelope follower is a serial scan in T
    # whose wall time is batch-invariant (it occupies B of the VPU's lanes),
    # so aggregate throughput scales ~linearly with batch (8 -> 303x,
    # 64 -> ~2354x measured on v5e)
    seconds, batch, src_sr, dst_sr = 10.0, 64, 44100, 24000
    rng = np.random.default_rng(0)
    a = jax.device_put(0.25 * rng.standard_normal(
        (batch, int(src_sr * seconds))).astype(np.float32))

    def fwd(_params, x, _key):
        y = resample_poly(x, src_sr, dst_sr)
        y = apply_compressor(y, dst_sr, threshold=-20.0, ratio=4.0)
        mel = mel_spectrogram(y, dst_sr, n_mels=80)
        return jnp.sum(mel) + jnp.sum(y)

    return _bench_forward(fwd, {}, a, seconds, iters=5, needs_key=False)


def bench_dia() -> float:
    """Full-size Dia 1.6B decode throughput in tokens/s (bf16 compute).

    The reference's one published benchmark: ~40 tokens/s on an RTX 3090
    (README.md:334-338). 86 tokens = 1 s of audio. Best of 3 timed runs
    (single-run tunnel variance is ~±20%)."""
    import time as _time

    import jax.numpy as jnp

    from neuralcodecs_tpu.models.dia import Dia, DiaConfig

    model = Dia(DiaConfig(), compute_dtype=jnp.bfloat16)
    text = ["[S1]This is the benchmark sentence for the decoder loop."]
    model.generate_codes(text, max_tokens=128, seed=0)  # compile + warmup
    steps = 128 - max(model.config.data.delay_pattern)
    best = float("inf")
    for seed in (1, 2, 3):
        start = _time.perf_counter()
        model.generate_codes(text, max_tokens=128, seed=seed)
        best = min(best, _time.perf_counter() - start)
    return steps / best


def bench_dia_int8() -> float:
    """Dia 1.6B decode with weight-only int8 kernels (bf16 activations):
    the decode loop is parameter-bandwidth bound, so halving the bytes per
    weight nearly doubles tokens/s."""
    import time as _time

    import jax.numpy as jnp

    from neuralcodecs_tpu.models.dia import Dia, DiaConfig

    model = Dia(DiaConfig(), compute_dtype=jnp.bfloat16)
    model.quantize_int8()
    text = ["[S1]This is the benchmark sentence for the decoder loop."]
    model.generate_codes(text, max_tokens=128, seed=0)  # compile + warmup
    steps = 128 - max(model.config.data.delay_pattern)
    best = float("inf")
    for seed in (1, 2, 3):
        start = _time.perf_counter()
        model.generate_codes(text, max_tokens=128, seed=seed)
        best = min(best, _time.perf_counter() - start)
    return steps / best


def main() -> None:
    """Default run (no flags) emits the full metric set — the Dia tokens/s
    headline FIRST (the driver parses line 1), then every codec/DSP xRT line
    against the >500x north star. Flags act as filters for quick single-bench
    runs; ``--bf16``/``--mixed``/``--int8`` stay opt-in because the remote
    bf16 compile is slow (~400 s over the axon tunnel).
    """
    import sys

    filter_flags = {"--snac", "--dac", "--enc24", "--enc48", "--dsp",
                    "--dia", "--aggregate", "--all"}
    optin_flags = {"--bf16", "--mixed", "--int8"}
    given = filter_flags & set(sys.argv[1:])
    # an opt-in flag alone must NOT trigger the full default suite
    full = (not given and not (optin_flags & set(sys.argv[1:]))) \
        or "--all" in given

    def want(flag: str) -> bool:
        return full or flag in given

    if want("--dia"):
        tok_s = bench_dia()
        print(json.dumps({
            "metric": "dia_1.6b_decode_tokens_per_s",
            "value": round(tok_s, 1),
            "unit": "tokens/s",
            "vs_baseline": round(tok_s / 40.0, 2),  # ref: 40 tok/s, RTX 3090
        }))
    if want("--snac"):
        _emit("snac24_roundtrip_xRT", bench_snac())
    if want("--dac"):
        _emit("dac44_roundtrip_xRT", bench_dac())
    if want("--enc24"):
        _emit("encodec24_roundtrip_xRT", bench_encodec())
    if want("--enc48"):
        _emit("encodec48_stereo_roundtrip_xRT", bench_encodec48())
        _emit("encodec48_stereo_batch64_aggregate_xRT",
              bench_encodec48(batch=64))
    if want("--dsp"):
        _emit("audiotools_dsp_pipeline_xRT", bench_dsp())
    if want("--aggregate"):
        # serving-batch aggregate throughput: per-stream work is partially
        # latency-bound, so a batch of streams raises per-chip throughput
        _emit("snac24_batch8_aggregate_xRT", bench_snac(batch=8))
        _emit("dac44_batch8_aggregate_xRT", bench_dac(batch=8))
    if "--bf16" in sys.argv:  # separate flag: the remote bf16 compile is slow
        _emit("snac24_bf16_roundtrip_xRT", bench_snac(compute_dtype="bfloat16"))
    if "--mixed" in sys.argv:  # f32 encoder+RVQ (bit-exact codes), bf16 decoder
        _emit("snac24_mixed_roundtrip_xRT", bench_snac(decoder_dtype="bfloat16"))
        _emit("dac44_mixed_roundtrip_xRT", bench_dac(decoder_dtype="bfloat16"))
        _emit("encodec24_mixed_roundtrip_xRT", bench_encodec(decoder_dtype="bfloat16"))
        _emit("encodec48_mixed_roundtrip_xRT", bench_encodec48(decoder_dtype="bfloat16"))
    # weight-only int8 Dia (fastest serving config): part of the default
    # record, printed LAST so a driver timeout cannot displace other lines;
    # a transient tunnel/chip error must not fail the nine lines above
    if "--int8" in sys.argv or full:
        try:
            tok_s = bench_dia_int8()
        except Exception as exc:  # transient FAILED_PRECONDITION observed
            print(f"int8 bench skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            if not full:
                raise
        else:
            print(json.dumps({
                "metric": "dia_1.6b_int8_decode_tokens_per_s",
                "value": round(tok_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tok_s / 40.0, 2),
            }))


if __name__ == "__main__":
    main()
