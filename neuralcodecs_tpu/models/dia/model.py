"""Dia 1.6B text-to-dialogue TTS, TPU-native.

Rebuild of /root/reference/NeuralCodecs.Torch/Models/Dia.cs:41-1256 and
Modules/Dia/*: byte-level text encoding ([S1]→0x01, [S2]→0x02), CFG-batched
encoder pass, per-layer precomputed cross-attention caches, delay-pattern
audio prefill, and the autoregressive decode loop with on-the-fly EOS /
delay-pattern countdown bookkeeping, followed by delay revert and the DAC
vocoder bridge.

TPU-first design: the reference steps the decoder from C# with per-token
host↔device ping-pong (SURVEY hard-part #5). Here the ENTIRE generation
loop — decode step, CFG combine, top-k/top-p sampling, EOS countdown, token
writeback — is ONE `lax.while_loop` inside ONE jit with donated KV caches;
the host gets control back only when generation finishes.
"""

from __future__ import annotations

import functools
import sys
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.models.dia.audio_delay import apply_audio_delay, revert_audio_delay
from neuralcodecs_tpu.models.dia.config import DiaConfig
from neuralcodecs_tpu.models.dia.layers import (
    Attention,
    DenseGeneral,
    KVCacheSlot,
    MlpBlock,
    rms_norm,
)
from neuralcodecs_tpu.models.layers import Params, StateDict, _require

Array = jax.Array


def _reupload_host_params(params: Params) -> Params:
    """Ensure every param is a device array after quantization.

    Guards the invariant that broke round 3: any host numpy left inside
    ``self.params`` (then: embeddings/norms after a bulk ``device_get``;
    now: only possible via externally-supplied numpy state) is re-shipped
    host->device on EVERY jitted generate call (~1.5 s/call over the axon
    tunnel — the round-3 Dia bench regression, ADVICE r3 / VERDICT r3 #1).
    One ``device_put`` here means one upload, ever. Quantization itself now
    runs fully on device, so this is normally a no-op."""
    return {k: v if isinstance(v, jax.Array) else jnp.asarray(v)
            for k, v in params.items()}


class _EncoderLayer:
    def __init__(self, prefix: str, cfg: DiaConfig):
        e = cfg.encoder
        self.prefix = prefix
        self.self_attention = Attention(
            f"{prefix}.self_attention", e.n_embd, e.n_embd, e.n_head, e.n_head,
            e.head_dim, e.n_embd, cfg.rope_min_timescale, cfg.rope_max_timescale)
        self.mlp = MlpBlock(f"{prefix}.mlp", e.n_embd, e.n_hidden)
        self.eps = cfg.normalization_layer_epsilon

    def init(self, key, params: Params) -> None:
        k1, k2 = jax.random.split(key)
        params[f"{self.prefix}.pre_sa_norm.weight"] = jnp.ones(
            (self.self_attention.q_proj.in_shapes[0],), jnp.float32)
        params[f"{self.prefix}.post_sa_norm.weight"] = jnp.ones_like(
            params[f"{self.prefix}.pre_sa_norm.weight"])
        self.self_attention.init(k1, params)
        self.mlp.init(k2, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for n in ("pre_sa_norm", "post_sa_norm"):
            params[f"{self.prefix}.{n}.weight"] = jnp.asarray(
                _require(sd, f"{self.prefix}.{n}.weight"))
        self.self_attention.convert(sd, params)
        self.mlp.convert(sd, params)

    def __call__(self, params: Params, x: Array, positions: Array,
                 mask: Array) -> Array:
        h = rms_norm(x, params[f"{self.prefix}.pre_sa_norm.weight"], self.eps)
        sa, _ = self.self_attention.self_attn(params, h, positions, mask)
        x = x + sa
        h = rms_norm(x, params[f"{self.prefix}.post_sa_norm.weight"], self.eps)
        return x + self.mlp(params, h)


class _DecoderLayer:
    def __init__(self, prefix: str, cfg: DiaConfig):
        d, e = cfg.decoder, cfg.encoder
        self.prefix = prefix
        self.self_attention = Attention(
            f"{prefix}.self_attention", d.n_embd, d.n_embd, d.gqa_query_heads,
            d.kv_heads, d.gqa_head_dim, d.n_embd,
            cfg.rope_min_timescale, cfg.rope_max_timescale)
        self.cross_attention = Attention(
            f"{prefix}.cross_attention", d.n_embd, e.n_embd, d.cross_query_heads,
            d.cross_query_heads, d.cross_head_dim, d.n_embd,
            cfg.rope_min_timescale, cfg.rope_max_timescale)
        self.mlp = MlpBlock(f"{prefix}.mlp", d.n_embd, d.n_hidden)
        self.eps = cfg.normalization_layer_epsilon
        self.n_embd = d.n_embd

    def init(self, key, params: Params) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        for n in ("pre_sa_norm", "pre_ca_norm", "pre_mlp_norm"):
            params[f"{self.prefix}.{n}.weight"] = jnp.ones((self.n_embd,), jnp.float32)
        self.self_attention.init(k1, params)
        self.cross_attention.init(k2, params)
        self.mlp.init(k3, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for n in ("pre_sa_norm", "pre_ca_norm", "pre_mlp_norm"):
            params[f"{self.prefix}.{n}.weight"] = jnp.asarray(
                _require(sd, f"{self.prefix}.{n}.weight"))
        self.self_attention.convert(sd, params)
        self.cross_attention.convert(sd, params)
        self.mlp.convert(sd, params)

    def prefill(self, params: Params, x: Array, positions: Array,
                causal_mask: Array, cross_cache: KVCacheSlot,
                cross_mask: Array, self_cache: KVCacheSlot) -> tuple[Array, KVCacheSlot]:
        h = rms_norm(x, params[f"{self.prefix}.pre_sa_norm.weight"], self.eps)
        sa, self_cache = self.self_attention.self_attn(
            params, h, positions, causal_mask, cache=self_cache, prefill=True)
        x = x + sa
        h = rms_norm(x, params[f"{self.prefix}.pre_ca_norm.weight"], self.eps)
        x = x + self.cross_attention.cross_attn(params, h, positions,
                                                cross_cache, cross_mask)
        h = rms_norm(x, params[f"{self.prefix}.pre_mlp_norm.weight"], self.eps)
        return x + self.mlp(params, h), self_cache

    def step(self, params: Params, x: Array, position: Array, index,
             self_cache: KVCacheSlot, self_mask: Array,
             cross_cache: KVCacheSlot, cross_mask: Array,
             kv_block: int = 0, kv_dot: bool = False) -> tuple[Array, KVCacheSlot]:
        h = rms_norm(x, params[f"{self.prefix}.pre_sa_norm.weight"], self.eps)
        sa, self_cache = self.self_attention.step_attn(
            params, h, position, self_cache, index, self_mask,
            kv_block=kv_block, kv_dot=kv_dot)
        x = x + sa
        h = rms_norm(x, params[f"{self.prefix}.pre_ca_norm.weight"], self.eps)
        x = x + self.cross_attention.cross_attn(params, h, position,
                                                cross_cache, cross_mask)
        h = rms_norm(x, params[f"{self.prefix}.pre_mlp_norm.weight"], self.eps)
        return x + self.mlp(params, h), self_cache


class Dia:
    """Public Dia TTS model (API mirrors Models/Dia.cs)."""

    def __init__(self, config: DiaConfig | None = None, *,
                 params: Params | None = None, seed: int = 0,
                 compute_dtype=jnp.float32):
        self.config = config or DiaConfig()
        cfg = self.config
        self.compute_dtype = compute_dtype

        self.enc_layers = [_EncoderLayer(f"encoder.layers.{i}", cfg)
                           for i in range(cfg.encoder.n_layer)]
        self.dec_layers = [_DecoderLayer(f"decoder.layers.{i}", cfg)
                           for i in range(cfg.decoder.n_layer)]
        self.logits_dense = DenseGeneral(
            "decoder.logits_dense", (cfg.decoder.n_embd,),
            (cfg.data.channels, cfg.tgt_vocab_size))
        self.dac = None  # vocoder bridge, set via load_dac_model/set_dac_model
        # int8 self-attention KV cache (serving optimization, see
        # KVCacheSlot): threaded to the jitted paths as an explicit static
        # argument — NOT read off `self` inside the trace — so toggling it
        # after a generate call can never hit a stale executable.
        self.kv_cache_int8 = False
        # block-skipped decode KV read (_blocked_decode_attn): None = auto
        # (block 512 once the generation buffer reaches 1024 — below that
        # the full read is cheap and the inner loop is pure overhead),
        # 0 = always read the full static cache, N = explicit block size.
        self.kv_read_block: int | None = None
        # int8-MXU dots against the int8 KV cache (opt-in): removes the
        # per-element K/V dequant from the blocked read at ~1% worst-case
        # relative attention error on top of the int8 cache grid
        # (tests/test_dia.py::test_blocked_decode_attn_int8_dot_bounded_error).
        # Measured 1.37x per-step at a nearly-full 3072 bucket, B=8
        # (PERF.md "int8-dot KV read"). Requires kv_cache_int8 and a
        # blocked read; ignored otherwise.
        self.kv_dot_int8 = False
        self.params: Params = params if params is not None else self.init_params(seed)

    def _resolve_kv_block(self, buffer_len: int) -> int:
        explicit = self.kv_read_block is not None
        if explicit:
            blk = int(self.kv_read_block)
        else:
            blk = 512 if buffer_len >= 1024 else 0
        if blk and buffer_len % blk:
            if explicit:  # ADVICE r4: never drop a user-requested
                # optimization silently — say why the flag was ignored
                self._notice_once(
                    f"dia: kv_read_block={blk} does not divide the "
                    f"generation buffer ({buffer_len}); falling back to "
                    f"the full-cache read")
            blk = 0  # non-divisible buffer: fall back to the full read
        return blk

    def _notice_once(self, msg: str) -> None:
        """stderr notice deduplicated per model instance: bucket resolution
        runs once per generate() call, so a serving process would otherwise
        repeat the same gating notice for every request."""
        seen = self.__dict__.setdefault("_notices_seen", set())
        if msg not in seen:
            seen.add(msg)
            print(msg, file=sys.stderr)

    def _resolve_kv_dot(self, buffer_len: int) -> bool:
        """int8-dot read applies only on the blocked path over an int8
        cache (the full-cache sdpa read keeps the dequant semantics)."""
        active = bool(self.kv_dot_int8 and self.kv_cache_int8
                      and self._resolve_kv_block(buffer_len))
        if self.kv_dot_int8 and self.kv_cache_int8 and not active:
            # ADVICE r4: the flag is inert without the blocked read (auto
            # block engages only at buffer >= 1024) — say so instead of
            # quietly running the dequant path.
            self._notice_once(
                f"dia: --kv-dot-int8 is inactive for this generation "
                f"buffer ({buffer_len}: blocked KV read is off); running "
                f"the dequant read instead")
        return active

    def enable_int8_kv_cache(self, enabled: bool = True) -> "Dia":
        """Store the decode self-attention KV cache as int8 (+ per-position
        scales). Halves the dominant per-step HBM read of long-bucket
        batched serving (the bucket-3072 serve default reads ~450 MB/step
        of masked K/V at bf16 — measured 2.45x cost, PERF.md); quality
        impact is bounded by the ~0.8% per-vector grid error and covered
        by the greedy-match test (tests/test_dia.py)."""
        self.kv_cache_int8 = bool(enabled)
        return self

    # ------------------------------------------------------------------ params

    def init_params(self, seed: int = 0) -> Params:
        cfg = self.config
        params: Params = {}
        key = jax.random.key(seed)
        keys = iter(jax.random.split(
            key, len(self.enc_layers) + len(self.dec_layers) + cfg.data.channels + 3))
        params["encoder.embedding.weight"] = 0.02 * jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.encoder.n_embd), jnp.float32)
        for layer in self.enc_layers:
            layer.init(next(keys), params)
        params["encoder.norm.weight"] = jnp.ones((cfg.encoder.n_embd,), jnp.float32)
        for c in range(cfg.data.channels):
            params[f"decoder.embeddings.{c}.weight"] = 0.02 * jax.random.normal(
                next(keys), (cfg.tgt_vocab_size, cfg.decoder.n_embd), jnp.float32)
        for layer in self.dec_layers:
            layer.init(next(keys), params)
        params["decoder.norm.weight"] = jnp.ones((cfg.decoder.n_embd,), jnp.float32)
        self.logits_dense.init(next(keys), params)
        return params

    def load_state_dict(self, sd: StateDict) -> "Dia":
        cfg = self.config
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
        params: Params = {}
        params["encoder.embedding.weight"] = jnp.asarray(
            _require(sd, "encoder.embedding.weight"))
        for layer in self.enc_layers:
            layer.convert(sd, params)
        params["encoder.norm.weight"] = jnp.asarray(_require(sd, "encoder.norm.weight"))
        for c in range(cfg.data.channels):
            params[f"decoder.embeddings.{c}.weight"] = jnp.asarray(
                _require(sd, f"decoder.embeddings.{c}.weight"))
        for layer in self.dec_layers:
            layer.convert(sd, params)
        params["decoder.norm.weight"] = jnp.asarray(_require(sd, "decoder.norm.weight"))
        self.logits_dense.convert(sd, params)
        self.params = params
        return self

    def quantize_int8(self) -> "Dia":
        """Weight-only int8 quantization of all DenseGeneral kernels.

        Decode throughput on a single chip is bound by streaming the 1.6B
        parameters from HBM each step; int8 storage halves that again over
        bf16 (dequant happens on the VMEM side of the read). Embeddings and
        norms stay in their original dtype. Quantization math runs fully
        on device (DenseGeneral.quantize_params) — the previous bulk
        ``device_get`` of the 6.4 GB f32 set cost ~20 min over the axon
        tunnel per model build. Mutates ``self.params`` in place so each
        f32 kernel frees as soon as its int8 replacement exists (peak HBM
        overhead = one kernel, not a whole second parameter set). The
        in-place trade-off (ADVICE r4): an exception partway — e.g. a
        missing key from a hand-edited state dict — leaves the model
        half-quantized and unusable; reload before retrying. Accepted
        deliberately: the alternative (build a full second dict) doubles
        peak HBM, which the 16 GB chip cannot afford at 6.4 GB f32."""
        params = self.params
        for layer in self.enc_layers:
            for dense in (*layer.self_attention._children,
                          layer.mlp.wi_fused, layer.mlp.wo):
                dense.quantize_params(params)
        for layer in self.dec_layers:
            for dense in (*layer.self_attention._children,
                          *layer.cross_attention._children,
                          layer.mlp.wi_fused, layer.mlp.wo):
                dense.quantize_params(params)
        self.logits_dense.quantize_params(params)
        self.params = _reupload_host_params(params)
        return self

    def quantize_int4(self, group_size: int = 128) -> "Dia":
        """Weight-only int4 (nibble-packed, group-wise scales) of all
        transformer DenseGeneral kernels; the logits head stays int8.

        The decode loop is parameter-bandwidth bound (PERF.md decode-loop
        accounting), so quartering the bytes per weight vs bf16 raises the
        per-step ceiling again over :meth:`quantize_int8`. The logits
        DenseGeneral projects to channels x vocab and directly shapes the
        sampling distribution, so it keeps the finer 8-bit grid (it is
        ~19M of the 1.6B parameters — its extra bytes are noise). On-device
        and in-place like :meth:`quantize_int8`."""
        params = self.params
        for layer in self.enc_layers:
            for dense in (*layer.self_attention._children,
                          layer.mlp.wi_fused, layer.mlp.wo):
                dense.quantize_params_int4(params, group_size)
        for layer in self.dec_layers:
            for dense in (*layer.self_attention._children,
                          *layer.cross_attention._children,
                          layer.mlp.wi_fused, layer.mlp.wo):
                dense.quantize_params_int4(params, group_size)
        self.logits_dense.quantize_params(params)
        self.params = _reupload_host_params(params)
        return self

    # ---------------------------------------------------------- text handling

    def encode_text(self, text: str) -> np.ndarray:
        """UTF-8 bytes with [S1]/[S2] speaker tags -> token ids
        (Dia.EncodeText :255-288)."""
        raw = text.encode("utf-8")
        raw = raw.replace(b"[S1]", b"\x01").replace(b"[S2]", b"\x02")
        max_len = self.config.data.text_length
        return np.frombuffer(raw[:max_len], dtype=np.uint8).astype(np.int64)

    def _pad_text(self, token_lists: Sequence[np.ndarray],
                  pad_to: int | None = None) -> np.ndarray:
        """Pad token lists to a power-of-two length bucket.

        The reference pads every prompt to the full ``text_length``
        (Dia.EncodeText/PrepareTextInput), which makes every decode step
        read 1024-position cross-attention K/V per layer no matter how
        short the text is. Padded positions carry exactly zero attention
        weight (they are masked to -inf before the softmax and their keys
        are zeroed in the cache), so shrinking the pad length to the
        smallest bucket >= the longest real prompt is numerically
        equivalent while cutting the dominant weight-independent
        per-step HBM read. Buckets are powers of two (floor 64) so the
        jit trace cache stays small; ``pad_to`` pins an explicit length
        (e.g. ``text_length`` for reference-identical shapes).
        """
        cfg = self.config.data
        if pad_to is None:
            longest = max((len(t) for t in token_lists), default=0)
            pad_to = 64
            while pad_to < min(longest, cfg.text_length):
                pad_to *= 2
        pad_to = min(max(pad_to, 1), cfg.text_length)
        out = np.full((len(token_lists), pad_to), cfg.text_pad_value,
                      np.int64)
        for i, tokens in enumerate(token_lists):
            n = min(len(tokens), pad_to)  # truncate prompts longer than pad_to
            out[i, :n] = tokens[:n]
        return out

    # ------------------------------------------------------------ model parts

    def _encode_fn(self, params: Params, enc_input: Array, padding_mask: Array):
        """enc_input: [2B, S] -> (enc_out [2B, S, D]).

        padding_mask: [2B, S] bool (True = real token)."""
        cfg = self.config
        x = jnp.take(params["encoder.embedding.weight"], enc_input, axis=0)
        x = x.astype(self.compute_dtype)
        positions = jnp.arange(enc_input.shape[1], dtype=jnp.int32)[None, :]
        mask = padding_mask[:, :, None] & padding_mask[:, None, :]  # [2B, S, S]
        for layer in self.enc_layers:
            x = layer(params, x, positions, mask)
        return rms_norm(x, params["encoder.norm.weight"],
                        cfg.normalization_layer_epsilon)

    def _embed_tokens(self, params: Params, tokens: Array) -> Array:
        """tokens: [2B, T, C] -> summed channel embeddings [2B, T, D]."""
        x = None
        for c in range(self.config.data.channels):
            e = jnp.take(params[f"decoder.embeddings.{c}.weight"],
                         tokens[..., c], axis=0)
            x = e if x is None else x + e
        return x.astype(self.compute_dtype)

    def _decoder_logits(self, params: Params, x: Array) -> Array:
        x = rms_norm(x, params["decoder.norm.weight"],
                     self.config.normalization_layer_epsilon)
        return self.logits_dense(params, x)  # [2B, T, C, V]

    # -------------------------------------------------------------- generation

    def _start_state(self, params: Params, text_tokens: Array, prefill: Array,
                     prefill_steps: Array, rng: Array, row_active: Array,
                     *, max_tokens: int, kv_int8: bool = False):
        """Encoder + cross caches + decoder prefill -> initial loop state.

        Returns ``(carry, cross_caches, cross_mask)`` where ``carry`` is the
        autoregressive while_loop carry consumed by :meth:`_run_loop`. Shared
        by the one-shot :meth:`_generate_jit` path and the segment-resumable
        streaming path (:meth:`_generate_start_jit` /
        :meth:`_generate_segment_jit`), so both trace the exact same ops.
        """
        cfg = self.config
        data = cfg.data
        b = text_tokens.shape[0]
        channels = data.channels
        eos = data.audio_eos_value
        pad = data.audio_pad_value
        delay = jnp.asarray(data.delay_pattern, jnp.int32)
        max_delay = int(max(data.delay_pattern))

        # ---- encoder + cross caches (CFG batch: [uncond; cond] interleaved) --
        enc_input = jnp.stack([jnp.zeros_like(text_tokens), text_tokens],
                              axis=1).reshape(2 * b, -1)
        padding_mask = (enc_input != data.text_pad_value)
        enc_out = self._encode_fn(params, enc_input, padding_mask)
        enc_positions = jnp.arange(enc_input.shape[1], dtype=jnp.int32)[None, :]
        cross_caches = [
            layer.cross_attention.precompute_cross_cache(
                params, enc_out, enc_positions, padding_mask)
            for layer in self.dec_layers
        ]
        cross_mask = padding_mask[:, None, :]  # [2B, 1, S] (dec queries all valid)

        # ---- decoder state ---------------------------------------------------
        d = cfg.decoder
        self_caches = [
            KVCacheSlot.zeros(2 * b, max_tokens, d.kv_heads, d.gqa_head_dim,
                              self.compute_dtype, quantized=kv_int8)
            for _ in self.dec_layers
        ]
        generated = jnp.full((b, max_tokens, channels), -1, jnp.int32)
        t_pre = prefill.shape[1]
        generated = jax.lax.dynamic_update_slice(
            generated, prefill.astype(jnp.int32), (0, 0, 0))

        # ---- prefill pass ----------------------------------------------------
        dec_step0 = jnp.min(prefill_steps) - 1
        # static prefill length: run over the full prompt block, masked causally
        pre_tokens = jnp.repeat(generated[:, :t_pre], 2, axis=0)
        pre_tokens = jnp.where(pre_tokens < 0, pad, pre_tokens)
        positions = jnp.arange(t_pre, dtype=jnp.int32)[None, :]
        causal = (jnp.arange(t_pre)[:, None] >= jnp.arange(t_pre)[None, :])
        causal = jnp.broadcast_to(causal[None], (2 * b, t_pre, t_pre))
        x = self._embed_tokens(params, pre_tokens)
        cross_mask_pre = jnp.broadcast_to(cross_mask, (2 * b, t_pre,
                                                       enc_input.shape[1]))
        new_self_caches = []
        for i, (layer, cache) in enumerate(zip(self.dec_layers, self_caches)):
            x, cache = layer.prefill(params, x, positions, causal,
                                     cross_caches[i], cross_mask_pre, cache)
            new_self_caches.append(cache)
        self_caches = new_self_caches

        # batch-padding rows start with countdown 0 ("already finished") so
        # they can never hold the loop open past the real rows' EOS
        carry = (dec_step0, generated,
                 jnp.zeros((b,), bool),
                 jnp.full((b,), -1, jnp.int32),
                 jnp.where(row_active, -1, 0).astype(jnp.int32),
                 self_caches, rng, dec_step0)
        return carry, cross_caches, cross_mask

    def _run_loop(self, params: Params, carry, cross_caches, cross_mask,
                  prefill_steps: Array, token_limit: Array, stop,
                  *, max_tokens: int, temperature: float, top_k: int,
                  top_p: float, cfg_scale: float, kv_block: int = 0,
                  kv_dot: bool = False):
        """Run the autoregressive while_loop from ``carry`` until ``stop``
        (exclusive step bound, dynamic or static) or until every row's EOS
        countdown drains. Returns the advanced carry — resumable, so a host
        caller can step the generation in segments (streaming TTS) with the
        KV caches staying on device between calls."""
        cfg = self.config
        data = cfg.data
        b = carry[1].shape[0]
        channels = data.channels
        eos = data.audio_eos_value
        pad = data.audio_pad_value
        delay = jnp.asarray(data.delay_pattern, jnp.int32)
        max_delay = int(max(data.delay_pattern))

        # ---- autoregressive while_loop --------------------------------------
        slots = jnp.arange(max_tokens, dtype=jnp.int32)

        def cond(carry):
            step, _, _, _, countdown, _, _, _ = carry
            return (step < stop) & ~jnp.all(countdown == 0)

        def body(carry):
            (step, generated, eos_detected, finished, countdown, caches,
             rng, _) = carry
            tokens = jax.lax.dynamic_slice_in_dim(generated, step, 1, axis=1)
            tokens = jnp.repeat(tokens, 2, axis=0)          # [2B, 1, C]
            tokens = jnp.where(tokens < 0, pad, tokens)
            position = jnp.full((2 * b, 1), step, jnp.int32)
            self_mask = jnp.broadcast_to((slots <= step)[None, None, :],
                                         (2 * b, 1, max_tokens))
            x = self._embed_tokens(params, tokens)
            new_caches = []
            for i, layer in enumerate(self.dec_layers):
                x, cache = layer.step(params, x, position, step, caches[i],
                                      self_mask, cross_caches[i], cross_mask,
                                      kv_block=kv_block, kv_dot=kv_dot)
                new_caches.append(cache)
            logits = self._decoder_logits(params, x)         # [2B, 1, C, V]
            logits = logits[:, -1].reshape(b, 2, channels, -1).astype(jnp.float32)
            uncond, cond_l = logits[:, 0], logits[:, 1]
            logits = cond_l + cfg_scale * (cond_l - uncond)  # [B, C, V]

            # invalid-token masking (Dia.DecoderStep :535-541)
            v = logits.shape[-1]
            vocab_idx = jnp.arange(v)
            logits = jnp.where(vocab_idx[None, None, :] > eos, -jnp.inf, logits)
            ch_idx = jnp.arange(channels)
            non_first = (ch_idx[None, :, None] >= 1) & (vocab_idx[None, None, :] >= eos)
            logits = jnp.where(non_first, -jnp.inf, logits)
            logits = logits.at[:, 0, eos].multiply(0.8)

            # Per-row sampling keys (fold_in of the step key by row index):
            # the noise drawn for row i depends only on (seed, step, i), not
            # on the padded batch size, so batch bucketing (padding B to a
            # power of two) is exactly reproducible at temperature > 0 —
            # jax.random.categorical over the whole [B*C, V] block would
            # pair its counter stream with the total element count and give
            # real rows different tokens whenever B changes.
            rng, sample_key = jax.random.split(rng)
            row_keys = jax.vmap(
                lambda i: jax.random.fold_in(sample_key, i))(jnp.arange(b))
            pred = jax.vmap(
                lambda lg, k: _sample_next_token(lg, k, temperature, top_k,
                                                 top_p, eos)
            )(logits, row_keys)  # [B, C]

            # EOS detection + countdown (Dia.Generate :688-745)
            step_idx = step + 1
            active = countdown != 0
            is_eos = (~eos_detected) & (pred[:, 0] == eos) & active
            is_max = step_idx >= (token_limit - max_delay)
            trigger = active & (is_eos | is_max)
            eos_detected = eos_detected | trigger
            start = trigger & (countdown < 0)
            countdown = jnp.where(start, max_delay, countdown)
            finished = jnp.where(start, step_idx, finished)
            padding_rows = countdown > 0
            step_after = (max_delay - countdown)[:, None]
            pred = jnp.where(padding_rows[:, None] & (step_after == delay[None, :]),
                             eos, pred)
            pred = jnp.where(padding_rows[:, None] & (step_after > delay[None, :]),
                             pad, pred)
            countdown = jnp.where(padding_rows, countdown - 1, countdown)

            # BOS-protected writeback (DecoderOutput.UpdateOne :71-86)
            bos_over = (step - jnp.max(prefill_steps)) > max_delay
            existing = jax.lax.dynamic_slice_in_dim(generated, step_idx, 1,
                                                    axis=1)[:, 0]
            keep = (existing != -1) & ~bos_over
            new_vals = jnp.where(keep, existing, pred)
            generated = jax.lax.dynamic_update_slice_in_dim(
                generated, new_vals[:, None], step_idx, axis=1)
            return (step + 1, generated, eos_detected, finished, countdown,
                    new_caches, rng, step_idx)

        return jax.lax.while_loop(cond, body, carry)

    @functools.partial(jax.jit, static_argnames=("self", "max_tokens", "temperature",
                                                 "top_k", "top_p", "cfg_scale",
                                                 "kv_int8", "kv_block",
                                                 "kv_dot"))
    def _generate_jit(self, params: Params, text_tokens: Array, prefill: Array,
                      prefill_steps: Array, rng: Array, token_limit: Array,
                      row_active: Array, *, max_tokens: int, temperature: float,
                      top_k: int, top_p: float, cfg_scale: float,
                      kv_int8: bool = False, kv_block: int = 0,
                      kv_dot: bool = False):
        """The whole generation pipeline on device.

        text_tokens: [B, S] int; prefill: [B, Tpre, C] delayed prompt tokens;
        prefill_steps: [B] int32. Returns (generated [B, maxT, C],
        finished_step [B], lengths [B]).

        ``max_tokens`` (static) sizes the generation buffer and KV caches;
        ``token_limit`` (dynamic, <= max_tokens) is where EOS is forced.
        Splitting the two lets callers bucket the compiled buffer length
        while honoring the exact requested limit, so serving different
        ``max_tokens`` values reuses one executable per bucket.
        """
        carry, cross_caches, cross_mask = self._start_state(
            params, text_tokens, prefill, prefill_steps, rng, row_active,
            max_tokens=max_tokens, kv_int8=kv_int8)
        # stop is the static python int max_tokens - 1, so this traces the
        # exact same while_loop as before the streaming split
        (final_step, generated, _, finished, _, _, _, _) = self._run_loop(
            params, carry, cross_caches, cross_mask, prefill_steps,
            token_limit, max_tokens - 1, max_tokens=max_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            cfg_scale=cfg_scale, kv_block=kv_block, kv_dot=kv_dot)

        max_delay = int(max(self.config.data.delay_pattern))
        finished = jnp.where(finished == -1, final_step + 1 - max_delay, finished)
        lengths = jnp.clip(finished - prefill_steps, 0)
        return generated, finished, lengths

    @functools.partial(jax.jit, static_argnames=("self", "max_tokens",
                                                 "kv_int8"))
    def _generate_start_jit(self, params: Params, text_tokens: Array,
                            prefill: Array, prefill_steps: Array, rng: Array,
                            row_active: Array, *, max_tokens: int,
                            kv_int8: bool = False):
        """Streaming entry: encoder + prefill only, returning the resumable
        loop carry (KV caches stay on device across segment calls)."""
        return self._start_state(params, text_tokens, prefill, prefill_steps,
                                 rng, row_active, max_tokens=max_tokens,
                                 kv_int8=kv_int8)

    @functools.partial(jax.jit, static_argnames=("self", "max_tokens",
                                                 "temperature", "top_k",
                                                 "top_p", "cfg_scale",
                                                 "kv_block", "kv_dot"))
    def _generate_segment_jit(self, params: Params, carry, cross_caches,
                              cross_mask, prefill_steps: Array,
                              token_limit: Array, seg_end: Array,
                              *, max_tokens: int, temperature: float,
                              top_k: int, top_p: float, cfg_scale: float,
                              kv_block: int = 0, kv_dot: bool = False):
        """Advance the generation loop until ``seg_end`` (dynamic) or EOS.

        One executable serves every segment length — ``seg_end`` is a traced
        operand, so the host can stream tokens in arbitrary-size slices
        without recompiling."""
        return self._run_loop(
            params, carry, cross_caches, cross_mask, prefill_steps,
            token_limit, jnp.minimum(seg_end, max_tokens - 1),
            max_tokens=max_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, cfg_scale=cfg_scale, kv_block=kv_block,
            kv_dot=kv_dot)

    def generate_codes(self, texts: Sequence[str], *, max_tokens: int | None = None,
                       cfg_scale: float | None = None, temperature: float | None = None,
                       top_p: float | None = None, top_k: int | None = None,
                       audio_prompts: Sequence[np.ndarray] | None = None,
                       seed: int = 0, verbose: bool = False,
                       pad_text_to: int | None = None,
                       pad_tokens_to: int | None = None,
                       pad_batch_to: int | None = None):
        """Generate delay-reverted DAC codes per batch item.

        Returns (codes [B, L, C] int32 in [0, 1023], lengths [B]).

        The three ``pad_*_to`` knobs pin compiled shapes; by default each
        axis is bucketed to the next power of two (text prompt length,
        generation-buffer length, batch size) so a serving process reuses
        one executable per bucket instead of recompiling per request
        shape. Bucketing is semantically inert: EOS is still forced at
        the exact requested ``max_tokens`` (dynamic ``token_limit``),
        batch-padding rows are masked out of the loop's exit condition
        and sliced off, text padding carries zero attention weight, and
        sampling keys are derived per row (fold_in by row index), so a
        seeded generation draws identical noise at any padded batch size
        — including at temperature > 0.
        """
        cfg = self.config
        data = cfg.data
        requested = int(max_tokens or data.audio_length)
        if pad_tokens_to is None:
            pad_tokens_to = 64
            while pad_tokens_to < requested:
                pad_tokens_to *= 2
            # the model's own ceiling is a better bucket than the next pow2
            pad_tokens_to = min(pad_tokens_to, max(data.audio_length, requested))
        buffer_len = max(int(pad_tokens_to), requested)
        b_real = len(texts)
        if pad_batch_to is None:
            pad_batch_to = 1
            while pad_batch_to < b_real:
                pad_batch_to *= 2
        b = max(int(pad_batch_to), b_real)
        texts = list(texts) + [""] * (b - b_real)
        if audio_prompts:
            audio_prompts = list(audio_prompts) + [None] * (b - b_real)
        text_arr = self._pad_text([self.encode_text(t) for t in texts],
                                  pad_to=pad_text_to)
        max_delay = max(data.delay_pattern)

        # audio prompt prefill (Dia.PrepareAudioPrompt :312-424)
        if audio_prompts:
            prompt_len = max(0 if p is None else len(p) for p in audio_prompts)
        else:
            prompt_len = 0
        t_pre = prompt_len + max_delay
        prefill = np.full((b, max(t_pre, max_delay + 1), data.channels), -1, np.int64)
        prefill[:, 0, :] = data.audio_bos_value
        prefill_steps = np.ones((b,), np.int32)
        if audio_prompts:
            for i, prompt in enumerate(audio_prompts):
                if prompt is not None:
                    prefill[i, 1:1 + len(prompt)] = np.asarray(prompt)
                    prefill_steps[i] = len(prompt) + 1
        if b_real and b > b_real:
            # batch-padding rows must not pull the loop's start step
            # (min over prefill_steps) below the real rows' minimum
            prefill_steps[b_real:] = prefill_steps[:b_real].min()
        delayed = apply_audio_delay(jnp.asarray(prefill), -1,
                                    data.audio_bos_value, data.delay_pattern)

        import time as _time

        start_time = _time.perf_counter()
        generated, finished, lengths = self._generate_jit(
            self.params, jnp.asarray(text_arr), delayed,
            jnp.asarray(prefill_steps), jax.random.key(seed),
            jnp.int32(requested), jnp.arange(b) < b_real,
            max_tokens=int(buffer_len),
            temperature=float(cfg.temperature if temperature is None else temperature),
            top_k=int(cfg.top_k if top_k is None else top_k),
            top_p=float(cfg.top_p if top_p is None else top_p),
            cfg_scale=float(cfg.cfg_scale if cfg_scale is None else cfg_scale),
            kv_int8=self.kv_cache_int8,
            kv_block=self._resolve_kv_block(int(buffer_len)),
            kv_dot=self._resolve_kv_dot(int(buffer_len)))

        # drop batch-padding rows before any length accounting
        generated = np.asarray(generated)[:b_real]  # forces completion
        lengths = np.asarray(lengths)[:b_real]
        finished = np.asarray(finished)[:b_real]
        b = b_real
        if verbose:
            # tokens/s + realtime factor reporting (Models/Dia.cs:758-812;
            # 86 tokens = 1 s of audio)
            elapsed = _time.perf_counter() - start_time
            steps = int(finished.max()) if finished.size else 0
            if elapsed > 0 and steps > 0:
                print(f"generate: {steps} steps in {elapsed:.2f}s = "
                      f"{steps * b_real / elapsed:.1f} tokens/s, "
                      f"realtime factor {steps / 86.0 / elapsed:.2f}x")
        # extract + revert delay (Dia.Generate :764-795, GenerateOutput :1010-1045)
        max_len = int(lengths.max()) + max_delay if b else 0
        codes_batch = np.full((b, max(max_len, 1), data.channels),
                              data.audio_pad_value, np.int64)
        for i in range(b):
            start = int(prefill_steps[i])
            actual = int(lengths[i]) + max_delay
            codes_batch[i, :actual] = generated[i, start:start + actual]
        reverted = np.asarray(revert_audio_delay(
            jnp.asarray(codes_batch), data.audio_pad_value, data.delay_pattern))
        if max_len > max_delay:
            reverted = reverted[:, :-max_delay]
        invalid = (reverted < 0) | (reverted > 1023)
        reverted = np.where(invalid, 0, reverted)
        return reverted.astype(np.int32), lengths

    def generate(self, texts: Sequence[str],
                 audio_prompt_paths: Sequence[str] | None = None,
                 **kwargs) -> list[np.ndarray]:
        """Full TTS: text -> waveforms via the DAC vocoder
        (Dia.Generate + GenerateOutput). ``audio_prompt_paths`` are WAV
        voice-clone prompts, DAC-encoded on the fly (Dia.LoadAudioPrompts)."""
        if self.dac is None:
            raise RuntimeError(
                "No DAC vocoder attached; call load_dac_model()/set_dac_model()")
        if audio_prompt_paths:
            prompts = [self.load_audio_prompt(p) for p in audio_prompt_paths]
            kwargs.setdefault("audio_prompts", prompts)
        codes, lengths = self.generate_codes(texts, **kwargs)
        # vocode items of equal code length as ONE batched DAC decode:
        # a served burst shares max_tokens, so its streams usually finish
        # at the same length and the whole batch decodes in one device
        # call (the per-item loop serialized B decoder dispatches).
        # Grouping by exact length keeps outputs bit-identical to the
        # per-item decode — no cross-stream padding is ever introduced.
        by_len: dict[int, list[int]] = {}
        for i in range(codes.shape[0]):
            by_len.setdefault(max(int(lengths[i]), 1), []).append(i)
        wavs: dict[int, np.ndarray] = {}
        for length, idxs in by_len.items():
            stacked = np.stack([codes[i, :length].T for i in idxs])  # [G, C, L]
            decoded = self.dac.from_codes(stacked)                   # [G, L*hop]
            for g, i in enumerate(idxs):
                wavs[i] = np.asarray(decoded[g])
        audios = []
        for i in range(codes.shape[0]):
            wav = wavs[i]
            factor = self._speed_factor(len(texts[i]))
            if abs(factor - 1.0) > 1e-6:
                from neuralcodecs_tpu.dsp.resample import resample_poly

                sr = self.config.sample_rate
                wav = np.asarray(resample_poly(wav, int(sr * factor), sr))
            audios.append(wav)
        return audios

    def generate_codes_stream(self, text: str, *, segment_tokens: int = 64,
                              max_tokens: int | None = None,
                              cfg_scale: float | None = None,
                              temperature: float | None = None,
                              top_p: float | None = None,
                              top_k: int | None = None,
                              audio_prompt: np.ndarray | None = None,
                              seed: int = 0, pad_text_to: int | None = None,
                              pad_tokens_to: int | None = None):
        """Incremental generation for ONE text: yields ``(codes_block, done)``.

        Each yielded ``codes_block`` is ``[n, C]`` int32 delay-reverted DAC
        codes — concatenating every block reproduces ``generate_codes([text])``
        exactly (same seed, same buckets, same RNG stream: the loop carry,
        including the per-step split key and donatable KV caches, stays on
        device between segment dispatches; only scalars come back to the
        host). A frame is emitted once all of its delayed channels are
        decoded, i.e. emission lags the decode head by ``max(delay_pattern)``
        steps. First-codes latency is therefore ~``segment_tokens`` steps
        instead of the whole generation (the streaming counterpart of the
        reference's one-shot Dia.Generate, Models/Dia.cs:615-820).
        """
        cfg = self.config
        data = cfg.data
        channels = data.channels
        requested = int(max_tokens or data.audio_length)
        if pad_tokens_to is None:
            pad_tokens_to = 64
            while pad_tokens_to < requested:
                pad_tokens_to *= 2
            pad_tokens_to = min(pad_tokens_to, max(data.audio_length, requested))
        buffer_len = max(int(pad_tokens_to), requested)
        text_arr = self._pad_text([self.encode_text(text)], pad_to=pad_text_to)
        max_delay = max(data.delay_pattern)

        prompt_len = 0 if audio_prompt is None else len(audio_prompt)
        t_pre = prompt_len + max_delay
        prefill = np.full((1, max(t_pre, max_delay + 1), channels), -1, np.int64)
        prefill[:, 0, :] = data.audio_bos_value
        prefill_steps = np.ones((1,), np.int32)
        if audio_prompt is not None:
            prefill[0, 1:1 + prompt_len] = np.asarray(audio_prompt)
            prefill_steps[0] = prompt_len + 1
        delayed = apply_audio_delay(jnp.asarray(prefill), -1,
                                    data.audio_bos_value, data.delay_pattern)

        statics = dict(
            max_tokens=int(buffer_len),
            temperature=float(cfg.temperature if temperature is None else temperature),
            top_k=int(cfg.top_k if top_k is None else top_k),
            top_p=float(cfg.top_p if top_p is None else top_p),
            cfg_scale=float(cfg.cfg_scale if cfg_scale is None else cfg_scale),
            kv_block=self._resolve_kv_block(int(buffer_len)),
            kv_dot=self._resolve_kv_dot(int(buffer_len)))
        steps_dev = jnp.asarray(prefill_steps)
        carry, cross_caches, cross_mask = self._generate_start_jit(
            self.params, jnp.asarray(text_arr), delayed, steps_dev,
            jax.random.key(seed), jnp.ones((1,), bool),
            max_tokens=int(buffer_len), kv_int8=self.kv_cache_int8)
        token_limit = jnp.int32(requested)
        start = int(prefill_steps[0])
        emitted = 0
        delay = list(data.delay_pattern)
        while True:
            step = int(carry[0])
            seg_end = jnp.int32(min(step + int(segment_tokens), buffer_len - 1))
            carry = self._generate_segment_jit(
                self.params, carry, cross_caches, cross_mask, steps_dev,
                token_limit, seg_end, **statics)
            step = int(carry[0])
            countdown = np.asarray(carry[4])
            done = bool(step >= buffer_len - 1) or bool(np.all(countdown == 0))
            if done:
                finished = int(np.asarray(carry[3])[0])
                if finished == -1:
                    finished = step + 1 - max_delay
                frames_avail = max(finished - start, 0)
            else:
                # frame f is complete once row start+f+max_delay is written
                frames_avail = max(step - start - max_delay + 1, 0)
            if frames_avail > emitted or done:
                gen = np.asarray(carry[1][0])  # [maxT, C]
                block = np.zeros((frames_avail - emitted, channels), np.int64)
                for c, dly in enumerate(delay):
                    lo = start + emitted + dly
                    block[:, c] = gen[lo:lo + frames_avail - emitted, c]
                block = np.where((block < 0) | (block > 1023), 0, block)
                yield block.astype(np.int32), done
                emitted = frames_avail
            if done:
                return

    def generate_stream(self, text: str, *,
                        audio_prompt_path: str | None = None,
                        **kwargs):
        """Streaming TTS: yields ``(sample_rate, audio_chunk)`` float32 arrays
        as the generation proceeds.

        Each code segment is vocoded with a halo of
        ``decoder_receptive_field_frames`` frames on both sides, so interior
        samples match the one-shot ``generate`` decode exactly; emission of
        audio lags the code head by one halo (the right context a non-causal
        decoder needs). The dynamic-slowdown resample (``_speed_factor``)
        is NOT applied on the streaming path — it is a whole-utterance
        post-process that would seam across chunks; callers that need it can
        resample the concatenated stream.
        """
        if self.dac is None:
            raise RuntimeError(
                "No DAC vocoder attached; call load_dac_model()/set_dac_model()")
        from neuralcodecs_tpu.ops.chunking import decoder_receptive_field_frames

        dcfg = self.dac.config
        halo = decoder_receptive_field_frames(list(dcfg.decoder_rates))
        hop = dcfg.hop_length
        sr = dcfg.sample_rate
        if audio_prompt_path is not None:
            kwargs.setdefault("audio_prompt",
                              self.load_audio_prompt(audio_prompt_path))
        codes_buf = np.zeros((0, self.config.data.channels), np.int32)
        sent = 0  # frames whose audio has been yielded
        for block, done in self.generate_codes_stream(text, **kwargs):
            codes_buf = np.concatenate([codes_buf, block], axis=0)
            total = len(codes_buf)
            emit_to = total if done else max(total - halo, sent)
            if emit_to > sent or (done and total == 0):
                if total == 0:
                    yield sr, np.zeros((0,), np.float32)
                    return
                lo = max(sent - halo, 0)
                hi = min(total, emit_to + halo)
                seg = codes_buf[lo:hi]  # [n, C]
                audio = np.asarray(self.dac.from_codes(seg.T[None]))[0]
                chunk = audio[(sent - lo) * hop:(emit_to - lo) * hop]
                yield sr, np.asarray(chunk, np.float32)
                sent = emit_to

    def _speed_factor(self, text_length: int) -> float:
        """Dynamic slowdown factor (Dia.GenerateOutput :1050-1065)."""
        cfg = self.config
        if cfg.slowdown_mode == "static":
            return cfg.static_slowdown_factor
        if text_length <= cfg.dynamic_slowdown_start_length:
            return 1.0
        frac = min(1.0, (text_length - cfg.dynamic_slowdown_start_length)
                   / (cfg.dynamic_slowdown_max_length - cfg.dynamic_slowdown_start_length))
        return 1.0 - cfg.dynamic_slowdown_max_percent * frac

    # -------------------------------------------------------------- DAC bridge

    def load_audio_prompt(self, path) -> np.ndarray:
        """Load a voice-clone prompt WAV and encode it to delay-channel codes
        (counterpart of Dia.LoadAudio + DAC.Encode, Models/Dia.cs:827-877).

        Returns [T_codes, C] int codes suitable for ``generate_codes``'s
        ``audio_prompts`` argument."""
        if self.dac is None:
            raise RuntimeError("load_audio_prompt requires an attached DAC model")
        from neuralcodecs_tpu.dsp.signal import AudioSignal

        signal = AudioSignal.load(path).to_mono().resample(
            self.dac.config.sample_rate)
        audio = np.asarray(signal.audio_data[0, 0])
        _, codes, _, _, _ = self.dac.encode(audio,
                                            n_quantizers=self.config.data.channels)
        return np.asarray(codes)[0].T  # [T, C]

    def set_dac_model(self, dac) -> None:
        self.dac = dac

    def load_dac_model(self, source: str = "descript/dac_44khz") -> None:
        """Counterpart of Dia.LoadDacModel (Models/Dia.cs:121-138)."""
        from neuralcodecs_tpu.core.loader import load_dac

        self.dac = load_dac(source)


def _sample_next_token(logits: Array, key: Array, temperature: float,
                       top_k: int | None, top_p: float,
                       eos_value: int | None) -> Array:
    """Temperature / top-k / top-p sampling (Dia.SampleNextToken :420-501).

    logits: [N, V] f32 -> [N] int32.
    """
    if temperature < 1e-5:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if eos_value is not None and eos_value >= 0:
        # mask EOS unless it is already the argmax
        top = jnp.argmax(logits, axis=-1)
        mask_eos = top != eos_value
        v_idx = jnp.arange(logits.shape[-1])
        logits = jnp.where(mask_eos[:, None] & (v_idx[None, :] == eos_value),
                           -jnp.inf, logits)
    logits = logits / temperature
    if top_k is not None and top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
        cumulative = jnp.cumsum(sorted_probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (first always kept)
        cutoff_count = jnp.sum(cumulative <= top_p, axis=-1, keepdims=True)
        sorted_keep = jnp.take_along_axis(
            sorted_probs, jnp.minimum(cutoff_count, probs.shape[-1] - 1), axis=-1)
        logits = jnp.where(probs < sorted_keep, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def release_generation_caches() -> None:
    """Drop every compiled Dia generation executable.

    The jitted generation entry points hold ``self`` as a static argument,
    so their caches keep strong references to every Dia instance they ever
    traced — including its full parameter set in HBM (6.4 GB f32 /
    1.7 GB int8 at full size). A process that builds several models in
    sequence (bench mode sweeps, serving reloads) must call this between
    models or the chip accumulates dead parameter sets until
    RESOURCE_EXHAUSTED (observed in the round-4 bench: the retained bf16
    model OOMed the int8 build)."""
    for fn in (Dia._generate_jit, Dia._generate_start_jit,
               Dia._generate_segment_jit):
        try:
            fn.clear_cache()
        except Exception:
            pass


def _factory(config: DiaConfig, **kwargs) -> Dia:
    return Dia(config, **kwargs)


registry.register("dia", _factory, DiaConfig)
