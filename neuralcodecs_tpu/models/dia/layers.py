"""Dia transformer building blocks.

Rebuild of /root/reference/NeuralCodecs.Torch/Modules/Dia/{DenseGeneral,
RMSNorm,RotaryEmbedding,MlpBlock,SelfAttention,CrossAttention,KVCache}.cs.

Canonical weight layout note: DenseGeneral kernels are stored
``[in_shapes..., out_features...]`` in the Dia checkpoints
(DenseGeneral.cs:24-35) — exactly the layout a jnp tensordot wants, so
import is copy-through with no transposes.

Attention specifics preserved from the reference: RoPE is the split-half
(first/second) rotation with a timescale table (RotaryEmbedding.cs:34-66),
attention uses scale=1.0 (SelfAttention.cs:196-204 — the q projection is
trained to fold the 1/√d), and GQA repeats K/V heads across query groups.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.models.layers import Params, StateDict, _require

Array = jax.Array


def rms_norm(x: Array, weight: Array, eps: float = 1e-5) -> Array:
    """f32 RMS norm (RMSNorm.cs:35-47)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def rope_timescale(head_dim: int, min_timescale: float = 1.0,
                   max_timescale: float = 10000.0) -> np.ndarray:
    fraction = 2.0 * np.arange(head_dim // 2, dtype=np.float32) / head_dim
    return (min_timescale * (max_timescale / min_timescale) ** fraction).astype(np.float32)


def apply_rope(x: Array, positions: Array, timescale: Array) -> Array:
    """x: [B, T, H, Dh]; positions: [B, T] (or [1, T]). Split-half rotation."""
    sinusoid = positions[..., None, None].astype(jnp.float32) / timescale
    sin, cos = jnp.sin(sinusoid), jnp.cos(sinusoid)
    x32 = x.astype(jnp.float32)
    first, second = jnp.split(x32, 2, axis=-1)
    out = jnp.concatenate([first * cos - second * sin,
                           second * cos + first * sin], axis=-1)
    return out.astype(x.dtype)


def sdpa_gqa(q: Array, k: Array, v: Array, mask: Array | None,
             scale: float = 1.0) -> Array:
    """q: [B, T, Nq, Dh]; k/v: [B, S, Nkv, Dh]; mask: [B, T, S] bool
    (True = attend), shared across heads. Returns [B, T, Nq, Dh]."""
    b, t, nq, dh = q.shape
    nkv = k.shape[2]
    groups = nq // nkv
    q = q.reshape(b, t, nkv, groups, dh)
    logits = jnp.einsum("btkgd,bskd->bkgts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    # guard fully-masked rows (softmax of all -inf -> nan)
    weights = jnp.nan_to_num(weights).astype(q.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", weights, v)
    return out.reshape(b, t, nq, dh)


class DenseGeneral:
    """tensordot layer with kernel [in..., out...] (DenseGeneral.cs)."""

    def __init__(self, prefix: str, in_shapes: tuple[int, ...],
                 out_features: tuple[int, ...]):
        self.prefix = prefix
        self.in_shapes = in_shapes
        self.out_features = out_features

    def init(self, key, params: Params) -> None:
        fan_in = int(np.prod(self.in_shapes))
        std = 1.0 / math.sqrt(fan_in)
        params[f"{self.prefix}.weight"] = std * jax.random.normal(
            key, (*self.in_shapes, *self.out_features), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        w = _require(sd, f"{self.prefix}.weight")
        expected = (*self.in_shapes, *self.out_features)
        if tuple(w.shape) != expected:
            raise ValueError(f"{self.prefix}.weight {w.shape} != {expected}")
        params[f"{self.prefix}.weight"] = jnp.asarray(w)

    def __call__(self, params: Params, x: Array) -> Array:
        q4 = params.get(f"{self.prefix}.weight_q4")
        if q4 is not None:
            return self._int4_matmul(params, x, q4)
        q8 = params.get(f"{self.prefix}.weight_q8")
        if q8 is not None:
            # weight-only int8: HBM streams 1 byte/param; dequant fuses into
            # the VMEM-side matmul read (decode is parameter-bandwidth bound).
            # Applying the per-output scale to the dot RESULT instead (it
            # commutes with the contraction) was measured slightly SLOWER on
            # chip (B1 249 vs 268 tok/s, B8 829 vs 845 aggregate): XLA
            # already fuses convert+scale into the operand read, so the
            # output-side multiply only adds a non-fused epilogue (PERF.md).
            scale = params[f"{self.prefix}.weight_scale"]
            w = q8.astype(x.dtype) * scale.astype(x.dtype)
        else:
            w = params[f"{self.prefix}.weight"].astype(x.dtype)
        n_in = len(self.in_shapes)
        axes = (tuple(range(x.ndim - n_in, x.ndim)), tuple(range(n_in)))
        return jax.lax.dot_general(
            x, w, dimension_numbers=(axes, ((), ())),
            preferred_element_type=x.dtype)

    def quantize_params(self, params: Params) -> None:
        """Replace this kernel in-place with int8 data + per-output scales
        (weight-only quantization; amax over the contracted in-dims).

        Runs ON DEVICE: the round-3 implementation pulled the full f32
        parameter set to the host first (a 6.4 GB device_get — ~20 min
        over the axon tunnel, measured round 4), quantized in numpy, and
        re-uploaded. jnp ops enqueue asynchronously, so the whole
        quantization is a few hundred pipelined device ops and zero
        host↔device weight traffic."""
        w = jnp.asarray(params[f"{self.prefix}.weight"], jnp.float32)
        n_in = len(self.in_shapes)
        in_axes = tuple(range(n_in))
        amax = jnp.max(jnp.abs(w), axis=in_axes, keepdims=True)
        scale = amax / 127.0
        q8 = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -127, 127)
        params[f"{self.prefix}.weight_q8"] = q8.astype(jnp.int8)
        params[f"{self.prefix}.weight_scale"] = scale
        del params[f"{self.prefix}.weight"]

    def quantize_params_int4(self, params: Params,
                             group_size: int = 128) -> None:
        """Replace this kernel with nibble-packed int4 + group-wise scales.

        Weight-only int4 halves the decode loop's HBM weight stream again
        over int8 (the measured per-step bound, PERF.md). Two int4 values
        pack into one int8 byte along the CONTRACTED dim: even rows in the
        low nibble, odd rows in the high nibble. Group-wise scales (amax
        over ``group_size`` consecutive in-rows, per output channel) keep
        the 4-bit grid tight; groups fall back to per-output-channel
        (one group) when ``group_size`` does not divide the in-dim.

        Storage: ``weight_q4`` int8 [K/2, N] + ``weight_scale4`` f32
        [K/G, N] — 0.5 + 4/G bytes per parameter. The int4 jnp dtype is
        deliberately NOT used: this platform cannot device_put S4 layouts
        across the jit boundary, and nibble unpacking is two VPU shifts
        that fuse into the matmul operand read.
        """
        w = jnp.asarray(params[f"{self.prefix}.weight"], jnp.float32)
        k = int(np.prod(self.in_shapes))
        n = int(np.prod(self.out_features))
        if k % 2:
            # cannot nibble-pack an odd contracted dim; int8 is the
            # next-best weight-only format (never hit by Dia's dims)
            self.quantize_params(params)
            return
        w2 = w.reshape(k, n)
        g = group_size
        if g % 2 or k % g:
            g = k  # per-output-channel fallback
        wg = w2.reshape(k // g, g, n)
        amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)     # [K/G, 1, N]
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int32)
        q = q.reshape(k, n)
        packed = ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(jnp.uint8)
        params[f"{self.prefix}.weight_q4"] = jax.lax.bitcast_convert_type(
            packed, jnp.int8)
        params[f"{self.prefix}.weight_scale4"] = scale[:, 0, :]
        del params[f"{self.prefix}.weight"]

    def _int4_matmul(self, params: Params, x: Array, q4: Array) -> Array:
        """Dequantized matmul over nibble-packed int4 weights.

        The even/odd-row split avoids re-interleaving the unpacked halves
        (which would materialize a full-width weight tensor): contract the
        even input rows against the low nibbles and the odd rows against
        the high nibbles in two half-K dots that XLA schedules back to
        back, each with shift+convert+scale fused into its operand read
        (same fusion the int8 path relies on)."""
        scale = params[f"{self.prefix}.weight_scale4"]
        k2, nf = q4.shape
        k = 2 * k2
        n_groups = scale.shape[0]
        g = k // n_groups
        # arithmetic int8 shifts sign-extend each nibble
        w_even = (jnp.left_shift(q4, 4) >> 4).astype(x.dtype)
        w_odd = (q4 >> 4).astype(x.dtype)
        sg = scale.astype(x.dtype)[:, None, :]               # [K/G, 1, N]
        w_even = (w_even.reshape(n_groups, g // 2, nf) * sg).reshape(k2, nf)
        w_odd = (w_odd.reshape(n_groups, g // 2, nf) * sg).reshape(k2, nf)
        n_in = len(self.in_shapes)
        batch_shape = x.shape[:x.ndim - n_in]
        xb = x.reshape(*batch_shape, k)
        dn = (((xb.ndim - 1,), (0,)), ((), ()))
        y = jax.lax.dot_general(xb[..., 0::2], w_even, dimension_numbers=dn,
                                preferred_element_type=x.dtype)
        y = y + jax.lax.dot_general(xb[..., 1::2], w_odd,
                                    dimension_numbers=dn,
                                    preferred_element_type=x.dtype)
        return y.reshape(*batch_shape, *self.out_features)



class MlpBlock:
    """Fused gate+up projection [.., 2, I] -> silu(gate)·up -> wo (MlpBlock.cs)."""

    def __init__(self, prefix: str, embed_dim: int, intermediate_dim: int):
        self.wi_fused = DenseGeneral(f"{prefix}.wi_fused", (embed_dim,),
                                     (2, intermediate_dim))
        self.wo = DenseGeneral(f"{prefix}.wo", (intermediate_dim,), (embed_dim,))

    def init(self, key, params: Params) -> None:
        k1, k2 = jax.random.split(key)
        self.wi_fused.init(k1, params)
        self.wo.init(k2, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        self.wi_fused.convert(sd, params)
        self.wo.convert(sd, params)

    def __call__(self, params: Params, x: Array) -> Array:
        fused = self.wi_fused(params, x)          # [..., 2, I]
        gate, up = fused[..., 0, :], fused[..., 1, :]
        return self.wo(params, jax.nn.silu(gate) * up)


def _quantize_kv(x: Array) -> tuple[Array, Array]:
    """Per-(batch, position, head) int8 quantization over the head dim:
    scale = amax/127 so the 128-dim vector keeps ~0.8% relative grid error."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = amax / 127.0
    q = jnp.round(x32 / jnp.maximum(scale, 1e-12)[..., None])
    return q.astype(jnp.int8), scale


class KVCacheSlot(NamedTuple):
    """Preallocated decode cache: [B, maxT, Nkv, Dh] pair.

    Optionally int8-quantized (KVCache.cs:9-105 holds f32; the int8 form is
    a TPU serving optimization): the decode loop reads the FULL static
    cache every step (masked), so at the model-ceiling generation bucket
    (3072) the per-step K/V read is ~450 MB at bf16 and dominates batched
    serving (PERF.md "Generation-buffer bucket cost", measured 2.45x).
    Quantizing at cache-write (per-position/head scales over the head dim)
    halves those bytes; the dequant multiply fuses into the attention
    einsum's operand read exactly like the weight-only int8 path."""

    k: Array
    v: Array
    k_scale: Array | None = None  # [B, maxT, Nkv] f32, int8 cache only
    v_scale: Array | None = None

    @staticmethod
    def zeros(batch: int, max_len: int, n_kv: int, head_dim: int,
              dtype=jnp.float32, quantized: bool = False) -> "KVCacheSlot":
        shape = (batch, max_len, n_kv, head_dim)
        if quantized:
            sshape = (batch, max_len, n_kv)
            return KVCacheSlot(jnp.zeros(shape, jnp.int8),
                               jnp.zeros(shape, jnp.int8),
                               jnp.zeros(sshape, jnp.float32),
                               jnp.zeros(sshape, jnp.float32))
        return KVCacheSlot(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def update(self, k_new: Array, v_new: Array, index) -> "KVCacheSlot":
        """Write step slice at time `index` (KVCache.Update :74-93)."""
        if self.k_scale is not None:
            qk, sk = _quantize_kv(k_new)
            qv, sv = _quantize_kv(v_new)
            return KVCacheSlot(
                jax.lax.dynamic_update_slice_in_dim(self.k, qk, index, axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.v, qv, index, axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.k_scale, sk, index,
                                                    axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.v_scale, sv, index,
                                                    axis=1))
        k = jax.lax.dynamic_update_slice_in_dim(self.k, k_new, index, axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(self.v, v_new, index, axis=1)
        return KVCacheSlot(k, v)

    def prefill_write(self, k: Array, v: Array) -> "KVCacheSlot":
        """Write the whole prompt block at position 0 (prefill pass)."""
        if self.k_scale is not None:
            qk, sk = _quantize_kv(k)
            qv, sv = _quantize_kv(v)
            return KVCacheSlot(
                jax.lax.dynamic_update_slice_in_dim(self.k, qk, 0, axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.v, qv, 0, axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.k_scale, sk, 0,
                                                    axis=1),
                jax.lax.dynamic_update_slice_in_dim(self.v_scale, sv, 0,
                                                    axis=1))
        return KVCacheSlot(
            jax.lax.dynamic_update_slice_in_dim(self.k, k, 0, axis=1),
            jax.lax.dynamic_update_slice_in_dim(self.v, v, 0, axis=1))

    def kv(self, dtype) -> tuple[Array, Array]:
        """(k, v) for the attention read, dequantized if stored int8 —
        convert+scale fuse into the einsum operand read, so HBM streams
        the int8 bytes plus one f32 scale per 128-dim vector."""
        if self.k_scale is None:
            return self.k, self.v
        k = self.k.astype(dtype) * self.k_scale.astype(dtype)[..., None]
        v = self.v.astype(dtype) * self.v_scale.astype(dtype)[..., None]
        return k, v


def _blocked_decode_attn(q: Array, cache: KVCacheSlot, step,
                         block: int, int8_dot: bool = False) -> Array:
    """Decode-step GQA attention that reads the KV cache in ``block``-sized
    slices, visiting only blocks whose start is <= ``step`` (positions past
    the step are causally masked anyway). Flash-style single-query
    accumulation: running max ``m``, denominator ``l``, weighted sum
    ``acc`` in f32.

    q: [B, 1, Nq, Dh]; cache k/v: [B, maxT, Nkv, Dh] (fp or int8+scales).
    Returns [B, 1, Nq, Dh] in q.dtype. Scale 1.0 like sdpa_gqa (the q
    projection folds 1/sqrt(d))."""
    b, _, nq, dh = q.shape
    max_t = cache.k.shape[1]
    nkv = cache.k.shape[2]
    groups = nq // nkv
    assert max_t % block == 0, (max_t, block)
    qg = q.reshape(b, nkv, groups, dh).astype(jnp.float32)

    # int8-MXU dots against the int8 cache (opt-in, Dia.kv_dot_int8):
    # q quantized per row, q.k int8->int32 on the MXU, and the
    # per-position v_scale folded into the softmax numerators which are
    # then themselves row-quantized for the p.v dot. Removes the
    # per-element K/V dequant — the element-rate term that survives
    # byte-halving — at an extra ~1% relative output error (worst case,
    # flat attention). Measured: 5.03 -> 3.67 ms/step at a nearly-full
    # 3072 bucket, B=8 (PERF.md "int8-dot KV read").
    int8_dot = bool(int8_dot) and cache.k_scale is not None
    if int8_dot:
        q_scale = jnp.maximum(
            jnp.max(jnp.abs(qg), axis=-1, keepdims=True) / 127.0, 1e-30)
        q_i8 = jnp.clip(jnp.round(qg / q_scale), -127, 127).astype(jnp.int8)

    neg = jnp.float32(-jnp.inf)
    m0 = jnp.full((b, nkv, groups), neg)
    l0 = jnp.zeros((b, nkv, groups), jnp.float32)
    acc0 = jnp.zeros((b, nkv, groups, dh), jnp.float32)

    def cond(carry):
        j = carry[0]
        return j * block <= step

    def body(carry):
        j, m, l, acc = carry
        start = j * block
        kb = jax.lax.dynamic_slice_in_dim(cache.k, start, block, axis=1)
        vb = jax.lax.dynamic_slice_in_dim(cache.v, start, block, axis=1)
        pos = start + jnp.arange(block)
        live = (pos <= step)[None, None, None, :]
        if int8_dot:
            ks = jax.lax.dynamic_slice_in_dim(cache.k_scale, start, block,
                                              axis=1)
            vs = jax.lax.dynamic_slice_in_dim(cache.v_scale, start, block,
                                              axis=1)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", q_i8, kb,
                preferred_element_type=jnp.int32).astype(jnp.float32)
            logits = logits * q_scale \
                * jnp.transpose(ks, (0, 2, 1))[:, :, None, :]
            logits = jnp.where(live, logits, neg)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            p = jnp.exp(logits - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            pv = p * jnp.transpose(vs, (0, 2, 1))[:, :, None, :]
            pv_scale = jnp.maximum(
                jnp.max(pv, axis=-1, keepdims=True) / 127.0, 1e-30)
            pv_i8 = jnp.clip(jnp.round(pv / pv_scale), 0, 127
                             ).astype(jnp.int8)
            dv = jnp.einsum(
                "bkgs,bskd->bkgd", pv_i8, vb,
                preferred_element_type=jnp.int32).astype(jnp.float32)
            acc_new = acc * corr[..., None] + dv * pv_scale
            return j + 1, m_new, l_new, acc_new
        if cache.k_scale is not None:
            ks = jax.lax.dynamic_slice_in_dim(cache.k_scale, start, block,
                                              axis=1)
            vs = jax.lax.dynamic_slice_in_dim(cache.v_scale, start, block,
                                              axis=1)
            kb = kb.astype(jnp.float32) * ks[..., None]
            vb = vb.astype(jnp.float32) * vs[..., None]
        else:
            kb = kb.astype(jnp.float32)
            vb = vb.astype(jnp.float32)
        logits = jnp.einsum("bkgd,bskd->bkgs", qg, kb,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(live, logits, neg)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bkgs,bskd->bkgd", p, vb, preferred_element_type=jnp.float32)
        return j + 1, m_new, l_new, acc_new

    _, m, l, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(b, 1, nq, dh).astype(q.dtype)


class Attention:
    """Shared self/cross attention with q/k/v/o DenseGenerals
    (SelfAttention.cs / CrossAttention.cs)."""

    def __init__(self, prefix: str, q_dim: int, kv_dim: int, n_q: int,
                 n_kv: int, head_dim: int, out_dim: int,
                 min_timescale: float = 1.0, max_timescale: float = 10000.0):
        self.n_q, self.n_kv, self.head_dim = n_q, n_kv, head_dim
        self.q_proj = DenseGeneral(f"{prefix}.q_proj", (q_dim,), (n_q, head_dim))
        self.k_proj = DenseGeneral(f"{prefix}.k_proj", (kv_dim,), (n_kv, head_dim))
        self.v_proj = DenseGeneral(f"{prefix}.v_proj", (kv_dim,), (n_kv, head_dim))
        self.o_proj = DenseGeneral(f"{prefix}.o_proj", (n_q, head_dim), (out_dim,))
        self.timescale = jnp.asarray(rope_timescale(head_dim, min_timescale,
                                                    max_timescale))
        self._children = [self.q_proj, self.k_proj, self.v_proj, self.o_proj]

    def init(self, key, params: Params) -> None:
        for child, k in zip(self._children, jax.random.split(key, 4)):
            child.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for child in self._children:
            child.convert(sd, params)

    # self-attention over a full block (encoder / decoder prefill)
    def self_attn(self, params: Params, x: Array, positions: Array,
                  mask: Array | None, cache: KVCacheSlot | None = None,
                  prefill: bool = False):
        q = apply_rope(self.q_proj(params, x), positions, self.timescale)
        k = apply_rope(self.k_proj(params, x), positions, self.timescale)
        v = self.v_proj(params, x)
        new_cache = cache
        if cache is not None and prefill:
            new_cache = cache.prefill_write(k, v)
        out = sdpa_gqa(q, k, v, mask)
        return self.o_proj(params, out), new_cache

    # single-step decode with cache update
    def step_attn(self, params: Params, x: Array, position: Array,
                  cache: KVCacheSlot, index, mask: Array,
                  kv_block: int = 0, kv_dot: bool = False):
        """x: [B, 1, D]; position: [B, 1]; mask: [B, 1, 1, maxT] (True=attend).

        ``kv_block > 0`` enables the block-skipped read: instead of the
        full static cache (the reference reads its whole preallocated
        buffer every step too, KVCache.cs:9-105 — masked), an inner
        while_loop walks ``kv_block``-sized cache blocks only up to the
        current step with flash-style (m, l, acc) accumulation, so the
        per-step KV elements READ track the live position instead of the
        compiled bucket. At the 3072 serve bucket a typical ~450-step
        generation reads ~6x fewer cache elements. Numerics: same
        softmax up to f32 summation order (flash accumulation).

        RESTRICTION (ADVICE r4): the blocked path does NOT consume
        ``mask`` — it reconstructs pure step-causality (slot <= step)
        from ``index`` alone inside _blocked_decode_attn. That is exactly
        the self_mask _run_loop builds, so the two paths agree today; a
        caller passing a richer mask (padding, per-row windows) must use
        kv_block=0 or extend _blocked_decode_attn first."""
        q = apply_rope(self.q_proj(params, x), position, self.timescale)
        k = apply_rope(self.k_proj(params, x), position, self.timescale)
        v = self.v_proj(params, x)
        cache = cache.update(k, v, index)
        if kv_block:
            out = _blocked_decode_attn(q, cache, index, kv_block,
                                       int8_dot=kv_dot)
        else:
            ck, cv = cache.kv(q.dtype)
            out = sdpa_gqa(q, ck, cv, mask)
        return self.o_proj(params, out), cache

    # cross-attention against a precomputed cache
    def cross_attn(self, params: Params, x: Array, positions: Array,
                   cache: KVCacheSlot, mask: Array | None):
        q = apply_rope(self.q_proj(params, x), positions, self.timescale)
        out = sdpa_gqa(q, cache.k, cache.v, mask)
        return self.o_proj(params, out)

    def precompute_cross_cache(self, params: Params, enc_out: Array,
                               enc_positions: Array,
                               padding_mask: Array | None) -> KVCacheSlot:
        """K/V from encoder output (Decoder.PrecomputeCrossAttnCache :75-103)."""
        k = apply_rope(self.k_proj(params, enc_out), enc_positions, self.timescale)
        v = self.v_proj(params, enc_out)
        if padding_mask is not None:
            k = jnp.where(padding_mask[:, :, None, None], k, 0.0)
        return KVCacheSlot(k, v)
