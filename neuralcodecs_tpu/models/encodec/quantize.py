"""Encodec residual vector quantizer with EMA codebooks.

Rebuild of /root/reference/NeuralCodecs.Torch/Modules/Encodec/
{EuclideanCodebook,VectorQuantizer,ResidualVectorQuantizer,VQUtils}.cs.

Inference: the L2-argmin search reuses the shared XLA/Pallas codebook op.
Training: the EMA update (cluster-size EMA, embed-sum EMA, Laplace smoothing
— EuclideanCodebook.cs:309-330) is a PURE function (state in, state out),
jit/pjit-friendly; under data parallelism the batch statistics take a psum
over ``dp`` — the synchronization the reference left as a comment
(EuclideanCodebook.cs:292).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.models.layers import Layer, Params, StateDict, _require
from neuralcodecs_tpu.ops.vq import codebook_lookup, l2_argmin_codes


class QuantizedResult(NamedTuple):
    """Quantize-with-bandwidth output (counterpart of QuantizedResult.cs)."""

    quantized: jax.Array   # [B, T, D]
    codes: jax.Array       # [B, n_q, T]
    bandwidth: jax.Array   # [B] kbps actually used
    penalty: jax.Array     # mean commitment loss


class CodebookState(NamedTuple):
    """EMA codebook training state (embed is the inference parameter)."""

    embed: jax.Array        # [K, D]
    embed_avg: jax.Array    # [K, D]
    cluster_size: jax.Array  # [K]
    inited: jax.Array       # [1] float {0,1}


class EuclideanCodebook(Layer):
    """EMA codebook (EuclideanCodebook.cs:13-331)."""

    def __init__(self, prefix: str, dim: int, codebook_size: int, *,
                 decay: float = 0.99, epsilon: float = 1e-5,
                 threshold_ema_dead_code: int = 2):
        self.prefix = prefix
        self.dim = dim
        self.codebook_size = codebook_size
        self.decay = decay
        self.epsilon = epsilon
        self.threshold = threshold_ema_dead_code

    def init(self, key, params: Params) -> None:
        # VQUtils.UniformInit: kaiming-uniform-style init over the codebook
        bound = 1.0 / math.sqrt(self.codebook_size)
        embed = jax.random.uniform(key, (self.codebook_size, self.dim), jnp.float32,
                                   -bound, bound)
        params[f"{self.prefix}.embed"] = embed
        params[f"{self.prefix}.embed_avg"] = embed
        params[f"{self.prefix}.cluster_size"] = jnp.zeros((self.codebook_size,), jnp.float32)
        params[f"{self.prefix}.inited"] = jnp.ones((1,), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        params[f"{self.prefix}.embed"] = jnp.asarray(_require(sd, f"{self.prefix}.embed"))
        for name, default in (("embed_avg", params[f"{self.prefix}.embed"]),
                              ("cluster_size", jnp.zeros((self.codebook_size,))),
                              ("inited", jnp.ones((1,)))):
            key = f"{self.prefix}.{name}"
            params[key] = jnp.asarray(sd[key]) if key in sd else jnp.asarray(default)

    def quantize(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [..., D] -> int32 codes [...]."""
        return l2_argmin_codes(x, params[f"{self.prefix}.embed"])

    def dequantize(self, params: Params, codes: jax.Array) -> jax.Array:
        return codebook_lookup(codes, params[f"{self.prefix}.embed"])

    # -- training ------------------------------------------------------------

    def ema_update(self, state: CodebookState, flat_x: jax.Array,
                   codes: jax.Array, dp_axis: str | None = None) -> CodebookState:
        """One EMA step (UpdateCodebook :309-330). flat_x: [N, D], codes [N].

        With ``dp_axis`` set (inside shard_map/pmap), batch statistics are
        psum-ed across the data-parallel axis before the EMA — the
        distributed sync the reference only hints at (:292).
        """
        onehot = jax.nn.one_hot(codes, self.codebook_size, dtype=flat_x.dtype)  # [N, K]
        batch_size = jnp.sum(onehot, axis=0)                                    # [K]
        embed_sum = jnp.einsum("nk,nd->kd", onehot, flat_x,
                               preferred_element_type=jnp.float32)
        if dp_axis is not None:
            batch_size = jax.lax.psum(batch_size, dp_axis)
            embed_sum = jax.lax.psum(embed_sum, dp_axis)
        cluster_size = state.cluster_size * self.decay + batch_size * (1 - self.decay)
        embed_avg = state.embed_avg * self.decay + embed_sum * (1 - self.decay)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + self.epsilon) / (n + self.codebook_size * self.epsilon) * n
        embed = embed_avg / smoothed[:, None]
        return CodebookState(embed=embed, embed_avg=embed_avg,
                             cluster_size=cluster_size, inited=state.inited)

    def expire_codes(self, key: jax.Array, state: CodebookState,
                     batch_samples: jax.Array) -> CodebookState:
        """Replace dead codes (EMA cluster size < threshold) with random
        batch samples (EuclideanCodebook.ExpireCodes :253-270), as a pure
        jit-able update."""
        if self.threshold == 0:
            return state
        flat = batch_samples.reshape(-1, batch_samples.shape[-1])
        replacements = sample_vectors(key, flat, self.codebook_size)
        expired = state.cluster_size < self.threshold
        embed = jnp.where(expired[:, None], replacements, state.embed)
        return state._replace(embed=embed)

    def state_from_params(self, params: Params) -> CodebookState:
        return CodebookState(
            embed=params[f"{self.prefix}.embed"],
            embed_avg=params[f"{self.prefix}.embed_avg"],
            cluster_size=params[f"{self.prefix}.cluster_size"],
            inited=params[f"{self.prefix}.inited"],
        )

    def state_to_params(self, state: CodebookState, params: Params) -> None:
        params[f"{self.prefix}.embed"] = state.embed
        params[f"{self.prefix}.embed_avg"] = state.embed_avg
        params[f"{self.prefix}.cluster_size"] = state.cluster_size
        params[f"{self.prefix}.inited"] = state.inited


def uniform_init(key: jax.Array, shape: tuple[int, ...],
                 scale: float | None = None) -> jax.Array:
    """Kaiming-uniform-flavored codebook init (VQUtils.UniformInit)."""
    bound = scale if scale is not None else 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Sample `num` rows (with replacement if fewer available)
    (VQUtils.SampleVectors)."""
    n = samples.shape[0]
    idx = jax.random.randint(key, (num,), 0, n)
    return jnp.take(samples, idx, axis=0)


def kmeans(key: jax.Array, samples: jax.Array, num_clusters: int,
           num_iters: int = 10) -> tuple[jax.Array, jax.Array]:
    """K-means codebook init (VQUtils.KMeans :26-74), jit-able.

    samples: [N, D]. Returns (means [K, D], bins [K]).
    """
    n = samples.shape[0]
    idx = jax.random.permutation(key, n)[:num_clusters]
    means = samples[idx]

    def body(_, means):
        codes = l2_argmin_codes(samples, means)
        onehot = jax.nn.one_hot(codes, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)
        sums = jnp.einsum("nk,nd->kd", onehot, samples,
                          preferred_element_type=jnp.float32)
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where(bins[:, None] > 0, new_means, means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    codes = l2_argmin_codes(samples, means)
    bins = jnp.sum(jax.nn.one_hot(codes, num_clusters, dtype=samples.dtype), axis=0)
    return means, bins


class VectorQuantizer(Layer):
    """Single VQ stage: optional in/out projection + EMA codebook
    (Modules/Encodec/VectorQuantizer.cs:11-180). When ``codebook_dim``
    differs from ``dim``, torch-``Linear`` projections bracket the codebook
    (VectorQuantizer.cs:34-37); Encodec presets use dim == codebook_dim, so
    the projections are identity (omitted from the param dict)."""

    def __init__(self, prefix: str, dim: int, codebook_size: int,
                 codebook_dim: int | None = None, *, decay: float = 0.99,
                 commitment_weight: float = 1.0):
        codebook_dim = codebook_dim or dim
        self.prefix = prefix
        self.dim = dim
        self.codebook_dim = codebook_dim
        self.requires_projection = codebook_dim != dim
        self.codebook = EuclideanCodebook(f"{prefix}.codebook", codebook_dim,
                                          codebook_size, decay=decay)
        self.codebook_size = codebook_size
        self.commitment_weight = commitment_weight

    def init(self, key, params: Params) -> None:
        kcb, kin, kout = jax.random.split(key, 3)
        self.codebook.init(kcb, params)
        if self.requires_projection:
            # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            # for both weight [out, in] and bias [out].
            for name, fan_in, fan_out, k in (
                    ("project_in", self.dim, self.codebook_dim, kin),
                    ("project_out", self.codebook_dim, self.dim, kout)):
                kw, kb = jax.random.split(k)
                bound = 1.0 / math.sqrt(fan_in)
                params[f"{self.prefix}.{name}.weight"] = jax.random.uniform(
                    kw, (fan_out, fan_in), jnp.float32, -bound, bound)
                params[f"{self.prefix}.{name}.bias"] = jax.random.uniform(
                    kb, (fan_out,), jnp.float32, -bound, bound)

    def convert(self, sd: StateDict, params: Params) -> None:
        self.codebook.convert(sd, params)
        if self.requires_projection:
            for name in ("project_in", "project_out"):
                for p in ("weight", "bias"):
                    key = f"{self.prefix}.{name}.{p}"
                    params[key] = jnp.asarray(_require(sd, key))

    def _project(self, params: Params, x: jax.Array, name: str) -> jax.Array:
        w = params[f"{self.prefix}.{name}.weight"]  # [out, in]
        b = params[f"{self.prefix}.{name}.bias"]
        return jnp.einsum("...i,oi->...o", x, w) + b

    def encode(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [B, T, D] -> codes [B, T] (VectorQuantizer.cs:67-74)."""
        if self.requires_projection:
            x = self._project(params, x, "project_in")
        return self.codebook.quantize(params, x)

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        """codes -> [B, T, D] (VectorQuantizer.cs:58-65)."""
        q = self.codebook.dequantize(params, codes)
        if self.requires_projection:
            q = self._project(params, q, "project_out")
        return q

    def forward(self, params: Params, x: jax.Array):
        """Returns (quantized [B,T,D] straight-through, codes, commit_loss).

        Straight-through + commitment loss are computed in codebook space,
        then projected back out (VectorQuantizer.cs:76-113)."""
        if self.requires_projection:
            x = self._project(params, x, "project_in")
        codes = self.codebook.quantize(params, x)
        quantized = self.codebook.dequantize(params, codes).astype(x.dtype)
        commit = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
        quantized = x + jax.lax.stop_gradient(quantized - x)
        if self.requires_projection:
            quantized = self._project(params, quantized, "project_out")
        return quantized, codes, commit * self.commitment_weight


class ResidualVectorQuantizer(Layer):
    """Multi-stage RVQ with bandwidth→n_q selection
    (Modules/Encodec/ResidualVectorQuantizer.cs:12-282)."""

    def __init__(self, prefix: str, dim: int, num_quantizers: int,
                 codebook_size: int, *, codebook_dim: int | None = None,
                 decay: float = 0.99):
        self.prefix = prefix
        self.dim = dim
        self.num_quantizers = num_quantizers
        self.codebook_size = codebook_size
        self.layers = [
            VectorQuantizer(f"{prefix}.layers.{i}", dim, codebook_size,
                            codebook_dim, decay=decay)
            for i in range(num_quantizers)
        ]

    def init(self, key, params: Params) -> None:
        for layer, k in zip(self.layers, jax.random.split(key, len(self.layers))):
            layer.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for layer in self.layers:
            layer.convert(sd, params)

    # -- bandwidth logic (RVQ.cs:243-260) -------------------------------------

    def bandwidth_per_quantizer(self, frame_rate: float) -> float:
        return math.log2(self.codebook_size) * frame_rate

    def num_quantizers_for_bandwidth(self, frame_rate: float,
                                     bandwidth: float | None) -> int:
        bw_per_q = self.bandwidth_per_quantizer(frame_rate)
        if bandwidth is not None and bandwidth > 0:
            # clamp to the layers that exist: a generous bandwidth on a
            # small stack must not request codebooks beyond num_quantizers
            return min(self.num_quantizers,
                       max(1, int(math.floor(bandwidth * 1000 / bw_per_q))))
        return self.num_quantizers

    # -- encode/decode ---------------------------------------------------------

    def encode(self, params: Params, x: jax.Array, n_q: int | None = None) -> jax.Array:
        """x: [B, T, D] -> codes [B, n_q, T] (int32)."""
        n_q = n_q or self.num_quantizers
        residual = x.astype(jnp.float32)
        all_codes = []
        for layer in self.layers[:n_q]:
            codes = layer.encode(params, residual)
            quantized = layer.decode(params, codes)
            residual = residual - quantized
            all_codes.append(codes)
        return jnp.stack(all_codes, axis=1)

    def decode(self, params: Params, codes: jax.Array) -> jax.Array:
        """codes: [B, n_q, T] -> [B, T, D]."""
        n_q = codes.shape[1]
        out = self.layers[0].decode(params, codes[:, 0])
        for i in range(1, n_q):
            out = out + self.layers[i].decode(params, codes[:, i])
        return out

    def quantize_with_bandwidth(self, params: Params, x: jax.Array,
                                frame_rate: float,
                                bandwidth: float | None = None) -> QuantizedResult:
        """Bandwidth-targeted quantization
        (RVQ.QuantizeWithBandwidth, ResidualVectorQuantizer.cs:210-233)."""
        n_q = self.num_quantizers_for_bandwidth(frame_rate, bandwidth)
        quantized, codes, losses = self.forward(params, x, n_q)
        bw_per_q = self.bandwidth_per_quantizer(frame_rate) / 1000.0
        bw = jnp.full((x.shape[0],), n_q * bw_per_q, jnp.float32)
        return QuantizedResult(quantized=quantized, codes=codes, bandwidth=bw,
                               penalty=jnp.mean(losses))

    def forward(self, params: Params, x: jax.Array, n_q: int | None = None):
        """Training-path forward: (quantized, codes [B,n_q,T], losses [n_q])."""
        n_q = n_q or self.num_quantizers
        residual = x.astype(jnp.float32)
        quantized_out = jnp.zeros_like(residual)
        all_codes, all_losses = [], []
        for layer in self.layers[:n_q]:
            quantized, codes, loss = layer.forward(params, residual)
            residual = residual - jax.lax.stop_gradient(quantized)
            quantized_out = quantized_out + quantized
            all_codes.append(codes)
            all_losses.append(loss)
        return quantized_out, jnp.stack(all_codes, axis=1), jnp.stack(all_losses)
