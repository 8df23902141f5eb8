"""Encodec language model: streaming transformer over RVQ code streams.

Rebuild of /root/reference/NeuralCodecs.Torch/Modules/Encodec/
{EncodecLanguageModel,StreamingTransformerEncoder,StreamingTransformerEncoderLayer}.cs.
Semantics follow the ORIGINAL encodec LM (per-codebook embeddings summed →
norm_in + sin positions → N post-norm layers with [past‖current] banded
attention → per-codebook linears → softmax): the C# port feeds each layer
the block input instead of the running output
(StreamingTransformerEncoder.cs:113 passes ``x`` not ``output``), which
diverges from the checkpoints' training graph; we keep the trained-graph
semantics so pretrained LM weights behave.

TPU design: the streaming state is a FIXED-SIZE rolling buffer
[B, past_context, D] per layer plus an offset counter, so the jitted
single-step function compiles once (the reference's Python-list states
change shape every step). Masking handles unfilled slots.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.config import ModelConfig
from neuralcodecs_tpu.models.layers import Params, StateDict

Array = jax.Array


@dataclass
class EncodecLMConfig(ModelConfig):
    """Counterpart of EncodecLanguageModelConfig (Config/Encodec/...)."""

    codebook_size: int = 1024
    num_codebooks: int = 32
    dimension: int = 200
    num_heads: int = 8
    num_layers: int = 5
    hidden_scale: float = 4.0
    max_period: float = 10000.0
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True

    def __post_init__(self) -> None:
        self.architecture = self.architecture or "encodec_lm"


class LMState(NamedTuple):
    """Rolling per-layer attention state + absolute offset."""

    buffers: Array   # [L, B, P, D] — last P layer inputs, newest at slot P-1
    offset: Array    # scalar int32


def sin_embedding(positions: Array, dim: int, max_period: float) -> Array:
    """[.., T, 1] positions -> [.., T, dim] (CreateSinEmbedding :179-194)."""
    half = dim // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    phase = positions.astype(jnp.float32) / (max_period ** (idx / (half - 1.0)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _layer_norm(x, w, b, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


class EncodecLanguageModel:
    """Streaming LM with jitted full-sequence and single-step paths."""

    def __init__(self, config: EncodecLMConfig | None = None, *,
                 params: Params | None = None, seed: int = 0):
        self.config = config or EncodecLMConfig()
        self.params = params if params is not None else self.init_params(seed)

    # ------------------------------------------------------------------ params

    def init_params(self, seed: int = 0) -> Params:
        cfg = self.config
        d = cfg.dimension
        hidden = int(d * cfg.hidden_scale)
        key = jax.random.key(seed)
        params: Params = {}
        n_keys = cfg.num_codebooks * 2 + cfg.num_layers * 6 + 2
        keys = iter(jax.random.split(key, n_keys))

        def lin(kk, n_in, n_out):
            bound = 1.0 / math.sqrt(n_in)
            return jax.random.uniform(kk, (n_in, n_out), jnp.float32, -bound, bound)

        for k in range(cfg.num_codebooks):
            params[f"emb.{k}.weight"] = jax.random.normal(
                next(keys), (cfg.codebook_size + 1, d), jnp.float32)
            params[f"linears.{k}.weight"] = lin(next(keys), d, cfg.codebook_size)
            params[f"linears.{k}.bias"] = jnp.zeros((cfg.codebook_size,), jnp.float32)
        if cfg.norm_in:
            params["transformer.norm_in.weight"] = jnp.ones((d,), jnp.float32)
            params["transformer.norm_in.bias"] = jnp.zeros((d,), jnp.float32)
        for i in range(cfg.num_layers):
            p = f"transformer.layers.{i}"
            params[f"{p}.self_attn.in_proj_weight"] = lin(next(keys), d, 3 * d)
            params[f"{p}.self_attn.in_proj_bias"] = jnp.zeros((3 * d,), jnp.float32)
            params[f"{p}.self_attn.out_proj.weight"] = lin(next(keys), d, d)
            params[f"{p}.self_attn.out_proj.bias"] = jnp.zeros((d,), jnp.float32)
            params[f"{p}.linear1.weight"] = lin(next(keys), d, hidden)
            params[f"{p}.linear1.bias"] = jnp.zeros((hidden,), jnp.float32)
            params[f"{p}.linear2.weight"] = lin(next(keys), hidden, d)
            params[f"{p}.linear2.bias"] = jnp.zeros((d,), jnp.float32)
            for n in ("norm1", "norm2"):
                params[f"{p}.{n}.weight"] = jnp.ones((d,), jnp.float32)
                params[f"{p}.{n}.bias"] = jnp.zeros((d,), jnp.float32)
        return params

    def load_state_dict(self, sd: StateDict) -> "EncodecLanguageModel":
        """Import a torch state dict (transposing [out,in] linears)."""
        params: Params = {}
        for key, value in sd.items():
            key = key.replace("model.", "") if key.startswith("model.") else key
            v = np.asarray(value)
            if key.endswith((".in_proj_weight", ".out_proj.weight",
                             ".linear1.weight", ".linear2.weight")) or (
                    key.startswith("linears.") and key.endswith(".weight")):
                v = np.ascontiguousarray(v.T)
            params[key] = jnp.asarray(v)
        self.params = params
        return self

    # ----------------------------------------------------------------- compute

    def _attention(self, params: Params, layer: int, queries: Array, keys: Array,
                   mask: Array) -> Array:
        """MHA with packed qkv projection (torch MultiheadAttention parity).

        queries: [B, T, D]; keys(=values): [B, S, D]; mask: [T, S] bool —
        True means MASKED (torch convention).
        """
        cfg = self.config
        p = f"transformer.layers.{layer}.self_attn"
        w = params[f"{p}.in_proj_weight"]   # [D, 3D]
        b = params[f"{p}.in_proj_bias"]     # [3D]
        d = cfg.dimension
        q = jnp.dot(queries, w[:, :d]) + b[:d]
        k = jnp.dot(keys, w[:, d:2 * d]) + b[d:2 * d]
        v = jnp.dot(keys, w[:, 2 * d:]) + b[2 * d:]
        heads = cfg.num_heads
        dh = d // heads

        def split(a):
            return a.reshape(*a.shape[:-1], heads, dh)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        logits = jnp.where(mask[None, None, :, :], -jnp.inf, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhts,bshd->bthd", weights, v)
        out = out.reshape(*queries.shape[:-1], d)
        return jnp.dot(out, params[f"{p}.out_proj.weight"]) + params[f"{p}.out_proj.bias"]

    def _layer(self, params: Params, i: int, x: Array, keys: Array,
               mask: Array) -> tuple[Array, Array]:
        """Post-norm transformer layer; returns (output, sa_input-for-state)."""
        p = f"transformer.layers.{i}"
        sa_input = x
        attn = self._attention(params, i, x, keys, mask)
        x = _layer_norm(x + attn, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
        h = jnp.dot(x, params[f"{p}.linear1.weight"]) + params[f"{p}.linear1.bias"]
        h = jax.nn.gelu(h, approximate=False) if self.config.gelu else jax.nn.relu(h)
        h = jnp.dot(h, params[f"{p}.linear2.weight"]) + params[f"{p}.linear2.bias"]
        x = _layer_norm(x + h, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
        return x, sa_input

    def _embed(self, params: Params, indices: Array) -> Array:
        """indices: [B, K, T] (+1-shifted codes, 0 = padding) -> [B, T, D]."""
        k = self.config.num_codebooks
        out = None
        for i in range(k):
            e = jnp.take(params[f"emb.{i}.weight"], indices[:, i], axis=0)
            out = e if out is None else out + e
        return out

    def _logits_softmax(self, params: Params, h: Array) -> Array:
        """h: [B, T, D] -> probas [B, card, K, T] (reference layout)."""
        outs = []
        for i in range(self.config.num_codebooks):
            logit = jnp.dot(h, params[f"linears.{i}.weight"]) + params[f"linears.{i}.bias"]
            outs.append(jax.nn.softmax(logit, axis=-1))  # [B, T, card]
        stacked = jnp.stack(outs, axis=1)                 # [B, K, T, card]
        return jnp.transpose(stacked, (0, 3, 1, 2))       # [B, card, K, T]

    # -- full-sequence path (tests / batch analysis) ---------------------------

    @functools.cached_property
    def _jit_forward_full(self):
        cfg = self.config

        def fn(params: Params, indices: Array):
            b, k, t = indices.shape
            x = self._embed(params, indices)
            if cfg.norm_in:
                x = _layer_norm(x, params["transformer.norm_in.weight"],
                                params["transformer.norm_in.bias"])
            positions = jnp.arange(t)[None, :, None]
            x = x + sin_embedding(positions, cfg.dimension, cfg.max_period)
            qpos = jnp.arange(t)[:, None]
            kpos = jnp.arange(t)[None, :]
            delta = qpos - kpos
            mask = ~((delta >= 0) & (delta <= cfg.past_context))
            for i in range(cfg.num_layers):
                x, _ = self._layer(params, i, x, x, mask)
            return self._logits_softmax(params, x)

        return jax.jit(fn)

    def forward_full(self, indices) -> Array:
        """indices: [B, K, T] shifted codes -> probas [B, card, K, T]."""
        return self._jit_forward_full(self.params, jnp.asarray(indices, jnp.int32))

    # -- streaming single-step path (compression loop) -------------------------

    def init_state(self, batch: int = 1) -> LMState:
        cfg = self.config
        return LMState(
            buffers=jnp.zeros((cfg.num_layers, batch, cfg.past_context,
                               cfg.dimension), jnp.float32),
            offset=jnp.zeros((), jnp.int32),
        )

    @functools.cached_property
    def _jit_step(self):
        cfg = self.config
        p_ctx = cfg.past_context

        def fn(params: Params, indices: Array, state: LMState):
            """indices: [B, K, 1] -> (probas [B, card, K, 1], new state)."""
            x = self._embed(params, indices)            # [B, 1, D]
            if cfg.norm_in:
                x = _layer_norm(x, params["transformer.norm_in.weight"],
                                params["transformer.norm_in.bias"])
            pos = state.offset.reshape(1, 1, 1)
            x = x + sin_embedding(pos, cfg.dimension, cfg.max_period)
            # key slot i holds input at absolute position offset - (P - i);
            # valid iff that position >= 0 and within past_context.
            slot = jnp.arange(p_ctx)
            key_pos = state.offset - (p_ctx - slot)
            valid = (key_pos >= 0) & ((state.offset - key_pos) <= p_ctx)
            mask = jnp.concatenate([~valid, jnp.zeros((1,), bool)])[None, :]  # [1, P+1]
            new_buffers = []
            for i in range(cfg.num_layers):
                keys = jnp.concatenate([state.buffers[i], x], axis=1)  # [B, P+1, D]
                x, sa_input = self._layer(params, i, x, keys, mask)
                rolled = jnp.concatenate([state.buffers[i][:, 1:], sa_input], axis=1)
                new_buffers.append(rolled)
            probas = self._logits_softmax(params, x)
            return probas, LMState(buffers=jnp.stack(new_buffers),
                                   offset=state.offset + 1)

        return jax.jit(fn)

    def step(self, indices, state: LMState):
        """One autoregressive step. indices: [B, K, 1] shifted codes."""
        return self._jit_step(self.params, jnp.asarray(indices, jnp.int32), state)
