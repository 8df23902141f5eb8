"""Shared layer building blocks for the conv codec families (SNAC + DAC).

The reference keeps per-family copies of these modules
(/root/reference/NeuralCodecs.Torch/Modules/SNAC/*.cs and Modules/DAC/*.cs
are near-duplicates); here there is one shared implementation, as the survey
(§2.3 "one shared implementation") prescribes.

Parameter model: a model's parameters form ONE FLAT DICT mapping the
*torch-compatible dotted name* (after weight-norm folding) to an array in
canonical TPU layout. Each layer object is static Python structure holding
hyperparameters + its name prefix; `init` fills the dict with torch-default
random init, `convert` pulls + re-lays-out tensors from an imported torch
state dict, `apply` runs the computation. This keeps checkpoint import 1:1
(hubertsiuzdak/snac & descript/dac checkpoints load by name) while
activations stay channels-last [B, T, C].
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import LoadError
from neuralcodecs_tpu.ops.attention import local_mha
from neuralcodecs_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    conv_bias_init,
    kaiming_uniform_conv_init,
    torch_conv_weight_to_hio,
    torch_conv_transpose_weight_to_hio,
)
from neuralcodecs_tpu.ops.snake import snake

Params = dict[str, jax.Array]
StateDict = dict[str, np.ndarray]


def _require(sd: StateDict, key: str) -> np.ndarray:
    if key not in sd:
        raise LoadError(f"Missing key in checkpoint: {key}")
    return sd[key]


class Layer:
    """Base: static structure + (init, convert, apply)."""

    def init(self, key: jax.Array, params: Params) -> None:
        raise NotImplementedError

    def convert(self, sd: StateDict, params: Params) -> None:
        raise NotImplementedError


class WNConv1d(Layer):
    """Weight-norm conv with the norm folded into a plain conv weight.

    Counterpart of Modules/SNAC/WNConv1d.cs (the reference recomputes
    g·v/‖v‖ per forward at :122-144; we fold at import)."""

    def __init__(self, prefix: str, cin: int, cout: int, k: int, *, stride: int = 1,
                 padding: int = 0, dilation: int = 1, groups: int = 1, bias: bool = True):
        self.prefix = prefix
        self.cin, self.cout, self.k = cin, cout, k
        self.stride, self.padding, self.dilation, self.groups = stride, padding, dilation, groups
        self.has_bias = bias

    def init(self, key: jax.Array, params: Params) -> None:
        kw, kb = jax.random.split(key)
        params[f"{self.prefix}.weight"] = kaiming_uniform_conv_init(
            kw, self.k, self.cin // self.groups, self.cout
        )
        if self.has_bias:
            fan_in = (self.cin // self.groups) * self.k
            params[f"{self.prefix}.bias"] = conv_bias_init(kb, fan_in, self.cout)

    def convert(self, sd: StateDict, params: Params) -> None:
        w = _require(sd, f"{self.prefix}.weight")
        if w.shape != (self.cout, self.cin // self.groups, self.k):
            raise LoadError(
                f"{self.prefix}.weight shape {w.shape} != "
                f"{(self.cout, self.cin // self.groups, self.k)}"
            )
        params[f"{self.prefix}.weight"] = jnp.asarray(torch_conv_weight_to_hio(w))
        if self.has_bias:
            params[f"{self.prefix}.bias"] = jnp.asarray(_require(sd, f"{self.prefix}.bias"))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return conv1d(
            x,
            params[f"{self.prefix}.weight"],
            params.get(f"{self.prefix}.bias") if self.has_bias else None,
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class WNConvTranspose1d(Layer):
    """Folded weight-norm transposed conv (Modules/SNAC/WNConvTranspose1d.cs)."""

    def __init__(self, prefix: str, cin: int, cout: int, k: int, *, stride: int = 1,
                 padding: int = 0, output_padding: int = 0, groups: int = 1, bias: bool = True):
        self.prefix = prefix
        self.cin, self.cout, self.k = cin, cout, k
        self.stride, self.padding, self.output_padding = stride, padding, output_padding
        self.groups = groups
        self.has_bias = bias

    def init(self, key: jax.Array, params: Params) -> None:
        kw, kb = jax.random.split(key)
        # torch ConvTranspose1d fan_in = Cout/g * k (weight dim-1,2 of [Cin, Cout/g, K])
        params[f"{self.prefix}.weight"] = kaiming_uniform_conv_init(
            kw, self.k, self.cin // self.groups, self.cout
        )
        if self.has_bias:
            fan_in = (self.cout // self.groups) * self.k
            params[f"{self.prefix}.bias"] = conv_bias_init(kb, fan_in, self.cout)

    def convert(self, sd: StateDict, params: Params) -> None:
        w = _require(sd, f"{self.prefix}.weight")
        expected = (self.cin, self.cout // self.groups, self.k)
        if w.shape != expected:
            raise LoadError(f"{self.prefix}.weight shape {w.shape} != {expected}")
        params[f"{self.prefix}.weight"] = jnp.asarray(
            torch_conv_transpose_weight_to_hio(w, self.groups)
        )
        if self.has_bias:
            params[f"{self.prefix}.bias"] = jnp.asarray(_require(sd, f"{self.prefix}.bias"))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return conv_transpose1d(
            x,
            params[f"{self.prefix}.weight"],
            params.get(f"{self.prefix}.bias") if self.has_bias else None,
            stride=self.stride, padding=self.padding,
            output_padding=self.output_padding, groups=self.groups,
        )


class Snake1d(Layer):
    """Learnable periodic activation (Modules/SNAC/Snake1d.cs:54-63).

    torch stores alpha as [1, C, 1]; canonical layout is [C]."""

    def __init__(self, prefix: str, channels: int):
        self.prefix = prefix
        self.channels = channels

    def init(self, key: jax.Array, params: Params) -> None:
        params[f"{self.prefix}.alpha"] = jnp.ones((self.channels,), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        a = _require(sd, f"{self.prefix}.alpha")
        params[f"{self.prefix}.alpha"] = jnp.asarray(a.reshape(-1))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return snake(x, params[f"{self.prefix}.alpha"])


class ResidualUnit(Layer):
    """Snake→dilated conv(k7)→Snake→1×1 conv with center-cropped residual
    (Modules/SNAC/ResidualUnit.cs:25-60)."""

    def __init__(self, prefix: str, dim: int, *, dilation: int = 1, kernel: int = 7,
                 groups: int = 1):
        pad = (kernel - 1) * dilation // 2
        self.snake1 = Snake1d(f"{prefix}.block.0", dim)
        self.conv1 = WNConv1d(f"{prefix}.block.1", dim, dim, kernel,
                              padding=pad, dilation=dilation, groups=groups)
        self.snake2 = Snake1d(f"{prefix}.block.2", dim)
        self.conv2 = WNConv1d(f"{prefix}.block.3", dim, dim, 1)
        self.children = [self.snake1, self.conv1, self.snake2, self.conv2]

    def init(self, key: jax.Array, params: Params) -> None:
        for child, k in zip(self.children, jax.random.split(key, len(self.children))):
            child.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for child in self.children:
            child.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = self.conv2(params, self.snake2(params, self.conv1(params, self.snake1(params, x))))
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad, :]
        return x + y


class NoiseBlock(Layer):
    """x + randn·(1×1 conv)(x) decoder noise injection
    (Modules/SNAC/NoiseBlock.cs:38-45). Deterministic (identity-noise-free)
    when no rng is supplied — inference parity with torch eval-time noise is
    inherently stochastic, so callers pass an explicit key."""

    def __init__(self, prefix: str, dim: int):
        self.linear = WNConv1d(f"{prefix}.linear", dim, dim, 1, bias=False)

    def init(self, key: jax.Array, params: Params) -> None:
        self.linear.init(key, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        self.linear.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array,
                 rng: jax.Array | None = None) -> jax.Array:
        h = self.linear(params, x)
        if rng is None:
            return x  # noise-free eval: E[noise]=0
        b, t, _ = x.shape
        noise = jax.random.normal(rng, (b, t, 1), x.dtype)
        return x + noise * h


class LocalMHA(Layer):
    """Windowed attention block (Modules/SNAC/LocalMHA.cs:78-115)."""

    def __init__(self, prefix: str, dim: int, *, window_size: int = 32,
                 dim_head: int = 64, use_rope: bool = True):
        self.prefix = prefix
        self.dim = dim
        self.window_size = window_size
        self.num_heads = dim // dim_head
        self.use_rope = use_rope

    def init(self, key: jax.Array, params: Params) -> None:
        k1, k2 = jax.random.split(key)
        bound_qkv = 1.0 / math.sqrt(self.dim)
        params[f"{self.prefix}.norm.weight"] = jnp.ones((self.dim,), jnp.float32)
        params[f"{self.prefix}.norm.bias"] = jnp.zeros((self.dim,), jnp.float32)
        params[f"{self.prefix}.to_qkv.weight"] = jax.random.uniform(
            k1, (self.dim, 3 * self.dim), jnp.float32, -bound_qkv, bound_qkv)
        params[f"{self.prefix}.to_out.weight"] = jax.random.uniform(
            k2, (self.dim, self.dim), jnp.float32, -bound_qkv, bound_qkv)

    def convert(self, sd: StateDict, params: Params) -> None:
        params[f"{self.prefix}.norm.weight"] = jnp.asarray(
            _require(sd, f"{self.prefix}.norm.weight"))
        params[f"{self.prefix}.norm.bias"] = jnp.asarray(
            _require(sd, f"{self.prefix}.norm.bias"))
        # torch Linear stores [out, in]; canonical is [in, out]
        params[f"{self.prefix}.to_qkv.weight"] = jnp.asarray(
            _require(sd, f"{self.prefix}.to_qkv.weight").T)
        params[f"{self.prefix}.to_out.weight"] = jnp.asarray(
            _require(sd, f"{self.prefix}.to_out.weight").T)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return local_mha(
            x,
            norm_scale=params[f"{self.prefix}.norm.weight"],
            norm_bias=params[f"{self.prefix}.norm.bias"],
            qkv_weight=params[f"{self.prefix}.to_qkv.weight"],
            out_weight=params[f"{self.prefix}.to_out.weight"],
            window_size=self.window_size,
            num_heads=self.num_heads,
            use_rope=self.use_rope,
        )


class Sequential(Layer):
    """Ordered composition of layers (callable with (params, x))."""

    def __init__(self, layers: list[Any]):
        self.layers = layers

    def init(self, key: jax.Array, params: Params) -> None:
        for layer, k in zip(self.layers, jax.random.split(key, max(len(self.layers), 2))):
            layer.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for layer in self.layers:
            layer.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array, **kwargs: Any) -> jax.Array:
        for layer in self.layers:
            x = layer(params, x)
        return x


class Tanh(Layer):
    def init(self, key: jax.Array, params: Params) -> None:
        pass

    def convert(self, sd: StateDict, params: Params) -> None:
        pass

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return jnp.tanh(x)
