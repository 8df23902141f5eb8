"""SEANet encoder/decoder stack for Encodec, TPU-native.

Rebuild of /root/reference/NeuralCodecs.Torch/Modules/Encodec/{SConv1d,
SConvTranspose1d,SEANetResnetBlock,SLSTM,SEANetEncoder,SEANetDecoder,
NormConv1d}.cs. The stream-aware padding math (causal left-pad, asymmetric
"same" for odd strides, stride-alignment extra pad, reflect small-input
fallback — SConv1d.cs:245-274) is replicated exactly in Python on static
shapes; the convs themselves are the shared channels-last XLA ops.

The 2-layer LSTM runs as `lax.scan` with the input-to-hidden matmuls hoisted
out of the scan (one big MXU matmul over the whole sequence per layer); only
the recurrent h·W_hh matmul stays inside the carry loop. Streaming state is
the carried (h, c) — exposed for the chunked/streaming path.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.core.exceptions import LoadError
from neuralcodecs_tpu.models.layers import Layer, Params, StateDict, _require
from neuralcodecs_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    conv_bias_init,
    kaiming_uniform_conv_init,
    torch_conv_weight_to_hio,
    torch_conv_transpose_weight_to_hio,
)


def elu(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def get_extra_padding(length: int, eff_kernel: int, stride: int, pad_total: int) -> int:
    """Stride-alignment extra pad (SConv1d.GetExtraPaddingForConv1d :245-250)."""
    n_frames = (length - eff_kernel + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_kernel - pad_total)
    return ideal - length


def pad1d(x: jax.Array, left: int, right: int, mode: str = "reflect") -> jax.Array:
    """Time-axis padding on [B, T, C] with the small-input reflect fallback
    (SConv1d.Pad1d :258-274): zero-extend so reflect is valid, pad, then
    TRIM the zero extension back off so the output length is exactly
    ``T + left + right``. (The C# port omits the trim — a port bug vs the
    original encodec's ``pad1d``, which slices ``padded[..., :end]``; the
    trim is structurally required, e.g. streaming first-chunks smaller
    than a kernel would otherwise emit extra frames.)"""
    if mode in ("zero", "constant"):
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    extra = 0
    if mode == "reflect" and t <= max(left, right):
        extra = max(left, right) - t + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=mode)
    return out[:, : out.shape[1] - extra, :] if extra else out


class ConvLayerNorm(Layer):
    """Channel-last layer norm for conv layouts (ConvLayerNorm.cs:11) —
    trivial in our [B, T, C] world: a plain LN over the channel axis."""

    def __init__(self, prefix: str, channels: int, eps: float = 1e-5):
        self.prefix = prefix
        self.channels = channels
        self.eps = eps

    def init(self, key, params: Params) -> None:
        params[f"{self.prefix}.weight"] = jnp.ones((self.channels,), jnp.float32)
        params[f"{self.prefix}.bias"] = jnp.zeros((self.channels,), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        params[f"{self.prefix}.weight"] = jnp.asarray(_require(sd, f"{self.prefix}.weight"))
        params[f"{self.prefix}.bias"] = jnp.asarray(_require(sd, f"{self.prefix}.bias"))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return h * params[f"{self.prefix}.weight"] + params[f"{self.prefix}.bias"]


def _make_norm(prefix: str, norm_type: str, channels: int):
    """Norm dispatch (NormConv1d.cs:35-120): weight_norm is folded at import
    (no runtime module); time_group_norm / layer_norm wrap the conv."""
    if norm_type == "time_group_norm":
        return GroupNorm1(prefix, channels)
    if norm_type == "layer_norm":
        return ConvLayerNorm(prefix, channels)
    if norm_type in ("weight_norm", "none", ""):
        return None
    raise ValueError(f"Unsupported norm type: {norm_type}")


class GroupNorm1(Layer):
    """GroupNorm(1, C) over (T, C) per sample — Encodec's time_group_norm
    (NormConv1d.cs:35-120)."""

    def __init__(self, prefix: str, channels: int, eps: float = 1e-5):
        self.prefix = prefix
        self.channels = channels
        self.eps = eps

    def init(self, key, params: Params) -> None:
        params[f"{self.prefix}.weight"] = jnp.ones((self.channels,), jnp.float32)
        params[f"{self.prefix}.bias"] = jnp.zeros((self.channels,), jnp.float32)

    def convert(self, sd: StateDict, params: Params) -> None:
        params[f"{self.prefix}.weight"] = jnp.asarray(_require(sd, f"{self.prefix}.weight"))
        params[f"{self.prefix}.bias"] = jnp.asarray(_require(sd, f"{self.prefix}.bias"))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return h * params[f"{self.prefix}.weight"] + params[f"{self.prefix}.bias"]


class SConv1d(Layer):
    """Stream-aware conv: causal/asymmetric same-padding + plain conv.

    Param names mirror the reference registration (SConv1d.cs:106-118):
    ``{prefix}.conv.weight`` (weight-norm folded) / ``{prefix}.conv.bias``,
    with optional ``{prefix}.norm.*`` for time_group_norm.
    """

    def __init__(self, prefix: str, cin: int, cout: int, k: int, *, stride: int = 1,
                 dilation: int = 1, groups: int = 1, bias: bool = True,
                 causal: bool = False, norm_type: str = "weight_norm",
                 pad_mode: str = "reflect"):
        self.prefix = prefix
        self.cin, self.cout, self.k = cin, cout, k
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.has_bias = bias
        self.causal = causal
        self.pad_mode = pad_mode
        self.norm = _make_norm(f"{prefix}.norm", norm_type, cout)

    def init(self, key, params: Params) -> None:
        kw, kb = jax.random.split(key)
        params[f"{self.prefix}.conv.weight"] = kaiming_uniform_conv_init(
            kw, self.k, self.cin // self.groups, self.cout)
        if self.has_bias:
            params[f"{self.prefix}.conv.bias"] = conv_bias_init(
                kb, (self.cin // self.groups) * self.k, self.cout)
        if self.norm is not None:
            self.norm.init(key, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        w = _require(sd, f"{self.prefix}.conv.weight")
        expected = (self.cout, self.cin // self.groups, self.k)
        if w.shape != expected:
            raise LoadError(f"{self.prefix}.conv.weight shape {w.shape} != {expected}")
        params[f"{self.prefix}.conv.weight"] = jnp.asarray(torch_conv_weight_to_hio(w))
        if self.has_bias:
            params[f"{self.prefix}.conv.bias"] = jnp.asarray(
                _require(sd, f"{self.prefix}.conv.bias"))
        if self.norm is not None:
            self.norm.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        eff_k = (self.k - 1) * self.dilation + 1
        pad_total = eff_k - self.stride
        extra = get_extra_padding(x.shape[1], eff_k, self.stride, pad_total)
        if self.causal:
            x = pad1d(x, pad_total, extra, self.pad_mode)
        else:
            right = pad_total // 2
            left = pad_total - right
            x = pad1d(x, left, right + extra, self.pad_mode)
        out = conv1d(x, params[f"{self.prefix}.conv.weight"],
                     params.get(f"{self.prefix}.conv.bias") if self.has_bias else None,
                     stride=self.stride, padding=0, dilation=self.dilation,
                     groups=self.groups)
        if self.norm is not None:
            out = self.norm(params, out)
        return out

    # -- streaming (causal only) ----------------------------------------------

    @property
    def _stream_ctx(self) -> int:
        eff_k = (self.k - 1) * self.dilation + 1
        return eff_k - self.stride

    def stream(self, params: Params, x: jax.Array, state):
        """One streaming step: x [B, Tc, Cin] with Tc % stride == 0.

        ``state`` carries the previous chunk's input tail (the causal left
        context, SConv1d.cs causal branch); ``state=None`` starts a stream —
        the first chunk uses the layer's normal left padding (incl. the
        reflect mode), so chunked output == the full causal forward exactly.
        """
        assert self.causal, "streaming requires a causal conv"
        ctx = self._stream_ctx
        if state is None:
            ext = pad1d(x, ctx, 0, self.pad_mode)
        else:
            ext = jnp.concatenate([state, x], axis=1)
        out = conv1d(ext, params[f"{self.prefix}.conv.weight"],
                     params.get(f"{self.prefix}.conv.bias") if self.has_bias else None,
                     stride=self.stride, padding=0, dilation=self.dilation,
                     groups=self.groups)
        if self.norm is not None:
            out = self.norm(params, out)
        new_state = ext[:, ext.shape[1] - ctx:, :]
        return out, new_state


class SConvTranspose1d(Layer):
    """Transpose conv + causal/asymmetric trimming (SConvTranspose1d.cs:82-110)."""

    def __init__(self, prefix: str, cin: int, cout: int, k: int, *, stride: int = 1,
                 causal: bool = False, norm_type: str = "weight_norm",
                 trim_right_ratio: float = 1.0):
        self.prefix = prefix
        self.cin, self.cout, self.k = cin, cout, k
        self.stride = stride
        self.causal = causal
        self.trim_right_ratio = trim_right_ratio
        self.pad_total = k - stride
        self.norm = _make_norm(f"{prefix}.norm", norm_type, cout)

    def init(self, key, params: Params) -> None:
        kw, kb = jax.random.split(key)
        params[f"{self.prefix}.conv.weight"] = kaiming_uniform_conv_init(
            kw, self.k, self.cin, self.cout)
        params[f"{self.prefix}.conv.bias"] = conv_bias_init(kb, self.cout * self.k, self.cout)
        if self.norm is not None:
            self.norm.init(key, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        w = _require(sd, f"{self.prefix}.conv.weight")
        expected = (self.cin, self.cout, self.k)
        if w.shape != expected:
            raise LoadError(f"{self.prefix}.conv.weight shape {w.shape} != {expected}")
        params[f"{self.prefix}.conv.weight"] = jnp.asarray(
            torch_conv_transpose_weight_to_hio(w, 1))
        params[f"{self.prefix}.conv.bias"] = jnp.asarray(
            _require(sd, f"{self.prefix}.conv.bias"))
        if self.norm is not None:
            self.norm.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = conv_transpose1d(x, params[f"{self.prefix}.conv.weight"],
                             params.get(f"{self.prefix}.conv.bias"),
                             stride=self.stride, padding=0)
        if self.norm is not None:
            y = self.norm(params, y)
        if self.causal:
            pad_right = math.ceil(self.pad_total * self.trim_right_ratio)
            pad_left = self.pad_total - pad_right
        else:
            pad_right = self.pad_total // 2
            pad_left = self.pad_total - pad_right
        t = y.shape[1]
        return y[:, pad_left: t - pad_right, :]

    # -- streaming (causal, trim_right_ratio == 1 only) ------------------------

    def stream(self, params: Params, x: jax.Array, state):
        """One streaming step: x [B, Tc, Cin] -> y [B, Tc*stride, Cout].

        The transpose conv's trailing ``k - stride`` half-frame overlaps the
        next chunk; ``state`` carries that tail (pre-bias) and overlap-adds
        it into the next chunk's head. Equal to the full causal forward with
        trim_right_ratio == 1 (the Encodec default)."""
        assert self.causal and self.trim_right_ratio == 1.0, \
            "streaming transpose conv requires causal + trim_right_ratio=1"
        assert self.norm is None, "streaming transpose conv with norm unsupported"
        y = conv_transpose1d(x, params[f"{self.prefix}.conv.weight"], None,
                             stride=self.stride, padding=0)
        emit_len = x.shape[1] * self.stride
        carry_in = state
        emitted = y[:, :emit_len, :]
        if self.pad_total > 0:
            if carry_in is None:
                carry_in = jnp.zeros((x.shape[0], self.pad_total, self.cout),
                                     y.dtype)
            emitted = emitted.at[:, : self.pad_total, :].add(carry_in)
            new_state = y[:, emit_len:, :]
        else:
            new_state = y[:, :0, :]
        bias = params.get(f"{self.prefix}.conv.bias")
        if bias is not None:
            emitted = emitted + bias
        return emitted, new_state


class SEANetResnetBlock(Layer):
    """ELU→conv(k,dil)→ELU→conv(1) + (identity | 1×1 conv) skip
    (SEANetResnetBlock.cs)."""

    def __init__(self, prefix: str, dim: int, *, kernel_sizes=(3, 1), dilations=(1, 1),
                 causal: bool = False, norm_type: str = "weight_norm",
                 pad_mode: str = "reflect", compress: int = 2, true_skip: bool = False):
        hidden = dim // compress
        self.convs = []
        for i, (k, d) in enumerate(zip(kernel_sizes, dilations)):
            cin = dim if i == 0 else hidden
            cout = dim if i == len(kernel_sizes) - 1 else hidden
            # block indices: act at 2i, conv at 2i+1 (reference Sequential)
            self.convs.append(SConv1d(f"{prefix}.block.{2 * i + 1}", cin, cout, k,
                                      dilation=d, causal=causal, norm_type=norm_type,
                                      pad_mode=pad_mode))
        self.shortcut = None if true_skip else SConv1d(
            f"{prefix}.shortcut", dim, dim, 1, causal=causal, norm_type=norm_type,
            pad_mode=pad_mode)

    def init(self, key, params: Params) -> None:
        children = self.convs + ([self.shortcut] if self.shortcut else [])
        for child, k in zip(children, jax.random.split(key, len(children))):
            child.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for child in self.convs + ([self.shortcut] if self.shortcut else []):
            child.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for conv in self.convs:
            h = conv(params, elu(h))
        skip = x if self.shortcut is None else self.shortcut(params, x)
        return skip + h

    def stream(self, params: Params, x: jax.Array, state):
        states = state if state is not None else [None] * (len(self.convs) + 1)
        h = x
        new_states = []
        for conv, s in zip(self.convs, states):
            h, ns = conv.stream(params, elu(h), s)
            new_states.append(ns)
        if self.shortcut is None:
            skip = x
            new_states.append(states[-1] if states[-1] is not None
                              else jnp.zeros((x.shape[0], 0, x.shape[2]), x.dtype))
        else:
            skip, ns = self.shortcut.stream(params, x, states[-1])
            new_states.append(ns)
        return skip + h, new_states


def _lstm_recurrence(gates_x: jax.Array, w_hh: jax.Array,
                     h0: jax.Array, c0: jax.Array):
    """One LSTM layer recurrence over the hoisted input projection.

    gates_x: [T, B, 4H] -> (ys [T, B, H], h_f [B, H], c_f [B, H]).

    On TPU, multi-step sequences dispatch to the fused Pallas kernel
    (ops/pallas/lstm.py): the whole recurrence runs in one Mosaic program
    with W_hh VMEM-resident, measured 1.7x faster than `lax.scan` at B=1
    and ~5% at B=4 (PERF.md "SLSTM recurrence kernel"). CPU (tests),
    T == 1 (per-chunk streaming steps), and unsupported shapes keep the
    XLA scan — bit-identical goldens on the CI backend.
    """
    t, b, four_h = gates_x.shape
    use_pallas = False
    try:
        use_pallas = jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover — uninitialized backend
        pass
    if use_pallas and t > 1:
        from neuralcodecs_tpu.ops.pallas.lstm import (lstm_pallas_compiles,
                                                      lstm_pallas_supported,
                                                      lstm_scan_pallas)

        # the shape gate is a cheap pre-filter; the compile probe is the
        # real guarantee — a Mosaic lowering failure would otherwise only
        # surface when the ENCLOSING jit compiles, where no except here
        # could catch it (probe is memoized per shape + persistent cache)
        if (lstm_pallas_supported(b, four_h // 4)
                and lstm_pallas_compiles(t, b, four_h, gates_x.dtype,
                                         w_hh.dtype, h0.dtype)):
            try:
                return lstm_scan_pallas(gates_x, w_hh, h0, c0)
            except Exception:  # pragma: no cover — trace-time issues
                pass

    def step(carry, gx):
        h_prev, c_prev = carry
        # HIGH (3-pass bf16): at B>=4 XLA tiles this dot onto the MXU,
        # where DEFAULT means one bf16 pass (~4e-3 drift over a 150-step
        # recurrence vs f64, measured in tests_tpu) — far below the HIGH
        # policy the rest of the f32 model runs at (ops/conv.py). The dot
        # is tiny and the scan is latency-bound, so the extra passes are
        # free. (B=1 lowers to a full-f32 VPU matvec either way; CPU is
        # always exact f32.)
        prec = (jax.lax.Precision.HIGH if gx.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        gates = gx + jnp.dot(h_prev, w_hh, preferred_element_type=gx.dtype,
                             precision=prec)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_f, c_f), ys = jax.lax.scan(step, (h0, c0), gates_x)
    return ys, h_f, c_f


class SLSTM(Layer):
    """2-layer LSTM over time with skip connection (SLSTM.cs:11-130).

    Canonical weights: W_ih stored transposed [in, 4H] and W_hh [H, 4H]
    (torch keeps [4H, in]); gate order i,f,g,o matches torch. The
    input-to-hidden product for the WHOLE sequence is computed as one MXU
    matmul per layer before the scan; the scan carries (h, c).
    """

    def __init__(self, prefix: str, dim: int, num_layers: int = 2, skip: bool = True):
        self.prefix = prefix
        self.dim = dim
        self.num_layers = num_layers
        self.skip = skip

    def _names(self, layer: int) -> tuple[str, str, str, str]:
        p = f"{self.prefix}.lstm"
        return (f"{p}.weight_ih_l{layer}", f"{p}.weight_hh_l{layer}",
                f"{p}.bias_ih_l{layer}", f"{p}.bias_hh_l{layer}")

    def init(self, key, params: Params) -> None:
        h = self.dim
        bound = 1.0 / math.sqrt(h)
        keys = jax.random.split(key, 4 * self.num_layers)
        for layer in range(self.num_layers):
            wih, whh, bih, bhh = self._names(layer)
            k0, k1, k2, k3 = keys[4 * layer: 4 * layer + 4]
            params[wih] = jax.random.uniform(k0, (h, 4 * h), jnp.float32, -bound, bound)
            params[whh] = jax.random.uniform(k1, (h, 4 * h), jnp.float32, -bound, bound)
            params[bih] = jax.random.uniform(k2, (4 * h,), jnp.float32, -bound, bound)
            params[bhh] = jax.random.uniform(k3, (4 * h,), jnp.float32, -bound, bound)

    def convert(self, sd: StateDict, params: Params) -> None:
        for layer in range(self.num_layers):
            wih, whh, bih, bhh = self._names(layer)
            params[wih] = jnp.asarray(np.ascontiguousarray(_require(sd, wih).T))
            params[whh] = jnp.asarray(np.ascontiguousarray(_require(sd, whh).T))
            params[bih] = jnp.asarray(_require(sd, bih))
            params[bhh] = jnp.asarray(_require(sd, bhh))

    def __call__(self, params: Params, x: jax.Array,
                 state: tuple[jax.Array, jax.Array] | None = None,
                 return_state: bool = False):
        """x: [B, T, C]. state: optional ([L, B, H], [L, B, H])."""
        b, t, _ = x.shape
        h_dim = self.dim
        if state is None:
            h0 = jnp.zeros((self.num_layers, b, h_dim), x.dtype)
            c0 = jnp.zeros((self.num_layers, b, h_dim), x.dtype)
        else:
            h0, c0 = state
        out = x
        h_stack, c_stack = [], []
        for layer in range(self.num_layers):
            wih, whh, bih, bhh = self._names(layer)
            w_ih = params[wih].astype(out.dtype)
            w_hh = params[whh].astype(out.dtype)
            bias = (params[bih] + params[bhh]).astype(out.dtype)
            # hoisted input projection: [B, T, 4H] in one matmul
            gates_x = jnp.einsum("btc,ch->bth", out, w_ih,
                                 preferred_element_type=out.dtype) + bias
            ys, h_f, c_f = _lstm_recurrence(
                jnp.swapaxes(gates_x, 0, 1), w_hh, h0[layer], c0[layer])
            out = jnp.swapaxes(ys, 0, 1)
            h_stack.append(h_f)
            c_stack.append(c_f)
        if self.skip:
            out = out + x
        if return_state:
            return out, (jnp.stack(h_stack), jnp.stack(c_stack))
        return out

    def stream(self, params: Params, x: jax.Array, state):
        """One streaming step; state is the carried ([L,B,H], [L,B,H])."""
        return self(params, x, state=state, return_state=True)



class _Act:
    """Parameterless ELU slot matching the reference Sequential layout."""

    def init(self, key, params):  # noqa: D102
        pass

    def convert(self, sd, params):  # noqa: D102
        pass

    def __call__(self, params, x):
        return elu(x)


def _stream_layers(layers, params: Params, x: jax.Array, states):
    """Run a Sequential of layers one streaming step; stateless layers keep
    a None slot so the state pytree shape is stable."""
    if states is None:
        states = [None] * len(layers)
    new_states = []
    for layer, s in zip(layers, states):
        if hasattr(layer, "stream"):
            x, ns = layer.stream(params, x, s)
        else:
            x = layer(params, x)
            ns = None
        new_states.append(ns)
    return x, new_states


class SEANetEncoder(Layer):
    """conv(k7) → [resblocks + strided conv]×4 → SLSTM → ELU → conv(k7)
    (SEANetEncoder.cs:37-141). Ratios are applied reversed (finest first)."""

    def __init__(self, prefix: str, *, channels: int = 1, dimension: int = 128,
                 n_filters: int = 32, n_residual_layers: int = 1,
                 ratios=(8, 5, 4, 2), kernel_size: int = 7, last_kernel_size: int = 7,
                 residual_kernel_size: int = 3, dilation_base: int = 2,
                 causal: bool = False, norm_type: str = "weight_norm",
                 pad_mode: str = "reflect", true_skip: bool = False,
                 compress: int = 2, lstm: int = 2):
        self.ratios = list(reversed(list(ratios)))
        self.hop_length = int(np.prod(ratios))
        mult = 1
        idx = 0
        layers: list = [SConv1d(f"{prefix}.{idx}", channels, mult * n_filters,
                                kernel_size, causal=causal, norm_type=norm_type,
                                pad_mode=pad_mode)]
        idx += 1
        for ratio in self.ratios:
            for j in range(n_residual_layers):
                layers.append(SEANetResnetBlock(
                    f"{prefix}.{idx}", mult * n_filters,
                    kernel_sizes=(residual_kernel_size, 1),
                    dilations=(dilation_base ** j, 1),
                    causal=causal, norm_type=norm_type, pad_mode=pad_mode,
                    compress=compress, true_skip=true_skip))
                idx += 1
            layers.append(_Act())
            idx += 1
            layers.append(SConv1d(f"{prefix}.{idx}", mult * n_filters,
                                  mult * n_filters * 2, ratio * 2, stride=ratio,
                                  causal=causal, norm_type=norm_type, pad_mode=pad_mode))
            idx += 1
            mult *= 2
        self.lstm = None
        if lstm > 0:
            self.lstm = SLSTM(f"{prefix}.{idx}", mult * n_filters, lstm)
            layers.append(self.lstm)
            idx += 1
        layers.append(_Act())
        idx += 1
        layers.append(SConv1d(f"{prefix}.{idx}", mult * n_filters, dimension,
                              last_kernel_size, causal=causal, norm_type=norm_type,
                              pad_mode=pad_mode))
        self.layers = layers

    def init(self, key, params: Params) -> None:
        for layer, k in zip(self.layers, jax.random.split(key, len(self.layers))):
            layer.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for layer in self.layers:
            layer.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for layer in self.layers:
            x = layer(params, x)
        return x

    def stream(self, params: Params, x: jax.Array, states):
        """Streaming encode step: x [B, Tc, C] with Tc % hop_length == 0 ->
        (frames [B, Tc/hop, D], new_states). Chunked == full causal forward
        exactly (conv tails + LSTM state carried; SLSTM.cs streaming state +
        SConv1d.cs causal padding)."""
        return _stream_layers(self.layers, params, x, states)


class SEANetDecoder(Layer):
    """conv(k7) → SLSTM → [ELU + convT + resblocks]×4 → ELU → conv(k7)
    (SEANetDecoder.cs:40-214)."""

    def __init__(self, prefix: str, *, channels: int = 1, dimension: int = 128,
                 n_filters: int = 32, n_residual_layers: int = 1,
                 ratios=(8, 5, 4, 2), kernel_size: int = 7, last_kernel_size: int = 7,
                 residual_kernel_size: int = 3, dilation_base: int = 2,
                 causal: bool = False, norm_type: str = "weight_norm",
                 pad_mode: str = "reflect", true_skip: bool = False,
                 compress: int = 2, lstm: int = 2, trim_right_ratio: float = 1.0):
        self.ratios = list(ratios)
        mult = 2 ** len(self.ratios)
        idx = 0
        layers: list = [SConv1d(f"{prefix}.{idx}", dimension, mult * n_filters,
                                kernel_size, causal=causal, norm_type=norm_type,
                                pad_mode=pad_mode)]
        idx += 1
        if lstm > 0:
            layers.append(SLSTM(f"{prefix}.{idx}", mult * n_filters, lstm))
            idx += 1
        for ratio in self.ratios:
            layers.append(_Act())
            idx += 1
            layers.append(SConvTranspose1d(f"{prefix}.{idx}", mult * n_filters,
                                           mult * n_filters // 2, ratio * 2,
                                           stride=ratio, causal=causal,
                                           norm_type=norm_type,
                                           trim_right_ratio=trim_right_ratio))
            idx += 1
            for j in range(n_residual_layers):
                layers.append(SEANetResnetBlock(
                    f"{prefix}.{idx}", mult * n_filters // 2,
                    kernel_sizes=(residual_kernel_size, 1),
                    dilations=(dilation_base ** j, 1),
                    causal=causal, norm_type=norm_type, pad_mode=pad_mode,
                    compress=compress, true_skip=true_skip))
                idx += 1
            mult //= 2
        layers.append(_Act())
        idx += 1
        layers.append(SConv1d(f"{prefix}.{idx}", n_filters, channels,
                              last_kernel_size, causal=causal, norm_type=norm_type,
                              pad_mode=pad_mode))
        self.layers = layers

    def init(self, key, params: Params) -> None:
        for layer, k in zip(self.layers, jax.random.split(key, len(self.layers))):
            layer.init(k, params)

    def convert(self, sd: StateDict, params: Params) -> None:
        for layer in self.layers:
            layer.convert(sd, params)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for layer in self.layers:
            x = layer(params, x)
        return x

    def stream(self, params: Params, x: jax.Array, states):
        """Streaming decode step: frames [B, Fc, D] -> (audio
        [B, Fc*hop, channels], new_states); transpose-conv tails overlap-add
        across chunks, so concatenated chunks == the full causal decode."""
        return _stream_layers(self.layers, params, x, states)
