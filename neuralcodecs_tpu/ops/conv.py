"""1-D convolution ops in TPU-friendly channels-last layout.

Semantics match torch.nn.functional.conv1d / conv_transpose1d (what the
reference's WNConv1d/WNConvTranspose1d call into,
/root/reference/NeuralCodecs.Torch/Modules/SNAC/WNConv1d.cs:137-144,
WNConvTranspose1d.cs:119-140) but operate on ``[B, T, C]`` activations with
``[K, Cin/groups, Cout]`` (HIO) weights so XLA tiles the contraction onto
the MXU with channels on the lane dimension.

Weight norm is *not* here: it is folded into plain weights at import time
(see core/importer.fold_weight_norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMNUMS = ("NHC", "HIO", "NHC")

# Codec fidelity targets (>60 dB SNR vs reference) need f32-grade
# contractions; TPU defaults drop conv inputs to bf16. HIGH (3-pass bf16
# accumulation) measures ~88 dB SNR and bit-identical RVQ codes vs HIGHEST
# (6-pass) on the full SNAC stack while being ~17% faster, so it is the f32
# path; bf16 compute (the fast path) uses the native single-pass MXU mode.
def _precision_for(dtype) -> lax.Precision:
    return lax.Precision.DEFAULT if dtype == jnp.bfloat16 else lax.Precision.HIGH


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """torch-semantics conv1d on [B, T, Cin] -> [B, T', Cout].

    weight: [K, Cin/groups, Cout]; symmetric zero padding of ``padding``.
    """
    weight = weight.astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=_precision_for(x.dtype),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """torch-semantics conv_transpose1d on [B, T, Cin] -> [B, T', Cout].

    Implemented as a fractionally-strided (lhs-dilated) regular convolution —
    the form XLA lowers efficiently on TPU. ``weight`` is already in the
    equivalent-regular-conv layout [K, Cin/groups, Cout] (see
    torch_conv_transpose_weight_to_hio, which flips the kernel and swaps
    channel axes at import time).

    Output length: (T-1)*stride - 2*padding + dilation*(K-1) + output_padding + 1.
    """
    weight = weight.astype(x.dtype)
    k = weight.shape[0]
    if stride > 1 and dilation == 1 and groups == 1:
        return _conv_transpose_polyphase(x, weight, bias, stride=stride,
                                         padding=padding,
                                         output_padding=output_padding)
    # NOTE: XLA's lhs_dilation path miscompiles asymmetric-padding cases
    # (odd stride + output_padding=1, e.g. SNAC 44k's stride-3 decoder block)
    # on both CPU and TPU backends (observed jax 0.9), and is ~20% slower
    # than explicit zero-stuffing even where correct (v5e: 158x vs 203x
    # SNAC-24k round-trip). Zero-stuff via reshape; XLA fuses it.
    lo = dilation * (k - 1) - padding
    hi = dilation * (k - 1) - padding + output_padding
    if stride > 1:
        b, t, c = x.shape
        x = jnp.pad(x[:, :, None, :], ((0, 0), (0, 0), (0, stride - 1), (0, 0)))
        x = x.reshape(b, t * stride, c)[:, : (t - 1) * stride + 1, :]
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(1,),
        padding=[(lo, hi)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=_precision_for(x.dtype),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def _polyphase_weight(k: int, stride: int, padding: int):
    """Static tap bookkeeping for the polyphase transpose conv.

    Returns (k_eff, d_min, taps) where taps[r] is the list of
    (d, j) pairs: output phase r takes original tap j at input offset
    d_min + d.
    """
    lo = (k - 1) - padding
    taps: list[list[tuple[int, int]]] = []
    bases = []
    for r in range(stride):
        j0 = (lo - r) % stride
        base = (r + j0 - lo) // stride
        ms = list(range(j0, k, stride))
        bases.append((base, j0, ms))
    d_min = min(b for b, _, ms in bases if ms)
    d_max = max(b + len(ms) - 1 for b, _, ms in bases if ms)
    k_eff = d_max - d_min + 1
    for base, j0, ms in bases:
        taps.append([(base - d_min + i, j) for i, j in enumerate(ms)])
    return k_eff, d_min, taps


def _conv_transpose_polyphase(x, weight, bias, *, stride, padding,
                              output_padding):
    """Transpose conv WITHOUT zero-stuffing: one stride-1 conv producing all
    ``stride`` output phases as channels, then a row-major reshape.

    The zero-stuffed formulation makes XLA run the full K-tap window over a
    stride-times-longer tensor of mostly zeros and drags T(1,128)-tiled
    re-layout fusions through the long-T decoder stages (XPlane profile,
    round 2). Here the kernel is regrouped per output phase
    (y[s·q+r] = Σ_m W[j0(r)+s·m]·x[q+base_r+m], all phases realized by ONE
    [K_eff, Cin, s·Cout] conv with K_eff = max tap span ≈ ceil(K/s)+1), so
    the MXU contracts over the dense input and the only layout op left is
    the final [B,Q,s,Cout]->[B,Q·s,Cout] interleave reshape.
    """
    b, t, cin = x.shape
    k, _, cout = weight.shape
    s = stride
    t_out = (t - 1) * s - 2 * padding + k + output_padding
    q_count = -(-t_out // s)  # ceil
    k_eff, d_min, taps = _polyphase_weight(k, s, padding)

    # W2[d, ci, r*cout+co] — zeros where phase r has no tap at offset d
    w2 = jnp.zeros((k_eff, cin, s * cout), weight.dtype)
    for r, pairs in enumerate(taps):
        for d, j in pairs:
            w2 = w2.at[d, :, r * cout:(r + 1) * cout].set(weight[j])

    # y4[b, q, r*cout+co] = Σ_d W2[d]·x[b, q + d_min + d]
    lo2 = -d_min
    hi2 = (q_count - 1) + d_min + (k_eff - 1) - (t - 1)
    out = lax.conv_general_dilated(
        x,
        w2,
        window_strides=(1,),
        padding=[(lo2, hi2)],
        dimension_numbers=_DIMNUMS,
        precision=_precision_for(x.dtype),
        preferred_element_type=x.dtype,
    )
    out = out.reshape(b, q_count * s, cout)[:, :t_out, :]
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Weight layout transforms (import-time, numpy)
# ---------------------------------------------------------------------------

def torch_conv_weight_to_hio(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight [Cout, Cin/g, K] -> canonical HIO [K, Cin/g, Cout].

    Group ordering: torch and XLA (feature_group_count) both order the output
    channel dim group-major, so a pure transpose suffices.
    """
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def torch_conv_transpose_weight_to_hio(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """torch ConvTranspose1d weight [Cin, Cout/g, K] -> equivalent-conv HIO.

    A transposed conv equals a regular conv over the stride-dilated input
    with the kernel flipped in time and in/out channels swapped. With groups,
    torch groups along Cin; the equivalent conv's HIO layout is
    [K, Cin/g, Cout] with out channels ordered group-major.
    """
    cin, cout_g, k = w.shape
    assert cin % groups == 0, (cin, groups)
    w = w[:, :, ::-1]  # flip kernel taps
    w = w.reshape(groups, cin // groups, cout_g, k)
    # [g, Cin/g, Cout/g, K] -> [K, Cin/g, g, Cout/g] -> [K, Cin/g, Cout]
    w = np.transpose(w, (3, 1, 0, 2)).reshape(k, cin // groups, groups * cout_g)
    return np.ascontiguousarray(w)


def conv_output_length(t: int, k: int, *, stride: int = 1, padding: int = 0,
                       dilation: int = 1) -> int:
    return (t + 2 * padding - dilation * (k - 1) - 1) // stride + 1


def conv_transpose_output_length(t: int, k: int, *, stride: int = 1, padding: int = 0,
                                 output_padding: int = 0, dilation: int = 1) -> int:
    return (t - 1) * stride - 2 * padding + dilation * (k - 1) + output_padding + 1


# ---------------------------------------------------------------------------
# Initializers matching torch Conv1d defaults (kaiming uniform, a=sqrt(5))
# ---------------------------------------------------------------------------

def kaiming_uniform_conv_init(key: jax.Array, k: int, cin_g: int, cout: int,
                              dtype=jnp.float32) -> jax.Array:
    """torch nn.Conv1d default weight init in HIO layout."""
    fan_in = cin_g * k
    gain = np.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, (k, cin_g, cout), dtype, -bound, bound)


def conv_bias_init(key: jax.Array, fan_in: int, cout: int, dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (cout,), dtype, -bound, bound)
