"""TPU-native compute ops: convolutions, activations, VQ, attention, LSTM.

All ops use channels-last activations ``[B, T, C]`` — the TPU-friendly
layout (C rides the 128-wide lane dimension) — while the public model APIs
keep the reference's ``[B, C, T]`` convention at their boundaries.
"""

from neuralcodecs_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    torch_conv_weight_to_hio,
    torch_conv_transpose_weight_to_hio,
)
from neuralcodecs_tpu.ops.snake import snake
from neuralcodecs_tpu.ops.vq import (
    codebook_lookup,
    cosine_argmin_codes,
    l2_argmin_codes,
)

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "torch_conv_weight_to_hio",
    "torch_conv_transpose_weight_to_hio",
    "snake",
    "l2_argmin_codes",
    "cosine_argmin_codes",
    "codebook_lookup",
]
