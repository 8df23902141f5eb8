"""Conv op parity vs the torch oracle (the reference's compute substrate).

The reference delegates conv1d/conv_transpose1d to libtorch
(Modules/SNAC/WNConv1d.cs:137, WNConvTranspose1d.cs:135-140); these tests pin
our channels-last XLA formulation to torch.nn.functional semantics across
stride/padding/dilation/groups/output_padding combinations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from neuralcodecs_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    torch_conv_weight_to_hio,
    torch_conv_transpose_weight_to_hio,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,dilation,groups",
    [
        (1, 8, 7, 1, 3, 1, 1),
        (8, 16, 4, 2, 1, 1, 1),
        (16, 16, 7, 1, 9, 3, 1),
        (16, 16, 7, 1, 3, 1, 16),   # depthwise
        (16, 32, 6, 3, 2, 1, 8),    # grouped strided
        (8, 8, 1, 1, 0, 1, 1),      # 1x1
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, padding, dilation, groups):
    b, t = 2, 64
    x = _rand(rng, b, cin, t)
    w = _rand(rng, cout, cin // groups, k)
    bias = _rand(rng, cout)

    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
                   stride=stride, padding=padding, dilation=dilation, groups=groups).numpy()

    got = conv1d(
        np.transpose(x, (0, 2, 1)),
        torch_conv_weight_to_hio(w),
        bias,
        stride=stride, padding=padding, dilation=dilation, groups=groups,
    )
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,output_padding,groups",
    [
        (16, 8, 16, 8, 4, 0, 1),    # SNAC decoder stride-8 (outPad=8%2=0)
        (16, 8, 6, 3, 2, 1, 1),     # stride-3, outPad=1
        (8, 8, 4, 2, 1, 0, 1),
        (8, 4, 2, 1, 1, 0, 1),
        (16, 16, 4, 2, 1, 0, 4),    # grouped transpose
    ],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, k, stride, padding,
                                        output_padding, groups):
    b, t = 2, 32
    x = _rand(rng, b, cin, t)
    w = _rand(rng, cin, cout // groups, k)
    bias = _rand(rng, cout)

    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
        stride=stride, padding=padding, output_padding=output_padding, groups=groups,
    ).numpy()

    got = conv_transpose1d(
        np.transpose(x, (0, 2, 1)),
        torch_conv_transpose_weight_to_hio(w, groups),
        bias,
        stride=stride, padding=padding, output_padding=output_padding, groups=groups,
    )
    got = np.transpose(np.asarray(got), (0, 2, 1))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_snake_matches_reference_formula(rng):
    from neuralcodecs_tpu.ops.snake import snake

    x = _rand(rng, 2, 16, 8)
    alpha = _rand(rng, 8)
    alpha[0] = 0.0  # exercise the α==0 guard (Snake1d.cs:59)
    got = np.asarray(snake(x, alpha))
    expected = np.where(alpha == 0, x, x + np.sin(alpha * x) ** 2 /
                        np.where(alpha == 0, 1, alpha))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_l2_argmin_matches_torch_cdist(rng):
    from neuralcodecs_tpu.ops.vq import l2_argmin_codes

    x = _rand(rng, 257, 8)
    cb = _rand(rng, 1024, 8)
    ref = torch.cdist(torch.from_numpy(x), torch.from_numpy(cb)).argmin(1).numpy()
    got = np.asarray(l2_argmin_codes(x, cb, use_pallas=False))
    np.testing.assert_array_equal(got, ref)


def test_cosine_argmin_matches_torch_normalized_cdist(rng):
    """cosine_argmin_codes == argmin of cdist over F.normalize'd rows (the
    upstream descript/SNAC ViT-VQGAN lookup; PARITY.md divergence #12)."""
    import torch.nn.functional as F

    from neuralcodecs_tpu.ops.vq import cosine_argmin_codes

    x = _rand(rng, 257, 8)
    cb = _rand(rng, 1024, 8)
    ref = torch.cdist(F.normalize(torch.from_numpy(x)),
                      F.normalize(torch.from_numpy(cb))).argmin(1).numpy()
    got = np.asarray(cosine_argmin_codes(x, cb, use_pallas=False))
    np.testing.assert_array_equal(got, ref)


def test_l2_argmin_pallas_interpret_matches_xla(rng):
    """Pallas kernel (interpreter mode on CPU) vs the XLA path."""
    from neuralcodecs_tpu.ops.pallas import codebook as cb_mod
    import jax
    from jax.experimental.pallas import tpu as pltpu

    x = _rand(rng, 300, 8)
    cb = _rand(rng, 512, 8)
    from neuralcodecs_tpu.ops.vq import _l2_argmin_xla

    ref = np.asarray(_l2_argmin_xla(x, cb))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cb_mod.l2_argmin_pallas(x, cb))
    np.testing.assert_array_equal(got, ref)


def test_fused_residual_unit_interpret_matches_reference(rng):
    """Pallas fused residual unit (interpret mode) vs the composed jnp path."""
    from jax.experimental.pallas import tpu as pltpu

    from neuralcodecs_tpu.ops.pallas.resunit import fused_residual_unit
    from neuralcodecs_tpu.ops.snake import snake as snake_op

    t, c, k, d = 256, 128, 7, 3
    x = rng.standard_normal((1, t, c)).astype(np.float32) * 0.5
    a1 = rng.standard_normal(c).astype(np.float32)
    a2 = rng.standard_normal(c).astype(np.float32)
    wd = (rng.standard_normal((k, 1, c)) * 0.1).astype(np.float32)
    bd = (rng.standard_normal(c) * 0.1).astype(np.float32)
    w1 = (rng.standard_normal((1, c, c)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal(c) * 0.1).astype(np.float32)
    pad = (k - 1) * d // 2
    ref = x + np.asarray(conv1d(
        snake_op(np.asarray(conv1d(snake_op(x, a1), wd, bd, padding=pad,
                                   dilation=d, groups=c)), a2), w1, b1))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_residual_unit(
            x, a1, wd, bd, a2, w1, b1, k=k, dilation=d, depthwise=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
