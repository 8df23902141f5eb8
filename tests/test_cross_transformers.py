"""Independent cross-validation against the HF `transformers` implementations.

VERDICT r4 "What's missing" #1: every parity gate in tests/ is
builder-authored — tests/oracles.py re-implements the reference semantics in
torch, and the goldens freeze those oracle outputs — so a misunderstanding
SHARED between oracle and implementation is invisible. The installed
`transformers` library ships third-party, independently-maintained
implementations of two of our model families:

  - ``EncodecModel`` — faithful port of facebookresearch/encodec, the same
    upstream the C# reference ports (Models/Encodec.cs);
  - ``DacModel``    — faithful port of descript-audio-codec
    (Models/DAC.cs's upstream).

These tests build a tiny transformers model, draw ONE seeded random
parameter set, load it into BOTH implementations — ours through the
production import pipeline (core.importer.fold_weight_norm +
model.load_state_dict) — run the same input, and assert:

  - **bit-exact RVQ code indices** (BASELINE.json's parity metric), and
  - decoded waveforms agree to float tolerance,
  - Encodec per-frame scales agree (normalize=True path).

Codebook rows are drawn with a wide spread (scale 3 vs 0.3 for the conv
weights) so argmin margins dwarf the ~2e-4 f32 conv-order noise between
XLA and torch — code flips then indicate real semantic divergence, not
float ties.

This cross-check is what exposed the round-5 normalized-lookup finding
(PARITY.md "Known divergences" #12): the C# reference comments but omits
the ViT-VQGAN L2 normalization in the SNAC/DAC codebook search; with the
reference's raw-L2 lookup, DAC stage-2+ codes here disagree wholesale
(observed 24-34% match), while the upstream-correct normalized lookup
matches transformers bit-exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# each case pays a transformers model build + our jit compiles (~minutes on
# the 1-core CI host): full tier only
pytestmark = pytest.mark.slow


# --------------------------------------------------------------------- Encodec

ENCODEC_KW = dict(
    sampling_rate=1600,
    # codebook_size 1024 (10 bits): the one size where transformers'
    # bits-aware n_q formula coincides with the reference's hard-coded
    # 10-bit formula (quantize.py num_quantizers_for_bandwidth)
    codebook_size=1024, codebook_dim=8, hidden_size=8,
    num_filters=4, num_residual_layers=1, upsampling_ratios=[4, 2],
    kernel_size=3, last_kernel_size=3, residual_kernel_size=3,
    dilation_growth_rate=2, compress=2, num_lstm_layers=2,
    target_bandwidths=[6.0, 12.0],
    chunk_length_s=None, overlap=None, pad_mode="reflect",
)


def _seeded_torch_sd(model, seed: int, wide: str = "codebook") -> dict:
    """One seeded random state dict for both sides. Codebook tensors get a
    wide spread so argmin margins dominate cross-framework float noise."""
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in model.state_dict().items():
        if k.endswith(("inited", "cluster_size")):
            out[k] = torch.ones_like(v)
        else:
            scale = 3.0 if wide in k else 0.3
            out[k] = scale * torch.randn(v.shape, generator=g,
                                         dtype=torch.float32)
    return out


def _build_encodec_pair(seed: int, channels: int, **over):
    from transformers import EncodecConfig as TConfig
    from transformers import EncodecModel as TModel

    from neuralcodecs_tpu.core.importer import fold_weight_norm
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    kw = {**ENCODEC_KW, **over}
    tm = TModel(TConfig(audio_channels=channels, **kw)).eval()
    sd = _seeded_torch_sd(tm, seed)
    tm.load_state_dict(sd)
    tm.eval()

    ours = Encodec(EncodecConfig(channels=channels, **kw))
    ours.load_state_dict(fold_weight_norm(
        {k: v.numpy() for k, v in sd.items()}))
    return tm, ours


def _assert_encodec_cross(tm, ours, x: "torch.Tensor", bandwidth: float,
                          normalize: bool):
    from neuralcodecs_tpu.models.encodec.model import EncodedFrame

    with torch.no_grad():
        enc = tm.encode(x, bandwidth=bandwidth)
        tcodes = enc.audio_codes[0].numpy()            # [B, nq, F]
        tout = tm.decode(enc.audio_codes,
                         enc.audio_scales).audio_values.numpy()

    ours.set_target_bandwidth(bandwidth)
    frames = ours.encode(np.asarray(x[0]))             # input [C, T]
    assert len(frames) == 1
    ncodes = np.asarray(frames[0].codes)
    assert ncodes.shape == tcodes.shape
    np.testing.assert_array_equal(
        ncodes, tcodes,
        err_msg="Encodec RVQ codes diverge from the independent "
                "transformers implementation")
    if normalize:
        tscale = enc.audio_scales[0].reshape(-1).numpy()
        nscale = np.asarray(frames[0].scale).reshape(-1)
        np.testing.assert_allclose(nscale, tscale, rtol=1e-5, atol=1e-6)

    T = x.shape[-1]
    nout = np.asarray(ours.decode(frames))[..., :T]
    assert np.abs(nout[0] - tout[0]).max() < 1e-4

    # decoder-only isolation: THEIR codes through OUR decoder must land on
    # THEIR waveform too (catches compensating encode/decode errors)
    scale = frames[0].scale if normalize else None
    nf = [EncodedFrame(codes=tcodes, scale=scale)]
    nout2 = np.asarray(ours.decode(nf))[..., :T]
    assert np.abs(nout2[0] - tout[0]).max() < 1e-4


def test_encodec_cross_causal_mono():
    """24k-style config: causal convs, weight_norm, no chunking. All 6 RVQ
    stages bit-exact at max bandwidth; T=960 is not a hop multiple, so the
    causal extra-padding math is exercised too."""
    tm, ours = _build_encodec_pair(
        seed=7, channels=1,
        use_causal_conv=True, norm_type="weight_norm", normalize=False)
    g = torch.Generator().manual_seed(99)
    x = 0.25 * torch.randn(1, 1, 960, generator=g)
    _assert_encodec_cross(tm, ours, x, bandwidth=12.0, normalize=False)


def test_encodec_cross_stereo_groupnorm_normalized():
    """48k-style config: stereo, non-causal, time_group_norm, per-frame
    volume normalization with transmitted scales."""
    tm, ours = _build_encodec_pair(
        seed=13, channels=2,
        use_causal_conv=False, norm_type="time_group_norm", normalize=True)
    g = torch.Generator().manual_seed(5)
    x = 0.25 * torch.randn(1, 2, 800, generator=g)
    _assert_encodec_cross(tm, ours, x, bandwidth=6.0, normalize=True)


# ------------------------------------------------------------------------- DAC

def _dac_rename(key: str, n_enc: int, n_dec: int) -> str:
    """transformers DacModel names -> descript checkpoint names (the naming
    our loader consumes; frozen in tests/keysets/dac_44khz.json).

    descript encoder: block.0=conv, block.1..n=EncoderBlock(3 ResUnits +
    Snake + strided conv), block.n+1=Snake, block.n+2=conv; decoder:
    model.0=conv, model.1..n=DecoderBlock(Snake + ConvT + 3 ResUnits),
    model.n+1=Snake, model.n+2=conv. ResidualUnit: Snake, conv k7, Snake,
    conv k1. transformers names the same submodules res_unit1..3 / snake1 /
    conv1 / conv_t1."""
    def res_units(rest: str, base: int) -> str:
        rest = re.sub(r"res_unit(\d)\.snake1\.alpha",
                      lambda m: f"block.{int(m.group(1)) + base}.block.0.alpha",
                      rest)
        rest = re.sub(r"res_unit(\d)\.conv1\.",
                      lambda m: f"block.{int(m.group(1)) + base}.block.1.",
                      rest)
        rest = re.sub(r"res_unit(\d)\.snake2\.alpha",
                      lambda m: f"block.{int(m.group(1)) + base}.block.2.alpha",
                      rest)
        rest = re.sub(r"res_unit(\d)\.conv2\.",
                      lambda m: f"block.{int(m.group(1)) + base}.block.3.",
                      rest)
        return rest

    m = re.match(r"encoder\.block\.(\d+)\.(.*)", key)
    if m:  # EncoderBlock: res_units at 0..2, snake at 3, strided conv at 4
        i, rest = int(m.group(1)), res_units(m.group(2), base=-1)
        rest = rest.replace("snake1.alpha", "block.3.alpha")
        rest = re.sub(r"^conv1\.", "block.4.", rest)
        return f"encoder.block.{i + 1}.{rest}"
    m = re.match(r"decoder\.block\.(\d+)\.(.*)", key)
    if m:  # DecoderBlock: snake at 0, conv_t at 1, res_units at 2..4
        i, rest = int(m.group(1)), res_units(m.group(2), base=1)
        rest = rest.replace("snake1.alpha", "block.0.alpha")
        rest = re.sub(r"^conv_t1\.", "block.1.", rest)
        return f"decoder.model.{i + 1}.{rest}"
    key = re.sub(r"^encoder\.conv1\.", "encoder.block.0.", key)
    key = re.sub(r"^encoder\.snake1\.alpha",
                 f"encoder.block.{n_enc + 1}.alpha", key)
    key = re.sub(r"^encoder\.conv2\.", f"encoder.block.{n_enc + 2}.", key)
    key = re.sub(r"^decoder\.conv1\.", "decoder.model.0.", key)
    key = re.sub(r"^decoder\.snake1\.alpha",
                 f"decoder.model.{n_dec + 1}.alpha", key)
    key = re.sub(r"^decoder\.conv2\.", f"decoder.model.{n_dec + 2}.", key)
    return key


def test_dac_cross_codes_bitexact():
    """DAC vs the independent transformers DacModel: same seeded weights,
    bit-exact codes across all stages + decode agreement. This is the test
    that detects the reference's missing ViT-VQGAN normalization (PARITY.md
    divergence #12): reverting cosine_argmin_codes to plain L2 argmin drops
    stage-1+ match to ~0.3."""
    from transformers.models.dac import DacConfig, DacModel

    from neuralcodecs_tpu.models.dac import DAC, DACConfig

    rates = [2, 4]
    tm = DacModel(DacConfig(
        encoder_hidden_size=8, downsampling_ratios=rates,
        decoder_hidden_size=8, upsampling_ratios=rates[::-1],
        n_codebooks=3, codebook_size=64, codebook_dim=4,
        sampling_rate=1000)).eval()
    sd = _seeded_torch_sd(tm, seed=11)
    tm.load_state_dict(sd)
    tm.eval()

    ours = DAC(DACConfig(
        sample_rate=1000, encoder_dim=8, encoder_rates=rates,
        decoder_dim=8, decoder_rates=rates[::-1], n_codebooks=3,
        codebook_size=64, codebook_dim=4))
    n = len(rates)
    ours.load_state_dict(
        {_dac_rename(k, n, n): v.numpy() for k, v in sd.items()})

    hop = int(np.prod(rates))
    g = torch.Generator().manual_seed(3)
    x = 0.25 * torch.randn(1, 1, 50 * hop, generator=g)
    with torch.no_grad():
        enc = tm.encode(x)
        tcodes = enc.audio_codes.numpy()               # [B, nq, F]
        tq = enc.quantized_representation
        tout = tm.decode(tq).audio_values.numpy()
        # the random-weight decoder's own sensitivity to input-scale float
        # noise: re-decode with 1e-4 jitter on the latents. Cross-framework
        # f32 conv-order noise enters at the same scale (measured z_q max
        # diff 1.6e-4), so our decode must land inside a small multiple of
        # this envelope — a self-calibrating bound instead of a magic
        # tolerance (unnormalized 0.3-scale weights amplify 1e-4 input
        # noise to ~1e-2 at the saturated tanh output).
        jit = tq + 1e-4 * torch.randn(tq.shape, generator=g)
        envelope = float(np.abs(tm.decode(jit).audio_values.numpy()
                                - tout).max())

    _, codes, *_ = ours.encode(np.asarray(x[0, 0]))
    ncodes = np.asarray(codes)
    assert ncodes.shape == tcodes.shape
    np.testing.assert_array_equal(
        ncodes, tcodes,
        err_msg="DAC RVQ codes diverge from the independent transformers "
                "implementation")

    T = x.shape[-1]
    nout = np.asarray(ours.from_codes(ncodes))[:, :T]
    diff = np.abs(nout[0] - tout.reshape(-1)[:T])
    assert float(diff.max()) < max(10.0 * envelope, 1e-4), (
        float(diff.max()), envelope)
    # and in absolute terms the two decodes are the same signal
    snr = 10.0 * np.log10(float(np.mean(tout.reshape(-1)[:T] ** 2))
                          / max(float(np.mean(diff ** 2)), 1e-30))
    assert snr > 40.0, snr
