"""DAC discriminators: multi-period + multi-band STFT ensembles.

The reference ships the GAN losses (Modules/DAC/GANLoss.cs), a 2-D
weight-norm conv (Modules/DAC/WNConv2d.cs) and the discriminator CONFIG
(Config/DAC/DACConfig.cs DiscriminatorConfig: periods [2,3,5,7,11], fft
lengths [2048,1024,512], band splits) but no discriminator network — it is
inference-only. This module completes the training story with the
descript-style ensemble those settings describe:

  * MPD: audio folded to [T/p, p] per period, 2-D strided conv stack;
  * MRD: STFT magnitude split into frequency bands, 2-D conv stack per band.

Each sub-discriminator returns [feat_0, ..., feat_n, logits] matching the
`DiscOutputs` contract in losses/gan.py.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from neuralcodecs_tpu.dsp.stft import stft
from neuralcodecs_tpu.models.layers import Params, StateDict, _require

_LRELU_SLOPE = 0.1


def _leaky(x):
    return jnp.where(x >= 0, x, _LRELU_SLOPE * x)


def _conv2d(x, w, b, stride=(1, 1), padding=(0, 0)):
    """x: [B, H, W, C]; w: [kh, kw, Cin, Cout] (HWIO)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride,
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=x.dtype)
    return out + b


class _Conv2dLayer:
    """Weight-norm-folded 2-D conv (counterpart of WNConv2d.cs)."""

    def __init__(self, prefix, cin, cout, kernel, stride=(1, 1), padding=(0, 0)):
        self.prefix = prefix
        self.cin, self.cout = cin, cout
        self.kernel, self.stride, self.padding = kernel, stride, padding

    def init(self, key, params: Params) -> None:
        kh, kw = self.kernel
        fan_in = self.cin * kh * kw
        bound = math.sqrt(1.0 / fan_in)
        k1, k2 = jax.random.split(key)
        params[f"{self.prefix}.weight"] = jax.random.uniform(
            k1, (kh, kw, self.cin, self.cout), jnp.float32, -bound, bound)
        params[f"{self.prefix}.bias"] = jax.random.uniform(
            k2, (self.cout,), jnp.float32, -bound, bound)

    def convert(self, sd: StateDict, params: Params) -> None:
        # torch layout [Cout, Cin, kh, kw] -> HWIO
        w = _require(sd, f"{self.prefix}.weight")
        params[f"{self.prefix}.weight"] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))
        params[f"{self.prefix}.bias"] = jnp.asarray(_require(sd, f"{self.prefix}.bias"))

    def __call__(self, params: Params, x):
        return _conv2d(x, params[f"{self.prefix}.weight"],
                       params[f"{self.prefix}.bias"], self.stride, self.padding)


class PeriodDiscriminator:
    """Fold audio to [T/p, p] and run a strided 2-D conv stack (HiFi-GAN MPD)."""

    _CHANNELS = (32, 128, 512, 1024)

    def __init__(self, prefix: str, period: int):
        self.period = period
        chans = [1, *self._CHANNELS]
        self.convs = [
            _Conv2dLayer(f"{prefix}.convs.{i}", chans[i], chans[i + 1],
                         (5, 1), stride=(3, 1), padding=(2, 0))
            for i in range(len(self._CHANNELS))
        ]
        self.post = _Conv2dLayer(f"{prefix}.conv_post", self._CHANNELS[-1], 1,
                                 (3, 1), padding=(1, 0))

    def init(self, key, params: Params) -> None:
        layers = [*self.convs, self.post]
        for layer, k in zip(layers, jax.random.split(key, len(layers))):
            layer.init(k, params)

    def convert(self, sd, params) -> None:
        for layer in [*self.convs, self.post]:
            layer.convert(sd, params)

    def __call__(self, params: Params, audio: jax.Array) -> list[jax.Array]:
        """audio: [B, T] -> [feat..., logits]."""
        b, t = audio.shape
        pad = (-t) % self.period
        x = jnp.pad(audio, ((0, 0), (0, pad)))
        x = x.reshape(b, -1, self.period, 1)  # [B, T/p, p, 1]
        feats = []
        for conv in self.convs:
            x = _leaky(conv(params, x))
            feats.append(x)
        logits = self.post(params, x)
        return [*feats, logits]


class BandDiscriminator:
    """STFT magnitude split into frequency bands, conv stack per band
    (descript MRD; fft lengths/bands from DiscriminatorConfig)."""

    _BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))
    _CH = 32

    def __init__(self, prefix: str, fft_size: int):
        self.fft_size = fft_size
        self.band_convs = []
        for b_i in range(len(self._BANDS)):
            stack = [
                _Conv2dLayer(f"{prefix}.band_convs.{b_i}.{j}",
                             2 if j == 0 else self._CH, self._CH,
                             (3, 9) if j < 3 else (3, 3),
                             stride=(1, 2) if 0 < j < 3 else (1, 1),
                             padding=(1, 4) if j < 3 else (1, 1))
                for j in range(4)
            ]
            self.band_convs.append(stack)
        self.post = _Conv2dLayer(f"{prefix}.conv_post", self._CH, 1, (3, 3),
                                 padding=(1, 1))

    def init(self, key, params: Params) -> None:
        layers = [c for stack in self.band_convs for c in stack] + [self.post]
        for layer, k in zip(layers, jax.random.split(key, len(layers))):
            layer.init(k, params)

    def convert(self, sd, params) -> None:
        for stack in self.band_convs:
            for layer in stack:
                layer.convert(sd, params)
        self.post.convert(sd, params)

    def __call__(self, params: Params, audio: jax.Array) -> list[jax.Array]:
        spec = stft(audio, n_fft=self.fft_size, hop_length=self.fft_size // 4)
        # [B, F, frames] complex -> [B, frames, F, 2] (real/imag as channels)
        x = jnp.stack([spec.real, spec.imag], axis=-1)
        x = jnp.swapaxes(x, 1, 2)
        n_freq = x.shape[2]
        feats = []
        band_outs = []
        for (lo, hi), stack in zip(self._BANDS, self.band_convs):
            band = x[:, :, int(lo * n_freq): int(hi * n_freq), :]
            h = band
            for conv in stack:
                h = _leaky(conv(params, h))
                feats.append(h)
            band_outs.append(h)
        full = jnp.concatenate(band_outs, axis=2)
        logits = self.post(params, full)
        return [*feats, logits]


class DACDiscriminator:
    """Ensemble: one MPD per period + one MRD per fft length."""

    def __init__(self, periods=(2, 3, 5, 7, 11), fft_sizes=(2048, 1024, 512),
                 seed: int = 0, params: Params | None = None):
        self.subs: list = []
        for i, p in enumerate(periods):
            self.subs.append(PeriodDiscriminator(f"discriminator.mpd.{i}", p))
        for i, n in enumerate(fft_sizes):
            self.subs.append(BandDiscriminator(f"discriminator.mrd.{i}", n))
        self.params = params if params is not None else self.init_params(seed)

    def init_params(self, seed: int = 0) -> Params:
        params: Params = {}
        for sub, k in zip(self.subs,
                          jax.random.split(jax.random.key(seed), len(self.subs))):
            sub.init(k, params)
        return params

    def __call__(self, params: Params, audio: jax.Array) -> list[list[jax.Array]]:
        """audio: [B, T] -> per-sub [feat..., logits] lists (DiscOutputs)."""
        return [sub(params, audio) for sub in self.subs]
