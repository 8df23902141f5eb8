"""SNAC configuration + the three published presets.

Counterpart of SNACConfig in the reference
(/root/reference/NeuralCodecs.Torch/Config/SNAC/SNACConfig.cs:11-153). Field
names match the upstream config.json keys so HF checkpoints load unchanged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import reduce

from neuralcodecs_tpu.core.config import ModelConfig


@dataclass
class SNACConfig(ModelConfig):
    sampling_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: list[int] = field(default_factory=lambda: [2, 3, 8, 8])
    latent_dim: int | None = None
    decoder_dim: int = 1536
    decoder_rates: list[int] = field(default_factory=lambda: [8, 8, 3, 2])
    attn_window_size: int | None = 32
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: list[int] = field(default_factory=lambda: [8, 4, 2, 1])
    noise: bool = True
    depthwise: bool = True

    def __post_init__(self) -> None:
        self.architecture = self.architecture or "snac"

    @property
    def sample_rate(self) -> int:
        return self.sampling_rate

    @property
    def resolved_latent_dim(self) -> int:
        # reference: latentDim = encoderDim * 2^len(encoderRates) (SNAC.cs:37)
        return self.latent_dim or self.encoder_dim * (1 << len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return reduce(lambda a, b: a * b, self.encoder_rates)

    @property
    def pad_to(self) -> int:
        # reference Preprocess: hop * lcm(vqStrides[0], attnWindow ?? 1)
        lcm = math.lcm(self.vq_strides[0], self.attn_window_size or 1)
        return self.hop_length * lcm

    @classmethod
    def snac_44khz(cls) -> "SNACConfig":
        return cls()

    @classmethod
    def snac_32khz(cls) -> "SNACConfig":
        return cls(sampling_rate=32000)

    @classmethod
    def snac_24khz(cls) -> "SNACConfig":
        return cls(
            sampling_rate=24000,
            encoder_dim=48,
            encoder_rates=[2, 4, 8, 8],
            decoder_dim=1024,
            decoder_rates=[8, 8, 4, 2],
            attn_window_size=None,
            vq_strides=[4, 2, 1],
        )
