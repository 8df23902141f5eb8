"""Audio training losses: multi-scale mel, SI-SDR, L1, GAN.

Counterpart of /root/reference/NeuralCodecs.Torch/Modules/DAC/{MelSpectrogramLoss,
SISDRLoss,GANLoss,L1Loss}.cs — all jit-able pure functions.
"""

from neuralcodecs_tpu.losses.audio import (
    l1_loss,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
    sisdr_loss,
)
from neuralcodecs_tpu.losses.gan import (
    discriminator_loss,
    generator_loss,
    feature_matching_loss,
)

__all__ = [
    "l1_loss",
    "mel_spectrogram_loss",
    "multi_scale_stft_loss",
    "sisdr_loss",
    "discriminator_loss",
    "generator_loss",
    "feature_matching_loss",
]
