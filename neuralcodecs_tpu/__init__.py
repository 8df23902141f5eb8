"""neuralcodecs_tpu — a TPU-native neural audio codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DillionLowry/NeuralCodecs (a C#/TorchSharp audio-codec model zoo):
the SNAC, DAC and Encodec codecs, the Dia 1.6B TTS model, the
AudioTools DSP layer, and the model loader/cache — re-designed
TPU-first (channels-last layouts, jitted end-to-end pipelines,
Pallas kernels for the RVQ codebook search, `lax.scan` streaming
state, and `jax.sharding` meshes for multi-chip scale-out).

Public API mirrors the reference facade
(/root/reference/NeuralCodecs.Torch/NeuralCodecs.cs:14-99):

    import neuralcodecs_tpu as nc
    model = nc.load_snac("hubertsiuzdak/snac_24khz")   # or local path
    audio_hat = model.process_audio(audio, sample_rate=24000)
"""

__version__ = "0.1.0"

from neuralcodecs_tpu.core.registry import ModelRegistry, registry
from neuralcodecs_tpu.core.loader import (
    ModelLoader,
    load_model,
    load_snac,
    load_dac,
    load_encodec,
    load_dia,
)
from neuralcodecs_tpu.models.snac import SNAC, SNACConfig
from neuralcodecs_tpu.models.dac import DAC, DACConfig
from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig
from neuralcodecs_tpu.models.dia import Dia, DiaConfig
from neuralcodecs_tpu.core.export import load_pretrained, save_pretrained
from neuralcodecs_tpu.core.zoo import load_zoo_model, zoo_models
from neuralcodecs_tpu.dsp.signal import AudioSignal

__all__ = [
    "ModelRegistry",
    "registry",
    "ModelLoader",
    "load_model",
    "load_snac",
    "load_dac",
    "load_encodec",
    "load_dia",
    "SNAC",
    "SNACConfig",
    "DAC",
    "DACConfig",
    "Encodec",
    "EncodecConfig",
    "Dia",
    "DiaConfig",
    "load_pretrained",
    "save_pretrained",
    "load_zoo_model",
    "zoo_models",
    "AudioSignal",
]
