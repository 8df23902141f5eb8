from neuralcodecs_tpu.models.dac.config import DACConfig
from neuralcodecs_tpu.models.dac.model import DAC

__all__ = ["DAC", "DACConfig"]
