from neuralcodecs_tpu.models.dia.config import DiaConfig
from neuralcodecs_tpu.models.dia.model import Dia

__all__ = ["Dia", "DiaConfig"]
