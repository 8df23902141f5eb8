from neuralcodecs_tpu.models.encodec.config import EncodecConfig
from neuralcodecs_tpu.models.encodec.model import Encodec

__all__ = ["Encodec", "EncodecConfig"]
