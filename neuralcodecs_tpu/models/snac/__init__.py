from neuralcodecs_tpu.models.snac.config import SNACConfig
from neuralcodecs_tpu.models.snac.model import SNAC

__all__ = ["SNAC", "SNACConfig"]
