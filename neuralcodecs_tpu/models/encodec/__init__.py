from neuralcodecs_tpu.models.encodec.config import EncodecConfig
from neuralcodecs_tpu.models.encodec.model import Encodec
from neuralcodecs_tpu.models.encodec.streaming import (
    StreamingDecoder,
    StreamingEncoder,
    stream_roundtrip,
)

__all__ = ["Encodec", "EncodecConfig", "StreamingEncoder", "StreamingDecoder",
           "stream_roundtrip"]
