"""Encodec model — full implementation lands with the SEANet stack.

Placeholder registration so the loader/registry surface is complete;
see seanet.py/quantize.py for the compute modules.
"""

from __future__ import annotations

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.models.encodec.config import EncodecConfig


class Encodec:
    def __init__(self, config: EncodecConfig | None = None, **kwargs):
        self.config = config or EncodecConfig()
        raise NotImplementedError("Encodec lands in the next build stage")


def _factory(config: EncodecConfig, **kwargs) -> "Encodec":
    return Encodec(config, **kwargs)


registry.register("encodec", _factory, EncodecConfig)
