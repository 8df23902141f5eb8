"""Dia TTS model — full implementation lands with the transformer stack."""

from __future__ import annotations

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.models.dia.config import DiaConfig


class Dia:
    def __init__(self, config: DiaConfig | None = None, **kwargs):
        self.config = config or DiaConfig()
        raise NotImplementedError("Dia lands in a later build stage")


def _factory(config: DiaConfig, **kwargs) -> "Dia":
    return Dia(config, **kwargs)


registry.register("dia", _factory, DiaConfig)
