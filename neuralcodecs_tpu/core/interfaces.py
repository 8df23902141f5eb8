"""Public codec protocol.

Counterpart of INeuralCodec (/root/reference/NeuralCodecs.Core/INeuralCodec.cs:8-20):
every model in the zoo satisfies this structural interface — a config, a
state-dict loader, and an audio round-trip entry point.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class NeuralCodec(Protocol):
    """Structural type every codec model implements."""

    config: Any
    params: dict[str, Any]

    def load_state_dict(self, sd: dict[str, np.ndarray]) -> "NeuralCodec":
        """Import a (folded) torch-style state dict."""
        ...

    def process_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Resample-if-needed encode+decode round trip."""
        ...
