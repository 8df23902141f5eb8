"""Diagnostics: tensor stats, timing scopes, anomaly detection, dumps.

Counterpart of /root/reference/NeuralCodecs.Diagnostics/ (DiagnosticsContext,
TensorLogger/TensorSaver/TensorComparison, null-object pattern).
"""

from neuralcodecs_tpu.diagnostics.context import (
    DiagnosticsContext,
    NullDiagnosticsContext,
    TensorStats,
    compare_tensors,
    get_diagnostics,
    set_diagnostics,
)

__all__ = [
    "DiagnosticsContext",
    "NullDiagnosticsContext",
    "TensorStats",
    "compare_tensors",
    "get_diagnostics",
    "set_diagnostics",
]
