"""Profiling + numeric-sanitizer helpers.

The reference's tracing is wall-clock scopes + ETW counters
(DiagnosticsContext.cs:270-298, CodecEventSource.cs); the TPU-native
equivalents are jax.profiler traces (viewable in XProf/TensorBoard) and
checkify-based NaN/Inf guards (SURVEY §5 "race detection / sanitizers").
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/nc_profile"):
    """Capture a device trace around a block:

        with trace("/tmp/prof"):
            model.forward(audio)
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def nan_guard(fn):
    """Wrap a jittable function with checkify NaN/div-by-zero checks.

    Returns a callable raising ValueError with the original failure site on
    the first non-finite intermediate — the jit-compatible analogue of the
    reference's NaN anomaly detection (DiagnosticsContext.cs:347-421).
    """
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
