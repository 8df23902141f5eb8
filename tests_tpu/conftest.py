"""Opt-in REAL-TPU parity tests.

The main suite (tests/) pins jax to the CPU backend so CI never needs
hardware; the TPU-only dispatch paths there are exercised via their
explicit `use_pallas=True` interpreter modes or skipped. This directory is
the on-hardware counterpart: run it against an attached chip
(`python -m pytest tests_tpu/ -q`) to assert that the Pallas kernels and
TPU dispatch produce the same results the CPU suite froze. Every test
skips cleanly when no TPU is present, so including the directory in a
CPU-only run is harmless.
"""

import numpy as np
import pytest

import jax


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


collect_ignore: list[str] = []


@pytest.fixture(autouse=True)
def _require_tpu():
    if not _on_tpu():
        pytest.skip("no TPU attached")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
