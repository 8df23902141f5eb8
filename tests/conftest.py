"""Test configuration: force CPU jax with an 8-device virtual mesh.

CI/tests never require TPU hardware; multi-chip sharding tests run against
`--xla_force_host_platform_device_count=8` virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the harness presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize re-registers its TPU platform regardless of the env
# var, so pin the platform through jax.config as well (must run before any
# computation triggers backend init).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
