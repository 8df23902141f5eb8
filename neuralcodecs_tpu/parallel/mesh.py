"""Device-mesh construction over ICI.

Axis conventions:
  * ``dp``  — data parallel (batch axis).  Primary axis for codec workloads
              (SURVEY §2.8: "DP is the only parallelism that pays" for the
              small codecs).
  * ``tp``  — tensor parallel (channel/head axis) for Dia-1.6B scale models.
  * ``sp``  — sequence/time parallel for long-audio encode (shard_map +
              halo exchange; see parallel/timeshard.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, tp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp, sp) mesh. dp defaults to all-devices/(tp·sp).

    Axis order is (dp, tp, sp) so tp/sp neighbors are ICI-adjacent (inner
    axes map to contiguous devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * sp) == 0, (n, tp, sp)
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"mesh {dp}x{tp}x{sp} != {n} devices"
    arr = np.array(devices).reshape(dp, tp, sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def mesh_axes_for(n_devices: int, model_scale: str = "codec") -> tuple[int, int, int]:
    """Heuristic (dp, tp, sp) split.

    Codecs (SNAC/DAC/Encodec, <200M params): pure DP.
    Dia-1.6B ("tts"): tp up to 4 for decode latency, rest dp.
    """
    if model_scale == "tts" and n_devices >= 4:
        tp = 4
        return n_devices // tp, tp, 1
    if model_scale == "tts" and n_devices >= 2:
        return n_devices // 2, 2, 1
    return n_devices, 1, 1


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization (DCN across slices, SURVEY §2.8/§5).

    Thin wrapper over jax.distributed.initialize; no-ops when already
    initialized or when running single-process.
    """
    if num_processes in (None, 1):
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized
