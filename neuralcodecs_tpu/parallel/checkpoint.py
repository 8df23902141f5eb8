"""Training checkpoint/resume via orbax.

The reference has no training and therefore no training checkpoints
(SURVEY §5); this module provides the TPU-native story: the full TrainState
(params + optimizer state + step) saved/restored with
orbax.checkpoint.PyTreeCheckpointer, preserving shardings on restore when a
mesh is supplied.
"""

from __future__ import annotations

from pathlib import Path

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

from neuralcodecs_tpu.parallel.train import TrainState


def save_train_state(state: TrainState, directory: str | Path) -> Path:
    """Write the full TrainState under ``directory`` (atomic orbax save)."""
    assert _HAS_ORBAX, "orbax-checkpoint is required for training checkpoints"
    directory = Path(directory).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    checkpointer.save(directory, tree, force=True)
    return directory


def restore_train_state(directory: str | Path,
                        template: TrainState | None = None,
                        shardings=None) -> TrainState:
    """Restore a TrainState; with ``template``/``shardings`` arrays are placed
    directly onto their mesh devices during restore (no host detour)."""
    assert _HAS_ORBAX, "orbax-checkpoint is required for training checkpoints"
    directory = Path(directory).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        target = {"params": template.params, "opt_state": template.opt_state,
                  "step": template.step}
        # construct per-leaf restore args from the template so arrays are
        # restored straight onto the template's shardings (no sharding-file
        # fallback, which orbax warns is unsafe across topologies)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        tree = checkpointer.restore(directory, item=target,
                                    restore_args=restore_args)
    else:
        tree = checkpointer.restore(directory)
    if shardings is not None:
        tree["params"] = {
            k: jax.device_put(v, shardings[k]) if k in shardings else v
            for k, v in tree["params"].items()
        }
    return TrainState(params=tree["params"], opt_state=tree["opt_state"],
                      step=tree["step"])
