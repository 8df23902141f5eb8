"""Checkpoint importer: any supported weight file -> flat numpy state dict.

This is the TPU rebuild of the reference's weight-loading stack
(TorchModelLoader.LoadWeights /root/reference/NeuralCodecs.Torch/TorchModelLoader.cs:484,
 SNAC.LoadWeights Models/SNAC.cs:200-240, DACUnpickler Config/DAC/DACUnpickler.cs,
 StateDictNameConverter Config/DAC/StateDictNameConverter.cs:40-65).

Key TPU-first design decision: **weight norm is folded at import time.** The
reference recomputes w = g·v/‖v‖ on every forward
(Modules/SNAC/WNConv1d.cs:122-144); folding it once here makes every conv a
plain conv on device — a free speedup and one fewer source of fp drift.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from neuralcodecs_tpu.core.exceptions import LoadError
from neuralcodecs_tpu.core.files import (
    ModelFileType,
    detect_file_type,
    is_shard_index,
    safe_child_path,
)
from neuralcodecs_tpu.core.safetensors_io import load_safetensors
from neuralcodecs_tpu.core.torch_pickle import load_torch_checkpoint

StateDict = dict[str, np.ndarray]


def load_state_dict(path: str | Path) -> StateDict:
    """Load a weights file of any supported type into a flat state dict.

    Handles the nesting conventions the reference handles: top-level
    ``state_dict`` keys and DAC's ``{"metadata": ..., "state_dict": ...}``
    .pth layout (DACUnpickler.cs) — plus HF sharded checkpoints
    (``*.safetensors.index.json`` / ``*.bin.index.json``), which the
    reference predates: the index's weight_map names per-tensor shard
    files that are loaded and merged.
    """
    path = Path(path)
    if not path.is_file():
        raise LoadError(f"Weights file not found: {path}")
    if is_shard_index(path):
        return _load_sharded(path)
    ftype = detect_file_type(path)
    if ftype == ModelFileType.SAFETENSORS:
        sd: Any = load_safetensors(path)
    elif ftype in (ModelFileType.PYTORCH, ModelFileType.CHECKPOINT, ModelFileType.WEIGHTS):
        sd = load_torch_checkpoint(path)
    elif ftype == ModelFileType.NUMPY:
        with np.load(path) as npz:
            sd = {k: npz[k] for k in npz.files}
    else:
        raise LoadError(f"Unsupported weights file type {ftype} for {path}")
    return normalize_state_dict(sd)


def _load_sharded(index_path: Path) -> StateDict:
    """Merge an HF sharded checkpoint via its index's weight_map."""
    import json

    try:
        index = json.loads(index_path.read_text())
        weight_map: dict[str, str] = index["weight_map"]
    except (json.JSONDecodeError, KeyError, TypeError) as exc:
        raise LoadError(f"Malformed shard index {index_path}") from exc
    merged: StateDict = {}
    for shard_name in sorted(set(weight_map.values())):
        try:
            shard_path = safe_child_path(index_path.parent, shard_name)
        except ValueError as exc:
            raise LoadError(f"Unsafe shard name {shard_name!r} in "
                            f"{index_path.name}") from exc
        if not shard_path.is_file():
            raise LoadError(
                f"Shard {shard_name} referenced by {index_path.name} is "
                "missing (incomplete download?)")
        merged.update(load_state_dict(shard_path))
    missing = set(weight_map) - set(merged)
    if missing:
        raise LoadError(f"Shard index names tensors absent from the shards: "
                        f"{sorted(missing)[:5]}")
    return merged


def normalize_state_dict(obj: Any) -> StateDict:
    """Unwrap checkpoint nesting and flatten to {dotted_name: ndarray}."""
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "weights"):
            inner = obj.get(key)
            if isinstance(inner, dict) and _looks_like_state_dict(inner):
                obj = inner
                break
    if not isinstance(obj, dict):
        raise LoadError(f"Checkpoint does not contain a state dict (got {type(obj)})")
    flat: StateDict = {}
    _flatten(obj, "", flat)
    if not flat:
        raise LoadError("Checkpoint contained no tensors")
    return flat


def _looks_like_state_dict(d: dict) -> bool:
    arrays = sum(1 for v in d.values() if isinstance(v, np.ndarray))
    return arrays > 0 and arrays >= len(d) // 2


def _flatten(obj: Any, prefix: str, out: StateDict) -> None:
    if isinstance(obj, np.ndarray):
        out[prefix] = obj
    elif isinstance(obj, (float, int)) and prefix:
        out[prefix] = np.asarray(obj)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            if not isinstance(k, str):
                continue
            _flatten(v, f"{prefix}.{k}" if prefix else k, out)
    # other leaf types (strings, None, stubs) are dropped


# ---------------------------------------------------------------------------
# Weight-norm folding
# ---------------------------------------------------------------------------

_WN_SUFFIXES = [
    # (g suffix, v suffix) — new-style parametrizations, then legacy names
    (".parametrizations.weight.original0", ".parametrizations.weight.original1"),
    (".weight_g", ".weight_v"),
]


def fold_weight_norm(sd: StateDict) -> StateDict:
    """Fold weight-norm (g, v) parameter pairs into plain ``weight`` tensors.

    w = g * v / ||v|| with the L2 norm over all dims except dim 0 (PyTorch
    weight_norm(dim=0) semantics — for Conv1d that is per-out-channel, for
    ConvTranspose1d per-in-channel, matching the stored tensor layouts).
    Mirrors StateDictNameConverter's weight_v/weight_g recombination
    (/root/reference/.../StateDictNameConverter.cs:40-65) but done once, at
    import, instead of every forward.
    """
    out: StateDict = {}
    consumed: set[str] = set()
    for key in sd:
        for g_suf, v_suf in _WN_SUFFIXES:
            if key.endswith(g_suf):
                base = key[: -len(g_suf)]
                v_key = base + v_suf
                if v_key in sd:
                    g = sd[key].astype(np.float32)
                    v = sd[v_key].astype(np.float32)
                    reduce_dims = tuple(range(1, v.ndim))
                    norm = np.sqrt(np.sum(v * v, axis=reduce_dims, keepdims=True))
                    g = g.reshape(norm.shape) if g.size == norm.size else g
                    out[base + ".weight"] = (g * v / norm).astype(np.float32)
                    consumed.add(key)
                    consumed.add(v_key)
                break
    for key, value in sd.items():
        if key not in consumed:
            out[key] = value
    return out


def strip_prefix(sd: StateDict, prefixes: tuple[str, ...] = ("module.", "model.")) -> StateDict:
    """Remove wrapper prefixes (DataParallel 'module.', lightning 'model.')."""
    for prefix in prefixes:
        if sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def import_checkpoint(path: str | Path) -> StateDict:
    """Full import pipeline: load -> unwrap -> fold weight norm."""
    return fold_weight_norm(strip_prefix(load_state_dict(path)))
