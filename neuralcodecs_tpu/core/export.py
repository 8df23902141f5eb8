"""Model export: params -> safetensors + config.json artifacts.

The reference only consumes checkpoints (SURVEY §5 "checkpoint/resume":
weights-in, no weights-out). The TPU framework also PRODUCES them: a model
directory holds ``model.safetensors`` (canonical-layout params converted
back to the torch-compatible layouts where applicable) plus ``config.json``,
loadable by ``save_pretrained``'s dual ``load_pretrained`` or by the normal
loader path.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from neuralcodecs_tpu.core.registry import registry
from neuralcodecs_tpu.core.safetensors_io import load_safetensors, save_safetensors


def save_pretrained(model, directory: str | Path,
                    max_shard_bytes: int | None = None) -> Path:
    """Write ``model.safetensors`` (native-layout params) + ``config.json``.

    With ``max_shard_bytes`` set (e.g. 2 GB for multi-GB Dia exports), the
    params are split into ``model-XXXXX-of-YYYYY.safetensors`` shards plus
    a standard HF ``model.safetensors.index.json`` that the importer (and
    the HF ecosystem) reads back.
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    # remove any previous export layout so a re-save cannot leave a stale
    # index/shards (load prefers the index) or a stale single file behind
    for old_file in [directory / "model.safetensors",
                     directory / "model.safetensors.index.json",
                     *directory.glob("model-*-of-*.safetensors")]:
        if old_file.is_file():
            old_file.unlink()
    tensors = {name: np.asarray(arr) for name, arr in model.params.items()}
    meta = {"format": "neuralcodecs-tpu", "layout": "native",
            "architecture": model.config.architecture}
    total = sum(t.nbytes for t in tensors.values())
    if max_shard_bytes is not None and total > max_shard_bytes:
        shards: list[dict[str, np.ndarray]] = [{}]
        used = 0
        for name, arr in tensors.items():
            if used and used + arr.nbytes > max_shard_bytes:
                shards.append({})
                used = 0
            shards[-1][name] = arr
            used += arr.nbytes
        n = len(shards)
        weight_map = {}
        for i, shard in enumerate(shards):
            shard_name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_safetensors(directory / shard_name, shard, metadata=meta)
            weight_map.update({k: shard_name for k in shard})
        (directory / "model.safetensors.index.json").write_text(json.dumps(
            {"metadata": {"total_size": total}, "weight_map": weight_map},
            indent=2))
    else:
        save_safetensors(directory / "model.safetensors", tensors, metadata=meta)
    config = dict(model.config.to_dict())
    config["architecture"] = model.config.architecture
    (directory / "config.json").write_text(json.dumps(config, indent=2))
    return directory


def load_pretrained(directory: str | Path, architecture: str | None = None):
    """Load a save_pretrained directory back into a model instance.

    Native-layout tensors are assigned directly (no torch-layout
    conversion), so export/import round-trips are bit-exact.
    """
    directory = Path(directory)
    config_data = json.loads((directory / "config.json").read_text())
    architecture = architecture or config_data.get("architecture", "")
    entry = registry.get(architecture)
    config = entry.config_cls.from_dict(config_data)
    model = entry.factory(config)
    import jax.numpy as jnp

    index = directory / "model.safetensors.index.json"
    if index.is_file():
        from neuralcodecs_tpu.core.importer import load_state_dict as _load

        tensors = _load(index)
    else:
        tensors = load_safetensors(directory / "model.safetensors")
    missing = set(model.params) - set(tensors)
    if missing:
        from neuralcodecs_tpu.core.exceptions import LoadError

        raise LoadError(f"Missing tensors in {directory}: {sorted(missing)[:5]}...")
    model.params = {name: jnp.asarray(tensors[name]) for name in model.params}
    return model
