""".dac artifact: encoded DAC codes + config on disk.

Counterpart of /root/reference/NeuralCodecs.Torch/AudioTools/DACFile.cs:
config JSON + a list of int32 code tensors. Binary layout here:
``b"DACF"`` magic, u32 version, u32 config-JSON length, JSON, u32 tensor
count, then per tensor: u32 ndim, i64 dims, raw little-endian int32 data.
(The C# file uses .NET BinaryWriter string framing, which is
platform-specific; this framing is explicit and self-describing.)
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

from neuralcodecs_tpu.models.dac.config import DACConfig

_MAGIC = b"DACF"
_VERSION = 1


def save_dac_file(path: str | Path, codes: list[np.ndarray],
                  config: DACConfig) -> None:
    config_json = json.dumps(config.to_dict()).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", _VERSION))
        f.write(struct.pack("<I", len(config_json)))
        f.write(config_json)
        f.write(struct.pack("<I", len(codes)))
        for code in codes:
            arr = np.ascontiguousarray(np.asarray(code), dtype=np.int32)
            f.write(struct.pack("<I", arr.ndim))
            for dim in arr.shape:
                f.write(struct.pack("<q", dim))
            f.write(arr.tobytes())


def load_dac_file(path: str | Path) -> tuple[list[np.ndarray], DACConfig]:
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError("Not a .dac artifact")
        (version,) = struct.unpack("<I", f.read(4))
        if version != _VERSION:
            raise ValueError(f"Unsupported .dac version {version}")
        (config_len,) = struct.unpack("<I", f.read(4))
        config = DACConfig.from_dict(json.loads(f.read(config_len)))
        (count,) = struct.unpack("<I", f.read(4))
        codes = []
        for _ in range(count):
            (ndim,) = struct.unpack("<I", f.read(4))
            shape = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(f.read(4 * n), np.int32).reshape(shape)
            codes.append(arr)
    return codes, config
