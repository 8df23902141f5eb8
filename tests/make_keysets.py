"""Generate the real-checkpoint key-set fixtures in tests/keysets/.

    python tests/make_keysets.py

Each JSON fixture pins the EXACT state-dict key set (name -> shape) of a
published checkpoint family, so a name-mapping slip in any model's
``convert()`` fails CI instead of failing on the first real download.

Provenance (no network in the build environment, so the key grammar is
derived from the same evidence chain the reference used to load the real
files — cite-checked against the reference's module registrations):

- ``snac_24khz.json`` / ``snac_44khz.json``  — hubertsiuzdak/snac_*
  (pytorch_model.bin): torch-dotted names with NEW-style weight-norm
  parametrizations (``*.parametrizations.weight.original0/original1``) —
  the naming the reference's WNConv1d registers and loads 1:1
  (Modules/SNAC/WNConv1d.cs:66-77), plus the persistent ``rel_pos.inv_freq``
  buffer (SinusoidalEmbedding.cs:46 registers it persistent).
- ``dac_44khz.json`` — descript/dac_44khz weights.pth: legacy weight-norm
  pairs (``*.weight_g``/``*.weight_v``) on every conv, torch-dotted names
  (Config/DAC/StateDictNameConverter.cs:29-35 drops exactly these pairs).
- ``encodec_24khz.json`` / ``encodec_48khz.json`` — facebook/encodec_*:
  SEANet ``encoder.model.N.conv.conv.*`` / ``decoder.model.N.convtr.convtr.*``
  grammar with legacy weight norm (24k) or time-group-norm ``conv.norm.*``
  (48k), LSTM ``lstm.weight_ih_l0`` etc., and EMA codebooks
  ``quantizer.vq.layers.N._codebook.{embed,embed_avg,cluster_size,inited}``
  (the grammar Models/Encodec.cs + Modules/Encodec/NormConv1d.cs load).
- ``dia.json`` — nari-labs/Dia-1.6B: checkpoint-native names = this repo's
  Dia param names (verified by the name-mapping test); generated with the
  REAL layer/channel counts but narrow dims, so only names are pinned.

When the environment has network, the opt-in test in test_keysets.py
(NEURALCODECS_NETWORK_TESTS=1) downloads a real checkpoint and checks the
fixture against the actual file.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
KEYSET_DIR = HERE / "keysets"


# ---------------------------------------------------------------------------
# weight-norm expansion (module state dict -> real checkpoint key set)
# ---------------------------------------------------------------------------

def expand_weight_norm(sd: dict, style: str) -> dict[str, list[int]]:
    """Expand every conv ``.weight`` (ndim==3) into the weight-norm pair the
    real checkpoints store. g/original0 has shape [dim0, 1, 1] (torch
    weight_norm dim=0 over a [out|in, ch, k] tensor)."""
    out: dict[str, list[int]] = {}
    for key, value in sd.items():
        shape = list(value.shape)
        if key.endswith(".weight") and value.ndim == 3:
            base = key[: -len(".weight")]
            if style == "parametrizations":
                out[f"{base}.parametrizations.weight.original0"] = [shape[0], 1, 1]
                out[f"{base}.parametrizations.weight.original1"] = shape
            elif style == "legacy":
                out[f"{base}.weight_g"] = [shape[0], 1, 1]
                out[f"{base}.weight_v"] = shape
            else:
                raise ValueError(style)
        else:
            out[key] = shape
    return out


# ---------------------------------------------------------------------------
# SNAC / DAC (torch-oracle module trees at full published size)
# ---------------------------------------------------------------------------

def snac_keyset(cfg) -> dict:
    import torch

    from oracles import LocalMHAT, SNACOracle
    from test_snac import oracle_state_dict

    with torch.device("meta"):
        oracle = SNACOracle(cfg)
    sd = {k: v for k, v in oracle.state_dict().items()}
    named = oracle_state_dict_shapes(sd, oracle_state_dict)
    keys = expand_weight_norm(named, "parametrizations")
    ignored = {}
    for path, module in oracle.named_modules():
        if isinstance(module, LocalMHAT):
            import re
            mapped = re.sub(r"^encoder\.(\d+)", r"encoder.block.\1", path)
            mapped = re.sub(r"^decoder\.(\d+)", r"decoder.model.\1", mapped)
            # persistent sinusoidal buffer present in the real file but
            # recomputed (not consumed) at import
            ignored[f"{mapped}.rel_pos.inv_freq"] = [module.inv_freq.shape[0]]
    return {"keys": keys, "ignored": ignored}


def dac_keyset(cfg) -> dict:
    import torch

    from oracles import DACOracle
    from test_dac import oracle_state_dict

    with torch.device("meta"):
        oracle = DACOracle(cfg)
    sd = {k: v for k, v in oracle.state_dict().items()}
    named = oracle_state_dict_shapes(sd, oracle_state_dict)
    return {"keys": expand_weight_norm(named, "legacy"), "ignored": {}}


def oracle_state_dict_shapes(raw_sd: dict, mapper) -> dict:
    """Apply a test oracle's name mapper to a {name: tensor} dict."""

    class _Shim:
        def __init__(self, sd):
            self._sd = sd

        def state_dict(self):
            return self._sd

    class _T:
        """Tensor shim exposing .numpy()->shape-carrying ndarray."""

        def __init__(self, t):
            self._t = t

        def numpy(self):
            import numpy as np

            return np.broadcast_to(np.float32(0), tuple(self._t.shape))

    return mapper(_Shim({k: _T(v) for k, v in raw_sd.items()}))


# ---------------------------------------------------------------------------
# Encodec (oracle module tree + real SEANet naming grammar)
# ---------------------------------------------------------------------------

def encodec_keyset(cfg, n_q: int) -> dict:
    import torch

    from oracles import EncodecOracle, SConv1dT, SConvTr1dT

    with torch.device("meta"):
        oracle = EncodecOracle(cfg, n_q)

    # map each oracle module path to the real checkpoint prefix
    conv_paths: dict[str, str] = {}     # oracle path -> "conv" | "convtr"
    for path, module in oracle.named_modules():
        if isinstance(module, SConv1dT):
            conv_paths[path] = "conv"
        elif isinstance(module, SConvTr1dT):
            conv_paths[path] = "convtr"

    import re

    named: dict = {}
    for key, value in oracle.state_dict().items():
        new = re.sub(r"^(encoder|decoder)\.(\d+)", r"\1.model.\2", key)
        for path, kind in conv_paths.items():
            real = re.sub(r"^(encoder|decoder)\.(\d+)", r"\1.model.\2", path)
            if new == f"{real}.conv.weight" or new == f"{real}.conv.bias":
                new = new.replace(f"{real}.conv.", f"{real}.{kind}.{kind}.")
                break
            if new.startswith(f"{real}.norm."):
                new = new.replace(f"{real}.norm.", f"{real}.{kind}.norm.")
                break
        new = new.replace("quantizer.layers.", "quantizer.vq.layers.")
        new = new.replace(".codebook.embed", "._codebook.embed")
        named[new] = value

    style = "legacy" if cfg.norm_type == "weight_norm" else None
    keys: dict[str, list[int]] = {}
    for key, value in named.items():
        shape = list(value.shape)
        if (style == "legacy" and key.endswith(".weight") and value.ndim == 3
                and "_codebook" not in key):
            keys[f"{key}_g"] = [shape[0], 1, 1]
            keys[f"{key}_v"] = shape
        else:
            keys[key] = shape
    # EMA codebook training-state tensors present in the published files
    for i in range(n_q):
        prefix = f"quantizer.vq.layers.{i}._codebook"
        k_sz, k_dim = keys[f"{prefix}.embed"]
        keys[f"{prefix}.embed_avg"] = [k_sz, k_dim]
        keys[f"{prefix}.cluster_size"] = [k_sz]
        keys[f"{prefix}.inited"] = [1]
    return {"keys": keys, "ignored": {}}


# ---------------------------------------------------------------------------
# Dia (names only: real layer/channel counts, narrow dims)
# ---------------------------------------------------------------------------

def dia_narrow_config():
    from neuralcodecs_tpu.models.dia.config import (
        DiaConfig, DiaDataConfig, DiaDecoderConfig, DiaEncoderConfig)

    return DiaConfig(
        data=DiaDataConfig(text_length=32, audio_length=64),  # real channels=9
        encoder=DiaEncoderConfig(n_layer=12, n_embd=64, n_hidden=128,
                                 n_head=4, head_dim=16),
        decoder=DiaDecoderConfig(n_layer=18, n_embd=64, n_hidden=128,
                                 gqa_query_heads=4, kv_heads=2,
                                 gqa_head_dim=16, cross_query_heads=4,
                                 cross_head_dim=16),
    )


def dia_keyset() -> dict:
    from neuralcodecs_tpu.models.dia import Dia

    dia = Dia(dia_narrow_config(), seed=0)
    return {"keys": sorted(dia.params.keys()), "ignored": {},
            "note": "names only (narrow dims, real layer/channel counts)"}


def main() -> None:
    KEYSET_DIR.mkdir(exist_ok=True)

    from neuralcodecs_tpu.models.dac import DACConfig
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig
    from neuralcodecs_tpu.models.snac import SNACConfig

    fixtures = {
        "snac_24khz.json": lambda: snac_keyset(SNACConfig.snac_24khz()),
        "snac_44khz.json": lambda: snac_keyset(SNACConfig.snac_44khz()),
        "dac_44khz.json": lambda: dac_keyset(DACConfig.dac_44khz()),
        "encodec_24khz.json": lambda: encodec_keyset(
            EncodecConfig.encodec_24khz(),
            Encodec(EncodecConfig.encodec_24khz(), params={}).num_codebooks),
        "encodec_48khz.json": lambda: encodec_keyset(
            EncodecConfig.encodec_48khz(),
            Encodec(EncodecConfig.encodec_48khz(), params={}).num_codebooks),
        "dia.json": dia_keyset,
    }
    for name, fn in fixtures.items():
        data = fn()
        path = KEYSET_DIR / name
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
        n = len(data["keys"])
        print(f"{name}: {n} keys, {path.stat().st_size / 1e3:.1f} kB")


if __name__ == "__main__":
    main()
