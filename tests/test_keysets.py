"""Real-checkpoint key-set gates.

Fixtures in tests/keysets/ pin the exact state-dict key sets (+shapes) of
the published checkpoints (see make_keysets.py for the provenance chain).
Two gates per family:

1. **consumption** — a synthetic checkpoint with exactly the fixture's keys
   must import through the full pipeline (strip prefix -> fold weight norm
   -> convert) with EVERY key consumed and none missing. A name-mapping
   slip in any model's convert() fails here instead of on the first real
   download.
2. **freeze** — regenerating the key set from the current module trees must
   equal the frozen fixture, so naming drift is caught at the PR that
   introduces it.

Set NEURALCODECS_NETWORK_TESTS=1 to additionally download a real
checkpoint and check the fixture against the actual file.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from neuralcodecs_tpu.core.importer import fold_weight_norm, strip_prefix

KEYSET_DIR = Path(__file__).resolve().parent / "keysets"


def _load_fixture(name: str) -> dict:
    return json.loads((KEYSET_DIR / f"{name}.json").read_text())


def _synthetic_sd(keys: dict[str, list[int]], seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in keys.items():
        a = rng.standard_normal(shape).astype(np.float32) * 0.05
        if key.endswith(("original0", "weight_g", ".alpha", ".inited")):
            a = np.abs(a) + 0.5  # norms/scales must be positive
        sd[key] = a
    return sd


class _RecordingDict(dict):
    """Records which keys convert() actually reads."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.read: set[str] = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        self.read.add(key)
        return super().get(key, default)


def _assert_full_consumption(model, fixture: dict, seed: int = 0,
                             normalize=None):
    sd = _synthetic_sd(fixture["keys"], seed)
    sd.update(_synthetic_sd(fixture.get("ignored", {}), seed + 1))
    folded = fold_weight_norm(strip_prefix(sd))
    ignored = set(fixture.get("ignored", {}))
    if normalize is not None:
        # model-specific source-name normalization is a copying transform, so
        # instrument consumption at the normalized level and drive the
        # convert layer directly; must be lossless first
        normalized = normalize({k: v for k, v in folded.items()
                                if k not in ignored})
        assert len(normalized) == len(folded) - len(ignored), \
            "name normalization collided/dropped keys"
        rec = _RecordingDict(normalized)
        params = {}
        for module in model._modules:
            module.convert(rec, params)  # raises LoadError on missing keys
        model.params = params
        unread = set(normalized) - rec.read
    else:
        rec = _RecordingDict(folded)
        model.load_state_dict(rec)  # raises LoadError on any missing key
        unread = (set(folded) - ignored) - rec.read
    assert not unread, f"keys present in real checkpoints but never consumed: {sorted(unread)[:8]}"
    return model


@pytest.mark.slow
def test_snac_24khz_keyset_consumed():
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    model = SNAC(SNACConfig.snac_24khz(), params={})
    _assert_full_consumption(model, _load_fixture("snac_24khz"))
    # loaded params must cover the model's own parameter inventory
    fresh = SNAC(SNACConfig.snac_24khz(), params={})
    fresh_keys = set(SNAC(SNACConfig.snac_24khz(), seed=0).params)
    assert set(model.params) == fresh_keys


def test_snac_44khz_keyset_consumed():
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    model = SNAC(SNACConfig.snac_44khz(), params={})
    _assert_full_consumption(model, _load_fixture("snac_44khz"))


def test_dac_44khz_keyset_consumed():
    from neuralcodecs_tpu.models.dac import DAC, DACConfig

    model = DAC(DACConfig.dac_44khz(), params={})
    _assert_full_consumption(model, _load_fixture("dac_44khz"))


@pytest.mark.parametrize("preset", ["encodec_24khz", "encodec_48khz"])
def test_encodec_keyset_consumed(preset):
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig

    from neuralcodecs_tpu.models.encodec.model import _normalize_source_names

    cfg = getattr(EncodecConfig, preset)()
    model = Encodec(cfg, params={})
    # normalization is idempotent, so pre-normalizing for instrumentation
    # does not change what load_state_dict sees
    _assert_full_consumption(model, _load_fixture(preset),
                             normalize=_normalize_source_names)


def test_dia_keyset_consumed():
    from make_keysets import dia_narrow_config

    from neuralcodecs_tpu.models.dia import Dia

    fixture = _load_fixture("dia")
    dia = Dia(dia_narrow_config(), seed=0)
    assert sorted(dia.params.keys()) == fixture["keys"], (
        "Dia param names drifted from the pinned nari-labs checkpoint names")
    # and the checkpoint-shaped dict (model. prefix) loads by name
    sd = {f"model.{k}": np.asarray(v) for k, v in dia.params.items()}
    Dia(dia_narrow_config(), seed=1).load_state_dict(sd)


def test_keysets_frozen_against_regeneration():
    """Regenerating every key set from the current module trees must match
    the committed fixtures exactly (catches naming drift at the source)."""
    from make_keysets import dac_keyset, dia_keyset, encodec_keyset, snac_keyset

    from neuralcodecs_tpu.models.dac import DACConfig
    from neuralcodecs_tpu.models.encodec import Encodec, EncodecConfig
    from neuralcodecs_tpu.models.snac import SNACConfig

    regen = {
        "snac_24khz": lambda: snac_keyset(SNACConfig.snac_24khz()),
        "snac_44khz": lambda: snac_keyset(SNACConfig.snac_44khz()),
        "dac_44khz": lambda: dac_keyset(DACConfig.dac_44khz()),
        "encodec_24khz": lambda: encodec_keyset(
            EncodecConfig.encodec_24khz(),
            Encodec(EncodecConfig.encodec_24khz(), params={}).num_codebooks),
        "encodec_48khz": lambda: encodec_keyset(
            EncodecConfig.encodec_48khz(),
            Encodec(EncodecConfig.encodec_48khz(), params={}).num_codebooks),
        "dia": dia_keyset,
    }
    for name, fn in regen.items():
        frozen = _load_fixture(name)
        got = json.loads(json.dumps(fn()))  # normalize tuples -> lists
        assert got["keys"] == frozen["keys"], f"{name} key set drifted"
        assert got.get("ignored", {}) == frozen.get("ignored", {})


@pytest.mark.skipif(not os.environ.get("NEURALCODECS_NETWORK_TESTS"),
                    reason="network tests disabled (set NEURALCODECS_NETWORK_TESTS=1)")
def test_real_snac_checkpoint_matches_fixture():
    """Opt-in: download the real hubertsiuzdak/snac_24khz checkpoint and
    check the frozen fixture against the actual file, then validate."""
    from neuralcodecs_tpu.core.importer import load_state_dict as load_sd
    from neuralcodecs_tpu.core.loader import LoadOptions, ModelLoader
    from neuralcodecs_tpu.core.validation import validate_model

    loader = ModelLoader()
    path = loader.resolve("hubertsiuzdak/snac_24khz", LoadOptions())
    raw = load_sd(path)
    fixture = _load_fixture("snac_24khz")
    expected = set(fixture["keys"]) | set(fixture.get("ignored", {}))
    assert set(raw) == expected

    from neuralcodecs_tpu.core.loader import load_snac

    model = load_snac("hubertsiuzdak/snac_24khz")
    validate_model(model)
