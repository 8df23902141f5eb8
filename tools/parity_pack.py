#!/usr/bin/env python
"""Portable real-checkpoint parity pack (VERDICT r4 #6).

The TPU build environment is egress-less, so no published checkpoint has
ever passed through this code there (PERF.md "Real published weights").
This tool makes the check PORTABLE: run it once on any machine with
network access —

    python tools/parity_pack.py [--models snac_24khz,dac_44khz,...]
                                [--out tests/parity_pack]

— and it downloads the published checkpoints through the PRODUCTION load
path (`core.loader.ModelLoader`: resolve -> cache -> DACUnpickler /
safetensors import -> name conversion -> WN folding; the same stack the
reference exercises, TorchModelLoader.cs:386-502), runs a deterministic
round-trip, and writes a small committable bundle:

    tests/parity_pack/pack.json          per-model record (see below)
    tests/parity_pack/<id>_codes.npz     the emitted code arrays

`tests/test_parity_pack.py` then verifies the bundle offline on every
machine (structure, config echoes vs current presets, SNR floors,
keyset-shape agreement) and — when the cached weights are available
locally — re-runs the full numeric round-trip against the recorded codes.

Per-model record:
  source              zoo id + resolved source string
  config_echo         the preset config as loaded (JSON dict)
  param_count / param_elems
  weights_fingerprint sha256 over "name:sha256(tensor-bytes)" lines of the
                      CONVERTED params — pins the loader+converter output,
                      machine-independently (pure numpy path)
  signal              deterministic input spec (seed/seconds/formula v1)
  codes_sha256        sha256 of the concatenated code arrays
  snr_db              decode SNR vs input (after codec round-trip)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_MODELS = ["snac_24khz", "dac_44khz", "encodec_24khz", "encodec_48khz"]
SIGNAL_VERSION = 1


def parity_signal(sample_rate: int, channels: int, seconds: float = 3.0,
                  seed: int = 12345) -> np.ndarray:
    """Deterministic test input, version 1: a 100->4000 Hz linear chirp at
    0.5 amplitude plus seeded noise at 0.05. Any change bumps
    SIGNAL_VERSION (recorded in the pack)."""
    n = int(sample_rate * seconds)
    t = np.arange(n, dtype=np.float64) / sample_rate
    f0, f1 = 100.0, 4000.0
    phase = 2 * np.pi * (f0 * t + 0.5 * (f1 - f0) / seconds * t * t)
    chirp = 0.5 * np.sin(phase)
    rng = np.random.default_rng(seed)
    noise = 0.05 * rng.standard_normal((channels, n))
    return (chirp[None, :] + noise).astype(np.float32)


def weights_fingerprint(params: dict) -> str:
    lines = []
    for name in sorted(params):
        arr = np.asarray(params[name])
        lines.append(f"{name}:{arr.dtype}:{arr.shape}:"
                     f"{hashlib.sha256(arr.tobytes()).hexdigest()}")
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def _roundtrip(model_id: str, model, signal: np.ndarray):
    """-> (codes: dict[str, np.ndarray], decoded [C, T] np.float32)."""
    if model_id.startswith("snac"):
        codes = model.encode(signal)  # list of per-scale [B, frames_i]
        audio = np.asarray(model.decode(codes))  # [B, T]
        return ({f"scale{i}": np.asarray(c) for i, c in enumerate(codes)},
                audio)
    if model_id.startswith("dac"):
        _, codes, *_ = model.encode(signal)  # codes [B, Nq, T]
        audio = np.asarray(model.from_codes(codes))  # [B, T*hop]
        return {"codes": np.asarray(codes)}, audio
    if model_id.startswith("encodec"):
        frames = model.encode(signal)
        audio = np.asarray(model.decode(frames))[..., : signal.shape[-1]]
        rec = {}
        for i, f in enumerate(frames):
            rec[f"frame{i}_codes"] = np.asarray(f.codes)
            if f.scale is not None:
                rec[f"frame{i}_scale"] = np.asarray(f.scale)
        return rec, audio[0]
    raise ValueError(f"unsupported model id {model_id}")


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    n = min(ref.shape[-1], est.shape[-1])
    ref, est = ref[..., :n].astype(np.float64), est[..., :n].astype(np.float64)
    err = np.mean((ref - est) ** 2)
    sig = np.mean(ref ** 2)
    return float(10.0 * np.log10(sig / max(err, 1e-30)))


def codes_sha256(codes: dict) -> str:
    h = hashlib.sha256()
    for name in sorted(codes):
        arr = np.ascontiguousarray(codes[name])
        h.update(name.encode())
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def build_pack(models: list[str], out_dir: Path, load_fn=None) -> dict:
    """`load_fn(model_id) -> model` defaults to the production zoo loader;
    tests inject tiny random-init factories to exercise the full pipeline
    offline (tests/test_parity_pack.py)."""
    import jax

    if load_fn is None:
        from neuralcodecs_tpu.core.zoo import load_zoo_model as load_fn

    out_dir.mkdir(parents=True, exist_ok=True)
    pack = {"signal_version": SIGNAL_VERSION,
            "jax_version": jax.__version__,
            "platform": jax.default_backend(),
            "models": {}}
    for model_id in models:
        print(f"[{model_id}] loading through production path ...", flush=True)
        model = load_fn(model_id)
        cfg = model.config
        sr = cfg.sample_rate
        channels = getattr(cfg, "channels", 1)
        signal = parity_signal(sr, channels)
        print(f"[{model_id}] round-trip ...", flush=True)
        codes, decoded = _roundtrip(model_id, model, signal)
        rec = {
            "source": model_id,
            "config_echo": {k: v for k, v in vars(cfg).items()
                            if isinstance(v, (int, float, str, bool, list,
                                              type(None)))},
            "param_count": len(model.params),
            "param_elems": int(sum(int(np.prod(np.shape(v)))
                                   for v in model.params.values())),
            "weights_fingerprint": weights_fingerprint(model.params),
            "signal": {"version": SIGNAL_VERSION, "seed": 12345,
                       "seconds": 3.0, "sample_rate": sr,
                       "channels": channels},
            "codes_sha256": codes_sha256(codes),
            "snr_db": round(snr_db(signal, decoded), 2),
        }
        np.savez_compressed(out_dir / f"{model_id}_codes.npz", **codes)
        pack["models"][model_id] = rec
        print(f"[{model_id}] snr={rec['snr_db']} dB "
              f"codes={rec['codes_sha256'][:16]} "
              f"weights={rec['weights_fingerprint'][:16]}", flush=True)
    (out_dir / "pack.json").write_text(json.dumps(pack, indent=1,
                                                  sort_keys=True))
    print(f"wrote {out_dir / 'pack.json'}", flush=True)
    return pack


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS),
                    help="comma-separated zoo ids")
    ap.add_argument("--out", default=str(REPO / "tests" / "parity_pack"))
    args = ap.parse_args()
    build_pack([m.strip() for m in args.models.split(",") if m.strip()],
               Path(args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
