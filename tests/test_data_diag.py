"""Data pipeline, diagnostics, profiler-guard tests."""

import numpy as np
import pytest

from neuralcodecs_tpu.diagnostics import (
    DiagnosticsContext,
    NullDiagnosticsContext,
    compare_tensors,
)


def _write_tone(path, sr=8000, seconds=0.4, freq=440.0):
    from neuralcodecs_tpu.dsp.signal import AudioSignal

    t = np.arange(int(sr * seconds)) / sr
    AudioSignal((0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr).write(path)


def test_audio_crop_dataset(tmp_path):
    from neuralcodecs_tpu.parallel.data import AudioCropDataset, find_audio_files, prefetch

    for i in range(3):
        _write_tone(tmp_path / f"tone{i}.wav", freq=200.0 + 100 * i)
    assert len(find_audio_files(tmp_path)) == 3

    ds = AudioCropDataset(tmp_path, sample_rate=8000, crop_seconds=0.1,
                          batch_size=4, loop=False)
    batches = list(prefetch(iter(ds)))
    assert len(batches) == 1
    batch = batches[0]
    assert batch.shape == (4, 800, 1)
    assert batch.dtype == np.float32
    assert np.abs(batch).max() > 0


def test_diagnostics_context(tmp_path):
    ctx = DiagnosticsContext(dump_dir=tmp_path)
    with ctx.track_scope("encoder"):
        pass
    stats = ctx.log_tensor("encoder", "z", np.array([1.0, 2.0, np.nan]))
    assert stats.nan_count == 1
    assert ctx.anomalies
    assert (tmp_path / "encoder.z.npy").exists()
    summary = ctx.summary()
    assert "encoder" in summary and "anomalies" in summary

    null = NullDiagnosticsContext()
    assert null.log_tensor("x", "y", np.ones(3)) is None


def test_compare_tensors():
    a = np.random.default_rng(0).standard_normal(100)
    result = compare_tensors(a, a + 1e-7, "test")
    assert result["match"] and result["correlation"] > 0.999
    result2 = compare_tensors(a, np.zeros(50))
    assert not result2["match"]


def test_nan_guard():
    import jax.numpy as jnp

    from neuralcodecs_tpu.diagnostics.profiler import nan_guard

    def bad(x):
        return jnp.log(x)  # nan for negative input

    guarded = nan_guard(bad)
    guarded(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        guarded(jnp.asarray([-1.0]))


def test_codec_event_source_live_jsonl(tmp_path):
    """The ETW-analog event source emits the three event kinds live
    (CodecEventSource.cs:12-22) to subscribers and a JSONL file."""
    import json
    import time

    from neuralcodecs_tpu.diagnostics.context import DiagnosticsContext
    from neuralcodecs_tpu.diagnostics.eventsource import log as event_log

    seen = []
    sink = seen.append
    path = tmp_path / "events.jsonl"
    event_log.subscribe(sink)
    event_log.open_jsonl(path)
    try:
        ctx = DiagnosticsContext()
        with ctx.track_scope("enc"):
            time.sleep(0.001)
        ctx.log_tensor("enc", "z", np.array([1.0, 2.0, np.nan]))
    finally:
        event_log.unsubscribe(sink)
        event_log.close()

    kinds = [e["event"] for e in seen]
    assert "ModuleExecution" in kinds
    assert "TensorStats" in kinds
    assert "AnomalyDetected" in kinds  # the NaN
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == len(seen)
    assert all("ts" in l for l in lines)


def test_codec_event_source_disabled_is_free():
    from neuralcodecs_tpu.diagnostics.eventsource import CodecEventSource

    src = CodecEventSource()
    assert not src.enabled
    src.module_execution("m", 1.0)  # no sink: must be a no-op


def test_with_retry_backoff_and_exhaustion(monkeypatch):
    """with_retry: retries only listed exceptions, calls on_retry, sleeps
    with exponential backoff, re-raises after exhaustion."""
    import neuralcodecs_tpu.core.retry as retry_mod
    from neuralcodecs_tpu.core.retry import with_retry

    sleeps = []
    monkeypatch.setattr(retry_mod.time, "sleep", sleeps.append)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "done"

    seen = []
    assert with_retry(flaky, attempts=4, base_delay=0.5,
                      on_retry=lambda a, e: seen.append(a)) == "done"
    assert calls["n"] == 3 and seen == [1, 2]
    assert sleeps == [0.5, 1.0]  # exponential

    # exhaustion re-raises the last error after `attempts` tries
    calls["n"] = 0

    def always_fails():
        calls["n"] += 1
        raise OSError("permanent")

    import pytest as _pytest
    with _pytest.raises(OSError, match="permanent"):
        with_retry(always_fails, attempts=3, base_delay=0.1)
    assert calls["n"] == 3

    # non-listed exceptions pass straight through (no retry)
    calls["n"] = 0

    def raises_value_error():
        calls["n"] += 1
        raise ValueError("no retry")

    with _pytest.raises(ValueError):
        with_retry(raises_value_error, attempts=3)
    assert calls["n"] == 1

    # max_delay caps the backoff
    sleeps.clear()
    calls["n"] = 0
    with _pytest.raises(OSError):
        with_retry(always_fails, attempts=4, base_delay=10.0, max_delay=15.0)
    assert sleeps == [10.0, 15.0, 15.0]


def test_xplane_parser_on_real_trace(tmp_path):
    """Parse a real jax.profiler trace (CPU) with the hand-rolled protobuf
    reader; op durations must aggregate to something non-trivial."""
    import jax
    import jax.numpy as jnp

    from neuralcodecs_tpu.diagnostics.xplane import parse_xplane, summarize_trace

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((256, 256), jnp.float32)
    f(x).block_until_ready()
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(3):
            out = f(x)
        out.block_until_ready()

    planes = sorted(tmp_path.rglob("*.xplane.pb"))
    assert planes, "profiler produced no xplane file"
    # CPU runs record host planes; an empty-filter parse sees every plane
    totals = parse_xplane(planes[-1], plane_filter="")
    assert totals and all(isinstance(v, int) and v >= 0 for v in totals.values())
    rows = summarize_trace(tmp_path, plane_filter="")
    assert rows and rows[0][1] >= rows[-1][1]  # sorted descending


def test_generate_comparison_script(tmp_path):
    """The generated standalone script (DiagnosticsContext.cs:265 analog)
    diffs two dump dirs: exit 0 on agreement, nonzero on drift/missing."""
    import subprocess
    import sys

    import numpy as np

    from neuralcodecs_tpu.diagnostics.context import DiagnosticsContext

    mine = tmp_path / "mine"
    ctx = DiagnosticsContext(dump_dir=mine)
    rng = np.random.default_rng(0)
    t = rng.standard_normal((4, 8)).astype(np.float32)
    ctx.dump_tensor("enc_out", t)
    ctx.dump_tensor("codes", np.arange(12, dtype=np.int32))
    script = ctx.generate_comparison_script(tmp_path / "compare.py")
    assert script.exists()

    agree = tmp_path / "theirs_ok"
    agree.mkdir()
    np.save(agree / "enc_out.npy", t.copy())
    np.save(agree / "codes.npy", np.arange(12, dtype=np.int32))
    r = subprocess.run([sys.executable, str(script), str(agree)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "enc_out.npy: ok" in r.stdout

    drift = tmp_path / "theirs_bad"
    drift.mkdir()
    np.save(drift / "enc_out.npy", t + 0.01)  # beyond tolerance
    r = subprocess.run([sys.executable, str(script), str(drift)],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "FAIL" in r.stdout and "MISSING" in r.stdout  # codes.npy absent
