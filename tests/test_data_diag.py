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
