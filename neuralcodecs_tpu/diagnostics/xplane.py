"""Dependency-free XPlane (jax.profiler) trace reader.

`jax.profiler.start_trace` writes XSpace protobufs that normally need
TensorBoard's profile plugin to inspect. This module parses the protobuf
wire format directly (no tensorflow/tensorboard dependency) and aggregates
per-op device time — enough for the "which op dominates" question that
drives kernel work.

Usage:
    from neuralcodecs_tpu.diagnostics.xplane import summarize_trace
    for name, ms in summarize_trace("/tmp/nc_prof")[:20]:
        print(f"{ms:8.2f} ms  {name}")
"""

from __future__ import annotations

import collections
from pathlib import Path


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, i
        shift += 7


def _fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            value, i = _read_varint(buf, i)
            yield field, value
        elif wire == 2:
            length, i = _read_varint(buf, i)
            yield field, buf[i:i + length]
            i += length
        elif wire == 5:
            yield field, buf[i:i + 4]
            i += 4
        elif wire == 1:
            yield field, buf[i:i + 8]
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def parse_xplane(path: str | Path, plane_filter: str = "tpu") -> dict[str, int]:
    """Aggregate event durations (picoseconds) by op name for matching planes.

    XSpace { planes=1 }; XPlane { name=2, lines=3, event_metadata=4 };
    XLine { events=4 }; XEvent { metadata_id=1, duration_ps=3 };
    XEventMetadata { id=1, name=2 }.
    """
    data = Path(path).read_bytes()
    totals: collections.Counter = collections.Counter()
    for field, value in _fields(data):
        if field != 1 or not isinstance(value, bytes):
            continue
        plane_name = None
        lines = []
        metadata: dict[int, str] = {}
        for f2, v2 in _fields(value):
            if f2 == 2 and isinstance(v2, bytes):
                plane_name = v2.decode(errors="replace")
            elif f2 == 3 and isinstance(v2, bytes):
                lines.append(v2)
            elif f2 == 4 and isinstance(v2, bytes):
                key = None
                name = None
                for f3, v3 in _fields(v2):
                    if f3 == 1 and isinstance(v3, int):
                        key = v3
                    elif f3 == 2 and isinstance(v3, bytes):
                        for f4, v4 in _fields(v3):
                            if f4 == 2 and isinstance(v4, bytes):
                                name = v4.decode(errors="replace")
                if key is not None and name is not None:
                    metadata[key] = name
        if plane_name is None or plane_filter.lower() not in plane_name.lower():
            continue
        for line in lines:
            for f3, v3 in _fields(line):
                if f3 == 4 and isinstance(v3, bytes):
                    metadata_id = duration = 0
                    for f4, v4 in _fields(v3):
                        if f4 == 1 and isinstance(v4, int):
                            metadata_id = v4
                        elif f4 == 3 and isinstance(v4, int):
                            duration = v4
                    totals[metadata.get(metadata_id, f"#{metadata_id}")] += duration
    return dict(totals)


def summarize_trace(log_dir: str | Path,
                    plane_filter: str = "tpu") -> list[tuple[str, float]]:
    """Find the newest .xplane.pb under a trace dir; return [(op, total_ms)]
    sorted by time descending."""
    log_dir = Path(log_dir)
    planes = sorted(log_dir.rglob("*.xplane.pb"),
                    key=lambda p: p.stat().st_mtime)
    if not planes:
        raise FileNotFoundError(f"No .xplane.pb under {log_dir}")
    totals = parse_xplane(planes[-1], plane_filter)
    return sorted(((name, ps / 1e9) for name, ps in totals.items()),
                  key=lambda kv: -kv[1])
