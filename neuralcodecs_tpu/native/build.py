"""On-demand compilation of the native components via g++ (cached .so)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_SRC_DIR = Path(__file__).parent


def _cache_dir() -> Path:
    d = Path(os.environ.get("NEURALCODECS_NATIVE_CACHE",
                            Path.home() / ".cache" / "neural_codecs" / "native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_library(name: str, source: str) -> Path | None:
    """Compile <source> into a cached shared library; None if no toolchain."""
    src_path = _SRC_DIR / source
    code = src_path.read_bytes()
    digest = hashlib.sha256(code).hexdigest()[:16]
    out = _cache_dir() / f"lib{name}-{digest}.so"
    if out.is_file():
        return out
    try:
        with tempfile.TemporaryDirectory() as tmp:
            tmp_out = Path(tmp) / out.name
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(tmp_out), str(src_path)],
                check=True, capture_output=True, timeout=120)
            tmp_out.replace(out)
        return out
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return None


_ENTROPY_LIB: ctypes.CDLL | None | bool = None  # False = tried and failed


def entropy_lib() -> ctypes.CDLL | None:
    """The compiled entropy library, or None if unavailable."""
    global _ENTROPY_LIB
    if _ENTROPY_LIB is None:
        path = build_library("ncentropy", "entropy.cpp")
        if path is None:
            _ENTROPY_LIB = False
        else:
            lib = ctypes.CDLL(str(path))
            lib.nc_ac_encode.restype = ctypes.c_longlong
            lib.nc_ac_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong]
            lib.nc_ad_new.restype = ctypes.c_void_p
            lib.nc_ad_new.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                      ctypes.c_int]
            lib.nc_ad_pull.restype = ctypes.c_int
            lib.nc_ad_pull.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int]
            lib.nc_ad_pull_many.restype = ctypes.c_int
            lib.nc_ad_pull_many.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_int, ctypes.c_int,
                                            ctypes.c_void_p]
            lib.nc_ad_free.restype = None
            lib.nc_ad_free.argtypes = [ctypes.c_void_p]
            _ENTROPY_LIB = lib
    return _ENTROPY_LIB or None
