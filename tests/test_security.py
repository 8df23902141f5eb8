"""Security hardening tests (ADVICE r1): restricted unpickler, path
traversal rejection, cache integrity verification."""

import io
import os
import pickle
import pickletools
import zipfile
from pathlib import Path

import pytest

from neuralcodecs_tpu.core.cache import ModelCache
from neuralcodecs_tpu.core.exceptions import CacheError, RepositoryError
from neuralcodecs_tpu.core.repos import safe_join
from neuralcodecs_tpu.core.torch_pickle import load_torch_checkpoint


def _make_zip_checkpoint(path: Path, payload: bytes) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)


class _Evil:
    def __reduce__(self):
        return (eval, ("__import__('os').getpid()",))


def test_unpickler_stubs_eval(tmp_path):
    """A REDUCE on builtins.eval must come back as an inert stub, not run."""
    path = tmp_path / "evil.pt"
    _make_zip_checkpoint(path, pickle.dumps(_Evil()))
    out = load_torch_checkpoint(path)
    # the object is replaced by a _Skipped stub; eval never executed
    assert type(out).__name__ == "_Skipped"


def test_unpickler_stubs_arbitrary_numpy_attr(tmp_path):
    """numpy.testing (or any unlisted numpy attr) must not resolve."""
    # hand-craft a GLOBAL for numpy.f2py.compile-like gadget
    payload = b"\x80\x02cnumpy.testing\nassert_equal\nq\x00."
    pickletools.dis(payload, out=io.StringIO())  # sanity: valid pickle
    path = tmp_path / "gadget.pt"
    _make_zip_checkpoint(path, payload)
    out = load_torch_checkpoint(path)
    assert out.__name__ == "_Skipped" or type(out).__name__ == "_Skipped"


def test_unpickler_allows_benign_containers(tmp_path):
    path = tmp_path / "ok.pt"
    _make_zip_checkpoint(
        path, pickle.dumps({"a": [1, 2], "b": (3, 4), "c": {5, 6}}))
    out = load_torch_checkpoint(path)
    assert out == {"a": [1, 2], "b": (3, 4), "c": {5, 6}}


@pytest.mark.parametrize("name", [
    "../../../escape.pt",
    "/abs/path.pt",
    "a/../../b.pt",
    "a\\b.pt",
    "",
    ".",
])
def test_safe_join_rejects_traversal(tmp_path, name):
    with pytest.raises(RepositoryError):
        safe_join(tmp_path, name)


def test_safe_join_allows_nested(tmp_path):
    assert safe_join(tmp_path, "sub/dir/model.safetensors") == (
        tmp_path / "sub/dir/model.safetensors")


def test_cache_model_rejects_traversal(tmp_path):
    cache = ModelCache(tmp_path / "cache")
    src = tmp_path / "w.bin"
    src.write_bytes(b"x" * 8)
    with pytest.raises(CacheError):
        cache.cache_model("owner/repo", "main", {"../../evil.bin": src})


def test_cache_detects_same_size_tampering(tmp_path):
    cache = ModelCache(tmp_path / "cache")
    src = tmp_path / "w.bin"
    src.write_bytes(b"A" * 16)
    d = cache.cache_model("owner/repo", "main", {"w.bin": src})
    # tamper: same size, different bytes
    (d / "w.bin").write_bytes(b"B" * 16)
    assert cache.get_cached_path("owner/repo", "main") is None


def test_cache_detects_mtime_preserving_tampering(tmp_path):
    """A tamper that restores size AND mtime must still fail on first load
    in a fresh process (ADVICE r2 medium): the mtime fast path only kicks
    in after one full in-process SHA-256 verification."""
    import neuralcodecs_tpu.core.cache as cache_mod

    cache = ModelCache(tmp_path / "cache")
    src = tmp_path / "w.bin"
    src.write_bytes(b"A" * 16)
    d = cache.cache_model("owner/repo", "main", {"w.bin": src})
    st = (d / "w.bin").stat()
    (d / "w.bin").write_bytes(b"B" * 16)
    os.utime(d / "w.bin", (st.st_atime, st.st_mtime))  # same size + mtime
    # simulate a fresh process: clear the in-process verified set
    cache_mod._verified_this_process.clear()
    assert cache.get_cached_path("owner/repo", "main") is None


def test_cache_mtime_fast_path_after_verification(tmp_path):
    """After one in-process verification, repeat loads skip re-hashing."""
    import neuralcodecs_tpu.core.cache as cache_mod

    cache = ModelCache(tmp_path / "cache")
    src = tmp_path / "w.bin"
    src.write_bytes(b"A" * 16)
    d = cache.cache_model("owner/repo", "main", {"w.bin": src})
    cache_mod._verified_this_process.clear()
    assert cache.get_cached_path("owner/repo", "main") == d  # pays the hash
    calls = []
    orig = cache_mod.file_sha256
    cache_mod.file_sha256 = lambda p: calls.append(p) or orig(p)
    try:
        assert cache.get_cached_path("owner/repo", "main") == d
        assert calls == []  # fast path: no re-hash within the process
    finally:
        cache_mod.file_sha256 = orig
