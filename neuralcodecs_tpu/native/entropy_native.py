"""ctypes bindings for the native range coder, with Python fallback."""

from __future__ import annotations

import numpy as np

from neuralcodecs_tpu.native.build import entropy_lib


def available() -> bool:
    return entropy_lib() is not None


def encode_symbols(cdfs: np.ndarray, symbols: np.ndarray,
                   total_range_bits: int = 24) -> bytes:
    """Range-encode symbols[i] against cdfs[i] (shape [N, card] int64)."""
    lib = entropy_lib()
    cdfs = np.ascontiguousarray(cdfs, np.int64)
    symbols = np.ascontiguousarray(symbols, np.int32)
    n, card = cdfs.shape
    if symbols.shape != (n,):
        # the C loop reads symbols[0..n): a shorter array would be read out
        # of bounds (segfault, not an exception) — validate here
        raise ValueError(
            f"encode_symbols: {symbols.shape[0]} symbols for {n} cdf rows")
    if lib is None:
        # pure-Python fallback
        import io

        from neuralcodecs_tpu.models.encodec.entropy import ArithmeticCoder

        buf = io.BytesIO()
        coder = ArithmeticCoder(buf, total_range_bits)
        for i in range(n):
            coder.push(int(symbols[i]), cdfs[i])
        coder.flush()
        return buf.getvalue()
    out_cap = max(1024, n * card.bit_length())  # generous upper bound
    out = np.empty(out_cap, np.uint8)
    written = lib.nc_ac_encode(
        cdfs.ctypes.data, symbols.ctypes.data, n, card, total_range_bits,
        out.ctypes.data, out_cap)
    if written < 0:
        raise RuntimeError(f"native range coder failed: {written}")
    return out[:written].tobytes()


class NativeArithmeticDecoder:
    """Stateful decoder over a byte buffer (handle-based C++ API)."""

    def __init__(self, data: bytes, total_range_bits: int = 24):
        self._lib = entropy_lib()
        self._fallback = None
        if self._lib is None:
            import io

            from neuralcodecs_tpu.models.encodec.entropy import ArithmeticDecoder

            self._fallback = ArithmeticDecoder(io.BytesIO(data), total_range_bits)
            return
        arr = np.frombuffer(data, np.uint8)
        self._handle = self._lib.nc_ad_new(arr.ctypes.data, len(arr),
                                           total_range_bits)

    def pull(self, cdf: np.ndarray) -> int | None:
        if self._fallback is not None:
            return self._fallback.pull(cdf)
        cdf = np.ascontiguousarray(cdf, np.int64)
        symbol = self._lib.nc_ad_pull(self._handle, cdf.ctypes.data, len(cdf))
        if symbol == -1:
            return None
        if symbol < 0:
            raise RuntimeError(f"native decoder failed: {symbol}")
        return symbol

    def pull_many(self, cdfs: np.ndarray) -> np.ndarray:
        """Decode len(cdfs) symbols in one native call (cdfs: [N, card])."""
        if self._fallback is not None:
            return np.array([self._fallback.pull(c) for c in cdfs])
        cdfs = np.ascontiguousarray(cdfs, np.int64)
        n, card = cdfs.shape
        out = np.empty(n, np.int32)
        got = self._lib.nc_ad_pull_many(self._handle, cdfs.ctypes.data, n,
                                        card, out.ctypes.data)
        if got < n:
            raise RuntimeError("stream ended during native decode")
        return out

    def close(self) -> None:
        if self._fallback is None and getattr(self, "_handle", None):
            self._lib.nc_ad_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
