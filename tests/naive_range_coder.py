"""Test-only naive range coder, independently transliterated from the
reference C# (NOT from this repo's production coder).

Purpose (VERDICT r4 #5): the production coder in
neuralcodecs_tpu/models/encodec/entropy.py and the committed .ecdc golden
were both authored by the same implementation, so a shared carry/rounding
bug would be invisible to the golden test. This module re-derives the coder
directly from the reference sources — structure, names, and arithmetic
follow the C# line by line:

- NaiveBitPacker / NaiveBitUnpacker:
  /root/reference/NeuralCodecs.Torch/Modules/Encodec/BitPacker.cs:92-117,
  BitUnpacker.cs (little-endian n-bit packing)
- naive_build_stable_quantized_cdf:
  ArithmeticCodingUtils.cs:19-103 (BuildStableQuantizedCdf)
- NaiveArithmeticCoder:  ArithmeticCoder.cs:78-142 (Push), :57-69 (Flush),
  :189-240 (FlushCommonPrefix)
- NaiveArithmeticDecoder: ArithmeticDecoder.cs:68-165 (Pull),
  :191-233 (FlushCommonPrefix)

It deliberately shares NO code with the production module (pure-Python
ints and math.ceil/floor on doubles — matching C# long + Math.Ceiling /
Math.Floor semantics), stays naive (recursion, per-bit streams, no
vectorization), and is consumed only by tests/test_entropy_cross.py, which
property-tests production-encode <-> naive-decode (and vice versa) plus
byte-stream equality over randomized CDFs and long symbol streams.
"""

from __future__ import annotations

import math

import numpy as np


class NaiveBitPacker:
    """BitPacker.cs:92-117 — little-endian accumulation, LSB-first bytes."""

    def __init__(self, bits: int, out: bytearray):
        if bits <= 0 or bits > 24:
            raise ValueError("bits out of range")
        self._bits = bits
        self._out = out
        self._current_value = 0
        self._current_bits = 0

    def push(self, value: int) -> None:
        max_value = (1 << self._bits) - 1
        if value < 0 or value > max_value:
            raise ValueError(f"value must be between 0 and {max_value}")
        self._current_value |= value << self._current_bits
        self._current_bits += self._bits
        while self._current_bits >= 8:
            self._out.append(self._current_value & 0xFF)
            self._current_value >>= 8
            self._current_bits -= 8

    def flush(self) -> None:
        if self._current_bits > 0:
            self._out.append(self._current_value & 0xFF)
            self._current_value = 0
            self._current_bits = 0


class NaiveBitUnpacker:
    """BitUnpacker.cs — mirror of the packer; returns None at end of data."""

    def __init__(self, bits: int, data: bytes):
        self._bits = bits
        self._data = data
        self._pos = 0
        self._mask = (1 << bits) - 1
        self._current_value = 0
        self._current_bits = 0

    def pull(self) -> int | None:
        while self._current_bits < self._bits:
            if self._pos >= len(self._data):
                return None
            self._current_value |= self._data[self._pos] << self._current_bits
            self._pos += 1
            self._current_bits += 8
        value = self._current_value & self._mask
        self._current_value >>= self._bits
        self._current_bits -= self._bits
        return value


def naive_build_stable_quantized_cdf(pdf, total_range_bits: int,
                                     roundoff: float = 1e-8,
                                     min_range: int = 2,
                                     check: bool = True) -> list[int]:
    """ArithmeticCodingUtils.cs:19-103, scalar per-symbol loop.

    The C# works on float32 tensors (div/floor/mul in f32); this
    transliteration keeps each per-symbol value in np.float32 so the
    quantized ranges land on the same grid, but the loop itself is plain
    Python (no production code shared)."""
    if total_range_bits <= 0:
        raise ValueError("total range bits must be positive")
    if min_range < 2:
        raise ValueError("minimum range must be at least 2")
    values = [np.float32(p) for p in np.asarray(pdf, np.float32)]
    if roundoff > 0:
        r = np.float32(roundoff)
        values = [np.float32(np.float32(math.floor(v / r)) * r) for v in values]
    total_range = 1 << total_range_bits
    cardinality = len(values)
    alpha = np.float32(min_range * cardinality / float(total_range))
    if alpha > 1:
        raise ValueError(f"alpha ({alpha}) > 1")
    # C# computes the scale in float32: (1.0f - alpha) * totalRange
    scale_f = np.float32((np.float32(1.0) - alpha) * np.float32(total_range))
    cdf: list[int] = []
    running = 0
    for v in values:
        rng = int(math.floor(np.float32(v * scale_f))) + min_range
        running += rng
        cdf.append(running)
    if check:
        if cdf[-1] > total_range:
            raise ValueError(f"CDF total ({cdf[-1]}) exceeds range")
        widths = [cdf[0]] + [cdf[i + 1] - cdf[i] for i in range(len(cdf) - 1)]
        if any(w < min_range for w in widths):
            raise ValueError("ranges too small")
    return cdf


class NaiveArithmeticCoder:
    """ArithmeticCoder.cs:25-142 — push/flush with common-prefix emission."""

    def __init__(self, total_range_bits: int = 24):
        if total_range_bits <= 0 or total_range_bits > 30:
            raise ValueError("total range bits must be in (0, 30]")
        self._total_range_bits = total_range_bits
        self._buf = bytearray()
        self._packer = NaiveBitPacker(1, self._buf)
        self._low = 0
        self._high = 0
        self._max_bit = -1

    @property
    def delta(self) -> int:
        return self._high - self._low + 1

    def push(self, symbol: int, quantized_cdf: list[int]) -> None:
        if symbol < 0 or symbol > len(quantized_cdf) - 1:
            raise ValueError(f"symbol {symbol} out of range")
        while self.delta < (1 << self._total_range_bits):
            self._low *= 2
            self._high = self._high * 2 + 1
            self._max_bit += 1
        range_low = 0 if symbol == 0 else int(quantized_cdf[symbol - 1])
        range_high = int(quantized_cdf[symbol]) - 1
        scale = self.delta / float(1 << self._total_range_bits)
        effective_low = int(math.ceil(range_low * scale))
        effective_high = int(math.floor(range_high * scale))
        if effective_low > effective_high:
            raise RuntimeError(
                f"invalid range for symbol {symbol}: "
                f"low={effective_low}, high={effective_high}")
        self._high = self._low + effective_high
        self._low = self._low + effective_low
        if self._low > self._high:
            raise RuntimeError("invalid range after update")
        self._flush_common_prefix()
        if self._max_bit < -1:
            raise RuntimeError(f"invalid max bit: {self._max_bit}")
        if self._max_bit > 61:
            raise RuntimeError(f"max bit too large: {self._max_bit}")

    def _flush_common_prefix(self) -> None:
        if self._high < self._low:
            raise RuntimeError("invalid range")
        if self._max_bit >= 0 and self._high >= (1 << (self._max_bit + 1)):
            raise RuntimeError("high exceeds maximum bit position")
        while self._max_bit >= 0:
            b1 = (self._low >> self._max_bit) & 1
            b2 = (self._high >> self._max_bit) & 1
            if b1 != b2:
                break
            self._low -= b1 << self._max_bit
            self._high -= b1 << self._max_bit
            if self._high < self._low:
                raise RuntimeError("invalid range after bit flush")
            if self._low < 0:
                raise RuntimeError("negative low value")
            self._max_bit -= 1
            self._packer.push(b1)

    def flush(self) -> bytes:
        while self._max_bit >= 0:
            bit = (self._low >> self._max_bit) & 1
            self._packer.push(bit)
            self._max_bit -= 1
        self._packer.flush()
        return bytes(self._buf)


class NaiveArithmeticDecoder:
    """ArithmeticDecoder.cs:26-165 — pull via the C#'s recursive search."""

    def __init__(self, data: bytes, total_range_bits: int = 24):
        if total_range_bits <= 0 or total_range_bits > 30:
            raise ValueError("total range bits must be in (0, 30]")
        self._total_range_bits = total_range_bits
        self._unpacker = NaiveBitUnpacker(1, data)
        self._low = 0
        self._high = 0
        self._current = 0
        self._max_bit = -1

    @property
    def delta(self) -> int:
        return self._high - self._low + 1

    def pull(self, quantized_cdf: list[int]) -> int | None:
        if len(quantized_cdf) < 2:
            raise ValueError("CDF must have at least 2 entries")
        while self.delta < (1 << self._total_range_bits):
            bit = self._unpacker.pull()
            if bit is None:
                return None
            self._low *= 2
            self._high = self._high * 2 + 1
            self._current = self._current * 2 + bit
            self._max_bit += 1

        def binary_search(low_idx: int, high_idx: int):
            if high_idx < low_idx:
                raise RuntimeError("binary search failed: high < low index")
            mid = (low_idx + high_idx) // 2
            range_low = int(quantized_cdf[mid - 1]) if mid > 0 else 0
            range_high = int(quantized_cdf[mid]) - 1
            scale = self.delta / float(1 << self._total_range_bits)
            effective_low = int(math.ceil(range_low * scale))
            effective_high = int(math.floor(range_high * scale))
            low = effective_low + self._low
            high = effective_high + self._low
            if low <= self._current <= high:
                return mid, low, high
            if self._current > high:
                return binary_search(mid + 1, high_idx)
            return binary_search(low_idx, mid - 1)

        symbol, self._low, self._high = binary_search(0, len(quantized_cdf) - 1)
        self._flush_common_prefix()
        return symbol

    def _flush_common_prefix(self) -> None:
        if self._high < self._low:
            raise RuntimeError("invalid range")
        while self._max_bit >= 0:
            b1 = (self._low >> self._max_bit) & 1
            b2 = (self._high >> self._max_bit) & 1
            if b1 != b2:
                break
            self._low -= b1 << self._max_bit
            self._high -= b1 << self._max_bit
            self._current -= b1 << self._max_bit
            if self._high < self._low:
                raise RuntimeError("invalid range after bit flush")
            if self._low < 0:
                raise RuntimeError("negative low value")
            self._max_bit -= 1
