"""Reference-independent cross-validation of the production range coder.

VERDICT r4 #5: the committed .ecdc golden was produced by the production
coder itself, so a carry/rounding bug there would be self-consistent and
invisible. These tests pit production against tests/naive_range_coder.py —
a from-scratch transliteration of the reference C# coder
(ArithmeticCoder.cs:78-142, ArithmeticDecoder.cs:8-233,
ArithmeticCodingUtils.cs:19-103) sharing no code with production — over
randomized CDFs and long streams, in both directions, including byte-level
stream equality. Any semantic divergence between the two lineages fails
here even though each is internally round-trip consistent.
"""

from __future__ import annotations

import io
import sys

import numpy as np
import pytest

from neuralcodecs_tpu.models.encodec.entropy import (
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
    build_stable_quantized_cdf_batch,
)

from naive_range_coder import (
    NaiveArithmeticCoder,
    NaiveArithmeticDecoder,
    naive_build_stable_quantized_cdf,
)


def _random_stream(rng: np.random.Generator, n_symbols: int,
                   cardinality: int, concentration: float):
    """Random per-step pdfs (varying sharpness) + symbols drawn from them —
    the adversarial regime for carry handling is pdfs that pin the range
    near its minimum width.

    The 1-1e-5 down-scale keeps the float32 pdf sum strictly below 1: both
    coder lineages (by shared reference semantics — see
    test_cdf_builder_error_agreement) reject pdfs whose f32-rounded sum
    exceeds 1 when the alphabet is too small for the 1e-8 roundoff slack
    to absorb the rounding, exactly like an f32 softmax output can."""
    pdfs = rng.dirichlet(np.full(cardinality, concentration), size=n_symbols)
    pdfs = pdfs * (1.0 - 1e-5)
    symbols = np.array([rng.choice(cardinality, p=p / p.sum()) for p in pdfs])
    return pdfs.astype(np.float32), symbols


def _production_encode(symbols, cdfs) -> bytes:
    buf = io.BytesIO()
    coder = ArithmeticCoder(buf)
    for s, cdf in zip(symbols, cdfs):
        coder.push(int(s), cdf)
    coder.flush()
    return buf.getvalue()


def _production_decode(blob: bytes, cdfs) -> list[int]:
    dec = ArithmeticDecoder(io.BytesIO(blob))
    out = []
    for cdf in cdfs:
        s = dec.pull(cdf)
        if s is None:
            break
        out.append(s)
    return out


def _naive_encode(symbols, cdfs) -> bytes:
    coder = NaiveArithmeticCoder()
    for s, cdf in zip(symbols, cdfs):
        coder.push(int(s), [int(v) for v in cdf])
    return coder.flush()


def _naive_decode(blob: bytes, cdfs) -> list[int]:
    dec = NaiveArithmeticDecoder(blob)
    out = []
    for cdf in cdfs:
        s = dec.pull([int(v) for v in cdf])
        if s is None:
            break
        out.append(s)
    return out


CASES = [
    # (seed, n_symbols, cardinality, dirichlet concentration)
    (0, 400, 1024, 0.05),   # Encodec LM regime: sharp pdfs over 1024 codes
    (1, 400, 1024, 1.0),    # flat pdfs: minimum compression, max range churn
    (2, 2000, 64, 0.02),    # long stream, very peaked (carry stress)
    (3, 2000, 2, 0.5),      # binary alphabet
    (4, 800, 17, 5.0),      # odd cardinality, smooth pdfs
]


@pytest.mark.slow
@pytest.mark.parametrize("seed,n,card,conc", CASES)
def test_cross_decode_and_byte_equality(seed, n, card, conc):
    """Production and naive coders produce IDENTICAL byte streams and each
    decodes the other's output exactly."""
    rng = np.random.default_rng(seed)
    pdfs, symbols = _random_stream(rng, n, card, conc)
    cdfs = [build_stable_quantized_cdf(p) for p in pdfs]

    blob_prod = _production_encode(symbols, cdfs)
    blob_naive = _naive_encode(symbols, cdfs)
    assert blob_prod == blob_naive, (
        f"byte streams diverge at offset "
        f"{next(i for i, (a, b) in enumerate(zip(blob_prod, blob_naive)) if a != b)}"
    )

    assert _naive_decode(blob_prod, cdfs) == list(symbols)
    assert _production_decode(blob_naive, cdfs) == list(symbols)


@pytest.mark.slow
def test_cross_decode_symbol_by_symbol_state():
    """March both coders together and compare (low, high, max_bit) after
    every push — localizes any divergence to the exact symbol."""
    rng = np.random.default_rng(7)
    pdfs, symbols = _random_stream(rng, 600, 256, 0.1)
    cdfs = [build_stable_quantized_cdf(p) for p in pdfs]

    buf = io.BytesIO()
    prod = ArithmeticCoder(buf)
    naive = NaiveArithmeticCoder()
    for i, (s, cdf) in enumerate(zip(symbols, cdfs)):
        prod.push(int(s), cdf)
        naive.push(int(s), [int(v) for v in cdf])
        assert (prod._low, prod._high, prod._max_bit) == \
            (naive._low, naive._high, naive._max_bit), f"state diverged at symbol {i}"
    prod.flush()
    assert buf.getvalue() == naive.flush()


def test_cdf_builders_agree():
    """The production CDF quantizer (scalar + batch) matches an independent
    transliteration of BuildStableQuantizedCdf over random pdfs."""
    rng = np.random.default_rng(11)
    for card in (2, 17, 64, 1024):
        pdfs = (rng.dirichlet(np.full(card, 0.3), size=32)
                * (1.0 - 1e-5)).astype(np.float32)
        batch = build_stable_quantized_cdf_batch(pdfs)
        for i, p in enumerate(pdfs):
            prod = build_stable_quantized_cdf(p)
            naive = naive_build_stable_quantized_cdf(p, 24)
            assert list(prod) == naive, f"CDF mismatch (card={card}, row={i})"
            assert list(batch[i]) == naive


def test_cdf_builder_error_agreement():
    """Where one lineage rejects a pdf (f32 sum over 1 overflowing the
    total range on a tiny alphabet), the other rejects it too — error
    semantics are part of parity."""
    # exact-1.0 f64 dirichlet rows whose f32 casts sum above 1
    rng = np.random.default_rng(3)
    checked = agreed = 0
    for _ in range(200):
        p = rng.dirichlet(np.full(2, 0.5)).astype(np.float32)
        try:
            prod = list(build_stable_quantized_cdf(p))
            prod_err = False
        except ValueError:
            prod_err = True
        try:
            naive = naive_build_stable_quantized_cdf(p, 24)
            naive_err = False
        except ValueError:
            naive_err = True
        assert prod_err == naive_err
        if not prod_err:
            assert prod == naive
        checked += 1
        agreed += prod_err
    assert checked == 200 and 0 < agreed < 200, (
        f"error-path coverage degenerate: {agreed}/200 rejected")


def test_cdf_builder_rejects_oversubscribed_alphabet():
    with pytest.raises(ValueError):
        naive_build_stable_quantized_cdf(
            np.full(1 << 20, 2 ** -20, np.float32), total_range_bits=20)
    with pytest.raises(ValueError):
        build_stable_quantized_cdf(
            np.full(1 << 20, 2 ** -20, np.float32), total_range_bits=20)


def test_recursion_depth_covers_lm_cardinality():
    """The naive decoder uses the C#'s recursive binary search; make sure a
    1024-way CDF stays within Python's default recursion limit."""
    assert 2 ** 11 > 1024
    assert sys.getrecursionlimit() >= 200
