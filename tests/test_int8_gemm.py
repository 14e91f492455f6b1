"""int8_gemm: the SGEMM fast path must be bit-identical to the integer
matmul everywhere the engine uses it (semdedup assignment, semdedup
within-cluster gram, semantic_decontaminate hits) — exactness is the
whole point, so it is asserted directly against numpy's int64 matmul.
"""

import numpy as np
import pytest

from hudi_spark_plus_spark.functions.similarity import int8_gemm


def _rand(rng, n, d, lo=-127, hi=127):
    return rng.integers(lo, hi + 1, size=(n, d)).astype(np.int64)


@pytest.mark.parametrize(
    "n,m,d",
    [(1, 1, 1), (7, 3, 5), (100, 64, 64), (257, 33, 78), (1024, 1024, 16)],
)
def test_bit_exact_random(n, m, d):
    rng = np.random.default_rng(n * 1000 + m * 10 + d)
    a, b = _rand(rng, n, d), _rand(rng, m, d)
    assert np.array_equal(int8_gemm(a, b), a @ b.T)


def test_bit_exact_extremes():
    # worst-case magnitudes the envelope admits: dim 78, all |v| = 127
    a = np.full((5, 78), 127, dtype=np.int64)
    b = np.full((4, 78), -127, dtype=np.int64)
    out = int8_gemm(a, b)
    assert np.array_equal(out, a @ b.T)
    assert out.dtype == np.int64
    assert out[0, 0] == -78 * 127 * 127  # below f32's 2**24 integer limit


def test_empty_rows():
    a = np.zeros((0, 64), dtype=np.int64)
    b = _rand(np.random.default_rng(0), 3, 64)
    out = int8_gemm(a, b)
    assert out.shape == (0, 3)
    assert np.array_equal(int8_gemm(b, a), b @ a.T)


def test_fallback_wide_dim_still_exact():
    # dim 79 exceeds the envelope -> integer matmul path
    rng = np.random.default_rng(42)
    a, b = _rand(rng, 11, 79), _rand(rng, 6, 79)
    assert np.array_equal(int8_gemm(a, b), a @ b.T)


def test_fallback_large_values_still_exact():
    # |v| > 127 exceeds the envelope -> integer matmul path; values here
    # would NOT be float32-exact, so equality proves the fallback fired
    rng = np.random.default_rng(7)
    a = rng.integers(-(2**31), 2**31, size=(9, 8)).astype(np.int64)
    b = rng.integers(-(2**31), 2**31, size=(5, 8)).astype(np.int64)
    assert np.array_equal(int8_gemm(a, b), a @ b.T)


def test_gram_self_product():
    rng = np.random.default_rng(3)
    m = _rand(rng, 300, 64)
    assert np.array_equal(int8_gemm(m, m), m @ m.T)
