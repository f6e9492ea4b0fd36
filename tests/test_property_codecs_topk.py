"""Property-based tests (hypothesis): codec roundtrips and tie-aware
top-k vs the brute lexsort contract."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from stumpy_spark.functions.codecs import (png_decode, png_encode,
                                           wav_decode, wav_encode)
from stumpy_spark.kernels import topk_tie_aware  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40),
       st.sampled_from([1, 3, 4]), st.integers(0, 2 ** 31 - 1))
def test_png_roundtrip_property(h, w, c, seed):
    rs = np.random.RandomState(seed)
    arr = rs.randint(0, 256, size=(h, w, c)).astype(np.uint8)
    if c == 1:
        arr = arr[:, :, 0]
    out = png_decode(png_encode(arr))
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]),
       st.integers(0, 2 ** 31 - 1))
def test_wav_roundtrip_property(n, rate, seed):
    rs = np.random.RandomState(seed)
    s = rs.randint(-32768, 32768, n).astype(np.int16)
    s2, r2 = wav_decode(wav_encode(s, rate))
    assert r2 == rate
    np.testing.assert_array_equal(s, s2)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 30), st.integers(1, 40), st.integers(1, 12),
       st.integers(0, 5), st.integers(0, 2 ** 31 - 1))
def test_topk_tie_aware_matches_lexsort(nr, nc, kk, vocab_bits, seed):
    """For any matrix (including heavy exact ties via tiny value
    vocabularies), selection must equal the brute per-row lexsort on
    (value, column)."""
    rs = np.random.RandomState(seed)
    D = rs.randint(0, 2 ** vocab_bits, size=(nr, nc)).astype(np.float64)
    if vocab_bits == 0:
        D[:] = 0.0                      # fully tied
    kk = min(kk, nc)
    vals, cols = topk_tie_aware(D, kk)
    for i in range(nr):
        order = np.lexsort((np.arange(nc), D[i]))[:kk]
        np.testing.assert_array_equal(cols[i][:len(order)], order)
        np.testing.assert_array_equal(vals[i][:len(order)], D[i][order])
