"""Property-based codec tests (hypothesis): round-trips must hold for ALL
inputs, not just the seeds we thought of."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mee_spark.codec import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)

uint64s = st.integers(min_value=0, max_value=2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(uint64s, max_size=500))
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**32), min_size=1, max_size=500))
def test_delta_roundtrip_strictly_ascending(gaps):
    docs = np.cumsum(np.array(gaps, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(docs)), docs)


@settings(max_examples=50, deadline=None)
@given(st.lists(uint64s, min_size=1, max_size=100))
def test_varbyte_encode_deterministic(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_encode(arr) == varbyte_encode(arr.copy())
