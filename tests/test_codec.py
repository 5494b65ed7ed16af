"""VByte/delta codec roundtrips (SURVEY §5 unit layer)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from word_sketch_lucene_spark.functions.codec import (
    decode_positions,
    delta_decode,
    delta_encode,
    encode_positions,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0


def test_vbyte_known_bytes():
    # 0 and 127 fit one byte; 128 needs two (little-endian 7-bit groups)
    assert vbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**9), max_size=200))
@settings(max_examples=40, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_delta_with_base():
    arr = np.array([100, 105, 200], dtype=np.int64)
    enc = delta_encode(arr, first_delta_from=100)
    assert enc[0] == 0
    assert np.array_equal(delta_decode(enc, first_delta_from=100), arr)


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    pls = [np.sort(rng.choice(4000, size=rng.integers(1, 40), replace=False))
           for _ in range(25)]
    dec = decode_positions(encode_positions(pls), len(pls))
    for a, b in zip(pls, dec):
        assert np.array_equal(a, b)


def test_positions_empty():
    assert encode_positions([]) == b""
    assert decode_positions(b"", 0) == []
