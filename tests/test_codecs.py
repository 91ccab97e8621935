"""Property tests: decode(encode(x)) == x (SURVEY.md §5.2.6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from beetle_search_engine_spark.operators.codecs import (
    decode_docgaps,
    encode_docgaps,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    a = np.array(xs, dtype=np.uint64)
    out = varint_decode(varint_encode(a))
    assert np.array_equal(out, a)


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200, deadline=None)
def test_docgap_roundtrip(xs):
    a = np.array(sorted(xs), dtype=np.int64)
    out = decode_docgaps(encode_docgaps(a))
    assert np.array_equal(out, a)


def test_dense_postings_are_compact():
    # dense consecutive docnums -> ~1 byte per posting
    a = np.arange(100_000, 200_000, dtype=np.int64)
    assert len(encode_docgaps(a)) <= a.size + 5


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert decode_docgaps(b"").size == 0
