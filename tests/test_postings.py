import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from yetisearch_ray.index.postings import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


class TestVarbyte:
    def test_roundtrip_basic(self):
        vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**63], dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(vals)).tolist() == vals.tolist()

    def test_empty(self):
        assert varbyte_encode(np.empty(0, np.uint64)) == b""
        assert varbyte_decode(b"").size == 0

    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_property(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(arr)).tolist() == vals

    def test_compactness(self):
        # small deltas should be ~1 byte each
        vals = np.arange(1000, dtype=np.uint64) % 100
        assert len(varbyte_encode(vals)) == 1000


class TestDelta:
    def test_roundtrip(self):
        ids = np.array([3, 9, 10, 500, 10**9], dtype=np.uint64)
        assert delta_decode(delta_encode(ids)).tolist() == ids.tolist()


class TestPostings:
    def test_roundtrip_with_positions(self):
        rng = np.random.default_rng(1)
        ids = np.unique(rng.integers(0, 10**6, 300).astype(np.uint64))
        tfs = rng.integers(1, 8, ids.size).astype(np.uint64)
        pos = np.concatenate(
            [np.sort(rng.choice(5000, int(t), replace=False)).astype(np.uint64) for t in tfs]
        )
        db, tb, pb = encode_postings(ids, tfs, pos)
        d2, t2, p2 = decode_postings(db, tb, pb)
        assert np.array_equal(ids, d2)
        assert np.array_equal(tfs, t2)
        assert np.array_equal(pos, p2)

    def test_roundtrip_without_positions(self):
        ids = np.array([1, 5, 9], dtype=np.uint64)
        tfs = np.array([2, 1, 4], dtype=np.uint64)
        db, tb, pb = encode_postings(ids, tfs, None)
        d2, t2, p2 = decode_postings(db, tb, pb)
        assert p2 is None and np.array_equal(ids, d2) and np.array_equal(tfs, t2)

    def test_unsorted_rejected_semantics(self):
        # deltas of unsorted ids would underflow uint64 — caller contract
        ids = np.array([5, 3], dtype=np.uint64)
        deltas = delta_encode(ids)
        assert deltas[1] != np.uint64(2)  # wrapped — documents the contract
