"""Round-trip + property tests for the varbyte/delta codec (FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fts_engine_spark.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**63, 2**64 - 1], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert (out == arr).all()


def test_varbyte_compactness():
    # small values take 1 byte each
    arr = np.arange(100, dtype=np.uint64)
    assert len(varbyte_encode(arr)) == 100


def test_postings_roundtrip():
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.choice(100_000, size=5000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=5000).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, base_doc=0, skip=128)
    d, t = decode_postings(enc.doc_blob, enc.tf_blob, base_doc=0)
    assert (d == doc_ids).all()
    assert (t == tfs).all()
    assert enc.count == 5000
    # skip blocks cover full docid range
    assert enc.skip_last_doc[-1] == doc_ids[-1]
    assert len(enc.skip_last_doc) == (5000 + 127) // 128
    # block-max is max of true tf per block
    assert enc.skip_max_tf.max() == tfs.max()


def test_postings_base_doc():
    doc_ids = np.array([1_000_000, 1_000_003, 1_000_010], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, base_doc=1_000_000)
    # first delta is shard-relative -> tiny blob
    assert len(enc.doc_blob) == 3
    d, t = decode_postings(enc.doc_blob, enc.tf_blob, base_doc=1_000_000)
    assert (d == doc_ids).all()


def test_decode_single_block():
    rng = np.random.default_rng(7)
    n, skip = 1000, 128
    doc_ids = np.sort(rng.choice(50_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=n).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, base_doc=0, skip=skip)
    n_blocks = len(enc.skip_last_doc)
    for b in range(n_blocks):
        d0 = int(enc.skip_doc_off[b])
        d1 = int(enc.skip_doc_off[b + 1]) if b + 1 < n_blocks else len(enc.doc_blob)
        t0 = int(enc.skip_tf_off[b])
        t1 = int(enc.skip_tf_off[b + 1]) if b + 1 < n_blocks else len(enc.tf_blob)
        prev = int(enc.skip_last_doc[b - 1]) if b > 0 else 0
        d, t = decode_block(enc.doc_blob, enc.tf_blob, (d0, d1), (t0, t1), prev)
        lo, hi = b * skip, min((b + 1) * skip, n)
        assert (d == doc_ids[lo:hi]).all()
        assert (t == tfs[lo:hi]).all()
        assert int(t.max()) <= int(enc.skip_max_tf[b])


def test_empty_postings():
    enc = encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert enc.count == 0 and enc.doc_blob == b""
