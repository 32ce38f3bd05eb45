"""Property tests for positions.phrase_match_kernel — the vectorized
(ragged gather + segmented cumsum + key-set intersection) formulation —
against a naive per-doc token-window reference on randomized corpora.
The kernel is shared verbatim by the distributed per-shard path and the
driver point tier, so this pins the single function every phrase
serving path depends on. No Spark session needed (pure numpy)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fts_engine_spark.positions import phrase_match_kernel, span_near_kernel

VOCAB = ["alpha", "beta", "gamma", "delta"]


def _naive(streams: dict[int, list[str]], seq: list[str]) -> dict[int, int]:
    out = {}
    n = len(seq)
    for doc, toks in streams.items():
        c = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i : i + n] == seq
        )
        if c:
            out[doc] = c
    return out


def _structures(streams: dict[int, list[str]]):
    """token streams -> (docs_offs, pos_vals) in the codec's shapes:
    per term sorted doc_ids, per-doc ascending positions stored
    delta-form (first absolute, rest diffs), offsets into the stream."""
    by_term: dict[str, dict[int, list[int]]] = {}
    for doc in sorted(streams):
        for pos, tok in enumerate(streams[doc]):
            by_term.setdefault(tok, {}).setdefault(doc, []).append(pos)
    docs_offs = {}
    pos_streams = {}
    for term, per_doc in by_term.items():
        doc_ids = np.array(sorted(per_doc), dtype=np.int64)
        offsets = [0]
        deltas: list[int] = []
        for d in doc_ids:
            ps = per_doc[int(d)]
            deltas.append(ps[0])
            deltas.extend(b - a for a, b in zip(ps, ps[1:]))
            offsets.append(offsets[-1] + len(ps))
        docs_offs[term] = (doc_ids, np.array(offsets, dtype=np.int64))
        pos_streams[term] = np.array(deltas, dtype=np.int64)
    return docs_offs, lambda t: pos_streams[t]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(  # corpus: token streams with sparse, gapped doc ids
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=24),
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 3),  # doc-id gap multiplier (simulates shard bases)
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),  # phrase
)
def test_kernel_matches_naive(corpus, gap, seq):
    streams = {i * (gap * 7 + 1) + 3: toks for i, toks in enumerate(corpus)}
    docs_offs, pos_vals = _structures(streams)
    want = _naive(streams, seq)
    if any(t not in docs_offs for t in seq):
        # callers never invoke the kernel with an unindexed term — they
        # short-circuit to "no matches"; the naive count must agree
        assert want == {}
        return
    docs, counts = phrase_match_kernel(docs_offs, pos_vals, seq)
    assert dict(zip(docs, counts)) == want
    # output is doc-id ascending (callers rely on it for stable sorts)
    assert docs == sorted(docs)


def test_kernel_duplicate_term_overlaps():
    """Overlapping repeated-term matches count every start position."""
    streams = {5: ["alpha", "alpha", "alpha", "alpha"]}
    docs_offs, pos_vals = _structures(streams)
    docs, counts = phrase_match_kernel(
        docs_offs, pos_vals, ["alpha", "alpha"]
    )
    assert docs == [5] and counts == [3]


# ------------------------------------------------- span_near_kernel


def _naive_near(
    streams: dict[int, list[str]], seq: list[str], slop: int
) -> dict[int, int]:
    """Independent exists-ANY-chain reference: enumerate every in-order
    position combination (one per sequence term) and count the distinct
    start positions whose best chain spans <= len(seq)+slop tokens. The
    kernel's greedy-chain argument is exactly what this brute force
    must validate, so no greediness here — raw product enumeration."""
    import itertools

    out = {}
    win = len(seq) - 1 + slop
    for doc, toks in streams.items():
        per_term = [
            [i for i, t in enumerate(toks) if t == q] for q in seq
        ]
        starts = {
            combo[0]
            for combo in itertools.product(*per_term)
            if all(a < b for a, b in zip(combo, combo[1:]))
            and combo[-1] - combo[0] <= win
        }
        if starts:
            out[doc] = len(starts)
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 3),
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
    st.integers(0, 6),  # slop
)
def test_span_near_matches_naive(corpus, gap, seq, slop):
    streams = {i * (gap * 7 + 1) + 3: toks for i, toks in enumerate(corpus)}
    docs_offs, pos_vals = _structures(streams)
    want = _naive_near(streams, seq, slop)
    if any(t not in docs_offs for t in seq):
        assert want == {}
        return
    docs, counts = span_near_kernel(docs_offs, pos_vals, seq, slop)
    assert dict(zip(docs, counts)) == want
    assert docs == sorted(docs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=24),
        min_size=1,
        max_size=10,
    ),
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),
)
def test_span_near_slop0_is_phrase(corpus, seq):
    """slop=0 forces consecutive positions — the phrase kernel exactly."""
    streams = {i * 3 + 1: toks for i, toks in enumerate(corpus)}
    docs_offs, pos_vals = _structures(streams)
    if any(t not in docs_offs for t in seq):
        return
    assert span_near_kernel(docs_offs, pos_vals, seq, 0) == (
        phrase_match_kernel(docs_offs, pos_vals, seq)
    )


def test_span_near_in_order_and_window():
    """Transpositions never match (ordered semantics); gaps match only
    within the slop window; counts are qualifying START positions."""
    streams = {
        1: ["beta", "alpha"],  # transposed — must NOT match
        2: ["alpha", "gamma", "beta"],  # gap 1 — needs slop >= 1
        3: ["alpha", "beta", "alpha", "delta", "beta"],  # starts 0 and 2
    }
    docs_offs, pos_vals = _structures(streams)
    seq = ["alpha", "beta"]
    assert span_near_kernel(docs_offs, pos_vals, seq, 0) == (
        [3],
        [1],
    )
    docs, counts = span_near_kernel(docs_offs, pos_vals, seq, 1)
    assert dict(zip(docs, counts)) == {2: 1, 3: 2}
    # window is in tokens past the minimum, not absolute positions
    docs, counts = span_near_kernel(docs_offs, pos_vals, seq, 9)
    assert dict(zip(docs, counts)) == {2: 1, 3: 2}


def test_span_near_rejects_negative_slop():
    streams = {1: ["alpha", "beta"]}
    docs_offs, pos_vals = _structures(streams)
    import pytest

    with pytest.raises(ValueError):
        span_near_kernel(docs_offs, pos_vals, ["alpha", "beta"], -1)


# ---------------------------------------- span_near_unordered_kernel


def _naive_unordered(
    streams: dict[int, list[str]], seq: list[str], slop: int
) -> dict[int, int]:
    """Anchor enumeration, independent of the kernel's searchsorted
    formulation: an anchor is any position of any (distinct) term whose
    forward window of n_distinct+slop tokens contains every term."""
    terms = list(dict.fromkeys(seq))
    win = len(terms) - 1 + slop
    out = {}
    for doc, toks in streams.items():
        c = 0
        for p, tok in enumerate(toks):
            if tok in terms:
                window = toks[p:p + win + 1]
                if all(t in window for t in terms):
                    c += 1
        if c:
            out[doc] = c
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=16),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 3),
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
    st.integers(0, 6),
)
def test_span_near_unordered_matches_naive(corpus, gap, seq, slop):
    from fts_engine_spark.positions import span_near_unordered_kernel

    streams = {i * (gap * 7 + 1) + 3: toks for i, toks in enumerate(corpus)}
    docs_offs, pos_vals = _structures(streams)
    want = _naive_unordered(streams, seq, slop)
    if any(t not in docs_offs for t in seq):
        assert want == {}
        return
    docs, counts = span_near_unordered_kernel(docs_offs, pos_vals, seq, slop)
    assert dict(zip(docs, counts)) == want
    assert docs == sorted(docs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=16),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 4),
)
def test_unordered_match_set_contains_ordered(corpus, slop):
    """For a duplicate-free sequence the windows coincide, so every doc
    with an ordered chain also has a covering anchor — the unordered
    match SET is a superset of the ordered one."""
    from fts_engine_spark.positions import span_near_unordered_kernel

    seq = ["alpha", "beta"]
    streams = {i * 2 + 1: toks for i, toks in enumerate(corpus)}
    docs_offs, pos_vals = _structures(streams)
    if any(t not in docs_offs for t in seq):
        return
    ordered, _ = span_near_kernel(docs_offs, pos_vals, seq, slop)
    unordered, _ = span_near_unordered_kernel(docs_offs, pos_vals, seq, slop)
    assert set(ordered) <= set(unordered)


def test_unordered_examples():
    from fts_engine_spark.positions import span_near_unordered_kernel

    streams = {
        1: ["beta", "alpha"],                    # reversed: unordered hit
        2: ["alpha", "gamma", "beta"],           # gap 1: needs slop >= 1
        3: ["alpha", "delta", "delta", "beta"],  # gap 2: needs slop >= 2
    }
    docs_offs, pos_vals = _structures(streams)
    seq = ["alpha", "beta"]
    # anchors look FORWARD only: in doc 1 the beta@0 anchor covers both
    # terms, the alpha@1 anchor sees nothing after it
    docs, counts = span_near_unordered_kernel(docs_offs, pos_vals, seq, 0)
    assert dict(zip(docs, counts)) == {1: 1}
    docs, counts = span_near_unordered_kernel(docs_offs, pos_vals, seq, 1)
    assert dict(zip(docs, counts)) == {1: 1, 2: 1}
    # duplicates collapse: ["alpha","alpha","beta"] == ["alpha","beta"]
    assert span_near_unordered_kernel(
        docs_offs, pos_vals, ["alpha", "alpha", "beta"], 1
    ) == span_near_unordered_kernel(docs_offs, pos_vals, seq, 1)
