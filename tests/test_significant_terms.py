"""Significant-terms aggregation: terms over-represented in the match set
relative to the corpus, scored by the integer lift
(fg_df/|matches|) / (bg_df/n_docs). Ground truth: brute-force counts over
the fully-decoded postings (a different decode path — tf/dl included —
than the engine's doc-blob-only foreground pass).
"""

from __future__ import annotations

import pytest

from fts_engine_spark.query import FtsIndex

QUERY = "turtle hotel"


@pytest.fixture(scope="module")
def fts(spark, small_index):
    ix = FtsIndex(spark, small_index[0])
    yield ix
    ix.close()


def _ground_truth(fts, query, k, min_fg):
    mult = fts._query_mult(query)
    vocab = [r["term"] for r in fts._read_terms().select("term").collect()]
    decoded = [
        (r["term"], int(r["doc_id"]))
        for r in fts.decoded_postings(vocab).select("term", "doc_id").collect()
    ]
    matches = {d for t, d in decoded if t in mult}
    fg: dict[str, int] = {}
    bg: dict[str, int] = {}
    for t, d in decoded:
        bg[t] = bg.get(t, 0) + 1
        if d in matches:
            fg[t] = fg.get(t, 0) + 1
    n, m = fts.n_docs, len(matches)
    rows = [
        (t, c, bg[t], c * n / (bg[t] * m))
        for t, c in fg.items()
        if c >= min_fg
    ]
    rows.sort(key=lambda x: (-round(x[3], 6), x[0]))
    return [(t, f, b, round(lf, 4)) for t, f, b, lf in rows[:k]]


def test_significant_terms_matches_bruteforce(fts):
    got = [
        (r["term"], int(r["fg_df"]), int(r["bg_df"]), float(r["lift"]))
        for r in fts.significant_terms(QUERY, k=15, min_fg_df=2).collect()
    ]
    assert got == _ground_truth(fts, QUERY, 15, 2)
    assert got, "non-empty on a matching query"


def test_query_terms_rank_high(fts):
    """The query's own terms are maximally over-represented: every doc
    containing them is in the match set, so their lift is exactly
    n_docs/|matches| — the maximum possible."""
    got = fts.significant_terms(QUERY, k=0 or 50, min_fg_df=1).collect()
    by_term = {r["term"]: float(r["lift"]) for r in got}
    mult = fts._query_mult(QUERY)
    max_lift = max(by_term.values())
    for t in mult:
        if t in by_term:
            assert by_term[t] == max_lift


def test_min_fg_df_guard_and_empty_query(fts):
    got = fts.significant_terms(QUERY, k=50, min_fg_df=5).collect()
    assert all(int(r["fg_df"]) >= 5 for r in got)
    empty = fts.significant_terms("zzzznotaword", k=10)
    assert empty.collect() == []
    assert empty.columns == ["term", "fg_df", "bg_df", "lift"]


def test_fg_never_exceeds_bg(fts):
    for r in fts.significant_terms(QUERY, k=100, min_fg_df=1).collect():
        assert int(r["fg_df"]) <= int(r["bg_df"])
