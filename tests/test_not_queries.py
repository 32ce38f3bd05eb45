"""Boolean NOT (exclusion) queries — r5 extension completing the query
algebra: OR (reference default, ``engine.go:82-158``), AND (conjunctive,
r5), NOT (``exclude=``, this file).

Pins (a) wand == relational == an independent referee (full OR result
minus the excluded terms' decoded match set), (b) the point tier and the
batch kernel produce identical rows to the distributed single-query path,
(c) the edge cases: absent exclusion term is a no-op, excluding a query
term drops its docs (NOT a no-op), conjunctive overlap is provably empty,
and the warm point tier still serves NOT queries without a Spark job.
"""

from __future__ import annotations

import pytest

from fts_engine_spark.query import FtsIndex

CASES = [
    ("french hotel", "turtle"),
    ("hotel turtle", "french"),
    ("french turtle", "hotel"),
]


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _meta = small_index
    return FtsIndex(spark, index_dir)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), round(float(r["score"]), 9)) for r in df.collect()
    )


def _referee(fts: FtsIndex, query: str, exclude: str) -> list:
    """Full OR result minus the excluded terms' decoded match set,
    computed through decoded_postings — independent of the kernel's
    exclusion path."""
    full = dict(
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25(query, k=0, mode="relational").collect()
    )
    excl_terms = list(fts._query_mult(exclude))
    bad = {
        int(r["doc_id"])
        for r in fts.decoded_postings(excl_terms).select("doc_id").collect()
    }
    return sorted((d, s) for d, s in full.items() if d not in bad)


@pytest.mark.parametrize("query,exclude", CASES)
def test_not_wand_relational_referee(fts, query, exclude):
    want = _referee(fts, query, exclude)
    assert want, "case must have survivors to be meaningful"
    wand = _rows(fts.search_bm25(query, k=0, mode="wand", exclude=exclude))
    rel = _rows(
        fts.search_bm25(query, k=0, mode="relational", exclude=exclude)
    )
    assert wand == want
    assert rel == want
    # exclusion actually removed something
    full = _rows(fts.search_bm25(query, k=0, mode="wand"))
    assert len(wand) < len(full)


def test_not_topk_prefix_of_full(fts):
    """Top-k under exclusion == first k of the k=0 exclusion result in
    (score desc, doc_id asc) order — theta pruning stays exact."""
    q, e = "french hotel", "turtle"
    allr = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25(q, k=0, mode="wand", exclude=e)
        .orderBy("score", ascending=False)
        .collect()
    ]
    allr.sort(key=lambda x: (-x[1], x[0]))
    top = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25(q, k=5, mode="wand", exclude=e).collect()
    ]
    assert top == allr[:5]


def test_not_edge_cases(fts):
    q = "french hotel"
    base = _rows(fts.search_bm25(q, k=0, mode="wand"))
    # absent exclusion term: no-op
    assert _rows(fts.search_bm25(q, k=0, mode="wand", exclude="zzzmissing")) == base
    # excluding a query term drops every doc containing it (NOT a no-op):
    # the survivors match 'french' but never 'hotel'
    got = _rows(fts.search_bm25(q, k=0, mode="wand", exclude="hotel"))
    assert got == _referee(fts, q, "hotel")
    assert 0 < len(got) < len(base)
    # conjunctive + excluded query term: provably empty, no job needed
    assert (
        fts.search_bm25(
            q, k=0, mode="wand", conjunctive=True, exclude="hotel"
        ).count()
        == 0
    )
    # excluding every query term: empty
    assert fts.search_bm25(q, k=0, mode="wand", exclude=q).count() == 0


def test_not_conjunctive_combination(fts):
    """AND + NOT compose: docs containing ALL query terms and NONE of the
    excluded terms."""
    q, e = "french hotel", "turtle"
    want = [
        r
        for r in _referee(fts, q, e)
        if r[0]
        in {
            int(x["doc_id"])
            for x in fts.search_bm25(q, k=0, conjunctive=True).collect()
        }
    ]
    got = _rows(
        fts.search_bm25(q, k=0, mode="wand", conjunctive=True, exclude=e)
    )
    assert got == want and got


def test_not_point_tier(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir).enable_point_serving()
    try:
        for q, e in CASES:
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts.search_bm25(
                    q, k=10, mode="wand", exclude=e
                ).collect()
            ]
            assert fts.search_bm25_point(q, k=10, exclude=e) == want
        # warm repeat schedules no Spark job
        q, e = CASES[0]
        fts.search_bm25_point(q, k=10, exclude=e)
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        out = fts.search_bm25_point(q, k=10, exclude=e)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert out and after == before
    finally:
        fts.close()


def test_not_batch_matches_single(fts):
    queries = [q for q, _ in CASES]
    excludes = [e for _, e in CASES]
    got = {}
    for r in fts.search_bm25_batch(queries, k=10, excludes=excludes).collect():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), round(float(r["score"]), 9))
        )
    for i, (q, e) in enumerate(CASES):
        want = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in fts.search_bm25(q, k=10, mode="wand", exclude=e).collect()
        ]
        assert got.get(i, []) == want, (q, e)
