"""explain_bm25 (Lucene Explanation analog): per-term contribution rows
whose per-doc sum equals the search_bm25 score, gated to the same top-k."""

from __future__ import annotations

from collections import defaultdict

import pytest

from fts_engine_spark.query import FtsIndex

QUERY = "turtle hotel data"


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _ = small_index
    return FtsIndex(spark, index_dir)


def test_explain_contribs_sum_to_search_score(fts):
    top = [
        (int(r["doc_id"]), float(r["score"]))
        for r in fts.search_bm25(QUERY, k=10).collect()
    ]
    rows = fts.explain_bm25(QUERY, k=10).collect()
    sums = defaultdict(float)
    for r in rows:
        sums[int(r["doc_id"])] += float(r["contrib"])
    assert set(sums) == {d for d, _ in top}
    for d, s in top:
        assert sums[d] == pytest.approx(s, rel=1e-9)


def test_explain_k0_covers_every_matching_doc(fts):
    all_docs = {int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()}
    explained = {
        int(r["doc_id"]) for r in fts.explain_bm25(QUERY, k=0).collect()
    }
    assert explained == all_docs


def test_explain_df_and_tf_are_consistent(fts):
    rows = fts.explain_bm25(QUERY, k=10).collect()
    assert rows, "top-10 explain must not be empty"
    # df is a per-term constant; tf >= 1 on every hit row
    df_by_term = defaultdict(set)
    for r in rows:
        df_by_term[r["term"]].add(int(r["df"]))
        assert int(r["tf"]) >= 1
    assert all(len(v) == 1 for v in df_by_term.values())


def test_explain_empty_query_returns_empty_schema(fts):
    out = fts.explain_bm25("zzzznotaterm")
    assert out.count() == 0
    assert out.columns == ["doc_id", "term", "tf", "df", "contrib"]
