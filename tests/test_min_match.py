"""Minimum-should-match (min_match=N): only docs matching >= N distinct
query terms are scored — Lucene's msm, generalizing conjunctive (= all)
over the existing require_n kernel machinery."""

from __future__ import annotations

import pytest

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.query import FtsIndex

CFG = BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1)
Q = "alpha w12 epsilon w10"  # 4 distinct terms with varying coverage


def _docs(spark, n):
    rows = [
        (
            f"doc://{i}",
            f"alpha beta w{i % 7} w{i % 13} gamma delta w{i % 5} "
            f"{'epsilon ' * (i % 3)}",
            "en",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def fts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("msm_ix"))
    build_index(spark, _docs(spark, 200), d, CFG, resume=False)
    return FtsIndex(spark, d)


def _matched_terms(i):
    text_terms = {
        "alpha", "beta", f"w{i % 7}", f"w{i % 13}", "gamma", "delta",
        f"w{i % 5}",
    } | ({"epsilon"} if i % 3 else set())
    return len({"alpha", "w12", "epsilon", "w10"} & text_terms)


def test_min_match_thresholds(spark, fts):
    full = {
        (r["url"], round(float(r["score"]), 9))
        for r in fts.search_bm25(Q, k=0, hydrate=True).collect()
    }
    for n in (1, 2, 3, 4):
        want = {
            x for x in full
            if _matched_terms(int(x[0].rsplit("/", 1)[1])) >= n
        }
        got_w = {
            (r["url"], round(float(r["score"]), 9))
            for r in fts.search_bm25(
                Q, k=0, hydrate=True, min_match=n
            ).collect()
        }
        got_r = {
            (r["url"], round(float(r["score"]), 9))
            for r in fts.search_bm25(
                Q, k=0, hydrate=True, min_match=n, mode="relational"
            ).collect()
        }
        assert got_w == want, n  # docs gated, scores UNCHANGED
        assert got_r == want, n

    # min_match == all distinct terms == conjunctive
    conj = fts.search_bm25(Q, k=0, conjunctive=True).collect()
    msm = fts.search_bm25(Q, k=0, min_match=4).collect()
    assert sorted(map(tuple, conj)) == sorted(map(tuple, msm))


def test_min_match_edges(spark, fts):
    # more matches required than query terms -> empty, no job
    assert fts.search_bm25(Q, k=0, min_match=5).count() == 0
    # min_match=1 == plain OR
    a = sorted(map(tuple, fts.search_bm25(Q, k=0).collect()))
    b = sorted(map(tuple, fts.search_bm25(Q, k=0, min_match=1).collect()))
    assert a == b
    with pytest.raises(ValueError, match="not both"):
        fts.search_bm25(Q, k=5, conjunctive=True, min_match=2)


def test_min_match_point_tier(spark, fts):
    fts.warm().enable_point_serving()
    try:
        for n in (2, 3):
            pt = fts.search_bm25_point(Q, k=10, min_match=n)
            dist = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts.search_bm25(Q, k=10, min_match=n).collect()
            ]
            assert pt == dist, n
    finally:
        fts.close()