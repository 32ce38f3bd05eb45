"""Result pagination (offset=) and the facet panel (facet_counts).

Pagination invariants: pages tile the deep top-k exactly (page1+page2 ==
top-20, element-wise), every serving path agrees (wand, relational, point
tier), and hydration applies after the slice. Facets: counts equal a
hand-built relational ground truth over the same normalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.query import FtsIndex

QUERY = "turtle hotel data"


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _ = small_index
    return FtsIndex(spark, index_dir)


def test_pages_tile_the_deep_topk(fts):
    deep = _rows(fts.search_bm25(QUERY, k=20))
    assert len(deep) == 20
    page1 = _rows(fts.search_bm25(QUERY, k=10))
    page2 = _rows(fts.search_bm25(QUERY, k=10, offset=10))
    assert page1 + page2 == deep
    # pages never overlap and ordering is deterministic
    assert len({d for d, _ in page1} & {d for d, _ in page2}) == 0


@pytest.mark.parametrize("k,offset", [(1, 1), (3, 2), (7, 13), (10, 10)])
def test_pages_tile_for_arbitrary_k_offset(fts, k, offset):
    deep = _rows(fts.search_bm25(QUERY, k=k + offset))
    head = _rows(fts.search_bm25(QUERY, k=offset)) if offset else []
    page = _rows(fts.search_bm25(QUERY, k=k, offset=offset))
    assert head + page == deep


def test_offset_modes_agree(fts):
    wand = _rows(fts.search_bm25(QUERY, k=5, offset=7, mode="wand"))
    rel = _rows(fts.search_bm25(QUERY, k=5, offset=7, mode="relational"))
    assert wand == rel and len(wand) == 5


def test_offset_point_tier_matches_distributed(fts):
    fts.warm().enable_point_serving()
    try:
        dist = _rows(fts.search_bm25(QUERY, k=10, offset=10))
        point = [
            (d, round(s, 9))
            for d, s in fts.search_bm25_point(QUERY, k=10, offset=10)
        ]
        assert point == dist
    finally:
        fts._postings_df.unpersist()
        if fts._terms_df is not None:
            fts._terms_df.unpersist()


def test_offset_past_end_and_validation(fts):
    n = fts.search_bm25(QUERY, k=0).count()
    assert _rows(fts.search_bm25(QUERY, k=10, offset=n + 5)) == []
    with pytest.raises(ValueError):
        fts.search_bm25(QUERY, k=10, offset=-1)


def test_offset_hydrates_one_page(fts):
    out = fts.search_bm25(QUERY, k=3, offset=3, hydrate=True)
    rows = out.collect()
    assert len(rows) == 3 and {"url", "url_md5"} <= set(out.columns)
    bare = _rows(fts.search_bm25(QUERY, k=3, offset=3))
    assert [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows] == bare


def test_facet_counts_match_relational_ground_truth(fts, spark):
    got = {
        r["lang"]: int(r["n_docs"])
        for r in fts.facet_counts(QUERY, facet="lang").collect()
    }
    # ground truth: distinct matching docs per lang via the decoded
    # postings (OR semantics, same normalization/pipeline)
    mult = fts._query_mult(QUERY)
    truth = {
        r["lang"]: int(r["n"])
        for r in (
            fts.decoded_postings(list(mult), mult)
            .select("doc_id")
            .distinct()
            .join(fts.docs().select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.countDistinct("doc_id").alias("n"))
            .collect()
        )
    }
    assert got == truth and sum(got.values()) > 0


def test_facet_counts_exclude_tombstones(fts, spark, small_index, tmp_path):
    import shutil

    from fts_engine_spark.mutate import delete_documents

    index_dir, _ = small_index
    work = str(tmp_path / "ix")
    shutil.copytree(index_dir, work)
    base = FtsIndex(fts.spark, work)
    before = {
        r["lang"]: int(r["n_docs"])
        for r in base.facet_counts(QUERY, facet="lang").collect()
    }
    # tombstone one matching doc; its lang bucket must shrink by one
    hit = base.search_bm25(QUERY, k=1, hydrate=True).collect()[0]
    lang = base.docs().where(F.col("doc_id") == hit["doc_id"]).first()["lang"]
    delete_documents(fts.spark, work, [hit["url"]])
    after = {
        r["lang"]: int(r["n_docs"])
        for r in FtsIndex(fts.spark, work).facet_counts(QUERY, "lang").collect()
    }
    assert after.get(lang, 0) == before[lang] - 1
    for other in set(before) - {lang}:
        assert after.get(other) == before[other]


def test_facet_histogram_matches_ground_truth(fts):
    """Histogram facet (date-histogram analog): bucket counts equal a
    hand-built histogram over the full OR match set's doclen values."""
    from collections import Counter

    hits = [int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()]
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    exp = Counter((dl[d] // 50) * 50 for d in hits)
    got = [
        (int(r["bucket"]), int(r["n_docs"]))
        for r in fts.facet_histogram(QUERY, col="doclen", width=50).collect()
    ]
    assert got == sorted(exp.items())


def test_facet_histogram_validation_and_empty_query(fts):
    with pytest.raises(ValueError):
        fts.facet_histogram(QUERY, width=0)
    assert fts.facet_histogram("zzzznotaterm").count() == 0


def test_facet_stats_matches_ground_truth(fts):
    """Stats facet: the single count/min/max/avg/sum row equals a
    hand-built aggregate over the full OR match set's doclen values."""
    hits = [int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()]
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    vals = [dl[d] for d in hits]
    row = fts.facet_stats(QUERY, col="doclen").collect()[0]
    assert int(row["n_docs"]) == len(vals) > 0
    assert int(row["min_v"]) == min(vals)
    assert int(row["max_v"]) == max(vals)
    assert float(row["avg_v"]) == pytest.approx(
        round(sum(vals) / len(vals), 4), abs=1e-9
    )
    assert int(row["sum_v"]) == sum(vals)


def test_facet_stats_empty_query(fts):
    assert fts.facet_stats("zzzznotaterm").count() == 0


def test_boosted_search_applies_prior_and_default(fts):
    """bm25 * boost(url): a boosted low-ranked doc rises to the top with
    exactly base*boost; docs absent from the boost table keep base order
    (default_boost=1)."""
    base = dict(_rows(fts.search_bm25(QUERY, k=0)))
    urls = {
        int(r["doc_id"]): r["url"]
        for r in fts.docs().select("doc_id", "url").collect()
    }
    low = min(base, key=lambda d: (base[d], -d))
    boost = fts.spark.createDataFrame(
        [(urls[low], 100.0)], "url string, boost double"
    )
    out = _rows(fts.search_bm25_boosted(QUERY, k=5, boost=boost))
    assert out[0][0] == low
    assert out[0][1] == pytest.approx(base[low] * 100.0, rel=1e-6)
    expected_rest = sorted(
        ((d, s) for d, s in base.items() if d != low),
        key=lambda t: (-t[1], t[0]),
    )[:4]
    assert [d for d, _ in out[1:]] == [d for d, _ in expected_rest]
    for (_, got_s), (_, exp_s) in zip(out[1:], expected_rest):
        assert got_s == pytest.approx(exp_s, rel=1e-9)


def test_boosted_search_default_boost_scales_uniformly(fts):
    base = _rows(fts.search_bm25(QUERY, k=3))
    out = _rows(fts.search_bm25_boosted(QUERY, k=3, default_boost=2.0))
    assert [d for d, _ in out] == [d for d, _ in base]
    for (_, got_s), (_, base_s) in zip(out, base):
        assert got_s == pytest.approx(base_s * 2.0, rel=1e-9)


def test_boosted_search_hydrates_and_handles_empty(fts):
    out = fts.search_bm25_boosted(QUERY, k=2, hydrate=True)
    rows = out.collect()
    assert len(rows) == 2 and {"url", "url_md5"} <= set(out.columns)
    assert all(r["url"] for r in rows)
    assert fts.search_bm25_boosted("zzzznotaterm", k=5).count() == 0


# ----------------------------------------- cardinality + percentiles (r5)


def test_facet_cardinality_exact_matches_ground_truth(fts):
    hits = [int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()]
    langs = {
        int(r["doc_id"]): r["lang"]
        for r in fts.docs().select("doc_id", "lang").collect()
    }
    truth = len({langs[d] for d in hits})
    row = fts.facet_cardinality(QUERY, col="lang", exact=True).collect()
    assert len(row) == 1 and int(row[0]["n_values"]) == truth > 0


def test_facet_cardinality_approx_agrees_at_small_cardinality(fts):
    """HLL++ is exact far below its register count — at single-digit
    true cardinality the sketch must equal count-distinct, which pins
    the approx plan end-to-end without flaky error-bound assertions."""
    exact = int(
        fts.facet_cardinality(QUERY, col="lang", exact=True)
        .collect()[0]["n_values"]
    )
    approx = int(
        fts.facet_cardinality(QUERY, col="lang").collect()[0]["n_values"]
    )
    assert approx == exact


def test_facet_cardinality_empty_query_is_zero(fts):
    row = fts.facet_cardinality("zzzznotaterm", col="lang").collect()
    assert len(row) == 1 and int(row[0]["n_values"]) == 0


def test_facet_percentiles_match_numpy(fts):
    import numpy as np

    hits = [int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()]
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    vals = np.array(sorted(dl[d] for d in hits), dtype=np.float64)
    pcts = (0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    got = fts.facet_percentiles(QUERY, col="doclen", percentiles=pcts)
    rows = got.collect()
    assert [float(r["pct"]) for r in rows] == list(pcts)
    for r in rows:
        # numpy 'linear' interpolation == Spark percentile == quantile_cont
        want = float(np.quantile(vals, float(r["pct"]), method="linear"))
        assert float(r["value"]) == pytest.approx(round(want, 6), abs=1e-6)


def test_facet_percentiles_approx_within_rank_error(fts):
    """The sketch mode returns actual column values whose rank error is
    bounded by 1/accuracy — at accuracy 10k over a small match set it
    must return exact order statistics (the nearest-rank value)."""
    import numpy as np

    hits = [int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()]
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    vals = sorted(dl[d] for d in hits)
    rows = fts.facet_percentiles(
        QUERY, col="doclen", percentiles=(0.5,), exact=False
    ).collect()
    assert len(rows) == 1
    assert float(rows[0]["value"]) in {float(v) for v in vals}


def test_facet_percentiles_empty_and_validation(fts):
    assert fts.facet_percentiles("zzzznotaterm").count() == 0
    with pytest.raises(ValueError, match="percentiles"):
        fts.facet_percentiles(QUERY, percentiles=(1.5,))
    with pytest.raises(ValueError, match="percentiles"):
        fts.facet_percentiles(QUERY, percentiles=())


def test_facet_cardinality_approx_plan_has_no_expand_or_distinct(fts):
    """The scale mode must aggregate HLL sketches map-side — the plan
    may not contain a distinct-style Expand/Aggregate over the match
    set's (doc_id, col) pairs."""
    df = fts.facet_cardinality(QUERY, col="lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "approx_count_distinct" in plan
    df_exact = fts.facet_cardinality(QUERY, col="lang", exact=True)
    plan_exact = df_exact._jdf.queryExecution().executedPlan().toString()
    assert "approx_count_distinct" not in plan_exact


# ------------------------------------------------- field-sorted retrieval


def test_search_sorted_matches_ground_truth(fts):
    """search_sorted == the match set ordered by (col desc, doc_id asc),
    truncated at k — the ES sort analog, no scoring involved."""
    hits = {int(r["doc_id"]) for r in fts.search_bm25(QUERY, k=0).collect()}
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    want = sorted(((d, dl[d]) for d in hits), key=lambda x: (-x[1], x[0]))
    got = [
        (int(r["doc_id"]), int(r["doclen"]))
        for r in fts.search_sorted(QUERY, by="doclen", k=3).collect()
    ]
    assert got == want[:3] and got
    # ascending + full set
    got_all = [
        (int(r["doc_id"]), int(r["doclen"]))
        for r in fts.search_sorted(
            QUERY, by="doclen", ascending=True, k=0
        ).collect()
    ]
    assert got_all == sorted(
        ((d, dl[d]) for d in hits), key=lambda x: (x[1], x[0])
    )


def test_search_sorted_topk_plan_and_empty(fts):
    """k>0 must end in TakeOrderedAndProject (per-partition heaps, one
    reduce — never a global sort); an analyzer-empty query is empty."""
    df = fts.search_sorted(QUERY, by="doclen", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert fts.search_sorted("zzzznotaterm", k=5).count() == 0
