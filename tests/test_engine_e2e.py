"""End-to-end: build the sharded compressed index on the synthetic corpus and
assert rank-identity of every Spark search path against the pure-Python
oracle on the reference query set (north rule / SURVEY.md §5 step 2)."""

from __future__ import annotations

import pandas as pd
import pytest

from fts_engine_spark.query import FtsIndex
from tools.gen_corpus import REFERENCE_QUERIES, gen_rows

from .oracle import OracleIndex


@pytest.fixture(scope="module")
def oracle(small_index, spark):
    """Oracle indexed with the SAME doc_ids the Spark build assigned."""
    index_dir, meta = small_index
    fts = FtsIndex(spark, index_dir)
    docs = {
        r["url"]: r["doc_id"]
        for r in fts.docs().select("url", "doc_id").collect()
    }
    urls, _, _, texts, langs = gen_rows(120)
    oi = OracleIndex(by_lang=True)
    for url, text, lang in zip(urls, texts, langs):
        oi.index_document(docs[url], text, lang)
    return oi


def test_meta_consistency(small_index, oracle):
    _, meta = small_index
    assert meta["n_docs"] == 120
    assert meta["n_docs"] == oracle.n_docs
    assert abs(meta["avgdl"] - oracle.avgdl) < 1e-9


@pytest.mark.parametrize("q", [q["query"] for q in REFERENCE_QUERIES[:12]])
def test_reference_scorer_rank_identity(spark, small_index, oracle, q):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    got = [
        (r["doc_id"], r["unique_matches"], r["total_matches"])
        for r in fts.search_reference(q, k=10, preset="multilingual").collect()
    ]
    want, _total = oracle.search_reference(q, k=10, lang=None)
    assert got == [(d, u, t) for d, u, t in want], f"query={q!r}"


@pytest.mark.parametrize("mode", ["relational", "wand"])
def test_bm25_rank_identity(spark, small_index, oracle, mode):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    for qd in REFERENCE_QUERIES:
        q, k = qd["query"], qd["k"]
        got = [
            (r["doc_id"], round(r["score"], 8))
            for r in fts.search_bm25(q, k=k, preset="multilingual", mode=mode).collect()
        ]
        want = [
            (d, round(s, 8)) for d, s in oracle.search_bm25(q, k=k, lang=None)
        ]
        assert [g[0] for g in got] == [w[0] for w in want], f"query={q!r} docids"
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), f"query={q!r} doc={gd}"


def test_wand_equals_relational(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    for qd in REFERENCE_QUERIES[:8]:
        q, k = qd["query"], qd["k"]
        rel = fts.search_bm25(q, k=k, preset="multilingual", mode="relational").collect()
        wnd = fts.search_bm25(q, k=k, preset="multilingual", mode="wand").collect()
        assert [r["doc_id"] for r in rel] == [r["doc_id"] for r in wnd], q
        for a, b in zip(rel, wnd):
            assert a["score"] == pytest.approx(b["score"], abs=1e-9)


def test_unknown_term_empty(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    assert fts.search_bm25("zzzunknownzzz", k=10).count() == 0
    assert fts.search_reference("zzzunknownzzz", k=10).count() == 0


def test_stopword_only_query_empty(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    # "the was" fully removed by the english pipeline (engine_test golden)
    assert fts.search_bm25("the was", k=10, preset="english").count() == 0


def test_stopword_only_query_hydrated_schema(spark, small_index):
    """hydrate=True must keep the hydrated schema on the empty path —
    callers (snippets, UIs) select `url` from the result unconditionally."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    out = fts.search_bm25("the was", k=10, preset="english", hydrate=True)
    assert out.count() == 0
    assert {"doc_id", "url", "url_md5", "score"} <= set(out.columns)
    pre = fts.search_bm25_prefix("thez*", k=10, preset="english", hydrate=True)
    assert pre.count() == 0
    assert "url" in pre.columns


def test_duplicate_token_quirk(spark, small_index, oracle):
    """'hotel hotel' doubles unique_matches for every matching doc
    (engine.go:96-123)."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    single = {
        r["doc_id"]: (r["unique_matches"], r["total_matches"])
        for r in fts.search_reference("hotel", k=0, preset="english").collect()
    }
    double = {
        r["doc_id"]: (r["unique_matches"], r["total_matches"])
        for r in fts.search_reference("hotel hotel", k=0, preset="english").collect()
    }
    assert set(single) == set(double)
    for d, (u, t) in single.items():
        assert double[d] == (2 * u, 2 * t)


def test_hydrate_roundtrip(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    rows = fts.search_bm25("turtle", k=5, hydrate=True).collect()
    assert len(rows) == 5
    assert all(r["url"].startswith("https://site") for r in rows)
    assert all(len(r["url_md5"]) == 32 for r in rows)


def test_resume_skips_completed(spark, small_corpus, small_index, tmp_path):
    """Re-running build with an intact manifest re-does nothing and produces
    identical results (load-skip-rebuild, main.go:272-280)."""
    import json
    import os

    from fts_engine_spark.build import BuildConfig, build_index

    index_dir, _ = small_index
    manifest_before = json.load(open(os.path.join(index_dir, "_manifest.json")))
    docs = spark.read.parquet(small_corpus)
    cfg = BuildConfig(preset="by_lang", shard_size=32, id_buckets=8, n_waves=2)
    build_index(spark, docs, index_dir, cfg, resume=True)
    manifest_after = json.load(open(os.path.join(index_dir, "_manifest.json")))
    for step, entry in manifest_before.items():
        assert manifest_after[step]["completed_at"] == entry["completed_at"], step


def test_search_full_total_and_timings(spark, small_index, oracle):
    """Pre-truncation TotalResultsCount + Timings keys, both scorers, vs the
    pure-Python oracle (engine.go:146-157 always reports the full count)."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    for qd in REFERENCE_QUERIES[:6]:
        q, k = qd["query"], qd["k"]
        want, want_total = oracle.search_reference(q, k=k, lang=None)
        got = fts.search_full(q, k=k, preset="multilingual", scorer="reference")
        assert got.total_results_count == want_total, q
        rows = [
            (r["doc_id"], r["unique_matches"], r["total_matches"])
            for r in got.results.collect()
        ]
        assert rows == [(d, u, t) for d, u, t in want], q
        assert set(got.timings) == {"preprocess", "search_tokens", "total"}
        assert got.timings["total"] >= got.timings["search_tokens"] >= 0

        for mode in ("relational", "wand"):
            full = fts.search_full(
                q, k=k, preset="multilingual", scorer="bm25", mode=mode
            )
            assert full.total_results_count == want_total, (q, mode)
            want_bm = oracle.search_bm25(q, k=k, lang=None)
            got_bm = [
                (r["doc_id"], round(r["score"], 8))
                for r in full.results.collect()
            ]
            assert [g[0] for g in got_bm] == [w[0] for w in want_bm], (q, mode)


def test_search_full_empty_query(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    res = fts.search_full("the was", k=10, preset="english")
    assert res.total_results_count == 0
    assert res.results.count() == 0
    assert set(res.timings) == {"preprocess", "search_tokens", "total"}


def test_warm_serving_rank_parity(spark, small_index):
    """Warm serving mode (driver dictionary + closure stats + partitioned
    cache) returns exactly what the cold path returns, for every reference
    query."""
    index_dir, _ = small_index
    cold = FtsIndex(spark, index_dir)
    warm = FtsIndex(spark, index_dir).warm(serving_conf=False)
    try:
        for qd in REFERENCE_QUERIES[:10]:
            q, k = qd["query"], qd["k"]
            a = [
                (r["doc_id"], round(r["score"], 9))
                for r in warm.search_bm25(q, k=k, preset="multilingual").collect()
            ]
            b = [
                (r["doc_id"], round(r["score"], 9))
                for r in cold.search_bm25(q, k=k, preset="multilingual").collect()
            ]
            assert a == b, q
        # reference scorer + totals too
        fa = warm.search_full("turtle hotel", k=5, preset="multilingual")
        fb = cold.search_full("turtle hotel", k=5, preset="multilingual")
        assert fa.total_results_count == fb.total_results_count
        assert sorted(map(tuple, fa.results.collect())) == sorted(
            map(tuple, fb.results.collect())
        )
    finally:
        warm._postings_df.unpersist()
        warm._terms_df.unpersist()


def test_batch_search_equals_individual(spark, small_index):
    """search_bm25_batch must return, per query, exactly the single-query
    WAND results — cold and warm."""
    from fts_engine_spark.query import FtsIndex

    index_dir, _ = small_index
    queries = ["turtle hotel", "coordinate", "turtle turtle fast"]
    for warm in (False, True):
        fts = FtsIndex(spark, index_dir)
        if warm:
            fts.warm(serving_conf=False)
        try:
            batch = fts.search_bm25_batch(queries, k=5).collect()
            by_q = {}
            for r in batch:
                by_q.setdefault(r["query_id"], []).append(
                    (r["doc_id"], round(float(r["score"]), 9))
                )
            for i, q in enumerate(queries):
                single = [
                    (r["doc_id"], round(float(r["score"]), 9))
                    for r in fts.search_bm25(q, k=5, mode="wand").collect()
                ]
                assert by_q.get(i, []) == single, (warm, q)
        finally:
            if warm:
                fts.close()


def test_search_full_with_total_false_skips_count(spark, small_index):
    """with_total=False: same top-k rows, total sentinel -1, and (wand)
    no decoded-postings count job — the serving fast path."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    for scorer, mode in (
        ("reference", "wand"),
        ("bm25", "relational"),
        ("bm25", "wand"),
    ):
        full = fts.search_full(
            "turtle hotel", k=5, preset="multilingual",
            scorer=scorer, mode=mode,
        )
        fast = fts.search_full(
            "turtle hotel", k=5, preset="multilingual",
            scorer=scorer, mode=mode, with_total=False,
        )
        assert fast.total_results_count == -1
        assert full.total_results_count > 0
        assert sorted(map(tuple, fast.results.collect())) == sorted(
            map(tuple, full.results.collect())
        ), (scorer, mode)


def test_match_count_equals_distinct_decoded(spark, small_index):
    """The doc-blob-only count must equal the full-decode distinct count
    (they read different byte ranges of the same lists)."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    mult = {"turtle": 1, "hotel": 1}
    cheap = fts._match_count_df(mult).count()
    fullc = (
        fts.decoded_postings(list(mult), mult)
        .select("doc_id").distinct().count()
    )
    assert cheap == fullc > 0


def test_warm_dict_byte_budget_boundary(spark, small_index):
    """VERDICT r4 wrong #4: the warm driver dictionary is capped by
    estimated BYTES, not just entries; over-budget degrades to the
    in-plan broadcast path with identical results."""
    index_dir, _ = small_index
    over = FtsIndex(spark, index_dir)
    under = FtsIndex(spark, index_dir)
    try:
        under.warm(driver_dict_max_bytes=100)  # ~300B/term: never fits
        assert under._term_dict is None
        over.warm()  # default 256 MiB: the small dict fits
        assert over._term_dict is not None
        a = [tuple(r) for r in under.search_bm25("turtle hotel", k=5).collect()]
        b = [tuple(r) for r in over.search_bm25("turtle hotel", k=5).collect()]
        assert a == b and len(a) > 0
    finally:
        under.close()
        over.close()
