"""More-like-this (operators/morelike.py): deterministic term selection,
wand == relational == an independent numpy BM25 referee over
decoded_postings, source-doc exclusion, point-tier parity, and the
no-text-source failure mode.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.operators.morelike import (
    more_like_this,
    more_like_this_point,
    select_mlt_terms,
)
from fts_engine_spark.query import FtsIndex

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def stored_small(spark, small_corpus, tmp_path_factory):
    """Small-corpus index WITH the stored-fields sidecar (store_text)."""
    from fts_engine_spark.build import BuildConfig, build_index

    d = str(tmp_path_factory.mktemp("mlt") / "ix")
    docs = spark.read.parquet(small_corpus)
    build_index(
        spark,
        docs,
        d,
        BuildConfig(
            preset="by_lang", shard_size=32, id_buckets=8, n_waves=2,
            store_text=True,
        ),
        resume=False,
    )
    return d


def _manual_bm25(fts: FtsIndex, terms: list[str]) -> dict[int, float]:
    """Independent BM25 over decoded_postings (mult=1 per term)."""
    rows = fts.decoded_postings(sorted(set(terms))).collect()
    df: dict[str, int] = {}
    for r in rows:
        df[r["term"]] = df.get(r["term"], 0) + 1
    n, avgdl = fts.n_docs, fts.avgdl
    out: dict[int, float] = {}
    for r in rows:
        idf = math.log(1.0 + (n - df[r["term"]] + 0.5) / (df[r["term"]] + 0.5))
        tf = float(r["tf"])
        c = idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * r["dl"] / avgdl))
        out[int(r["doc_id"])] = out.get(int(r["doc_id"]), 0.0) + c
    return out


def test_selection_rank_and_knobs(spark, stored_small):
    fts = FtsIndex(spark, stored_small)
    row = fts.stored_text([5], with_lang=True).collect()[0]
    terms = select_mlt_terms(fts, row["text"], row["lang"], max_terms=8)
    assert 0 < len(terms) <= 8
    # every selected term is a dictionary term
    stats = fts.term_stats(terms)
    assert set(terms) <= set(stats)
    # rank is (tf desc, df asc, term asc): recompute and compare
    from collections import Counter
    from fts_engine_spark.operators.morelike import _doc_preset
    from fts_engine_spark.textproc.pipeline import get_pipeline

    tf = Counter(
        get_pipeline(_doc_preset(fts, row["lang"], None)).process(row["text"])
    )
    full = fts.term_stats(sorted(tf))
    cands = sorted(
        ((t, c, full[t][0]) for t, c in tf.items() if t in full),
        key=lambda x: (-x[1], x[2], x[0]),
    )
    assert terms == [t for t, _, _ in cands[:8]]
    # min_tf filters singletons
    hi = select_mlt_terms(fts, row["text"], row["lang"], min_tf=2)
    assert all(tf[t] >= 2 for t in hi)


def test_mlt_modes_match_referee(spark, stored_small):
    fts = FtsIndex(spark, stored_small)
    row = fts.stored_text([7], with_lang=True).collect()[0]
    terms = select_mlt_terms(fts, row["text"], row["lang"], max_terms=10)
    base = _manual_bm25(fts, terms)
    want = sorted(
        ((d, round(s, 9)) for d, s in base.items() if d != 7),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    for mode in ("wand", "relational"):
        got = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in more_like_this(
                fts, doc_id=7, k=5, max_terms=10, mode=mode
            ).collect()
        ]
        assert got == want, mode
    # source doc never appears, even unbounded
    all_ids = {
        int(r["doc_id"])
        for r in more_like_this(fts, doc_id=7, k=0, max_terms=10).collect()
    }
    assert 7 not in all_ids and all_ids


def test_mlt_by_url_and_hydrate(spark, stored_small):
    fts = FtsIndex(spark, stored_small)
    url = fts.docs().where(F.col("doc_id") == 3).collect()[0]["url"]
    out = more_like_this(fts, url=url, k=5, hydrate=True)
    assert {"doc_id", "score", "url"} <= set(out.columns)
    got = {int(r["doc_id"]) for r in out.collect()}
    assert got and 3 not in got


def test_mlt_point_parity(spark, stored_small):
    fts = FtsIndex(spark, stored_small).enable_point_serving()
    try:
        for src in (2, 7, 11):
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in more_like_this(
                    fts, doc_id=src, k=5, max_terms=10
                ).collect()
            ]
            got = more_like_this_point(fts, src, k=5, max_terms=10)
            assert got == want, src
    finally:
        fts.close()


def test_mlt_errors(spark, small_index, stored_small):
    index_dir, _meta = small_index  # no stored sidecar, no docs passed
    fts = FtsIndex(spark, index_dir)
    with pytest.raises(ValueError, match="no text source"):
        more_like_this(fts, doc_id=0, k=5)
    fts2 = FtsIndex(spark, stored_small)
    with pytest.raises(ValueError, match="exactly one"):
        more_like_this(fts2, url="doc://1", doc_id=1)
    with pytest.raises(ValueError, match="not in the index"):
        more_like_this(fts2, url="doc://nope")


def test_mlt_docs_dataframe_source(spark, small_corpus, small_index):
    """Without the sidecar, a caller-provided docs DataFrame supplies the
    text; selection and results match the stored path's semantics."""
    index_dir, _meta = small_index
    fts = FtsIndex(spark, index_dir)
    docs = spark.read.parquet(small_corpus)
    out = more_like_this(fts, doc_id=5, k=5, docs=docs)
    rows = out.collect()
    assert rows and all(int(r["doc_id"]) != 5 for r in rows)
