"""Positional (phrase) search — an extension beyond the reference's
term-level engine (engine.go:82-158 has no positional queries).

Pins: (a) the direct JVM scan == the index-accelerated two-phase plan ==
a python ground truth on the 'simple' pipeline; (b) analyzed-token-space
semantics on stemmed presets (per-language routing for by_lang, matching
the build pipelines); (c) edge cases — single-term phrase, phrase longer
than any doc, stopword inside the phrase, absent term.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.operators import search
from fts_engine_spark.query import FtsIndex
from fts_engine_spark.textproc.pipeline import get_pipeline


@pytest.fixture(scope="module")
def phrase_docs(spark):
    rows = [
        (0, "merge sort is a classic merge sort algorithm", "en"),
        (1, "the merge of the sort", "en"),          # stopwords drop -> adjacent
        (2, "sort merge join beats hash join", "en"),
        (3, "merge then sorting data", "en"),        # not adjacent post-filter
        (4, "big merge sort merge sort merge sort run", "en"),
        (5, "nothing relevant here", "en"),
        (6, "merge", "en"),                          # shorter than the phrase
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def py_phrase_count(text: str, terms: list[str], preset: str = "simple") -> int:
    toks = get_pipeline(preset).process(text)
    n = len(terms)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i : i + n] == terms
    )


def test_direct_matches_python_ground_truth(phrase_docs):
    got = {
        int(r["doc_id"]): int(r["phrase_count"])
        for r in search.search_phrase_direct(
            phrase_docs, ["merge", "sort"], k=0
        ).collect()
    }
    rows = phrase_docs.collect()
    want = {
        int(r["doc_id"]): py_phrase_count(r["text"], ["merge", "sort"])
        for r in rows
    }
    want = {d: c for d, c in want.items() if c > 0}
    assert got == want
    # the stopword-bridge doc matches ("merge the sort" -> merge,sort)
    assert got[1] == 1
    assert 3 not in got and 5 not in got and 6 not in got
    assert got[4] == 3


def test_direct_single_term_counts_occurrences(phrase_docs):
    got = {
        int(r["doc_id"]): int(r["phrase_count"])
        for r in search.search_phrase_direct(phrase_docs, ["merge"], k=0).collect()
    }
    assert got[0] == 2 and got[4] == 3 and got[6] == 1


def test_direct_phrase_longer_than_docs(spark):
    docs = spark.createDataFrame(
        [(0, "one two"), (1, "")], "doc_id long, text string"
    )
    out = search.search_phrase_direct(
        docs, ["one", "two", "three", "four"], k=0
    )
    assert out.count() == 0


@pytest.fixture(scope="module")
def phrase_index(spark, phrase_docs, tmp_path_factory):
    from fts_engine_spark.build import BuildConfig, build_index

    d = str(tmp_path_factory.mktemp("phrase") / "ix")
    idx_docs = phrase_docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    build_index(
        spark, idx_docs, d,
        BuildConfig(preset="simple", shard_size=4, id_buckets=4, n_waves=1),
        resume=False,
    )
    return d, idx_docs


def test_accelerated_matches_direct_simple(spark, phrase_docs, phrase_index):
    index_dir, idx_docs = phrase_index
    fts = FtsIndex(spark, index_dir)
    accel = {
        int(r["url"][6:]): int(r["phrase_count"])
        for r in search.search_phrase(fts, idx_docs, "merge sort", k=0).collect()
    }
    direct = {
        int(r["doc_id"]): int(r["phrase_count"])
        for r in search.search_phrase_direct(
            phrase_docs, ["merge", "sort"], k=0
        ).collect()
    }
    assert accel == direct and accel


def test_accelerated_topk_order(spark, phrase_index):
    index_dir, idx_docs = phrase_index
    fts = FtsIndex(spark, index_dir)
    top = search.search_phrase(fts, idx_docs, "merge sort", k=2).collect()
    # count desc, doc_id asc: doc 4 (3 hits) then doc 0 (2 hits)
    assert [int(r["url"][6:]) for r in top] == [4, 0]


def test_accelerated_absent_term_empty(spark, phrase_index):
    index_dir, idx_docs = phrase_index
    fts = FtsIndex(spark, index_dir)
    assert (
        search.search_phrase(fts, idx_docs, "merge zzzznothere", k=0).count()
        == 0
    )
    assert search.search_phrase(fts, idx_docs, "the of", k=0).count() == 0


def test_stemmed_preset_matches_analyzed_space(spark):
    """by_lang index: phrase matching happens in analyzed token space with
    per-language pipeline routing — 'french hotels' must match docs whose
    english-stemmed stream contains (french, hotel)."""
    corpus = spark.createDataFrame(
        [
            (0, "the french hotels were quiet", "en"),
            (1, "a french hotel by the sea", "en"),
            (2, "hotels in france", "en"),
            (3, "hotel french food only", "en"),  # wrong order
        ],
        "doc_id long, text string, lang string",
    )
    # build a tiny by_lang index over THIS corpus so candidates line up
    from fts_engine_spark.build import BuildConfig, build_index

    import tempfile

    d = tempfile.mkdtemp(prefix="phrix")
    idx_docs = corpus.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    build_index(
        spark, idx_docs, d,
        BuildConfig(preset="by_lang", shard_size=4, id_buckets=4, n_waves=1),
        resume=False,
    )
    fts2 = FtsIndex(spark, d)
    got = {
        int(r["url"][6:]): int(r["phrase_count"])
        for r in search.search_phrase(fts2, idx_docs, "french hotels", k=0).collect()
    }
    # english pipeline: french hotels -> (french, hotel); docs 0 and 1
    # match contiguously, 2 is reversed/not adjacent, 3 wrong order
    assert got == {0: 1, 1: 1}


def test_engine_facade_phrase(spark, phrase_docs, phrase_index):
    from fts_engine_spark.engine import EngineOptions, FtsEngine

    index_dir, idx_docs = phrase_index
    eng = FtsEngine(spark, index_dir, EngineOptions(preset="simple"))
    out = eng.search_phrase(idx_docs, "merge sort", k=1).collect()
    assert len(out) == 1 and int(out[0]["url"][6:]) == 4
