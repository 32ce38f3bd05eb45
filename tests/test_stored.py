"""Stored fields (stored.py): text round-trip, snippet parity between
the source-table and stored paths (incl. by_lang routing), retrofit,
staleness fail-loud, and plan-level doc_id pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.operators.snippets import search_with_snippets
from fts_engine_spark.query import FtsIndex
from fts_engine_spark.stored import (
    StoredFieldsUnavailableError,
    add_stored_fields,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("https://a0", "the merge sort algorithm merges sorted runs", "en"),
        ("https://a1", "hotels in france: a french hotel guide", "en"),
        ("https://a2", "merge join beats hash join when inputs sort", "en"),
        ("https://a3", "быстрые машины и поезда города", "ru"),
        ("https://a4", "nothing relevant in this page at all", "en"),
        ("https://a5", "sorting networks merge pairwise", "en"),
        ("https://a6", "французский отель у моря", "ru"),
        ("https://a7", "merge merge merge tiny doc", "en"),
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def stored_index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("storedix") / "ix")
    build_index(
        spark, corpus, d,
        BuildConfig(
            preset="by_lang", shard_size=3, id_buckets=4, store_text=True
        ),
        resume=False,
    )
    return d


def test_stored_text_roundtrip(spark, corpus, stored_index):
    fts = FtsIndex(spark, stored_index)
    assert fts.has_stored
    want = {
        r["url"]: r["text"] for r in corpus.collect()
    }
    ids = {r["doc_id"]: r["url"] for r in fts.docs().collect()}
    got = {r["doc_id"]: r["text"] for r in fts.stored_text(list(ids)).collect()}
    assert len(got) == len(ids)
    for doc_id, url in ids.items():
        assert got[doc_id] == want[url]  # byte-identical text per doc


def test_snippet_parity_stored_vs_source(spark, corpus, stored_index):
    """docs=None (stored path) must return the exact strings the
    source-table path returns — including by_lang pipeline routing for
    the russian query."""
    fts = FtsIndex(spark, stored_index)
    for q in ["merge sort", "french hotel", "машины города", "the was"]:
        via_src = sorted(
            map(tuple, search_with_snippets(fts, corpus, q, k=5).collect())
        )
        via_stored = sorted(
            map(tuple, search_with_snippets(fts, None, q, k=5).collect())
        )
        assert via_stored == via_src, q


def test_retrofit_stored(spark, corpus, tmp_path):
    d = str(tmp_path / "retro")
    build_index(
        spark, corpus, d,
        BuildConfig(preset="by_lang", shard_size=3, id_buckets=4),
        resume=False,
    )
    fts = FtsIndex(spark, d)
    assert not fts.has_stored
    with pytest.raises(StoredFieldsUnavailableError, match="no stored"):
        fts.stored_text([0])
    add_stored_fields(spark, d, corpus)
    fts = FtsIndex(spark, d)
    assert fts.has_stored
    out = sorted(
        map(tuple, search_with_snippets(fts, None, "merge sort", k=5).collect())
    )
    ref = sorted(
        map(tuple, search_with_snippets(fts, corpus, "merge sort", k=5).collect())
    )
    assert out == ref
    # wrong corpus: count mismatch fails loudly
    with pytest.raises(ValueError, match="exact corpus"):
        add_stored_fields(spark, d, corpus.limit(3))


def test_stored_stale_fails_loudly(spark, stored_index):
    fts = FtsIndex(spark, stored_index)
    grown = dict(fts.meta, n_docs=fts.meta["n_docs"] + 1)
    fts.meta = grown
    with pytest.raises(StoredFieldsUnavailableError, match="stale"):
        fts.stored_text([0])
    # n_docs-preserving mutation: table_version bump alone must also trip
    fts2 = FtsIndex(spark, stored_index)
    fts2.meta = dict(
        fts2.meta, table_version=int(fts2.meta.get("table_version", 0)) + 1
    )
    with pytest.raises(StoredFieldsUnavailableError, match="stale"):
        fts2.stored_text([0])
    # a sidecar written by an older format version must be refused
    fts3 = FtsIndex(spark, stored_index)
    fts3.meta = dict(fts3.meta, stored=dict(fts3.meta["stored"], version=1))
    with pytest.raises(StoredFieldsUnavailableError, match="format version"):
        fts3.stored_text([0])


def test_snippets_point_parity(spark, corpus, stored_index):
    """The below-the-job-floor tier (point hits + driver pyarrow read)
    must return the exact rows the distributed paths return — with and
    without the warm point cache (the fallback still uses the driver
    read for text)."""
    from fts_engine_spark.operators.snippets import (
        search_with_snippets,
        snippets_point,
    )

    cold = FtsIndex(spark, stored_index)
    warm = FtsIndex(spark, stored_index).enable_point_serving()
    for q in ["merge sort", "french hotel", "машины города", "the was"]:
        want = [
            (int(r["doc_id"]), r["url"], float(r["score"]), r["snippet"])
            for r in search_with_snippets(cold, None, q, k=5).collect()
        ]
        assert snippets_point(cold, q, k=5) == want, q
        assert snippets_point(warm, q, k=5) == want, q


def test_snippets_point_requires_sidecar(spark, corpus, tmp_path):
    from fts_engine_spark.operators.snippets import snippets_point

    d = str(tmp_path / "nosidecar")
    build_index(
        spark, corpus, d,
        BuildConfig(preset="by_lang", shard_size=3, id_buckets=4),
        resume=False,
    )
    with pytest.raises(StoredFieldsUnavailableError, match="no stored"):
        snippets_point(FtsIndex(spark, d), "merge sort", k=5)


def test_retrofit_cli(spark, corpus, tmp_path, monkeypatch, capsys):
    """jobs/mutate.py retrofit --stored drives add_stored_fields end to
    end (the spark-submit ops path for refreshing a stale sidecar)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "jobs_mutate",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "mutate.py"),
    )
    jm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(jm)

    d = str(tmp_path / "cliix")
    build_index(
        spark, corpus, d,
        BuildConfig(preset="by_lang", shard_size=3, id_buckets=4),
        resume=False,
    )
    corpus_path = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(corpus_path)
    monkeypatch.setattr(
        "sys.argv",
        ["mutate.py", "retrofit", "--index", d, "--docs", corpus_path,
         "--stored"],
    )
    jm.main()
    assert '"stored"' in capsys.readouterr().out
    assert FtsIndex(spark, d).has_stored


def test_stored_scan_is_pruned(spark, stored_index):
    """The hit ids must reach the stored table's parquet scan as an In()
    predicate — with the doc_id-sorted layout that is what turns the
    snippet pass into a ~k-row-group point read at scale."""
    fts = FtsIndex(spark, stored_index)
    df = fts.stored_text([0, 3])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert df.count() == 2
