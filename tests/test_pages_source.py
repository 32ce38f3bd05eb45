"""Pages-table reader (``sources/pages.py``): format resolution, schema
conformance, text-from-html backfill (byte-identical invariant), and the
Iceberg syntax path's actionable failure on a jar-less environment."""

from __future__ import annotations

import datetime as dt

import pytest

from fts_engine_spark.extract import extract_text
from fts_engine_spark.sources.pages import (
    PagesSourceError,
    conform_pages,
    read_pages,
    resolve_format,
)


def test_resolve_format():
    assert resolve_format("warehouse.db.pages") == "iceberg"
    assert resolve_format("/data/pages.parquet") == "parquet"
    assert resolve_format("s3a://bucket/pages") == "parquet"
    assert resolve_format("pages") == "parquet"  # bare relative path
    assert resolve_format("/x/y", fmt="iceberg") == "iceberg"
    assert resolve_format("db.pages", fmt="parquet") == "parquet"
    with pytest.raises(PagesSourceError):
        resolve_format("x", fmt="delta")


def test_read_pages_parquet_roundtrip(spark, small_corpus):
    df = read_pages(spark, small_corpus)
    assert [f.name for f in df.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
    ]
    rows = df.orderBy("url").limit(3).collect()
    assert rows and all(r["url"].startswith("https://") for r in rows)
    # the generated corpus defines text == extract_text(html); conformance
    # must preserve that byte-identically
    for r in rows:
        assert r["text"] == extract_text(r["html"])


def test_text_backfilled_from_html(spark):
    html = b"<html><body><h1>T</h1><p>hello   world</p></body></html>"
    raw = spark.createDataFrame(
        [
            ("u1", None, html),  # text missing -> derive
            ("u2", "already here", html),  # text present -> untouched
        ],
        "url string, text string, html binary",
    )
    out = {r["url"]: r for r in conform_pages(raw).collect()}
    assert out["u1"]["text"] == extract_text(html)
    assert out["u2"]["text"] == "already here"
    assert out["u1"]["lang"] == "en" and out["u1"]["warc_ts"] is None


def test_html_only_table(spark):
    html = b"<html><body>only html</body></html>"
    raw = spark.createDataFrame([("u", html)], "url string, html binary")
    (row,) = conform_pages(raw, default_lang="ru").collect()
    assert row["text"] == extract_text(html)
    assert row["lang"] == "ru"


def test_case_insensitive_and_casts(spark):
    raw = spark.createDataFrame(
        [("u", "2024-01-02T03:04:05", "body text", "EN")],
        "URL string, WARC_TS string, Text string, Lang string",
    )
    (row,) = conform_pages(raw).collect()
    assert row["warc_ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert row["text"] == "body text" and row["html"] is None


def test_missing_required_columns(spark):
    with pytest.raises(PagesSourceError, match="no 'url'"):
        conform_pages(spark.createDataFrame([("x",)], "text string"))
    with pytest.raises(PagesSourceError, match="'text' or 'html'"):
        conform_pages(spark.createDataFrame([("u",)], "url string"))


def test_iceberg_path_fails_actionably_without_jars(spark):
    """The catalog path is syntax-tested only (SURVEY.md §6): no Iceberg
    runtime jars here, so the exact `spark.read.table(ident)` call a real
    cluster would execute must surface as a PagesSourceError that names
    the fix, not as a bare analysis exception."""
    with pytest.raises(PagesSourceError, match="iceberg-spark-runtime"):
        read_pages(spark, "nosuch_catalog.db.pages")
    with pytest.raises(PagesSourceError, match="iceberg-spark-runtime"):
        read_pages(spark, "/tmp/nosuch-pages-dir", fmt="iceberg")


def test_engine_index_pages_end_to_end(spark, small_corpus, tmp_path):
    """FtsEngine.index_pages == read_pages + index_documents: the
    north-star entry builds a searchable index straight from the pages
    table location."""
    from fts_engine_spark.engine import EngineOptions, FtsEngine

    eng = FtsEngine(
        spark,
        str(tmp_path / "idx_pages"),
        EngineOptions(shard_size=64, id_buckets=4),
    )
    meta = eng.index_pages(small_corpus)
    assert meta["n_docs"] == 120
    hits = eng.search("landmark coordinate", k=5).collect()
    assert len(hits) <= 5
