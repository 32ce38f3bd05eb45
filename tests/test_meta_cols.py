"""Docs-table metadata passthrough (BuildConfig.meta_cols, end of r5).

Extra input columns (e.g. the input_hint's ``warc_ts``) persist into the
index docs table via one (url, meta) join AFTER the tokenize pass — they
never cross the Python/Arrow boundary — and become filterable through the
query-string ``field:value`` / ``field:[lo TO hi]`` grammar. Pins: the
column round-trips (values exact), timestamp range filters gate correctly,
validation raises on unknown/reserved columns, the upsert path stages
delta docs with the same schema (meta.json carries meta_cols), and
merge refuses mismatched meta_cols.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.query import FtsIndex


@pytest.fixture(scope="module")
def meta_index(spark, small_corpus, tmp_path_factory):
    """Index over the 120-doc input_hint corpus with warc_ts stored."""
    d = str(tmp_path_factory.mktemp("metaix") / "ix")
    docs = spark.read.parquet(small_corpus)
    cfg = BuildConfig(
        preset="by_lang", shard_size=32, id_buckets=8, n_waves=1,
        meta_cols=("warc_ts",),
    )
    build_index(spark, docs, d, cfg, resume=False)
    return d


def test_meta_col_round_trips(spark, small_corpus, meta_index):
    src = {
        r["url"]: r["warc_ts"]
        for r in spark.read.parquet(small_corpus)
        .select("url", "warc_ts")
        .collect()
    }
    fts = FtsIndex(spark, meta_index)
    got = fts.docs().select("url", "warc_ts").collect()
    assert len(got) == len(src)
    for r in got:
        assert r["warc_ts"] == src[r["url"]], r["url"]


def test_timestamp_range_filter_gates(spark, meta_index):
    """`warc_ts:[lo TO hi]` casts to timestamp and gates candidacy;
    survivors keep their unfiltered scores."""
    fts = FtsIndex(spark, meta_index)
    tss = sorted(
        r["warc_ts"] for r in fts.docs().select("warc_ts").collect()
    )
    lo, hi = tss[len(tss) // 4], tss[3 * len(tss) // 4]
    in_range = {
        int(r["doc_id"])
        for r in fts.docs()
        .where(F.col("warc_ts").between(lo, hi))
        .select("doc_id")
        .collect()
    }
    base = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in fts.search_boolean("french turtle", k=0).collect()
    }
    lo_s = lo.strftime("%Y-%m-%dT%H:%M:%S")
    hi_s = hi.strftime("%Y-%m-%dT%H:%M:%S")
    got = sorted(
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_boolean(
            f"french turtle warc_ts:[{lo_s} TO {hi_s}]", k=0
        ).collect()
    )
    assert got == sorted(
        (d, s) for d, s in base.items() if d in in_range
    )
    assert got and len(got) < len(base)  # the range must actually cut


def test_meta_cols_validation(spark, small_corpus, tmp_path):
    docs = spark.read.parquet(small_corpus)
    with pytest.raises(ValueError, match="not in the input columns"):
        build_index(
            spark, docs, str(tmp_path / "bad1"),
            BuildConfig(shard_size=32, meta_cols=("nope",)), resume=False,
        )
    with pytest.raises(ValueError, match="collide with built-in"):
        build_index(
            spark, docs, str(tmp_path / "bad2"),
            BuildConfig(shard_size=32, meta_cols=("doclen",)), resume=False,
        )


def test_upsert_carries_meta_cols(spark, small_corpus, tmp_path):
    """update_documents stages its delta through meta.json's meta_cols,
    so the spliced docs rows carry real values, not NULLs."""
    import datetime

    from fts_engine_spark.mutate import update_documents

    d = str(tmp_path / "upix")
    docs = spark.read.parquet(small_corpus)
    cfg = BuildConfig(
        preset="by_lang", shard_size=32, id_buckets=8,
        meta_cols=("warc_ts",),
    )
    build_index(spark, docs, d, cfg, resume=False)
    one = docs.limit(1).collect()[0]
    new_ts = datetime.datetime(2031, 5, 6, 7, 8, 9)
    upd = spark.createDataFrame(
        [(one["url"], new_ts, one["html"], "recrawled page text", one["lang"])],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    update_documents(spark, d, upd, cfg)
    fts = FtsIndex(spark, d)
    live = fts.docs().where(F.col("url") == one["url"]).collect()
    spliced = [r for r in live if r["warc_ts"] == new_ts]
    assert spliced, [tuple(r) for r in live]
    # and an update batch MISSING the column fails loudly
    bad = spark.createDataFrame(
        [(one["url"], "x", "en")], "url string, text string, lang string"
    )
    with pytest.raises(ValueError, match="not in the input columns"):
        update_documents(spark, d, bad, cfg)


def test_merge_requires_equal_meta_cols(spark, small_corpus, tmp_path):
    from fts_engine_spark.mutate import merge_indexes

    docs = spark.read.parquet(small_corpus)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(
        spark, docs, a,
        BuildConfig(preset="simple", shard_size=32, meta_cols=("warc_ts",)),
        resume=False,
    )
    build_index(
        spark, docs, b,
        BuildConfig(preset="simple", shard_size=32), resume=False,
    )
    with pytest.raises(ValueError, match="equal meta_cols"):
        merge_indexes(spark, a, b)
