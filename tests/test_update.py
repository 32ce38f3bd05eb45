"""Upsert (mutate.update_documents): re-crawled urls replace their indexed
versions — tombstone + delta-append composition; compaction then matches a
fresh build of the updated corpus exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.engine import EngineOptions, FtsEngine
from fts_engine_spark.mutate import update_documents
from fts_engine_spark.query import FtsIndex
from fts_engine_spark.streaming.compact import compact_index

CFG = BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1)
QUERIES = ["alpha w12", "epsilon gamma", "zeta fresh", "w10 w11 beta"]


def _text(i, version=0):
    if version and i % 5 == 0:
        return f"zeta fresh recrawl w{i % 7} content{i}"
    return (
        f"alpha beta w{i % 7} w{i % 13} gamma delta w{i % 5} "
        f"{'epsilon ' * (i % 3)}"
    )


def _docs(spark, n, version=0, only_updated=False):
    rows = [
        (f"doc://{i}", _text(i, version), "en")
        for i in range(n)
        if not only_updated or (version and i % 5 == 0)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


def _ranked(fts: FtsIndex):
    out = {}
    for q in QUERIES:
        rows = fts.search_bm25(q, k=0, hydrate=True).collect()
        out[q] = sorted(
            ((r["url"], round(float(r["score"]), 9)) for r in rows),
            key=lambda x: (-x[1], x[0]),
        )
    return out


def test_update_replaces_and_matches_fresh_build(spark, tmp_path):
    index_dir = str(tmp_path / "ix")
    build_index(spark, _docs(spark, 150), index_dir, CFG, resume=False)

    out = update_documents(
        spark, index_dir, _docs(spark, 150, version=1, only_updated=True), CFG
    )
    assert out["replaced"] == 30  # ids 0,5,...,145

    # immediately: new content searchable, old content of updated urls gone
    fts = FtsIndex(spark, index_dir)
    fresh_hits = {
        r["url"]
        for r in fts.search_bm25("zeta fresh", k=0, hydrate=True).collect()
    }
    assert fresh_hits == {f"doc://{i}" for i in range(0, 150, 5)}
    alpha_hits = {
        r["url"]
        for r in fts.search_bm25("alpha", k=0, hydrate=True).collect()
    }
    assert alpha_hits == {f"doc://{i}" for i in range(150) if i % 5}

    # never both versions of a url: docs table may hold two rows, results
    # hold one
    assert fts.search_bm25(
        "alpha zeta", k=0, hydrate=True
    ).groupBy("url").count().where(F.col("count") > 1).count() == 0

    # compaction purges the old rows; equals a fresh build of v1
    compact_index(spark, index_dir, CFG)
    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, _docs(spark, 150, version=1), fresh_dir, CFG, resume=False)
    a, b = FtsIndex(spark, index_dir), FtsIndex(spark, fresh_dir)
    assert a.n_docs == b.n_docs == 150
    assert a.avgdl == b.avgdl
    assert _ranked(a) == _ranked(b)


def test_update_inserts_unknown_urls(spark, tmp_path):
    index_dir = str(tmp_path / "ix")
    eng = FtsEngine(
        spark, index_dir,
        options=EngineOptions(preset="simple", shard_size=64, id_buckets=4),
    )
    eng.index_documents(_docs(spark, 50), resume=False)
    new = spark.createDataFrame(
        [("doc://900", "zeta fresh brand new", "en")],
        "url string, text string, lang string",
    )
    out = eng.update_documents(new)
    assert out["replaced"] == 0  # pure insert
    hits = {
        r["url"] for r in eng.search("zeta fresh", k=0, hydrate=True).collect()
    }
    assert hits == {"doc://900"}
    assert eng.stats()["n_docs"] == 51

def test_update_maintains_sidecars(spark, tmp_path):
    """An upsert is delete + append: with fresh sidecars, the appended
    NEW versions are stored/position-indexed immediately and the old
    versions are tombstone-excluded — 'zeta fresh' phrase matches find
    exactly the recrawled urls, the stale text matches exclude them, and
    stored text point-reads the NEW content."""
    from fts_engine_spark.positions import add_positions_to_index
    from fts_engine_spark.stored import add_stored_fields

    index_dir = str(tmp_path / "ix")
    docs = _docs(spark, 60)
    build_index(spark, docs, index_dir, CFG, resume=False)
    add_stored_fields(spark, index_dir, docs)
    add_positions_to_index(spark, index_dir, docs)

    update_documents(
        spark, index_dir, _docs(spark, 60, version=1, only_updated=True), CFG
    )
    fts = FtsIndex(spark, index_dir)
    recrawled = {f"doc://{i}" for i in range(60) if i % 5 == 0}
    hits = {
        r["url"]
        for r in fts.search_phrase_positional("zeta fresh", k=0).collect()
    }
    assert hits == recrawled
    old_hits = {
        r["url"]
        for r in fts.search_phrase_positional("alpha beta", k=0).collect()
    }
    assert old_hits == {f"doc://{i}" for i in range(60)} - recrawled
    new_id = fts.docs().where(
        (F.col("url") == "doc://5") & (F.col("doc_id") >= 60)
    ).collect()
    assert len(new_id) == 1  # the appended new version
    row = fts.stored_text([int(new_id[0]["doc_id"])]).collect()
    assert row[0]["text"].startswith("zeta fresh recrawl")
    # and the trailing compaction keeps everything servable
    compact_index(spark, index_dir, CFG)
    fts2 = FtsIndex(spark, index_dir)
    assert {
        r["url"]
        for r in fts2.search_phrase_positional("zeta fresh", k=0).collect()
    } == recrawled
