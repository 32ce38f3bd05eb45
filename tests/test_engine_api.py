"""Engine-facade tests: options, analyze/stats, contains_normalized,
highlight, key-file scan (SURVEY.md §2.8 extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.engine import FtsEngine, EngineOptions, highlight, load_key_file


@pytest.fixture(scope="module")
def engine(spark, small_index):
    index_dir, _ = small_index
    return FtsEngine(spark, index_dir, EngineOptions(preset="by_lang"))


def test_stats(engine):
    st = engine.stats()
    assert st["n_docs"] == 120
    assert st["n_terms"] > 50
    assert st["n_postings"] >= st["n_terms"]
    assert st["total_tokens"] >= st["n_postings"]
    assert st["n_shards"] == 4  # 120 docs / shard_size 32


def test_analyze_per_shard(engine):
    rows = engine.analyze().collect()
    assert len(rows) == 4
    assert all(r["n_terms"] > 0 and r["blob_bytes"] > 0 for r in rows)


def test_search_facade(engine):
    bm = engine.search("turtle", k=5)
    assert bm.count() == 5
    ref = engine.search("turtle", k=5, scorer="reference")
    assert ref.columns == ["doc_id", "unique_matches", "total_matches"]


def test_contains_normalized(engine):
    # all-keys-AND semantics (filter_normalize.go:31-52)
    assert engine.contains_normalized("turtle")
    assert engine.contains_normalized("The turtle!")
    assert not engine.contains_normalized("turtle zzzmissingzzz")
    assert not engine.contains_normalized("")
    assert not engine.contains_normalized("the was")  # empty keys -> False


def test_missing_index_raises(spark, tmp_path):
    eng = FtsEngine(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        _ = eng.index


def test_highlight(spark):
    df = spark.createDataFrame([("The Turtle was here",)], "text string")
    out = df.select(
        highlight("text", ["turtle"], "<b>", "</b>").alias("h")
    ).first()["h"]
    assert out == "The <b>Turtle</b> was here"


def test_load_key_file(spark, tmp_path):
    p = tmp_path / "keys.txt"
    p.write_text("alpha\n  beta  \n\n\ngamma\n")
    rows = [r["key"] for r in load_key_file(spark, str(p)).collect()]
    assert sorted(rows) == ["alpha", "beta", "gamma"]
