"""Engine surface tests for the round-1-untested corners: Analyze/stats
(I7, reference stats.go:3-11), highlight (T15, cui.go:227-233), key-file
scan (S6, ribbon_file.go:15-46)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_engine_spark.engine import EngineOptions, FtsEngine, highlight, load_key_file


def test_analyze_and_stats_match_index_content(spark, small_index):
    index_dir, meta = small_index
    eng = FtsEngine(spark, index_dir)

    m = eng.analyze().collect()
    # one metrics row per shard, counts consistent with the postings table
    assert len(m) == meta["n_shards"]
    postings = spark.read.parquet(f"{index_dir}/postings")
    want = {
        r["shard_id"]: (r["n_terms"], r["n_postings"])
        for r in postings.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("count").alias("n_postings"),
        )
        .collect()
    }
    for row in m:
        assert (row["n_terms"], row["n_postings"]) == want[row["shard_id"]]
        assert row["blob_bytes"] > 0

    s = eng.stats()
    assert s["n_docs"] == meta["n_docs"]
    terms = spark.read.parquet(f"{index_dir}/terms")
    assert s["n_terms"] == terms.count()
    # total_tokens == sum of doclens (cf aggregates every posting's tf)
    docs = spark.read.parquet(f"{index_dir}/docs")
    assert s["total_tokens"] == docs.agg(F.sum("doclen")).first()[0]
    assert 0 < s["max_df"] <= s["n_docs"]


def test_highlight_wraps_whole_words(spark):
    df = spark.createDataFrame(
        [("The Hotel by the hotels near HOTEL",)], "text string"
    )
    out = df.select(
        highlight("text", ["hotel"], tag_open="<b>", tag_close="</b>").alias("h")
    ).first()["h"]
    # whole-word, case-insensitive: 'Hotel' and 'HOTEL' wrapped, 'hotels' not
    assert out == "The <b>Hotel</b> by the hotels near <b>HOTEL</b>"


def test_load_key_file(spark, tmp_path):
    p = tmp_path / "keys.txt"
    p.write_text("alpha\n  beta  \n\n\ngamma\n")
    rows = load_key_file(spark, str(p)).collect()
    assert sorted(r["key"] for r in rows) == ["alpha", "beta", "gamma"]


def test_build_log_structured_records(spark, small_index):
    """S14: structured JSON build log (reference slog role) — one record per
    phase/wave, machine-parseable, surviving resume attempts."""
    import json
    import os

    index_dir, meta = small_index
    path = os.path.join(index_dir, "build_log.jsonl")
    assert os.path.exists(path)
    recs = [json.loads(l) for l in open(path)]
    events = [r["event"] for r in recs]
    assert "build_start" in events
    assert "build_done" in events
    assert events.count("wave_done") >= 2  # small_index builds 2 waves
    for r in recs:
        assert {"ts", "event", "app"} <= set(r)
    done = [r for r in recs if r["event"] == "build_done"][-1]
    assert done["n_docs"] == meta["n_docs"]
