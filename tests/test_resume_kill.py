"""Kill-and-resume: interrupt the build right after the FIRST postings wave
commits (of 3), resume, and prove the final index is byte-identical to an
uninterrupted build — the crash-safety claim of the manifest
(checkpoint.py / reference persist/atomic.go:34-98) proven mid-build, not
just for a completed manifest."""

from __future__ import annotations

import json
import os

import pytest

from fts_engine_spark import checkpoint
from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.query import FtsIndex


class Killed(RuntimeError):
    pass


def _postings_rows(spark, index_dir):
    df = spark.read.parquet(os.path.join(index_dir, "postings"))
    rows = []
    for r in df.collect():
        rows.append(
            (
                r["term"], int(r["shard_id"]), r["count"], r["tf_sum"],
                bytes(r["doc_blob"]), bytes(r["tf_blob"]), bytes(r["dl_blob"]),
                tuple(r["skip_last_doc"]), tuple(r["skip_max_tf"]),
            )
        )
    return sorted(rows)


def test_kill_after_first_wave_then_resume(spark, small_corpus, tmp_path, monkeypatch):
    docs = spark.read.parquet(small_corpus)
    cfg = BuildConfig(preset="by_lang", shard_size=32, id_buckets=8, n_waves=3)
    dir_killed = str(tmp_path / "killed")
    dir_fresh = str(tmp_path / "fresh")

    orig = checkpoint.Manifest.mark_done
    seen = {"waves": 0}

    def mark_then_die(self, step, metrics=None):
        orig(self, step, metrics)
        if step.startswith("postings_wave_"):
            seen["waves"] += 1
            if seen["waves"] == 1:
                raise Killed(step)

    monkeypatch.setattr(checkpoint.Manifest, "mark_done", mark_then_die)
    with pytest.raises(Killed):
        build_index(spark, docs, dir_killed, cfg, resume=True)
    monkeypatch.setattr(checkpoint.Manifest, "mark_done", orig)

    # the manifest recorded exactly wave 1 (plus docs) — mid-build state
    manifest = json.load(open(os.path.join(dir_killed, "_manifest.json")))
    waves_done = [s for s in manifest if s.startswith("postings_wave_")]
    assert len(waves_done) == 1
    assert "terms" not in manifest and "meta" not in manifest

    meta_resumed = build_index(spark, docs, dir_killed, cfg, resume=True)
    meta_fresh = build_index(spark, docs, dir_fresh, cfg, resume=False)

    assert meta_resumed["n_docs"] == meta_fresh["n_docs"]
    assert meta_resumed["avgdl"] == pytest.approx(meta_fresh["avgdl"])
    assert _postings_rows(spark, dir_killed) == _postings_rows(spark, dir_fresh)

    # terms dictionaries identical
    t1 = sorted(map(tuple, spark.read.parquet(dir_killed + "/terms").collect()))
    t2 = sorted(map(tuple, spark.read.parquet(dir_fresh + "/terms").collect()))
    assert t1 == t2

    # and a search over the resumed index matches the fresh one
    q1 = FtsIndex(spark, dir_killed).search_bm25("turtle hotel", k=10).collect()
    q2 = FtsIndex(spark, dir_fresh).search_bm25("turtle hotel", k=10).collect()
    assert [tuple(r) for r in q1] == [tuple(r) for r in q2]
