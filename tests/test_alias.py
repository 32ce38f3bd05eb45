"""Index aliases + zero-downtime reindex cutover: atomic repoint,
rollback history, live-reader safety, and reindex_swap composing
reindex + flip with the old directory retained (or removed on
keep_old=False)."""

from __future__ import annotations

import os

import pytest

from fts_engine_spark.alias import (
    AliasError,
    read_alias,
    reindex_swap,
    resolve_alias,
    set_alias,
)
from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.query import FtsIndex

CFG = BuildConfig(
    preset="simple", shard_size=64, id_buckets=4, n_waves=1, store_text=True
)
Q = "alpha gamma"


def _docs(spark, n):
    rows = [
        (f"doc://{i}", f"alpha beta w{i % 7} gamma " + "pad " * (i % 9), "en")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def ix_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("alias_ix"))
    build_index(spark, _docs(spark, 100), d, CFG, resume=False)
    return d


def test_alias_set_resolve_repoint(spark, ix_dir, tmp_path):
    alias = str(tmp_path / "webidx")
    rec = set_alias(alias, ix_dir)
    assert rec["alias_version"] == 1
    assert resolve_alias(alias) == os.path.abspath(ix_dir)
    # repoint bumps the version and remembers the old target
    other = str(tmp_path / "ix2")
    build_index(spark, _docs(spark, 40), other, CFG, resume=False)
    rec2 = set_alias(alias, other)
    assert rec2["alias_version"] == 2
    assert rec2["history"] == [os.path.abspath(ix_dir)]
    assert resolve_alias(alias) == os.path.abspath(other)


def test_alias_rejects_non_index(tmp_path):
    with pytest.raises(AliasError, match="meta.json"):
        set_alias(str(tmp_path / "a"), str(tmp_path))
    with pytest.raises(AliasError, match="does not exist"):
        resolve_alias(str(tmp_path / "missing"))


def test_reindex_swap_zero_downtime(spark, ix_dir, tmp_path):
    alias = str(tmp_path / "webidx")
    set_alias(alias, ix_dir)
    old = FtsIndex(spark, resolve_alias(alias))
    before = sorted(
        (r["url"], round(float(r["score"]), 9))
        for r in old.search_bm25(Q, k=0, hydrate=True).collect()
    )
    rec = reindex_swap(
        spark, alias,
        BuildConfig(preset="simple", shard_size=32, id_buckets=8, n_waves=1),
    )
    assert rec["alias_version"] == 2
    new_dir = resolve_alias(alias)
    assert new_dir != os.path.abspath(ix_dir)
    assert FtsIndex(spark, new_dir).shard_size == 32
    # the live reader's directory is intact and still serves identically
    after_old_handle = sorted(
        (r["url"], round(float(r["score"]), 9))
        for r in old.search_bm25(Q, k=0, hydrate=True).collect()
    )
    assert after_old_handle == before
    # and the new target serves the same logical results
    new = FtsIndex(spark, new_dir)
    after_new = sorted(
        (r["url"], round(float(r["score"]), 9))
        for r in new.search_bm25(Q, k=0, hydrate=True).collect()
    )
    assert after_new == before
    assert rec["history"] == [os.path.abspath(ix_dir)]


def test_reindex_swap_keep_old_false_removes_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    build_index(spark, _docs(spark, 60), src, CFG, resume=False)
    alias = str(tmp_path / "webidx")
    set_alias(alias, src)
    rec = reindex_swap(
        spark, alias,
        BuildConfig(
            preset="simple", shard_size=32, id_buckets=8, n_waves=1,
            store_text=True,
        ),
        keep_old=False,
    )
    assert not os.path.exists(src)
    assert os.path.abspath(src) not in rec["history"]
    assert read_alias(alias)["index_dir"] == resolve_alias(alias)


def test_reindex_swap_refuses_text_destroying_removal(spark, tmp_path):
    """ADVICE r5 (medium): keep_old=False with store_text=False would
    rmtree the ONLY copy of the corpus text (the old index's stored
    sidecar is the reindex source) — must refuse before any build."""
    src = str(tmp_path / "src")
    build_index(spark, _docs(spark, 60), src, CFG, resume=False)
    alias = str(tmp_path / "webidx")
    set_alias(alias, src)
    with pytest.raises(AliasError, match="store_text"):
        reindex_swap(
            spark, alias,
            BuildConfig(
                preset="simple", shard_size=32, id_buckets=8, n_waves=1
            ),
            keep_old=False,
        )
    # nothing was flipped or deleted
    assert os.path.exists(src)
    assert resolve_alias(alias) == os.path.abspath(src)


def test_engine_from_alias(spark, ix_dir, tmp_path):
    from fts_engine_spark.engine import FtsEngine

    alias = str(tmp_path / "webidx")
    set_alias(alias, ix_dir)
    eng = FtsEngine.from_alias(spark, alias)
    assert eng.index_dir == os.path.abspath(ix_dir)
    assert eng.search(Q, k=5).count() == 5
