"""reindex (ES _reindex analog): rebuild under a new BuildConfig from
the stored-fields sidecar alone. Claims under test: (1) reindexed
results == a fresh build of the same corpus under the new config, with
no source table access; (2) pending tombstones are excluded (logical
deletes become physical); (3) meta_cols ride from the source docs
table; (4) absence of the sidecar fails loudly."""

from __future__ import annotations

import pytest

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.mutate import delete_documents, reindex
from fts_engine_spark.query import FtsIndex
from fts_engine_spark.stored import StoredFieldsUnavailableError

SRC_CFG = BuildConfig(
    preset="simple", shard_size=64, id_buckets=4, n_waves=1,
    store_text=True, meta_cols=("kind",),
)
NEW_CFG = BuildConfig(preset="simple", shard_size=32, id_buckets=8, n_waves=1)
Q = "alpha gamma w3"


def _docs(spark, n, skip=()):
    rows = [
        (
            f"doc://{i}",
            f"alpha beta w{i % 7} gamma " + ("pad " * (i % 9)),
            "en",
            f"k{i % 3}",
        )
        for i in range(n)
        if i not in skip
    ]
    return spark.createDataFrame(
        rows, "url string, text string, lang string, kind string"
    )


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reix_src"))
    build_index(spark, _docs(spark, 120), d, SRC_CFG, resume=False)
    return d


def _results(spark, d, k=0):
    return sorted(
        (r["url"], round(float(r["score"]), 9))
        for r in FtsIndex(spark, d).search_bm25(Q, k=k, hydrate=True).collect()
    )


def test_reindex_equals_fresh_build(spark, src_dir, tmp_path):
    dst = str(tmp_path / "re")
    fresh = str(tmp_path / "fresh")
    reindex(spark, src_dir, dst, NEW_CFG)
    build_index(spark, _docs(spark, 120), fresh, NEW_CFG, resume=False)
    got = _results(spark, dst)
    assert got == _results(spark, fresh)
    assert len(got) > 0
    # the new physical layout actually took effect
    assert FtsIndex(spark, dst).shard_size == 32


def test_reindex_purges_tombstones(spark, src_dir, tmp_path):
    victim_src = str(tmp_path / "vsrc")
    build_index(spark, _docs(spark, 120), victim_src, SRC_CFG, resume=False)
    dead = ["doc://3", "doc://10"]
    delete_documents(spark, victim_src, dead)
    dst = str(tmp_path / "re")
    reindex(spark, victim_src, dst, NEW_CFG)
    fresh = str(tmp_path / "fresh")
    build_index(
        spark, _docs(spark, 120, skip=(3, 10)), fresh, NEW_CFG, resume=False
    )
    assert _results(spark, dst) == _results(spark, fresh)
    assert FtsIndex(spark, dst).n_docs == 118  # stats exclude the dead


def test_reindex_carries_meta_cols(spark, src_dir, tmp_path):
    dst = str(tmp_path / "re")
    cfg = BuildConfig(
        preset="simple", shard_size=32, id_buckets=8, n_waves=1,
        meta_cols=("kind",),
    )
    reindex(spark, src_dir, dst, cfg)
    docs = FtsIndex(spark, dst).docs()
    assert "kind" in docs.columns
    kinds = {r["kind"] for r in docs.select("kind").distinct().collect()}
    assert kinds == {"k0", "k1", "k2"}
    with pytest.raises(ValueError, match="not source docs-table column"):
        reindex(
            spark, src_dir, str(tmp_path / "re2"),
            BuildConfig(
                preset="simple", shard_size=32, id_buckets=8, n_waves=1,
                meta_cols=("nope",),
            ),
        )


def test_reindex_requires_stored_sidecar(spark, tmp_path):
    bare = str(tmp_path / "bare")
    build_index(
        spark, _docs(spark, 40), bare,
        BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1),
        resume=False,
    )
    with pytest.raises(StoredFieldsUnavailableError):
        reindex(spark, bare, str(tmp_path / "re"), NEW_CFG)
    with pytest.raises(ValueError, match="source index dir"):
        reindex(spark, bare, bare, NEW_CFG)
