"""Restriction-filtered search (`within=`): the site:/sub-corpus filter.
Scoring is unchanged (full-corpus stats — the filter gates candidacy, it
never reshapes scores); wand rides a sorted include broadcast with
whole-shard/segment skips, relational a semi-join; both agree exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.mutate import delete_documents
from fts_engine_spark.query import FtsIndex

CFG = BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1)
QUERIES = ["alpha w12", "epsilon gamma", "w12 delta", "w10 w11 beta"]
WITHIN = [f"doc://{i}" for i in range(0, 200, 3)]


def _docs(spark, n):
    rows = [
        (
            f"doc://{i}",
            f"alpha beta w{i % 7} w{i % 13} gamma delta w{i % 5} "
            f"{'epsilon ' * (i % 3)}",
            "en",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("within_ix"))
    build_index(spark, _docs(spark, 200), d, CFG, resume=False)
    return d


def _rows(df):
    return [
        (r["url"], round(float(r["score"]), 9))
        for r in df.collect()
    ]


def test_within_gates_candidacy_without_reshaping_scores(spark, index_dir):
    fts = FtsIndex(spark, index_dir)
    allowed = set(WITHIN)
    for q in QUERIES:
        full = _rows(fts.search_bm25(q, k=0, hydrate=True))
        want = [x for x in full if x[0] in allowed]
        got_w = _rows(fts.search_bm25(q, k=0, hydrate=True, within=WITHIN))
        got_r = _rows(
            fts.search_bm25(
                q, k=0, hydrate=True, within=WITHIN, mode="relational"
            )
        )
        assert sorted(got_w) == sorted(want)  # same docs, SAME scores
        assert sorted(got_r) == sorted(want)
        # k=10 is exactly the top-10 of the filtered full ranking
        top = _rows(fts.search_bm25(q, k=10, hydrate=True, within=WITHIN))
        assert top == want[:10]


def test_within_accepts_dataframe_and_composes(spark, index_dir):
    fts = FtsIndex(spark, index_dir)
    within_df = spark.createDataFrame([(u,) for u in WITHIN], "url string")
    a = _rows(fts.search_bm25("alpha w12", k=0, hydrate=True, within=WITHIN))
    b = _rows(
        fts.search_bm25("alpha w12", k=0, hydrate=True, within=within_df)
    )
    assert sorted(a) == sorted(b)

    # composes with NOT and AND
    both = fts.search_bm25(
        "alpha gamma", k=0, hydrate=True, conjunctive=True,
        exclude="epsilon", within=WITHIN,
    ).collect()
    allowed = set(WITHIN)
    assert both
    for r in both:
        assert r["url"] in allowed

    # point tier serves `within` via the distributed fallback, identically
    fts2 = FtsIndex(spark, index_dir)
    fts2.warm().enable_point_serving()
    try:
        pt = fts2.search_bm25_point("alpha w12", k=10, within=WITHIN)
        dist = [
            (int(r["doc_id"]), float(r["score"]))
            for r in fts2.search_bm25("alpha w12", k=10, within=WITHIN).collect()
        ]
        assert pt == dist
    finally:
        fts2.close()


def test_within_edge_cases(spark, index_dir):
    fts = FtsIndex(spark, index_dir)
    # unknown urls only -> empty
    assert fts.search_bm25("alpha", k=0, within=["doc://nope"]).count() == 0
    # empty list -> empty
    assert fts.search_bm25("alpha", k=0, within=[]).count() == 0
    # oversized include set falls back to the relational semi-join plan
    fts.include_broadcast_max = 10
    got = _rows(
        fts.search_bm25("alpha w12", k=0, hydrate=True, within=WITHIN)
    )
    fts.include_broadcast_max = 100_000_000
    want = _rows(
        fts.search_bm25("alpha w12", k=0, hydrate=True, within=WITHIN)
    )
    assert sorted(got) == sorted(want)


def test_within_composes_with_tombstones(spark, index_dir, tmp_path):
    import shutil

    work = str(tmp_path / "ix")
    shutil.copytree(index_dir, work)
    delete_documents(spark, work, ["doc://3", "doc://6"])  # both in WITHIN
    fts = FtsIndex(spark, work)
    got = {
        r["url"]
        for r in fts.search_bm25(
            "alpha", k=0, hydrate=True, within=WITHIN
        ).collect()
    }
    assert got == set(WITHIN) - {"doc://3", "doc://6"}


def test_within_survives_tombstone_fallback(spark, index_dir, tmp_path):
    """When pending deletes exceed dead_broadcast_max, wand mode falls
    back to the relational plan — the within restriction must ride along
    (regression: the fallback used to drop incl_ids silently)."""
    import shutil

    work = str(tmp_path / "ix_fb")
    shutil.copytree(index_dir, work)
    delete_documents(spark, work, ["doc://3", "doc://6"])
    fts = FtsIndex(spark, work)
    fts.dead_broadcast_max = 1  # force the relational fallback
    with pytest.warns(UserWarning, match="pending deletes exceed"):
        got = {
            r["url"]
            for r in fts.search_bm25(
                "alpha", k=0, hydrate=True, within=WITHIN
            ).collect()
        }
    assert got == set(WITHIN) - {"doc://3", "doc://6"}


def test_within_skips_whole_shards(spark, index_dir):
    """Shards with no included doc return before any decode: the kernel
    early-out is observable through the decode counters when driven
    in-process."""
    from fts_engine_spark.query import make_wand_kernel

    fts = FtsIndex(spark, index_dir)
    rows = fts.postings_for(["alpha"]).collect()
    import pandas as pd

    shard_rows = {}
    for r in rows:
        shard_rows.setdefault(int(r["shard_id"]), []).append(r)
    assert len(shard_rows) >= 3
    # include only ids from shard 0
    incl = np.arange(0, 64, dtype=np.int64)

    class _B:
        value = incl

    counters = {}
    kernel = make_wand_kernel(
        fts.n_docs, fts.shard_size, fts.avgdl, 10,
        term_stats={"alpha": (1, fts.n_docs)}, counters=counters,
        include_bcast=_B,
    )
    for shard, rws in shard_rows.items():
        pdf = pd.DataFrame([r.asDict() for r in rws])
        out = kernel(None, pdf)
        if shard == 0:
            assert len(out)
        else:
            assert not len(out)
    # only shard 0's single block decoded
    assert counters.get("blocks_decoded", 0) <= counters["blocks_total"]
    assert counters.get("full_decodes", 0) + counters.get(
        "blocks_decoded", 0
    ) <= 2