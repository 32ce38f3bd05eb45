"""Field collapsing (``search_bm25_collapsed``): the single best document
per docs-column group, then top-k groups by best score — Elasticsearch
``collapse`` semantics. Ground truth: brute-force argmax over the full
match set (``search_bm25(k=0)`` joined to the docs table).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.query import FtsIndex

QUERY = "turtle hotel data"


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _ = small_index
    return FtsIndex(spark, index_dir)


def _ground_truth(fts, query, collapse, k):
    allm = [
        (int(r["doc_id"]), float(r["score"]))
        for r in fts.search_bm25(query, k=0).collect()
    ]
    langs = {
        int(r["doc_id"]): r[collapse]
        for r in fts.docs().select("doc_id", collapse).collect()
    }
    best: dict[str, tuple[int, float]] = {}
    for doc, sc in allm:
        g = langs[doc]
        cur = best.get(g)
        if cur is None or (sc, -doc) > (cur[1], -cur[0]):
            best[g] = (doc, sc)
    rows = sorted(
        ((g, d, s) for g, (d, s) in best.items()),
        key=lambda x: (-x[2], x[1]),
    )
    return [(g, d, round(s, 9)) for g, d, s in rows[:k]]


def test_collapse_matches_bruteforce(fts):
    got = [
        (r["lang"], int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25_collapsed(QUERY, collapse="lang", k=10).collect()
    ]
    assert got == _ground_truth(fts, QUERY, "lang", 10)
    # one row per group, groups distinct
    assert len({g for g, _, _ in got}) == len(got)


def test_collapse_k_truncates_groups(fts):
    full = fts.search_bm25_collapsed(QUERY, collapse="lang", k=0).collect()
    top2 = fts.search_bm25_collapsed(QUERY, collapse="lang", k=2).collect()
    assert [tuple(r) for r in top2] == [tuple(r) for r in full[:2]]


def test_collapse_empty_query(fts):
    out = fts.search_bm25_collapsed("zzzznotaword", collapse="lang", k=5)
    assert out.collect() == []
    assert out.columns == ["lang", "doc_id", "score"]


def test_collapse_respects_tombstones(fts, spark, small_index, tmp_path):
    """A collapsed result must never surface a tombstoned doc: delete the
    current best doc of the top group and re-collapse."""
    import shutil

    from fts_engine_spark.mutate import delete_documents
    from fts_engine_spark.query import FtsIndex as FI

    index_dir, _ = small_index
    clone = str(tmp_path / "idx_clone")
    shutil.copytree(index_dir, clone)
    top = fts.search_bm25_collapsed(QUERY, collapse="lang", k=1).collect()[0]
    url = (
        fts.docs()
        .where(F.col("doc_id") == int(top["doc_id"]))
        .collect()[0]["url"]
    )
    delete_documents(spark, clone, [url])
    fts2 = FI(spark, clone)
    got = {
        int(r["doc_id"])
        for r in fts2.search_bm25_collapsed(QUERY, collapse="lang", k=0).collect()
    }
    assert int(top["doc_id"]) not in got
