"""Federated (multi-snapshot) search == a single index over the union
corpus, bit-exactly.

The invariant under test: partition a corpus into N independent index
snapshots, search them through FederatedFtsIndex with globally-aggregated
stats, and every result — url set, scores to the last float bit — equals
the single index built over the whole corpus. Per-doc predicates
(conjunctive / min_match / exclude / within) must federate unchanged.

The split is BY LANGUAGE, deliberately: it maximizes term-distribution
skew across snapshots (a ru-only term has df=0 in the en snapshot), which
is exactly what breaks naive local-stats federation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.federated import FederatedFtsIndex
from fts_engine_spark.query import FtsIndex
from tools.gen_corpus import REFERENCE_QUERIES

CFG = dict(preset="by_lang", shard_size=32, id_buckets=8, n_waves=1)


@pytest.fixture(scope="module")
def fed(spark, small_corpus, small_index, tmp_path_factory):
    """(FederatedFtsIndex over a 2-way lang split, single FtsIndex)."""
    docs = spark.read.parquet(small_corpus)
    root = tmp_path_factory.mktemp("fed")
    dirs = []
    for name, pred in [
        ("en", F.col("lang") == "en"),
        ("rest", F.col("lang") != "en"),
    ]:
        d = str(root / f"idx_{name}")
        build_index(spark, docs.where(pred), d, BuildConfig(**CFG))
        dirs.append(d)
    single = FtsIndex(spark, small_index[0])
    return FederatedFtsIndex(spark, dirs), single


def _fed_rows(fed_idx, **kw):
    return [
        (r["url"], float(r["score"]))
        for r in fed_idx.search_bm25(**kw).collect()
    ]


def _single_rows(single, **kw):
    # re-sort the single-index page by the federated serving order
    # (score desc, url asc) — same set, cross-snapshot tiebreak is url
    rows = [
        (r["url"], float(r["score"]))
        for r in single.search_bm25(hydrate=True, **kw).collect()
    ]
    return sorted(rows, key=lambda t: (-t[1], t[0]))


def _assert_topk_equiv(got, single, k, **kw):
    """Top-k equivalence with the one documented ambiguity: at an EXACT
    score tie straddling the k boundary, the single index picks tie
    members by dense doc_id, the federation by url — any tie member is a
    correct rank-k. So: score lists bit-equal, url sets above the boundary
    score bit-equal, and boundary urls drawn from the corpus-wide tie set."""
    want = _single_rows(single, k=k, **kw)
    assert [s for _, s in got] == [s for _, s in want]
    if not got:
        return
    bound = got[-1][1]
    assert {u for u, s in got if s != bound} == {
        u for u, s in want if s != bound
    }
    tie_set = {
        u for u, s in _single_rows(single, k=0, **kw) if s == bound
    }
    assert {u for u, s in got if s == bound} <= tie_set


def test_reference_set_bit_identical(fed):
    fed_idx, single = fed
    for qd in REFERENCE_QUERIES:
        got = _fed_rows(fed_idx, query=qd["query"], k=qd["k"])
        _assert_topk_equiv(got, single, qd["k"], query=qd["query"])


def test_k0_full_match_set_bit_identical(fed):
    fed_idx, single = fed
    got = dict(_fed_rows(fed_idx, query="hotel turtle", k=0))
    want = dict(_single_rows(single, query="hotel turtle", k=0))
    assert got == want and len(got) > 10


def test_global_stats_are_exact(fed):
    fed_idx, single = fed
    assert fed_idx.n_docs == single.n_docs
    assert fed_idx.avgdl == single.avgdl  # integer-total reconstruction


def test_per_doc_predicates_federate(fed):
    fed_idx, single = fed
    cases = [
        dict(query="french hotel", k=10, conjunctive=True),
        dict(query="hotel turtle data", k=10, min_match=2),
        dict(query="hotel", k=10, exclude="french"),
    ]
    for kw in cases:
        k = kw.pop("k")
        _assert_topk_equiv(_fed_rows(fed_idx, k=k, **kw), single, k, **kw)


def test_within_restriction_federates(fed, spark, small_corpus):
    fed_idx, single = fed
    urls = [
        r["url"]
        for r in spark.read.parquet(small_corpus)
        .orderBy("url")
        .limit(40)
        .collect()
    ]
    got = _fed_rows(fed_idx, query="hotel", k=10, within=urls)
    _assert_topk_equiv(got, single, 10, query="hotel", within=urls)
    assert all(u in set(urls) for u, _ in got)


def test_absent_term_and_empty_query(fed):
    fed_idx, _ = fed
    assert _fed_rows(fed_idx, query="zzzzqqqq", k=10) == []
    assert _fed_rows(fed_idx, query="", k=10) == []
    # conjunctive with one absent term: empty, even though 'hotel' matches
    assert _fed_rows(fed_idx, query="hotel zzzzqqqq", k=10, conjunctive=True) == []


def test_three_way_split_matches_two_way(spark, small_corpus, fed, tmp_path_factory):
    """Snapshot granularity must not matter: 3-way hash split == 2-way
    lang split == single index."""
    docs = spark.read.parquet(small_corpus)
    root = tmp_path_factory.mktemp("fed3")
    dirs = []
    for i in range(3):
        d = str(root / f"idx_{i}")
        part = docs.where(
            (F.abs(F.hash(F.col("url"))) % 3) == i
        )
        build_index(spark, part, d, BuildConfig(**CFG))
        dirs.append(d)
    fed3 = FederatedFtsIndex(spark, dirs)
    _, single = fed
    for qd in REFERENCE_QUERIES[:4]:
        got = _fed_rows(fed3, query=qd["query"], k=qd["k"])
        _assert_topk_equiv(got, single, qd["k"], query=qd["query"])


def test_preset_mismatch_raises(spark, small_corpus, fed, tmp_path_factory):
    docs = spark.read.parquet(small_corpus)
    d = str(tmp_path_factory.mktemp("fedmix") / "idx_simple")
    build_index(
        spark, docs.limit(20), d,
        BuildConfig(preset="simple", shard_size=32, id_buckets=4, n_waves=1),
    )
    fed_idx, _ = fed
    with pytest.raises(ValueError, match="preset"):
        FederatedFtsIndex(spark, [fed_idx.subs[0].index_dir, d])


# ---- point-serving tier ---------------------------------------------------


def _fed_point(fed_idx, **kw):
    return [(u, s) for u, _m, s in fed_idx.search_bm25_point(**kw)]


def _fed_dist(fed_idx, **kw):
    return [
        (r["url"], r["url_md5"], float(r["score"]))
        for r in fed_idx.search_bm25(**kw).collect()
    ]


def test_point_tier_matches_distributed_federation(fed):
    """Warm federated point rows == distributed federated rows, url_md5
    included, across the reference set and every per-doc predicate."""
    fed_idx, _single = fed
    fed_idx.enable_point_serving()
    try:
        cases = [dict(query=qd["query"], k=qd["k"]) for qd in REFERENCE_QUERIES]
        cases += [
            dict(query="french hotel", k=10, conjunctive=True),
            dict(query="hotel turtle data", k=10, min_match=2),
            dict(query="hotel", k=10, exclude="french"),
            dict(query="hotel turtle", k=0),  # return-all path
            dict(query="zzzzqqqq", k=10),     # absent term
        ]
        for kw in cases:
            assert fed_idx.search_bm25_point(**kw) == _fed_dist(fed_idx, **kw), kw
    finally:
        for s in fed_idx.subs:
            s._point_cache = None


def test_point_tier_warm_zero_jobs(spark, fed):
    """A repeat federated query schedules NO Spark job in any snapshot."""
    fed_idx, _ = fed
    fed_idx.enable_point_serving()
    try:
        fed_idx.search_bm25_point("french hotel", k=10)  # fetch + hydrate once
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        out = fed_idx.search_bm25_point("french hotel", k=10)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert out and after == before, (
            "warm federated point query must not schedule a Spark job"
        )
    finally:
        for s in fed_idx.subs:
            s._point_cache = None


def test_point_tier_fallback_when_disabled(fed):
    """Tier off on any sub -> distributed fallback, same rows."""
    fed_idx, _ = fed
    assert all(s._point_cache is None for s in fed_idx.subs)
    got = fed_idx.search_bm25_point("hotel turtle", k=10)
    assert got == _fed_dist(fed_idx, query="hotel turtle", k=10)
