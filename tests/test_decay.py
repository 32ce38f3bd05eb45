"""Function-score decay (ES exp/gauss/linear decay analogs): final =
bm25 * factor(docs-table column), factor == decay exactly at dist ==
scale. Three checks: the factor math against a brute-force Python
oracle; point-tier parity vs the distributed plan; parameter
validation + the every-shape-hits-decay-at-scale contract."""

from __future__ import annotations

import math

import pytest

from fts_engine_spark.build import BuildConfig, build_index
from fts_engine_spark.query import FtsIndex

CFG = BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1)
Q = "alpha gamma w3"


def _docs(spark, n):
    # doc i has i%9 filler words -> analyzed doclen varies 4..12, giving
    # the decay field a real spread around any origin we pick
    rows = [
        (
            f"doc://{i}",
            f"alpha beta w{i % 7} gamma " + ("pad " * (i % 9)),
            "en",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def fts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("decay_ix"))
    build_index(spark, _docs(spark, 150), d, CFG, resume=False)
    return FtsIndex(spark, d)


def _factor(shape, v, origin, scale, decay, offset_dist=0.0):
    dist = max(0.0, abs(v - origin) - offset_dist)
    if shape == "exp":
        return math.exp(math.log(decay) / scale * dist)
    if shape == "gauss":
        return math.exp(math.log(decay) / (scale * scale) * dist * dist)
    return max(0.0, 1.0 - (1.0 - decay) * dist / scale)


@pytest.mark.parametrize("shape", ["exp", "gauss", "linear"])
def test_decay_matches_brute_force(spark, fts, shape):
    """decayed score == plain bm25 * python factor(doclen), per doc."""
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in fts.search_bm25(Q, k=0).collect()
    }
    dl = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in fts.search_bm25_decay(
            Q, k=0, field="doclen", origin=6.0, scale=3.0, decay=0.5,
            offset_dist=1.0, shape=shape,
        ).collect()
    }
    assert set(got) == set(base)
    for d, s in got.items():
        want = base[d] * _factor(shape, dl[d], 6.0, 3.0, 0.5, 1.0)
        assert s == pytest.approx(want, rel=1e-9), (d, shape)


@pytest.mark.parametrize("shape", ["exp", "gauss", "linear"])
def test_decay_point_parity(spark, fts, shape):
    """Point tier reproduces the distributed plan (round-9: the
    relational aggregate and the kernel sum floats in different
    orders) with zero Spark jobs once warm."""
    fts.enable_point_serving()
    kw = dict(
        field="doclen", origin=6.0, scale=3.0, decay=0.5, shape=shape
    )
    want = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25_decay(Q, k=10, **kw).collect()
    ]
    got = [
        (d, round(s, 9))
        for d, s in fts.search_bm25_decay_point(Q, k=10, **kw)
    ]
    assert got == want
    # warm: repeat serves with no Spark job
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    again = [
        (d, round(s, 9))
        for d, s in fts.search_bm25_decay_point(Q, k=10, **kw)
    ]
    assert again == got
    assert tracker.getJobIdsForGroup(None) == before


def test_decay_at_scale_equals_decay(spark, fts):
    """The ES contract: factor(dist=scale) == decay for every shape."""
    for shape in ("exp", "gauss", "linear"):
        assert _factor(shape, 10.0, 0.0, 10.0, 0.33) == pytest.approx(0.33)


def test_decay_validation(spark, fts):
    with pytest.raises(ValueError, match="shape"):
        fts.search_bm25_decay(Q, shape="step")
    with pytest.raises(ValueError, match="scale"):
        fts.search_bm25_decay(Q, scale=0.0)
    with pytest.raises(ValueError, match="decay"):
        fts.search_bm25_decay(Q, decay=1.0)
    with pytest.raises(ValueError, match="docs-table column"):
        fts.search_bm25_decay(Q, field="nope").collect()


def test_decay_field_budget_fallback(spark, fts):
    """Field array over budget -> the point path serves via the
    distributed plan (same rows), never a partial/empty result."""
    fts.enable_point_serving()
    fts._field_local_cache = {}
    fts._field_local_max_bytes = 8  # force n_docs*8 > budget
    got = fts.search_bm25_decay_point(
        Q, k=5, field="doclen", origin=6.0, scale=3.0
    )
    del fts._field_local_max_bytes
    fts._field_local_cache = {}
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in fts.search_bm25_decay(
            Q, k=5, field="doclen", origin=6.0, scale=3.0
        ).collect()
    ]
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]
