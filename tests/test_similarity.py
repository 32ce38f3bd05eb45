"""ANN-LSH verification: recall@k against the exact brute-force top-k on the
fixed driver embeddings (deterministic input → deterministic recall), plus
signature/bucket-cap properties."""

from __future__ import annotations

import pytest

from fts_engine_spark.operators import similarity

SF = "/root/testdata/sf0.001"
QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ann_lsh_recall_at_5(spark, emb):
    exact = _topk(similarity.ann_bruteforce_topk(emb, QUERY_IDS, 5))
    approx = _topk(
        similarity.ann_lsh_topk(emb, QUERY_IDS, 5, n_bands=8, band_bits=4)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # measured 0.72 on this fixed input (0.84 at sf0.01 with the same
    # geometry); the floor guards regressions
    assert recall >= 0.72 - 1e-9, f"recall@5 = {recall}"


def test_ann_lsh_more_bands_means_higher_recall(spark, emb):
    """The multi-band amplifier actually amplifies: 16 bands find at least
    as many true neighbors as 4 bands on the same input."""
    exact = _topk(similarity.ann_bruteforce_topk(emb, QUERY_IDS, 5))

    def recall(n_bands):
        approx = _topk(
            similarity.ann_lsh_topk(emb, QUERY_IDS, 5, n_bands=n_bands, band_bits=4)
        )
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    assert recall(16) >= recall(4)


def test_ann_lsh_cosines_are_exact(spark, emb):
    """The re-rank is exact: every (query, neighbor, cos) the LSH path emits
    matches the brute-force cosine for that pair."""
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.ann_bruteforce_topk(emb, QUERY_IDS, 500).collect()
    }
    for r in similarity.ann_lsh_topk(
        emb, QUERY_IDS, 5, n_bands=8, band_bits=4
    ).collect():
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cos"]


def test_band_signatures_shape(spark, emb):
    sig = similarity.srp_band_signatures(emb, n_bands=4, band_bits=4)
    rows = sig.collect()
    n = emb.count()
    assert len(rows) == n * 4
    assert all(0 <= r["sig"] < 16 for r in rows)
    assert all(0 <= r["band"] < 4 for r in rows)


def test_bucket_cap_bounds_bucket_size(spark, emb):
    sig = similarity.srp_band_signatures(emb, n_bands=2, band_bits=2)
    capped = similarity._cap_buckets(sig, 5)
    sizes = capped.groupBy("band", "sig").count().collect()
    assert all(r["count"] <= 5 for r in sizes)


def test_ann_ivf_recall_at_5(spark, emb):
    exact = _topk(similarity.ann_bruteforce_topk(emb, QUERY_IDS, 5))
    approx = _topk(
        similarity.ann_ivf_topk(
            emb, QUERY_IDS, 5, n_clusters=16, n_iters=2, nprobe=4
        )
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    print(f"ivf recall@5 = {recall}")
    assert recall >= 0.5, f"recall@5 = {recall}"


def test_ann_ivf_more_probes_higher_recall(spark, emb):
    exact = _topk(similarity.ann_bruteforce_topk(emb, QUERY_IDS, 5))

    def recall(nprobe):
        approx = _topk(
            similarity.ann_ivf_topk(
                emb, QUERY_IDS, 5, n_clusters=16, n_iters=2, nprobe=nprobe
            )
        )
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r16 = recall(16)  # probing every cluster == brute force
    assert r16 == 1.0
    assert recall(8) >= recall(2)


def test_ivf_centroids_deterministic_and_complete(spark, emb):
    c1 = {
        r["cluster"]: tuple(r["centroid"])
        for r in similarity.ivf_centroids(emb, 8, 2).collect()
    }
    c2 = {
        r["cluster"]: tuple(r["centroid"])
        for r in similarity.ivf_centroids(emb, 8, 2).collect()
    }
    assert c1 == c2  # bit-stable under re-execution (6dp quantization)
    assert set(c1) <= set(range(8))
    # every corpus vector lands in exactly one cluster
    from pyspark.sql import functions as F

    base = emb.select(F.col("vec_id").alias("id"),
                      F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    cents = similarity.ivf_centroids(emb, 8, 2)
    assigned = similarity._ivf_assign(base, cents)
    assert assigned.count() == emb.count()
    assert assigned.select("id").distinct().count() == emb.count()
