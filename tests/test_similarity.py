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
