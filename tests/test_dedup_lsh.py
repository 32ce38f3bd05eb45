"""LSH-plan verification harness (the discipline the reference applies to
its probabilistic filters, /root/reference/pkg/filter/ribbon_test.go:15-203):
an approximate plan ships only with a measured accuracy number against the
exact plan on deterministic data.

All inputs here are the fixed driver tables, so recall values are
deterministic — the asserted floors are the measured values, not guesses.
"""

from __future__ import annotations

import pytest

from fts_engine_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(df):
    return set((r["a_id"], r["b_id"]) for r in df.select("a_id", "b_id").collect())


def test_jaccard_lsh_equals_allpairs_on_driver_corpus(spark, docs):
    """On the driver corpus the LSH candidate set covers every pair above
    threshold, so the contract plan (LSH→verify) must reproduce the
    all-pairs plan exactly — including the jaccard values."""
    exact = dedup.ngram_jaccard_pairs(docs, 3, 0.12).collect()
    lsh = dedup.ngram_jaccard_pairs_lsh(docs, 3, 0.12).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, lsh))


def test_jaccard_lsh_is_subset_with_exact_values(spark, docs):
    """At a higher threshold (fewer, stronger pairs) LSH output is a subset
    of all-pairs with identical jaccard values for every emitted pair."""
    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, 3, 0.5).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs_lsh(docs, 3, 0.5).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # near-dup pairs have high jaccard, where banded LSH recall is high
    recall = len(lsh) / max(1, len(exact))
    assert recall >= 0.9, f"measured recall {recall}"


def test_embedding_lsh_recall_vs_bruteforce(spark, emb):
    """Contract geometry (16 bands × 4 bits) against the brute-force plan at
    the contract threshold; subset + exact cosine values + recall floor."""
    brute = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in dedup.embedding_cosine_dups(emb, 0.42).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["cos"]
        for r in dedup.embedding_cosine_dups_lsh(
            emb, 0.42, n_bands=16, band_bits=4
        ).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == brute[k]
    recall = len(lsh) / max(1, len(brute))
    # measured 24/27 on this fixed input; the floor guards regressions
    assert recall >= 24 / 27 - 1e-9, f"measured recall {recall}"


def test_embedding_lsh_bucket_cap_is_deterministic_subset(spark, emb):
    uncapped = _pairs(dedup.embedding_cosine_dups_lsh(emb, 0.42, 8, 4))
    capped1 = _pairs(
        dedup.embedding_cosine_dups_lsh(emb, 0.42, 8, 4, max_bucket=16)
    )
    capped2 = _pairs(
        dedup.embedding_cosine_dups_lsh(emb, 0.42, 8, 4, max_bucket=16)
    )
    assert capped1 == capped2  # deterministic under re-execution
    assert capped1 <= uncapped


def test_dup_clusters_components(spark):
    """Connected components over dup pairs: a 40-node path (worst case for
    plain label propagation) must converge within the pointer-doubling
    iteration cap, singletons stay their own cluster."""
    from fts_engine_spark.operators import dedup
    from pyspark.sql import functions as F

    n = 40
    docs = spark.range(0, n + 3).select(F.col("id").alias("doc_id"))
    # path 0-1-2-...-39, plus a 2-cycle {40,41}; 42 is a singleton
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(40, 41)],
        "a_id long, b_id long",
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup.dup_clusters(docs, pairs, max_iter=10).collect()}
    assert all(out[i] == (0, i == 0) for i in range(n))
    assert out[40] == (40, True) and out[41] == (40, False)
    assert out[42] == (42, True)
