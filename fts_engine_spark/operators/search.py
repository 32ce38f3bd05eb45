"""Index-free (direct) relational search operators over a documents table.

These are the SURVEY.md §2 dataflow stages expressed as pure DataFrame plans
with built-in functions only — used by the DuckDB correctness gate and as
the relational baseline the compressed-index paths are benchmarked against.

Every aggregate/computed column is aliased to match the oracle SQL exactly
(driver contract). Plans are Catalyst-friendly: tokenization and filters run
inside whole-stage codegen; the query-terms side of the search join is a
literal array (constant-folded), so no shuffle is introduced beyond the
required groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..query import B, K1
from .sql_tokens import tokens_array

# ---------------------------------------------------------------- tokens


def doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term) — one row per surviving token occurrence (S-T ops)."""
    return docs.select("doc_id", F.explode(tokens_array()).alias("term"))


def postings_tf(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — the upsert-counter aggregation (I1/I8)."""
    return (
        doc_tokens(docs)
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def term_stats(docs: DataFrame) -> DataFrame:
    """(term, df, cf) — per-term document/collection frequency (§2.6)."""
    return (
        postings_tf(docs)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, doc_len) — post-pipeline token count per document."""
    return docs.select(
        "doc_id", F.size(tokens_array()).cast("long").alias("doc_len")
    )


# ---------------------------------------------------------------- search


def _query_term_df(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """Tiny (term, mult) side of the search join, built as literal rows."""
    mult: dict[str, int] = {}
    for t in query_terms:
        mult[t] = mult.get(t, 0) + 1
    spark = docs.sparkSession
    return spark.createDataFrame(
        list(mult.items()), "term string, mult int"
    )


def search_coordinate(
    docs: DataFrame, query_terms: list[str], k: int = 10
) -> DataFrame:
    """Reference coordinate-match search (engine.go:82-158) as one plan:
    (doc_id, unique_matches, total_matches) ordered unique desc, total desc,
    doc_id asc, LIMIT k. ``query_terms`` are already-normalized tokens with
    duplicates kept (the Q4 double-count quirk)."""
    q = _query_term_df(docs, query_terms)
    out = (
        postings_tf(docs)
        .join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("mult").cast("long").alias("unique_matches"),
            F.sum(F.col("mult") * F.col("tf")).cast("long").alias("total_matches"),
        )
        .orderBy(F.desc("unique_matches"), F.desc("total_matches"), F.asc("doc_id"))
    )
    return out.limit(k) if k > 0 else out


def search_bm25_direct(
    docs: DataFrame, query_terms: list[str], k: int = 10, round_to: int = 4
) -> DataFrame:
    """Index-free BM25 top-k: (doc_id, score). Scores rounded for stable
    cross-engine comparison; ordering uses round(score, 6) then doc_id so the
    top-k set is deterministic in both engines."""
    tf_df = postings_tf(docs)
    stats = term_stats(docs)
    dls = doc_lengths(docs)
    q = _query_term_df(docs, query_terms)

    n = docs.count()
    avgdl = float(dls.agg(F.avg("doc_len")).first()[0] or 0.0)

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("doc_len").cast("double") / F.lit(avgdl)
    )
    contrib = F.col("mult") * F.col("idf") * tf * F.lit(K1 + 1.0) / (tf + norm)

    joined = (
        tf_df.join(F.broadcast(q), "term")
        .join(
            F.broadcast(
                stats.join(q.select("term"), "term")
                .withColumn("idf", idf)
                .select("term", "idf")
            ),
            "term",
        )
        .join(dls, "doc_id")
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("_raw"))
        .select(
            "doc_id",
            F.round(F.col("_raw"), round_to).alias("score"),
            F.round(F.col("_raw"), 6).alias("_ord"),
        )
        .orderBy(F.desc("_ord"), F.asc("doc_id"))
        .drop("_ord")
    )
    return joined.limit(k) if k > 0 else joined


def top_terms(docs: DataFrame, n: int = 20) -> DataFrame:
    """(term, cf) — global head of the vocabulary, deterministic order."""
    return (
        term_stats(docs)
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(n)
    )
