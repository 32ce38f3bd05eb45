"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline; sign-random-projection
LSH bucketing as the scale path (bucket join instead of cross join). All
arithmetic is in built-in higher-order functions (JVM); hyperplane weights
are derived from md5 bits so they are deterministic and reproducible in the
DuckDB oracle without shipping any state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as double), (acc, e) -> acc + e)"
_NORM = "sqrt(aggregate(transform({a}, x -> x * x), cast(0 as double), (acc, e) -> acc + e))"


def _as_double(vec_col: str) -> Column:
    return F.expr(f"transform({vec_col}, x -> cast(x as double))")


def ann_bruteforce_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos) exact cosine top-k per query vector.

    Plan: tiny query side (|query_ids| rows) broadcast against the corpus —
    a map-side nested loop; per-query top-k via window row_number. Scale:
    O(|Q|·N) compute streams through executors; no shuffle besides the
    final per-query top-k (keyed by query_id, |Q| keys).
    """
    from pyspark.sql.window import Window

    base = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    q = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.expr(_DOT.format(a="qv", b="v"))
    nq = F.expr(_NORM.format(a="qv"))
    nv = F.expr(_NORM.format(a="v"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(dot / (nq * nv), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cos"), F.asc("neighbor_id"))
    )


def srp_signature(
    emb: DataFrame,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id, sig) sign-random-projection signature.

    Hyperplane weight w(j, d) = +1 if the low bit of md5(j || '_' || d) is
    set else −1 — deterministic, stateless, oracle-reproducible. sig bit j =
    [dot(v, w_j) >= 0].
    """
    v = _as_double(vec_col)
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    # per (vector, bit): dot with ±1 hyperplane
    pb = base.select(
        "id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
    )
    w_expr = (
        "aggregate(zip_with(v, sequence(0, {dmax}), (x, d) -> "
        "case when (conv(substring(md5(concat(cast(bit as string), '_', cast(d as string))), 1, 2), 16, 10) % 2) = 1 "
        "then x else -x end), cast(0 as double), (acc, e) -> acc + e)"
    ).format(dmax=dim - 1)
    dots = pb.withColumn("d", F.expr(w_expr))
    return (
        dots.groupBy("id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN d >= 0 THEN shiftleft(cast(1 as bigint), bit) "
                    "ELSE cast(0 as bigint) END"
                )
            ).cast("long").alias("sig")
        )
    )


def ann_lsh_bucketed(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, cos) approximate top-k within LSH buckets.

    Scale path: signatures bucket the corpus; candidate generation is a
    bucket equi-join (shuffle on sig, 2^n_bits keys) instead of a cross
    join. Recall is tunable via n_bits; verify-with-exact-cosine inside the
    bucket keeps precision exact.
    """
    from pyspark.sql.window import Window

    sig = srp_signature(emb, n_bits, id_col, vec_col, dim)
    base = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v")).join(
        sig, "id"
    )
    a = base.select(F.col("id").alias("query_id"), F.col("v").alias("qv"), "sig")
    b = base.select(F.col("id").alias("neighbor_id"), F.col("v").alias("v"), "sig")
    dot = F.expr(_DOT.format(a="qv", b="v"))
    nq = F.expr(_NORM.format(a="qv"))
    nv = F.expr(_NORM.format(a="v"))
    scored = (
        a.join(b, "sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(dot / (nq * nv), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cos"), F.asc("neighbor_id"))
    )
