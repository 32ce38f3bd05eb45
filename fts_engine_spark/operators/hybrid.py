"""Hybrid search: BM25 lexical retrieval fused with embedding similarity
by Reciprocal Rank Fusion (RRF) — the standard lexical+vector hybrid
(Elasticsearch/OpenSearch hybrid query, Vespa/Weaviate fusion default).

RRF (Cormack et al., SIGIR 2009): ``score(d) = Σ_lists 1/(c + rank_d)``.
Rank-based fusion needs no score calibration between BM25 (unbounded) and
cosine ([-1, 1]) — exactly why it is the robust default — and it is
integer-exact: every fused score is a sum of rationals ``1/(c+r)``, so
ordering is deterministic and bit-reproducible in the SQL oracle (IEEE
division of small integers is exact-rounded identically everywhere).

Scale shape: both input lists are already top-N bounded (the BM25 side by
WAND, the ANN side by whichever ANN plan produced it — brute-force,
SRP-LSH, or IVF all emit the same (id, cos) contract), so fusion ranks at
most 2N rows — driver-scale work regardless of corpus size. The windows
are unpartitioned single-task sorts over those ≤N-row inputs by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

RRF_C = 60  # the SIGIR-2009 constant; dampens the top-rank dominance


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse a BM25 top-N ``(doc_id, score)`` list with an ANN top-N
    ``(doc_id, cos)`` list into ``(doc_id, rrf)``, ordered (rrf desc,
    doc_id asc), top-k.

    Ranks are assigned at the lists' own serving precision — BM25 at
    round-6 (the engine's global order), cosine at its already-rounded
    column value — with doc_id tiebreaks, so ranks (and therefore fused
    scores) are deterministic. A doc present in only one list
    contributes only that list's term (the standard RRF convention).
    """
    w_lex = Window.orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
    )
    w_vec = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    lex = lexical.select(
        "doc_id", F.row_number().over(w_lex).alias("_rl")
    )
    vec = vector.select(
        "doc_id", F.row_number().over(w_vec).alias("_rv")
    )
    c_ = float(c)
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (F.lit(c_) + F.col("_rl")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(c_) + F.col("_rv")), F.lit(0.0))
            ).alias("_rrf"),
        )
        .orderBy(F.desc("_rrf"), F.asc("doc_id"))
    )
    if k > 0:
        fused = fused.limit(k)
    return fused.select("doc_id", F.round(F.col("_rrf"), 6).alias("rrf"))


def hybrid_search_rrf(
    fts,
    emb: DataFrame,
    query: str,
    query_vec_id: int,
    k: int = 10,
    n_candidates: int = 20,
    c: int = RRF_C,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end hybrid query over an ``FtsIndex`` plus an embedding
    table whose ``id_col`` carries the SAME source doc ids the index's
    urls encode (``doc://<id>`` — the contract corpus convention): BM25
    top-N (WAND, hydrated and mapped back to source ids through the docs
    table) ∪ cosine top-N for the ``query_vec_id`` row of ``emb``,
    RRF-fused to the top-k ``(doc_id, rrf)``.

    The ANN side here is the brute-force plan; at scale swap in the
    SRP-LSH or IVF top-k — fusion only consumes the (id, cos) contract.
    """
    from .similarity import ann_bruteforce_topk

    lexical = fts.search_bm25(
        query, k=n_candidates, mode="wand", hydrate=True
    ).select(
        F.substring(F.col("url"), 7, 30).cast("long").alias("doc_id"),
        "score",
    )
    ann = ann_bruteforce_topk(
        emb, [query_vec_id], k=n_candidates, id_col=id_col, vec_col=vec_col
    ).select(F.col("neighbor_id").alias("doc_id"), "cos")
    return rrf_fuse(lexical, ann, k=k, c=c)
