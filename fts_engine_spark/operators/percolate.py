"""Percolator — reverse search (Elasticsearch percolate / Lucene
MemoryIndex analog): STORED queries are matched against INCOMING
documents, the mirror image of the serving path. The production shape
this exists for: millions of standing alerts/routing rules evaluated
against every new crawl micro-batch — queries are the big side, the doc
batch is the small side, and the join must stay relational.

Semantics (ES percolator's default `match` behavior, restricted to the
engine's term queries): a stored query matches a document when at least
``min_match`` of its DISTINCT analyzed terms appear in the document's
analyzed terms — ``min_match`` omitted/0 means ALL of them
(conjunctive, the percolator default). Both sides run the SAME
normalization pipeline the index uses (tokenize/stopword/stem, preset
or per-lang routing), so a stored query matches exactly the documents
it would retrieve from an index of the batch. A query whose text
analyzes to zero terms (all stopwords) matches nothing, loudly
distinguishable from matching everything.

Plan (one shuffle): both sides tokenize map-side (Arrow UDF), explode
to DISTINCT (key, term) rows, inner-join on ``term``, and aggregate
matched-term counts per (url, query_id) with a partial-agg HAVING.
Head-term skew is bounded by the doc batch (a term contributes
|docs_with_term| x |queries_with_term| join rows; selective alert terms
keep the right side short, and AQE's skew split is the backstop). No
driver-side structure grows with the query count — 10^7 stored queries
is a 10^7-row table, not memory.

Extension beyond the reference (no reverse search in ``pkg/fts``);
phrase/boolean predicates percolate via candidate-match here + the
existing verify kernels downstream, the same two-phase shape the
forward phrase path uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.udfs import make_tokenize_by_lang_udf, make_tokenize_udf


def _exploded_terms(
    df: DataFrame, key: str, text_col: str, preset: str, by_lang: bool
) -> DataFrame:
    if by_lang and "lang" in df.columns:
        tok = make_tokenize_by_lang_udf(preset)
        toks = tok(F.col(text_col), F.col("lang"))
    else:
        tok = make_tokenize_udf(preset)
        toks = tok(F.col(text_col))
    return (
        df.select(key, F.explode(F.array_distinct(toks)).alias("term"))
    )


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: DataFrame,
    preset: str = "simple",
    by_lang: bool = False,
) -> DataFrame:
    """Match every stored query against every doc in the batch.

    ``docs``: (url, text [, lang]); ``queries``: (query_id, query
    [, min_match]) — ``min_match`` NULL/0/absent means all the query's
    distinct analyzed terms are required. Returns one row per (url,
    query_id) match: (url, query_id, matched_terms, n_query_terms),
    deterministic under sort by (url, query_id).

    KEY-UNIQUENESS precondition (ADVICE r5): ``url`` must be unique in
    the doc batch and ``query_id`` unique in the stored-query table.
    Per-doc term dedup is array_distinct per ROW, so a duplicated url
    would inflate ``matched_terms`` past ``required`` (and a duplicated
    query_id with differing min_match would emit duplicate rows). Both
    inputs are keyed tables in the intended deployment (an ingest batch
    and a query registry); callers merging unkeyed sources must
    ``dropDuplicates`` on the key first — this operator does not pay a
    dedup shuffle on every batch to paper over unkeyed input."""
    if "min_match" not in queries.columns:
        queries = queries.withColumn("min_match", F.lit(None).cast("int"))
    # shuffle width scales with the CLUSTER (defaultParallelism = total
    # task slots), not the static session shuffle partitioning: every
    # exchange here is sized by the micro-batch x matching-queries
    # volume, and superfluous fixed-width reduce tasks cost real latency
    # per batch (r6: the 128-partition join+agg stages were ~2/3 of the
    # 2k-doc bench percolation). Aggregations spill gracefully if a
    # giant query table meets a small cluster; AQE skew-split remains
    # the hot-term backstop.
    p = max(1, spark.sparkContext.defaultParallelism)
    q_terms = (
        _exploded_terms(queries, "query_id", "query", preset, by_lang=False)
        .repartition(p, "query_id", "term")
        .distinct()
    )
    req = (
        q_terms.repartition(p, "query_id")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_query_terms"))
        .join(queries.select("query_id", "min_match"), "query_id")
        .select(
            "query_id",
            "n_query_terms",
            F.when(
                F.col("min_match").isNull() | (F.col("min_match") <= 0),
                F.col("n_query_terms"),
            )
            .otherwise(F.least("min_match", "n_query_terms"))
            .alias("required"),
        )
    )
    d_terms = _exploded_terms(docs, "url", "text", preset, by_lang)
    matched = (
        d_terms.repartition(p, "term")
        .join(q_terms, "term")
        .repartition(p, "url", "query_id")
        .groupBy("url", "query_id")
        .agg(F.count("*").alias("matched_terms"))
    )
    return (
        matched.join(req, "query_id")
        .where(F.col("matched_terms") >= F.col("required"))
        .select("url", "query_id", "matched_terms", "n_query_terms")
    )
