"""Query engine: reference coordinate-match scorer + BM25 (relational and
block-max WAND paths) over the sharded compressed index.

Reference plan (``/root/reference/pkg/fts/engine.go:82-158``):
normalize query with the SAME pipeline as documents (dup tokens kept, Q1/Q4)
→ filter-gated point lookups → accumulate per-doc (uniqueMatches,
totalMatches) → sort (unique desc, total desc, id asc) → top-k truncate with
pre-truncation total (Q5/Q6).

Spark realization:
- query normalization runs on the driver with the exact pipeline functions
  (guaranteed doc/query symmetry, ``filter_normalize.go:9-29``);
- the term-dictionary gate (reference filters F1–F5) becomes a driver-side
  lookup into the terms table + an ``isin`` predicate pushed into the
  parquet postings scan (row-group stats / bloom pruning);
- scoring is either a declarative decode→join(broadcast)→agg plan
  (relational mode; Catalyst handles partial aggregation), or a per-shard
  block-max WAND kernel in ``applyInPandas`` with a global
  TakeOrderedAndProject merge (wand mode) — document-partitioned DAAT, the
  standard distributed WAND layout.
"""

from __future__ import annotations

import heapq
import json
import math
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .codec import varbyte_decode
from .textproc.pipeline import get_pipeline

K1 = 1.2
B = 0.75

DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
    ]
)

WAND_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def bm25_idf(n_docs: int, df: int) -> float:
    """Okapi BM25 idf with +1 smoothing (always positive)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def normalize_query(query: str, preset: str) -> list[str]:
    """Driver-side query normalization — same pipeline as documents;
    duplicates KEPT (``engine.go:91``, the unique-match double-count quirk)."""
    return get_pipeline(preset).process(query)


@dataclass
class QueryTermStats:
    term: str
    multiplicity: int
    df: int
    cf: int
    idf: float


class FtsIndex:
    """Handle to a built index directory (read side of ``build_index``)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self.shard_size = int(self.meta["shard_size"])
        self.preset = self.meta["preset"]
        self._postings_path = os.path.join(index_dir, "postings")
        self._terms_path = os.path.join(index_dir, "terms")
        self._docs_path = os.path.join(index_dir, "docs")
        self._postings_df: DataFrame | None = None
        self._terms_df: DataFrame | None = None

    def warm(self) -> "FtsIndex":
        """Cache the postings/terms tables in executor memory — the
        counterpart of the reference's in-memory residency (its index IS the
        heap). Serving deployments call this once; cold queries work without
        it via parquet row-group pruning."""
        self._postings_df = self.spark.read.parquet(self._postings_path).persist()
        self._postings_df.count()
        self._terms_df = self.spark.read.parquet(self._terms_path).persist()
        self._terms_df.count()
        return self

    def _read_postings(self) -> DataFrame:
        if self._postings_df is not None:
            return self._postings_df
        return self.spark.read.parquet(self._postings_path)

    def _read_terms(self) -> DataFrame:
        if self._terms_df is not None:
            return self._terms_df
        return self.spark.read.parquet(self._terms_path)

    # ---- term dictionary gate (reference filter role, engine.go:108-116)
    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        if not terms:
            return {}
        rows = (
            self._read_terms()
            .where(F.col("term").isin(list(set(terms))))
            .collect()
        )
        return {r["term"]: (r["df"], r["cf"]) for r in rows}

    def _query_mult(self, query: str, preset: str | None = None) -> dict[str, int]:
        """Normalized query tokens with multiplicity (duplicates kept,
        engine.go:91). Driver-side, no Spark job."""
        preset = preset or ("multilingual" if self.preset == "by_lang" else self.preset)
        mult: dict[str, int] = {}
        for t in normalize_query(query, preset):
            mult[t] = mult.get(t, 0) + 1
        return mult

    def query_terms(self, query: str, preset: str | None = None) -> list[QueryTermStats]:
        """Query terms with global stats (runs one lookup job); the search
        paths do NOT use this — they join the stats in-plan so a query is a
        single Spark job. Kept for introspection/contains_normalized."""
        mult = self._query_mult(query, preset)
        stats = self.term_stats(list(mult))
        out = []
        for t, m in mult.items():
            if t not in stats:  # filter gate: absent term -> no lookup
                continue
            df, cf = stats[t]
            out.append(QueryTermStats(t, m, df, cf, bm25_idf(self.n_docs, df)))
        return out

    def _mult_df(self, mult: dict[str, int]) -> DataFrame:
        return self.spark.createDataFrame(
            list(mult.items()), "term string, mult int"
        )

    def _stats_joined_postings(self, mult: dict[str, int]) -> DataFrame:
        """Postings rows for the query terms with (mult, df) columns joined
        in-plan: the terms-table lookup rides inside the same job as the
        scan (broadcast of the filtered dictionary slice), so no separate
        driver collect per query."""
        terms = list(mult)
        stats = self._read_terms().where(F.col("term").isin(terms)).select("term", "df")
        return (
            self.postings_for(terms)
            .join(F.broadcast(self._mult_df(mult)), "term")
            .join(F.broadcast(stats), "term")
        )

    def postings_for(self, terms: list[str]) -> DataFrame:
        df = self._read_postings()
        return df.where(F.col("term").isin(terms)).withColumn(
            "shard_id", F.col("shard_id").cast("long")
        )

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(self._docs_path)

    # ---- decode to relational rows
    def decoded_postings(self, terms: list[str]) -> DataFrame:
        shard_size = self.shard_size

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    base = int(row.shard_id) * shard_size
                    deltas = varbyte_decode(bytes(row.doc_blob))
                    doc_ids = np.cumsum(deltas.astype(np.int64)) + base
                    tfs = varbyte_decode(bytes(row.tf_blob)).astype(np.int32)
                    dls = varbyte_decode(bytes(row.dl_blob)).astype(np.int32)
                    outs.append(
                        pd.DataFrame(
                            {
                                "term": row.term,
                                "doc_id": doc_ids,
                                "tf": tfs,
                                "dl": dls,
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return self.postings_for(terms).mapInPandas(decode, schema=DECODED_SCHEMA)

    # ---- searches ------------------------------------------------------
    def search_reference(
        self, query: str, k: int = 10, preset: str | None = None, hydrate: bool = False
    ) -> DataFrame:
        """Coordinate-match ranking, exact reference semantics (Q1–Q6).

        unique_matches counts query-token-OCCURRENCE hits (duplicate query
        tokens double-count, ``engine.go:96-123``); order by unique desc,
        total desc, doc_id asc; ``k <= 0`` returns all.
        """
        mult = self._query_mult(query, preset)
        if not mult:
            return self._empty_reference_result(hydrate)
        decoded = self.decoded_postings(list(mult))
        scored = (
            decoded.join(F.broadcast(self._mult_df(mult)), "term")
            .groupBy("doc_id")
            .agg(
                F.sum("mult").cast("long").alias("unique_matches"),
                F.sum(F.col("mult") * F.col("tf")).cast("long").alias("total_matches"),
            )
            .orderBy(
                F.desc("unique_matches"), F.desc("total_matches"), F.asc("doc_id")
            )
        )
        if k > 0:
            scored = scored.limit(k)
        if hydrate:
            scored = self._hydrate(
                scored, [F.desc("unique_matches"), F.desc("total_matches"), F.asc("doc_id")]
            )
        return scored

    def search_bm25(
        self,
        query: str,
        k: int = 10,
        preset: str | None = None,
        mode: str = "wand",
        hydrate: bool = False,
    ) -> DataFrame:
        """Top-k BM25 (k1=1.2, b=0.75), deterministic (score desc, doc_id
        asc). ``mode='relational'`` is the declarative plan; ``mode='wand'``
        runs per-shard block-max WAND and merges local top-k globally."""
        mult = self._query_mult(query, preset)
        if not mult:
            return self._empty_bm25_result()
        if mode == "relational":
            return self._bm25_relational(mult, k, hydrate)
        return self._bm25_wand(mult, k, hydrate)

    def _idf_col(self) -> "F.Column":
        n = float(self.n_docs)
        dfc = F.col("df").cast("double")
        return F.log(
            F.lit(1.0) + (F.lit(n) - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        )

    def _bm25_relational(self, mult: dict[str, int], k: int, hydrate: bool) -> DataFrame:
        avgdl = self.avgdl
        terms = list(mult)
        stats = self._read_terms().where(F.col("term").isin(terms)).select("term", "df")
        decoded = self.decoded_postings(terms)
        tf = F.col("tf").cast("double")
        norm = F.lit(K1) * (
            F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / F.lit(avgdl)
        )
        contrib = (
            F.col("mult") * F.col("idf") * tf * F.lit(K1 + 1.0) / (tf + norm)
        )
        scored = (
            decoded.join(F.broadcast(self._mult_df(mult)), "term")
            .join(F.broadcast(stats), "term")
            .withColumn("idf", self._idf_col())
            .withColumn("contrib", contrib)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        if k > 0:
            scored = scored.limit(k)
        return self._maybe_hydrate(scored, hydrate)

    def _bm25_wand(self, mult: dict[str, int], k: int, hydrate: bool) -> DataFrame:
        """Document-partitioned block-max WAND: each shard's posting rows for
        the query terms are processed by one kernel that decodes only the
        skip blocks whose upper-bound sum can beat the running threshold.
        Single Spark job: df stats ride in on a broadcast join, idf is
        computed in-kernel from (df, n_docs)."""
        posts = self._stats_joined_postings(mult)
        kernel = make_wand_kernel(self.n_docs, self.shard_size, self.avgdl, k)
        local_topk = posts.groupBy("shard_id").applyInPandas(
            kernel, schema=WAND_SCHEMA
        )
        out = local_topk.orderBy(F.desc("score"), F.asc("doc_id"))
        if k > 0:
            out = out.limit(k)
        return self._maybe_hydrate(out, hydrate)

    def _maybe_hydrate(self, scored: DataFrame, hydrate: bool) -> DataFrame:
        if not hydrate:
            return scored
        return self._hydrate(scored, [F.desc("score"), F.asc("doc_id")])

    def _hydrate(self, scored: DataFrame, order) -> DataFrame:
        # Q8 (cui.go:245-249): broadcast the tiny top-k back onto docs
        return (
            self.docs()
            .select("doc_id", "url", "url_md5")
            .join(F.broadcast(scored), "doc_id")
            .orderBy(*order)
        )

    def _empty_bm25_result(self) -> DataFrame:
        # spark.range(0) is a LocalRelation — no tasks scheduled on collect
        return self.spark.range(0).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast("double").alias("score"),
        )

    def _empty_reference_result(self, hydrate: bool) -> DataFrame:
        return self.spark.range(0).select(
            F.col("id").alias("doc_id"),
            F.col("id").alias("unique_matches"),
            F.col("id").alias("total_matches"),
        )


def make_wand_kernel(
    n_docs: int,
    shard_size: int,
    avgdl: float,
    k: int,
):
    """Build the per-shard block-max WAND applyInPandas kernel.

    Within a shard (all rows share shard_id; one row per query term):
    1. per-term skip arrays give (first_doc, last_doc, ub) per block where
       ub = mult * idf * (K1+1) * max_tf / (max_tf + K1*(1-B)) — a true
       upper bound on any posting's contribution in the block;
    2. sweep doc-space segments between block boundaries in order; skip a
       segment when the sum of active block UBs < current θ (never decoding
       those blocks); otherwise decode the overlapping blocks (each at most
       once), exact-score vectorized, and raise θ from the local top-k heap.
    """

    def ub_of(mult: int, idf: float, max_tf: np.ndarray) -> np.ndarray:
        mt = max_tf.astype(np.float64)
        return mult * idf * (K1 + 1.0) * mt / (mt + K1 * (1.0 - B))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        shard_id = int(pdf["shard_id"].iloc[0])
        base = shard_id * shard_size

        # per-term block tables
        terms = []
        for row in pdf.itertuples(index=False):
            mult = int(row.mult)
            idf = bm25_idf(n_docs, int(row.df))
            last = np.asarray(row.skip_last_doc, dtype=np.int64)
            maxtf = np.asarray(row.skip_max_tf, dtype=np.int64)
            doc_off = np.asarray(row.skip_doc_off, dtype=np.int64)
            tf_off = np.asarray(row.skip_tf_off, dtype=np.int64)
            if len(last) == 0:
                continue
            first = np.empty_like(last)
            first[0] = base
            first[1:] = last[:-1] + 1
            terms.append(
                {
                    "mult": mult,
                    "idf": idf,
                    "first": first,
                    "last": last,
                    "ub": ub_of(mult, idf, maxtf),
                    "doc_blob": bytes(row.doc_blob),
                    "tf_blob": bytes(row.tf_blob),
                    "dl_blob": bytes(row.dl_blob),
                    "doc_off": doc_off,
                    "tf_off": tf_off,
                    "count": int(row.count),
                    "decoded": None,  # lazy full decode cache
                }
            )
        if not terms:
            return pd.DataFrame({"doc_id": [], "score": []})

        # segment boundaries = union of block first/last+1 docids
        bounds = np.unique(
            np.concatenate(
                [t["first"] for t in terms] + [t["last"] + 1 for t in terms]
            )
        )
        heap: list[tuple[float, int]] = []  # min-heap (score, -doc_id)
        theta = 0.0

        def decode_term(t):
            if t["decoded"] is None:
                deltas = varbyte_decode(t["doc_blob"])
                doc_ids = np.cumsum(deltas.astype(np.int64)) + base
                tfs = varbyte_decode(t["tf_blob"]).astype(np.float64)
                dls = varbyte_decode(t["dl_blob"]).astype(np.float64)
                score = (
                    t["mult"]
                    * t["idf"]
                    * tfs
                    * (K1 + 1.0)
                    / (tfs + K1 * (1.0 - B + B * dls / avgdl))
                )
                t["decoded"] = (doc_ids, score)
            return t["decoded"]

        for si in range(len(bounds)):
            seg_lo = int(bounds[si])
            seg_hi = int(bounds[si + 1]) - 1 if si + 1 < len(bounds) else None

            # active blocks: block b of term t with first<=seg_hi and last>=seg_lo
            ub_sum = 0.0
            active = []
            for t in terms:
                j = np.searchsorted(t["last"], seg_lo)
                if j < len(t["last"]) and (
                    seg_hi is None or t["first"][j] <= seg_hi
                ):
                    ub_sum += float(t["ub"][j])
                    active.append((t, j))
            if not active:
                continue
            if len(heap) >= k and ub_sum <= theta:
                continue

            # exact-score the segment from the active terms
            seg_docs = []
            seg_scores = []
            for t, j in active:
                doc_ids, score = decode_term(t)
                lo = np.searchsorted(doc_ids, seg_lo, side="left")
                hi = (
                    np.searchsorted(doc_ids, seg_hi, side="right")
                    if seg_hi is not None
                    else len(doc_ids)
                )
                if hi > lo:
                    seg_docs.append(doc_ids[lo:hi])
                    seg_scores.append(score[lo:hi])
            if not seg_docs:
                continue
            d = np.concatenate(seg_docs)
            s = np.concatenate(seg_scores)
            uniq, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(uniq))
            np.add.at(acc, inv, s)
            for doc, sc in zip(uniq.tolist(), acc.tolist()):
                if len(heap) < k:
                    heapq.heappush(heap, (sc, -doc))
                elif (sc, -doc) > heap[0]:
                    heapq.heapreplace(heap, (sc, -doc))
            if len(heap) >= k:
                theta = heap[0][0]

        if not heap:
            return pd.DataFrame({"doc_id": [], "score": []})
        docs = np.array([-d for _, d in heap], dtype=np.int64)
        scores = np.array([s for s, _ in heap], dtype=np.float64)
        return pd.DataFrame({"doc_id": docs, "score": scores})

    def wrapped(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return kernel(pdf)

    return wrapped
