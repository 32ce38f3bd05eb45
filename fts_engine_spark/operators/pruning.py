"""Pruning-strategy factory — the reference's filter factory role
(``/root/reference/cmd/fts/main.go`` filter switch + ``config.go:206``:
none|bloom|cuckoo|ribbon) re-expressed for a storage-backed index.

The reference picks an in-memory probabilistic filter that gates index
lookups for absent terms. On Spark the same role is played by storage-level
pruning, so the factory selects HOW a term predicate reaches the postings
scan (SURVEY.md §2.5 F7):

- ``dict``    isin pushdown AND the term-dictionary gate (the broadcast
              stats join drops absent terms before any postings work) —
              the default, equivalent to the reference's filter+index pair.
- ``storage`` isin pushdown only: row-group min/max stats + the parquet
              bloom filter written at build time (build.py) prune the scan;
              no dictionary lookup. The closest analogue of "bloom filter
              in front of the index".
- ``none``    no predicate at all (full scan + join) — the reference's
              ``filter: none``; for debugging and for measuring what the
              pruning saves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STRATEGIES = ("dict", "storage", "none")


def make_pruner(strategy: str = "dict"):
    """Return ``prune(postings_df, terms) -> DataFrame``."""
    if strategy not in STRATEGIES:
        raise ValueError(
            f"unknown pruning strategy {strategy!r}; have {STRATEGIES}"
        )

    def prune(df: DataFrame, terms: list[str]) -> DataFrame:
        if strategy == "none" or not terms:
            return df
        return df.where(F.col("term").isin(list(terms)))

    prune.strategy = strategy
    prune.gates_with_dictionary = strategy == "dict"
    return prune
