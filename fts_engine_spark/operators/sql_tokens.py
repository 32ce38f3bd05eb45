"""Shared SQL-expressible "simple" tokenizer, defined identically for Spark
(native JVM functions, whole-stage codegen — no Python in the hot path) and
for the DuckDB oracle (ANSI SQL string).

Semantics = the reference pipeline minus stemming (tokenize on
``[\\p{L}\\p{Nd}]+`` runs, lowercase, byte-length min-length 3 with numeric
bypass, Snowball-English stopwords). Stemming is deliberately excluded here
because it is not expressible in SQL; the stemmed pipeline is exercised by
the pandas-UDF path and pinned by the pytest golden suite instead
(SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..textproc.stopwords import ENGLISH_STOPWORDS

TOKEN_PATTERN = r"[\p{L}\p{Nd}]+"
NUMERIC_PATTERN = "^[0-9]{1,19}$"

# sorted for deterministic plan/SQL text
_STOPLIST = sorted(w for w in ENGLISH_STOPWORDS if "'" not in w)


def tokens_array(text_col: str = "text", stopwords: bool = True, min_len: int = 3) -> Column:
    """array<string> of filtered tokens — pure built-in functions."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
    arr = F.filter(toks, lambda c: (F.octet_length(c) >= min_len) | c.rlike(NUMERIC_PATTERN))
    if stopwords:
        stop_arr = F.array(*[F.lit(w) for w in _STOPLIST])
        arr = F.filter(arr, lambda c: ~F.array_contains(stop_arr, c))
    return arr


def duckdb_tokens_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: bool = True,
    min_len: int = 3,
) -> str:
    """DuckDB CTE body producing (doc_id, term) with identical semantics.

    Usage: ``WITH toks AS ({duckdb_tokens_sql()}) SELECT ...``
    """
    stop_pred = ""
    if stopwords:
        stoplist = ", ".join(f"'{w}'" for w in _STOPLIST)
        stop_pred = f" AND term NOT IN ({stoplist})"
    return (
        f"SELECT {id_col} AS doc_id, u.term AS term "
        f"FROM (SELECT {id_col}, regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS ts "
        f"      FROM {table}) , unnest(ts) AS u(term) "
        f"WHERE (strlen(u.term) >= {min_len} OR regexp_full_match(u.term, '[0-9]{{1,19}}'))"
        f"{stop_pred}"
    )
