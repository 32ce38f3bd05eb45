"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. Built-in functions only — fully codegen'd and
oracle-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textproc.stopwords import ENGLISH_STOPWORDS
from .sql_tokens import TOKEN_PATTERN, tokens_array

# marker sets per language (tiny, inlined in both engines)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was", "a"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "los", "las", "es", "y", "una"],
    "fr": ["le", "la", "les", "et", "des", "une"],
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"

_STOP = sorted(w for w in ENGLISH_STOPWORDS if "'" not in w)


def _count_in(arr_col, words: list[str]):
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr_col, lambda c: F.array_contains(lit, c)))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): marker-word n-gram heuristic + CJK detection.

    Deterministic tie-break: langs compared in fixed order en,de,es,fr; CJK
    presence short-circuits to 'zh'.
    """
    toks = tokens_array(stopwords=False, min_len=1)
    d = docs.select("doc_id", "text", toks.alias("_t"))
    for lg, markers in LANG_MARKERS.items():
        d = d.withColumn(f"_c_{lg}", _count_in(F.col("_t"), markers))
    best = F.greatest(*[F.col(f"_c_{lg}") for lg in LANG_MARKERS])
    pred = F.when(F.col("text").rlike(CJK_PATTERN), F.lit("zh"))
    for lg in LANG_MARKERS:  # fixed iteration order = deterministic tie-break
        pred = pred.when(F.col(f"_c_{lg}") == best, F.lit(lg))
    return d.select("doc_id", pred.otherwise(F.lit("und")).alias("pred_lang"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, mean_token_len, quality).

    quality = length-normalized heuristic: in [0,1], rewarding mid-length
    docs with a natural stopword ratio — the standard cheap pre-filter for
    web-scale training corpora.
    """
    toks = tokens_array(stopwords=False, min_len=1)
    d = docs.select("doc_id", toks.alias("_t"))
    n = F.size("_t")
    stopc = _count_in(F.col("_t"), _STOP)
    total_len = F.aggregate(
        F.transform("_t", lambda c: F.length(c)), F.lit(0), lambda a, b: a + b
    )
    d = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stopc / F.greatest(n, F.lit(1)), 4).alias("stop_ratio"),
        F.round(total_len / F.greatest(n, F.lit(1)), 4).alias("mean_token_len"),
    )
    quality = F.round(
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.when((F.col("stop_ratio") >= 0.1) & (F.col("stop_ratio") <= 0.6), 0.5).otherwise(0.0),
        4,
    )
    return d.withColumn("quality", quality)


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace count + a BPE-ish
    regex segmentation (letters run | single digit | single symbol) — the
    cheap proxy for transformer token budgeting."""
    ws = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), F.lit(0)
        )
    )
    return docs.select(
        "doc_id",
        F.when(F.trim(F.col("text")) == "", 0).otherwise(ws).cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of whitespace-normalized lowercase text — the
    canonical-form fingerprint used for fast exact-dup detection."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))
