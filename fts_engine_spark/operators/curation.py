"""Corpus-curation operators for LLM training-data pipelines.

The dedup / similarity / textstats families cover the *matching* side of
data curation; this module adds the *filtering and splitting* side that a
production pretraining pipeline runs over the same documents table:

- :func:`repetition_stats` — per-document duplicate-n-gram fraction (the
  Gopher-style repetition filter signal): boilerplate and spam pages
  repeat themselves, and the fraction of n-gram occurrences that are
  repeats of another n-gram in the SAME document is the standard cheap
  detector.
- :func:`quality_rules` — a composite Gopher-style keep/drop decision
  from per-document word statistics (word count bounds, mean word length
  bounds, stopword ratio, repetition).
- :func:`stratified_sample` — deterministic per-language sampling by an
  md5-derived uniform, the building block of data-mixture construction
  (sample fractions per source/language bucket, reproducible across
  runs and engines).
- :func:`decontaminate` — benchmark decontamination: flag training
  documents that share any word n-gram with an evaluation set.
- :func:`pii_scrub` — mask emails / IPv4 addresses / phone-shaped
  numbers with typed placeholder tokens and count the redactions.

Scale notes (the 100 TB shapes):

- ``repetition_stats``, ``quality_rules``, ``stratified_sample`` and
  ``pii_scrub`` are ZERO-SHUFFLE: every statistic is computed per row
  with built-in higher-order array functions (whole-stage codegen, no
  Python), so they run at scan speed and compose with any downstream
  shuffle for free.
- ``decontaminate`` broadcasts the eval-side distinct shingle set (eval
  benchmarks are tiny next to a training corpus); the train side is a
  scan → explode → broadcast-semi-join with no train-side shuffle until
  the final per-doc ``distinct``, which is on the (already unique-ish)
  doc_id key.

Every operator is SQL-expressible and carries a DuckDB oracle in the
driver contract (``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textproc.stopwords import ENGLISH_STOPWORDS
from .sql_tokens import TOKEN_PATTERN, tokens_array
from . import dedup

def _raw_tokens() -> F.Column:
    """Words-as-written: every token run, no length/stopword filtering —
    quality statistics are about the raw text, not the index pipeline.
    (Built lazily: Column construction needs an active session.)"""
    return F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)
    )

_STOP = sorted(w for w in ENGLISH_STOPWORDS if "'" not in w)

# PII patterns — deliberately simple and identical under Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def _ngram_expr(tokens_col: str, n: int) -> F.Column:
    """array<string> of space-joined word n-grams (non-distinct, in text
    order) — same construction as :func:`dedup.shingles` minus the
    distinct, because repetition counting needs multiplicity."""
    # NB: sequence(1, 0) in Spark steps DOWNWARD ([1, 0]) rather than
    # yielding an empty array, so docs shorter than n grams need an
    # explicit empty-array branch.
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"transform(sequence(1, size({tokens_col})-{n - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {n}))) "
        f"ELSE array() END"
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, dup_frac): within-document n-gram
    repetition. ``dup_frac = 1 - n_distinct/n_ngrams`` (0.0 for docs with
    no n-grams) — the fraction of n-gram slots occupied by a repeat of an
    n-gram already seen in the document. Zero-shuffle: the whole statistic
    is an array expression per row."""
    toks = tokens_array(stopwords=False)
    grams = _ngram_expr("_toks", n)
    d = docs.select("doc_id", toks.alias("_toks")).select(
        "doc_id", grams.alias("_g")
    )
    total = F.size("_g")
    distinct = F.size(F.array_distinct("_g"))
    return d.select(
        "doc_id",
        total.cast("long").alias("n_ngrams"),
        distinct.cast("long").alias("n_distinct"),
        F.round(
            F.when(
                total > 0,
                F.lit(1.0) - distinct.cast("double") / total.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )


def quality_rules(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    min_stop_ratio: float = 0.02,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, stop_ratio, dup_3gram_frac, keep):
    the composite Gopher-style quality gate. ``keep`` is the AND of the
    five rules; the component statistics are returned so a pipeline can
    re-threshold without recomputing. Zero-shuffle per-row plan."""
    stop_arr = F.array(*[F.lit(w) for w in _STOP])
    d = docs.select("doc_id", _raw_tokens().alias("_w"), "text")
    toks = tokens_array(stopwords=False)
    d = d.withColumn("_toks", toks).withColumn(
        "_g", _ngram_expr("_toks", 3)
    )
    n = F.size("_w")
    total_len = F.aggregate(
        F.transform("_w", lambda c: F.length(c)), F.lit(0), lambda a, b: a + b
    )
    stopc = F.size(F.filter("_w", lambda c: F.array_contains(stop_arr, c)))
    gtot = F.size("_g")
    gdis = F.size(F.array_distinct("_g"))
    mean_len = F.when(
        n > 0, total_len.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n > 0, stopc.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        gtot > 0, F.lit(1.0) - gdis.cast("double") / gtot.cast("double")
    ).otherwise(F.lit(0.0))
    d = d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(dup_frac, 6).alias("dup_3gram_frac"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("stop_ratio") >= min_stop_ratio)
        & (F.col("dup_3gram_frac") <= max_dup_frac)
    )
    return d.withColumn("keep", keep)


def stratified_sample(
    docs: DataFrame, fracs: dict[str, float], seed: str = "strat"
) -> DataFrame:
    """(doc_id, lang): keep each document iff its md5-derived uniform
    u(doc_id) falls under its language's sampling fraction (languages
    absent from ``fracs`` are dropped). Deterministic and engine-portable
    — the same md5 threshold reproduces bit-identically in any engine, so
    a data mixture built on one cluster is reconstructible on another.
    Zero-shuffle: a pure filter over the scan."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    frac = F.lit(None).cast("double")
    for lg in sorted(fracs):
        frac = F.when(F.col("lang") == lg, F.lit(float(fracs[lg]))).otherwise(
            frac
        )
    return (
        docs.select("doc_id", "lang", u.alias("_u"), frac.alias("_f"))
        .where(F.col("_f").isNotNull() & (F.col("_u") < F.col("_f")))
        .select("doc_id", "lang")
    )


def decontaminate(
    train: DataFrame, holdout: DataFrame, n: int = 3
) -> DataFrame:
    """(doc_id, contaminated): flag every training document sharing at
    least one word n-gram with the holdout (evaluation) set — benchmark
    decontamination. The holdout's distinct shingle set is broadcast
    (eval benchmarks are tiny next to a training corpus); the training
    side never shuffles its text, only exploded shingles semi-joined
    against the broadcast."""
    ev = dedup.shingles(holdout, n).select("shingle").distinct()
    sh = dedup.shingles(train, n)
    hits = (
        sh.join(F.broadcast(ev), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("contaminated"), F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_pii, clean_text): mask emails, IPv4 addresses and
    phone-shaped numbers with typed placeholders and count redactions.
    Replacement order (email → ipv4 → phone) is fixed so results are
    engine-portable. Zero-shuffle per-row plan (JVM regex, no Python)."""
    # count each stage on the PREVIOUS stage's output so n_pii equals the
    # number of placeholders actually written: an ipv4 embedded in an
    # email local-part ('1.2.3.4@x.com') is one redaction, not two. The
    # placeholders contain no digits or '@', so a later pattern can never
    # match inside an earlier replacement.
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ip = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_IPV4), F.lit(0))
    )
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phone = F.size(
        F.regexp_extract_all(after_ip, F.lit(PII_PHONE), F.lit(0))
    )
    clean = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        (n_email + n_ip + n_phone).cast("long").alias("n_pii"),
        clean.alias("clean_text"),
    )
