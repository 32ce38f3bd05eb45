"""The single-shuffle build invariant: the doc-local (term, tf) pairs the
tokenize UDF emits are exactly ``groupBy(term, doc_id).count()`` over the
exploded token array — i.e. folding the tf aggregation into the tokenizer
changes the plan, never the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_engine_spark.functions.udfs import (
    make_term_tf_by_lang_udf,
    make_term_tf_udf,
    make_tokenize_by_lang_udf,
    make_tokenize_udf,
)

TEXTS = [
    ("d1", "The Quick brown fox jumps over the lazy dog the fox", "en"),
    ("d2", "Съешь ещё этих мягких французских булок", "ru"),
    ("d3", "", "en"),
    ("d4", None, "de"),
    ("d5", "data DATA Data 123 4567 a bb ccc", "xx"),
]


def _compare(spark, tok_udf_cols, pair_udf_cols):
    df = spark.createDataFrame(TEXTS, "id string, text string, lang string")
    exploded = (
        df.select("id", F.explode(tok_udf_cols(df)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    pairs = df.select("id", F.explode(pair_udf_cols(df)).alias("p")).select(
        "id", F.col("p.term").alias("term"), F.col("p.tf").alias("tf")
    )
    assert sorted(map(tuple, exploded.collect())) == sorted(
        map(tuple, pairs.collect())
    )


def test_pairs_match_groupby_fixed_preset(spark):
    tok = make_tokenize_udf("multilingual")
    pair = make_term_tf_udf("multilingual")
    _compare(spark, lambda df: tok(F.col("text")), lambda df: pair(F.col("text")))


def test_pairs_match_groupby_by_lang(spark):
    tok = make_tokenize_by_lang_udf()
    pair = make_term_tf_by_lang_udf()
    _compare(
        spark,
        lambda df: tok(F.col("text"), F.col("lang")),
        lambda df: pair(F.col("text"), F.col("lang")),
    )


def test_doclen_equals_token_count(spark):
    df = spark.createDataFrame(TEXTS, "id string, text string, lang string")
    tok = make_tokenize_by_lang_udf()
    pair = make_term_tf_by_lang_udf()
    both = df.select(
        "id",
        F.size(tok(F.col("text"), F.col("lang"))).alias("n_tokens"),
        F.aggregate(
            pair(F.col("text"), F.col("lang")),
            F.lit(0),
            lambda acc, x: acc + x["tf"],
        ).alias("doclen"),
    )
    for r in both.collect():
        assert r["n_tokens"] == r["doclen"], r
