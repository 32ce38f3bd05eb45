"""Unit + plan tests for the corpus-curation operators
(fts_engine_spark/operators/curation.py). End-to-end parity with the
DuckDB oracle is covered by tests/test_oracle_parity.py (curation_* rows);
these tests pin the semantics on crafted inputs and the physical plans
(zero-shuffle for the per-row ops, broadcast for decontamination)."""

from __future__ import annotations

import pytest

from fts_engine_spark.operators import curation
from fts_engine_spark.plans.review import assert_plan, assert_plan_absent


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # 6 three-grams, 3 distinct -> dup_frac 0.5
        (0, "aaa bbb ccc aaa bbb ccc aaa bbb", "en"),
        # all distinct three-grams -> dup_frac 0.0
        (1, "one two three four five", "en"),
        # fewer than 3 tokens -> no three-grams -> dup_frac 0.0
        (2, "solo word", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_repetition_stats_semantics(tiny):
    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_distinct"], r["dup_frac"])
        for r in curation.repetition_stats(tiny, 3).collect()
    }
    assert out[0] == (6, 3, 0.5)
    assert out[1] == (3, 3, 0.0)
    assert out[2] == (0, 0, 0.0)


def test_quality_rules_semantics(spark):
    long_ok = (
        "the curious engineer walked along the river bank and watched "
        "the morning light settle over distant hills while birds called "
        "from tall trees near an old stone bridge that carried travelers "
        "toward the quiet village market square before sunrise ended"
    )  # 40 words, natural stopword ratio, no repeated 3-grams
    rows = [
        (0, long_ok, "en"),
        (1, "too short", "en"),  # fails min_words
        (2, " ".join(["spam"] * 60), "en"),  # fails stop_ratio + dup_frac
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in curation.quality_rules(docs).collect()}
    assert out[0]["keep"] is True
    assert out[0]["n_words"] == 40
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["keep"] is False
    assert out[2]["dup_3gram_frac"] > 0.9
    assert out[2]["stop_ratio"] == 0.0


def test_stratified_sample_deterministic_and_drops_absent_langs(tiny):
    fracs = {"en": 1.0, "fr": 0.5}  # 'de' absent -> dropped
    a = sorted(r["doc_id"] for r in curation.stratified_sample(tiny, fracs).collect())
    b = sorted(r["doc_id"] for r in curation.stratified_sample(tiny, fracs).collect())
    assert a == b == [0, 1]  # both en docs kept at frac 1.0, de dropped
    none = curation.stratified_sample(tiny, {"en": 0.0}).collect()
    assert none == []


def test_decontaminate_flags_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),  # shares 'alpha beta gamma'
            (11, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(99, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in curation.decontaminate(train, holdout, 3).collect()
    }
    assert out == {10: True, 11: False}


def test_pii_scrub_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at bob.smith+x@corp.example.org today"),
            (1, "server 192.168.0.1 then call 555-0142"),
            (2, "no pii in this row at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.pii_scrub(docs).collect()}
    assert out[0]["n_pii"] == 1
    assert out[0]["clean_text"] == "mail me at <EMAIL> today"
    assert out[1]["n_pii"] == 2
    assert out[1]["clean_text"] == "server <IP> then call <PHONE>"
    assert out[2]["n_pii"] == 0
    assert out[2]["clean_text"] == "no pii in this row at all"


def test_pii_scrub_counts_overlaps_once(spark):
    """An ipv4 embedded in an email local-part is ONE redaction: each
    stage counts on the previous stage's output, so n_pii equals the
    placeholders actually written."""
    docs = spark.createDataFrame(
        [(0, "mail 1.2.3.4@example.com now"),
         (1, "bare 1.2.3.4 then x@y.org")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.pii_scrub(docs).collect()}
    assert out[0]["n_pii"] == 1
    assert out[0]["clean_text"] == "mail <EMAIL> now"
    assert out[1]["n_pii"] == 2
    assert out[1]["clean_text"] == "bare <IP> then <EMAIL>"


def test_per_row_curation_ops_are_zero_shuffle(tiny):
    for df in (
        curation.repetition_stats(tiny, 3),
        curation.quality_rules(tiny),
        curation.stratified_sample(tiny, {"en": 0.5}),
        curation.pii_scrub(tiny),
    ):
        assert_plan_absent(df, "Exchange", "HashAggregate", "pythonUDF")


def test_decontaminate_broadcasts_holdout(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curation.decontaminate(
        docs.where("doc_id % 10 <> 0"), docs.where("doc_id % 10 = 0"), 3
    )
    assert_plan(out, "BroadcastHashJoin")
    assert_plan_absent(out, "CartesianProduct", "BroadcastNestedLoopJoin")
