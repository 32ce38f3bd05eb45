"""Snippets: best-window highlighting in analyzed token space.

The pure kernel (best_snippet) is golden-tested directly; the Spark
operator is checked end-to-end over the small index (hit set identical
to search_bm25, every snippet highlights at least one analyzed match,
stemmed surface forms are wrapped, pushdown keeps the docs scan bounded).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fts_engine_spark.operators.snippets import best_snippet, search_with_snippets
from fts_engine_spark.query import FtsIndex
from fts_engine_spark.textproc.pipeline import get_pipeline

OPEN, CLOSE = "<<", ">>"


def snip(text, terms, preset="english", window=8):
    return best_snippet(
        text, frozenset(terms), get_pipeline(preset), window, OPEN, CLOSE
    )


def test_kernel_wraps_stemmed_surface_forms():
    # query term "merg" (analyzed "merge") must highlight "Merging"
    out = snip("Merging sorted runs is the core of the algorithm.", {"merg"})
    assert f"{OPEN}Merging{CLOSE}" in out


def test_kernel_picks_densest_window():
    text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "turtle hotel turtle nearby words here and more filler tail"
    )
    out = snip(text, {"turtl", "hotel"}, window=6)
    # the window must cover the turtle/hotel cluster, not the head
    assert f"{OPEN}turtle{CLOSE}" in out and f"{OPEN}hotel{CLOSE}" in out
    assert "alpha" not in out
    assert out.startswith("…") and out.endswith("…")


def test_kernel_no_match_returns_document_head():
    out = snip("one two three four five six seven eight nine ten", {"zzz"}, window=4)
    assert out.startswith("one two three four")
    assert OPEN not in out and out.endswith("…")


def test_kernel_earliest_window_wins_ties():
    out = snip("turtle a b c d e f g h i j k turtle", {"turtl"}, window=3)
    assert out.startswith(f"{OPEN}turtle{CLOSE}")


def test_kernel_empty_and_short_text():
    assert snip("", {"x"}) == ""
    assert snip("hi", {"x"}, window=5) == "hi"


_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=10,
)


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(_WORD, min_size=0, max_size=60),
    qwords=st.lists(_WORD, min_size=1, max_size=4),
    window=st.integers(min_value=1, max_value=20),
    preset=st.sampled_from(["simple", "english", "multilingual"]),
)
def test_kernel_properties(words, qwords, window, preset):
    """Invariants for arbitrary corpora: (1) the tag-stripped snippet is a
    contiguous substring of the source text (modulo the … ellipses), and
    (2) every tagged fragment analyzes to a query term — the highlighter
    can never mark text the index would not have matched."""
    pipe = get_pipeline(preset)
    text = " ".join(words)
    qterms = frozenset(t for w in qwords for t in pipe.process(w))
    out = best_snippet(text, qterms, pipe, window, OPEN, CLOSE)
    bare = out.strip("…").replace(OPEN, "").replace(CLOSE, "")
    assert bare in text
    rest = out
    while OPEN in rest:
        _, rest = rest.split(OPEN, 1)
        frag, rest = rest.split(CLOSE, 1)
        got = pipe.process(frag)
        assert got and got[0] in qterms, (frag, qterms)


def test_operator_matches_search_and_highlights(spark, small_index, small_corpus):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    docs = spark.read.parquet(small_corpus)
    out = search_with_snippets(
        fts, docs, "turtle hotel", k=5, tag_open=OPEN, tag_close=CLOSE
    )
    rows = out.collect()
    want = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in fts.search_bm25("turtle hotel", k=5).collect()
    ]
    assert [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows] == want
    assert all(OPEN in r["snippet"] for r in rows)  # hits always highlight


def test_operator_pushes_urls_into_docs_scan(spark, small_index, small_corpus):
    from fts_engine_spark.plans.review import formatted_plan

    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    docs = spark.read.parquet(small_corpus)
    out = search_with_snippets(fts, docs, "turtle hotel", k=3)
    plan = formatted_plan(out)
    # the k hit urls are a pushed In() predicate on the docs parquet scan
    assert "PushedFilters" in plan and "In(url" in plan


def test_operator_offset_and_empty(spark, small_index, small_corpus):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    docs = spark.read.parquet(small_corpus)
    p2 = search_with_snippets(fts, docs, "turtle hotel", k=3, offset=3)
    want = [
        int(r["doc_id"])
        for r in fts.search_bm25("turtle hotel", k=3, offset=3).collect()
    ]
    assert [int(r["doc_id"]) for r in p2.collect()] == want
    none = search_with_snippets(fts, docs, "qqqzzzxxx", k=3)
    assert none.count() == 0
    with pytest.raises(ValueError):
        search_with_snippets(fts, docs, "turtle", k=0)
