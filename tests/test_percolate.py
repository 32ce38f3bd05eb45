"""Percolator (reverse search): stored queries vs incoming docs,
brute-force-verified against the same text pipeline, min_match
variants, zero-term queries, and by_lang routing."""

from __future__ import annotations

import pytest

from fts_engine_spark.operators.percolate import percolate
from fts_engine_spark.textproc.pipeline import get_pipeline


def _docs(spark, n=60):
    rows = [
        (f"doc://{i}", f"alpha beta ww{i % 7} gamma " + "pad " * (i % 5), "en")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


QUERIES = [
    (1, "alpha gamma", None),      # conjunctive: both terms required
    (2, "alpha ww3", None),        # only docs with ww3
    (3, "ww1 ww2 ww3", 1),         # OR: any of the three
    (4, "alpha ww1 ww2", 2),       # >= 2 of the three
    (5, "missingterm", None),      # matches nothing
]


def _brute(docs_rows, queries, preset="simple"):
    pipe = get_pipeline(preset)
    out = set()
    for url, text, _lang in docs_rows:
        dterms = set(pipe.process(text))
        for qid, q, mm in queries:
            qterms = set(pipe.process(q))
            if not qterms:
                continue
            req = len(qterms) if not mm else min(mm, len(qterms))
            matched = len(dterms & qterms)
            if matched >= req:
                out.add((url, qid, matched, len(qterms)))
    return out


def test_percolate_brute_force_parity(spark):
    docs = _docs(spark)
    q = spark.createDataFrame(
        QUERIES, "query_id long, query string, min_match int"
    )
    got = {
        (r["url"], r["query_id"], r["matched_terms"], r["n_query_terms"])
        for r in percolate(spark, docs, q, preset="simple").collect()
    }
    rows = [(r["url"], r["text"], r["lang"]) for r in docs.collect()]
    assert got == _brute(rows, QUERIES)
    assert any(qid == 3 for _, qid, _, _ in got)  # OR fired
    assert not any(qid == 5 for _, qid, _, _ in got)


def test_percolate_without_min_match_column(spark):
    docs = _docs(spark, 20)
    q = spark.createDataFrame(
        [(1, "alpha gamma")], "query_id long, query string"
    )
    got = percolate(spark, docs, q).collect()
    assert len(got) == 20  # every doc has both terms
    assert all(r["matched_terms"] == 2 == r["n_query_terms"] for r in got)


def test_percolate_zero_term_query_matches_nothing(spark):
    docs = _docs(spark, 10)
    # 'the and' analyzes to zero terms under the english preset
    q = spark.createDataFrame(
        [(1, "the and", None), (2, "alpha", None)],
        "query_id long, query string, min_match int",
    )
    got = percolate(spark, docs, q, preset="english").collect()
    assert {r["query_id"] for r in got} == {2}


def test_percolate_by_lang_routing(spark):
    # by_lang: the ru doc is stemmed by the russian pipeline, so a
    # russian query matches it through stemming; the en doc does not.
    docs = spark.createDataFrame(
        [
            ("doc://ru", "стол столы", "ru"),
            ("doc://en", "tables alpha", "en"),
        ],
        "url string, text string, lang string",
    )
    q = spark.createDataFrame(
        [(1, "столами", None)], "query_id long, query string, min_match int"
    )
    # queries are analyzed with the default preset of the pipeline route;
    # use the russian-capable multilingual default on both sides
    got = percolate(spark, docs, q, preset="russian", by_lang=False).collect()
    assert {r["url"] for r in got} == {"doc://ru"}


def test_percolate_by_lang_true_routes_per_doc(spark):
    """by_lang=True (the bench's multilingual shape, ADVICE r5): each
    DOC analyzes through its own language pipeline while queries use the
    single ``preset`` pipeline — so a pre-stemmed query term matches
    only the doc whose language's stemmer produces it. Sanity-pins the
    doc-vs-query analyzer asymmetry the bench exercises."""
    from fts_engine_spark.operators.percolate import percolate
    from fts_engine_spark.textproc.pipeline import get_pipeline

    # doc-side stems: english "tables" -> tabl; russian "столы" -> стол.
    # multilingual (query side) does not stem, so the stemmed forms are
    # only reachable through the per-doc routing.
    assert get_pipeline("english").process("tables") == ["tabl"]
    assert get_pipeline("multilingual").process("tabl") == ["tabl"]
    ru_stem = get_pipeline("russian").process("столы")
    assert get_pipeline("multilingual").process(ru_stem[0]) == ru_stem

    docs = spark.createDataFrame(
        [
            ("doc://en", "tables", "en"),
            ("doc://ru", "столы", "ru"),
        ],
        "url string, text string, lang string",
    )
    q = spark.createDataFrame(
        [(1, "tabl", None), (2, ru_stem[0], None)],
        "query_id long, query string, min_match int",
    )
    got = percolate(
        spark, docs, q, preset="multilingual", by_lang=True
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(r["url"])
    assert by_q.get(1) == {"doc://en"}
    assert by_q.get(2) == {"doc://ru"}
