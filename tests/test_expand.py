"""Dictionary-expanded queries (prefix / fuzzy multi-term rewrite).

Extensions beyond the reference's exact-term search (engine.go:82-158):
trailing-* prefix patterns and levenshtein-bounded typo tolerance, both
expanded against the index's terms table with a deterministic,
SQL-reproducible preference (df desc, term asc, LIMIT max_expand) and
scored through the same BM25 paths as exact queries. The DuckDB oracle
twin lives in __spark_entry__ (fts_prefix_bm25 / fts_fuzzy_bm25).
"""

from __future__ import annotations

import pytest

from fts_engine_spark.query import FtsIndex


@pytest.fixture(scope="module")
def index(spark, small_index):
    ix = FtsIndex(spark, small_index[0])
    yield ix
    ix.close()


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_prefix_expansion_semantics(index):
    terms = index.expand_terms("s", "prefix", max_expand=1000)
    assert terms, "synthetic vocabulary has s-terms"
    assert all(t.startswith("s") for t in terms)
    # every dictionary s-term is present when the bound doesn't bite
    all_terms = {
        r["term"] for r in index._read_terms().select("term").collect()
    }
    assert set(terms) == {t for t in all_terms if t.startswith("s")}


def test_expansion_bound_and_preference(index):
    full = index.expand_terms("s", "prefix", max_expand=1000)
    capped = index.expand_terms("s", "prefix", max_expand=3)
    assert len(capped) == 3
    # the cap keeps the HIGHEST-df terms (ties term-asc): the capped list
    # must equal the first 3 of the df-desc-ordered full expansion
    assert capped == full[:3]
    # deterministic across calls
    assert capped == index.expand_terms("s", "prefix", max_expand=3)


def test_fuzzy_expansion_distance(index):
    """expand_terms(kind='fuzzy') returns exactly the dictionary terms
    within the edit-distance bound — checked against a local levenshtein
    over the full vocabulary (the dictionary is stemmed: by_lang preset)."""
    vocab = {r["term"] for r in index._read_terms().select("term").collect()}
    for pattern, dist in [("quer", 1), ("querry", 1), ("querry", 2)]:
        got = set(
            index.expand_terms(pattern, "fuzzy", max_dist=dist, max_expand=10_000)
        )
        want = {t for t in vocab if _levenshtein(t, pattern) <= dist}
        assert got == want, (pattern, dist)
    # a distance-1 typo of the stem 'queri' expands; sanity on non-empty
    assert "queri" in index.expand_terms("quer", "fuzzy", max_dist=1)


def test_expand_rejects_unknown_kind(index):
    with pytest.raises(ValueError):
        index.expand_terms("x", "regex")


def test_prefix_search_modes_agree(index):
    a = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_prefix(
            "data s*", k=0, mode="relational"
        ).collect()
    )
    b = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_prefix("data s*", k=0, mode="wand").collect()
    )
    assert a == b and a


def test_prefix_search_equals_manual_expansion(index):
    """search_bm25_prefix == _bm25_wand over the hand-built union mult."""
    mult = {t: 1 for t in index.expand_terms("s", "prefix")}
    mult["data"] = mult.get("data", 0) + 1
    manual = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index._bm25_wand(mult, 0, hydrate=False).collect()
    )
    got = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_prefix("data s*", k=0).collect()
    )
    assert got == manual


def test_fuzzy_search_finds_typo_docs(index):
    """A query of typos scores exactly like the corrected query (each typo
    expands to precisely its distance-1 dictionary term here)."""
    fuzzy = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_fuzzy("querry valu", k=0).collect()
    )
    exact = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25("query value", k=0).collect()
    )
    assert fuzzy == exact and fuzzy


def test_wildcard_expansion_semantics(index):
    """expand_terms(kind='wildcard') == a regex-filtered dictionary scan:
    mid-string *, single-char ?, and leading * (no prunable prefix) all
    honor SQL LIKE semantics."""
    import re

    all_terms = {
        r["term"] for r in index._read_terms().select("term").collect()
    }
    for pattern in ["s*e", "t?ble", "*ta", "s*", "?????"]:
        rx = re.compile(
            "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in pattern
            )
            + r"\Z"
        )
        got = index.expand_terms(pattern, "wildcard", max_expand=100000)
        assert set(got) == {t for t in all_terms if rx.match(t)}, pattern


def test_wildcard_generalizes_prefix(index):
    """A trailing-* wildcard expands to exactly the prefix expansion (same
    df-desc/term-asc preference), so the two rewrites can never drift."""
    assert index.expand_terms("s*", "wildcard", max_expand=1000) == (
        index.expand_terms("s", "prefix", max_expand=1000)
    )
    assert index.expand_terms("s*", "wildcard", max_expand=3) == (
        index.expand_terms("s", "prefix", max_expand=3)
    )


def test_wildcard_search_equals_manual_expansion(index):
    """search_bm25_wildcard == _bm25_wand over the hand-built union mult,
    and both modes agree."""
    mult = {t: 1 for t in index.expand_terms("s*e", "wildcard")}
    for t, m in index._query_mult("data").items():
        mult[t] = mult.get(t, 0) + m
    manual = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index._bm25_wand(mult, 0, hydrate=False).collect()
    )
    for mode in ("wand", "relational"):
        got = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in index.search_bm25_wildcard(
                "data s*e", k=0, mode=mode
            ).collect()
        )
        assert got == manual, mode
    assert manual


def test_wildcard_to_like_escaping():
    from fts_engine_spark.query import (
        _wildcard_literal_prefix,
        _wildcard_to_like,
    )

    assert _wildcard_to_like("t*le") == "t%le"
    assert _wildcard_to_like("va?ue") == "va_ue"
    assert _wildcard_to_like("a%b_c\\d") == "a\\%b\\_c\\\\d"
    assert _wildcard_literal_prefix("abc*def") == "abc"
    assert _wildcard_literal_prefix("?x") == ""
    assert _wildcard_literal_prefix("plain") == "plain"


def test_no_match_patterns_empty(index):
    assert index.search_bm25_prefix("zzzz*", k=5).collect() == []
    assert index.search_bm25_fuzzy("zzzzzzzz", k=5).collect() == []
    assert index.search_bm25_prefix("", k=5).collect() == []
    assert index.search_bm25_wildcard("zz*zz", k=5).collect() == []


def test_bare_star_is_not_a_pattern(index):
    # a lone '*' has no stem to expand; the query degrades to its exact part
    got = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_prefix("data *", k=0).collect()
    )
    exact = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25("data", k=0).collect()
    )
    assert got == exact


def test_engine_wrappers(spark, small_index, small_corpus):
    from fts_engine_spark.engine import EngineOptions, FtsEngine

    eng = FtsEngine(
        spark,
        small_index[0],
        EngineOptions(preset="by_lang", shard_size=32),
    )
    rows = eng.search_prefix("s*", k=5).collect()
    assert rows and all(r["url"] for r in rows)
    rows = eng.search_fuzzy("querry", k=5).collect()
    assert rows and all(r["url"] for r in rows)


# ---- regexp (Lucene RegexpQuery analog) ---------------------------------


def test_regexp_expansion_semantics(index):
    import re

    terms = index.expand_terms("s.*", "regexp", max_expand=1000)
    assert terms and all(t.startswith("s") for t in terms)
    # full-match anchoring: 'a' must NOT match dictionary terms merely
    # CONTAINING 'a'
    for t in index.expand_terms("s[aeiou]rt", "regexp", max_expand=1000):
        assert re.fullmatch("s[aeiou]rt", t)
    # regexp generalizes wildcard
    assert set(index.expand_terms("s.*", "regexp", max_expand=1000)) == set(
        index.expand_terms("s*", "wildcard", max_expand=1000)
    )


def test_regexp_literal_prefix():
    from fts_engine_spark.query import _regex_literal_prefix

    assert _regex_literal_prefix("abc.*") == "abc"
    assert _regex_literal_prefix("abc+") == "ab"  # quantifier eats 'c'
    assert _regex_literal_prefix("a(b|c)") == "a"
    assert _regex_literal_prefix(".*x") == ""
    assert _regex_literal_prefix("plain") == "plain"
    assert _regex_literal_prefix("ab?c") == "a"
    # top-level alternation voids the prefix — "scan" is not a required
    # prefix of 'scan|sort' matches; grouped alternation keeps it
    assert _regex_literal_prefix("scan|sort") == ""
    assert _regex_literal_prefix("s(can|ort)") == "s"


def test_regexp_search_equals_manual_expansion(index):
    mult = {t: 1 for t in index.expand_terms("s(cienc|ystem)", "regexp")}
    for t, m in index._query_mult("data").items():
        mult[t] = mult.get(t, 0) + m
    manual = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index._bm25_wand(mult, 0, hydrate=False).collect()
    )
    for mode in ("wand", "relational"):
        got = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in index.search_bm25_regexp(
                "data /s(cienc|ystem)/", k=0, mode=mode
            ).collect()
        )
        assert got == manual, mode
    assert manual


def test_regexp_point_tier_matches_distributed(index):
    index.warm().enable_point_serving()
    try:
        dist = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in index.search_bm25_regexp(
                "data /s(chool.*|tudent)/", k=10
            ).collect()
        ]
        point = [
            (d, round(s, 9))
            for d, s in index.search_bm25_point_regexp(
                "data /s(chool.*|tudent)/", k=10
            )
        ]
        assert point == dist and dist
        # point expansion mirrors the distributed expansion exactly
        assert index._point_expand("s(cienc|ystem)", "regexp", 0, 64) == (
            index.expand_terms("s(cienc|ystem)", "regexp", max_expand=64)
        )
    finally:
        index.close()


def test_regexp_toplevel_alternation_matches_both_branches(index):
    both = index.expand_terms("school|student", "regexp", max_expand=100)
    assert set(both) == {"school", "student"}


def test_regexp_no_match_and_plain_tokens(index):
    assert index.search_bm25_regexp("/zz+q/", k=5).collect() == []
    # tokens not wrapped in /.../ normalize as exact terms
    got = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25_regexp("data", k=0).collect()
    )
    exact = sorted(
        (r["doc_id"], round(r["score"], 6))
        for r in index.search_bm25("data", k=0).collect()
    )
    assert got == exact
