"""Did-you-mean suggestions (operators/suggest.py): distributed plan ==
point plan == a brute-force python referee over the collected dictionary;
self-suggestion at distance 0; no row beyond max_dist.
"""

from __future__ import annotations

import pytest

from fts_engine_spark.operators.suggest import (
    _dist_leq,
    suggest_terms,
    suggest_terms_point,
)
from fts_engine_spark.query import FtsIndex


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _meta = small_index
    return FtsIndex(spark, index_dir)


@pytest.fixture(scope="module")
def vocab(fts):
    return {
        r["term"]: int(r["df"]) for r in fts._read_terms().collect()
    }


def _referee(vocab, tok: str, max_dist: int):
    best = None
    for term, df in vocab.items():
        if abs(len(term) - len(tok)) > max_dist:
            continue
        d = _lev(term, tok)
        if d > max_dist:
            continue
        key = (d, -df, term)
        if best is None or key < best:
            best = key
    return best  # (dist, -df, term) | None


def test_dist_leq_matches_full_dp():
    cases = [("kitten", "sitting"), ("abc", "abc"), ("a", "abcde"),
             ("hotel", "hotl"), ("", "ab"), ("xy", "yx")]
    for a, b in cases:
        true = _lev(a, b)
        for cap in (0, 1, 2, 3):
            got = _dist_leq(a, b, cap)
            assert got == (true if true <= cap else None), (a, b, cap)


def test_suggest_matches_referee(fts, vocab):
    # typos of real corpus words + one exact word + one garbage token
    q = "hotl frnch turtel zzzzqqqq hotel"
    rows = [
        (r["token"], r["suggestion"], int(r["dist"]), int(r["sugg_df"]))
        for r in suggest_terms(fts, q, max_dist=2).collect()
    ]
    from fts_engine_spark.operators.suggest import _tokens

    toks = sorted(_tokens(fts, q, None))
    want = []
    for t in toks:
        b = _referee(vocab, t, 2)
        if b is not None:
            want.append((t, b[2], b[0], -b[1]))
    assert rows == want
    by_tok = {t: (s, d) for t, s, d, _ in rows}
    # the exact dictionary word suggests itself at distance 0
    exact = [t for t in toks if t in vocab]
    assert exact and all(by_tok[t] == (t, 0) for t in exact)
    # garbage produced no row
    garbage = [t for t in toks if _referee(vocab, t, 2) is None]
    assert garbage and all(t not in by_tok for t in garbage)
    # at least one true correction happened
    assert any(d > 0 for _, d in by_tok.values())


def test_suggest_point_parity(fts):
    fts.warm()
    for q in ("hotl frnch turtel zzzzqqqq hotel", "castl rivr", "german"):
        want = [
            (r["token"], r["suggestion"], int(r["dist"]), int(r["sugg_df"]))
            for r in suggest_terms(fts, q, max_dist=2).collect()
        ]
        assert suggest_terms_point(fts, q, max_dist=2) == want, q


def test_suggest_empty_query(fts):
    assert suggest_terms(fts, "", max_dist=2).count() == 0
    assert suggest_terms_point(fts, "", max_dist=2) == []
