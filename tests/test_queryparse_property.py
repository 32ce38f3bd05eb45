"""Property tests for the boolean query-string grammar (queryparse.py).

Round-trip: a query assembled from randomly generated typed components
(should/MUST/NOT words with optional boost and pattern suffixes, groups,
phrases, field filters) parses back to exactly those components,
whatever order they appear in. Robustness: arbitrary text never escapes
with anything but ValueError.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fts_engine_spark.queryparse import (
    Atom,
    BooleanQuery,
    FieldFilter,
    parse_query,
)

# word text that cannot collide with the grammar's operators/separators:
# plain letters, length >= 2 (a lone separator-ish token like 'or' is
# skipped by design), excluding the separator keywords
_WORD = st.from_regex(r"[a-z]{2,8}", fullmatch=True).filter(
    lambda w: w not in {"or", "and", "to"}
)
_BOOST = st.one_of(
    st.none(),
    st.floats(min_value=0.1, max_value=99.0, allow_nan=False).map(
        lambda b: round(b, 2)
    ),
)


@st.composite
def _word_atoms(draw):
    """(token_text, expected Atom) for a single word clause."""
    text = draw(_WORD)
    kind = draw(st.sampled_from(["term", "prefix", "fuzzy"]))
    boost = draw(_BOOST)
    tok = text
    exp_dist = 1
    if kind == "prefix":
        tok += "*"
    elif kind == "fuzzy":
        exp_dist = draw(st.integers(min_value=1, max_value=3))
        tok += f"~{exp_dist}"
    if boost is not None:
        tok += f"^{boost}"
    return tok, Atom(kind, text, exp_dist, boost if boost is not None else 1.0)


@st.composite
def _filters(draw):
    name = draw(st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True))
    negate = draw(st.booleans())
    sign = "-" if negate else ""
    if draw(st.booleans()):
        val = draw(st.from_regex(r"[a-z0-9.\-]{1,8}", fullmatch=True))
        # a value opening a bracket it does not close would be a range
        # typo; the generator stays in the equality alphabet
        return f"{sign}{name}:{val}", FieldFilter(name, negate, value=val)
    lo = draw(st.from_regex(r"[a-z0-9\-]{1,8}", fullmatch=True))
    hi = draw(st.from_regex(r"[a-z0-9\-]{1,8}", fullmatch=True))
    return (
        f"{sign}{name}:[{lo} TO {hi}]",
        FieldFilter(name, negate, lo=lo, hi=hi),
    )


@st.composite
def _clauses(draw):
    """(token_string, bucket, expected) — one top-level clause."""
    kind = draw(
        st.sampled_from(
            ["should", "must", "not", "group", "notgroup", "phrase", "filter"]
        )
    )
    if kind == "filter":
        tok, exp = draw(_filters())
        return tok, "filters", exp
    if kind == "phrase":
        words = draw(st.lists(_WORD, min_size=1, max_size=3))
        ph = " ".join(words)
        slop = draw(st.one_of(st.none(), st.integers(0, 9)))
        if slop is None or slop == 0:  # `~0` IS the exact phrase
            suffix = "~0" if slop == 0 else ""
            return f'"{ph}"{suffix}', "phrases", ph
        return f'"{ph}"~{slop}', "near", (ph, slop)
    if kind in ("group", "notgroup"):
        members = draw(st.lists(_word_atoms(), min_size=1, max_size=3))
        body = " ".join(t for t, _ in members)
        atoms = [a for _, a in members]
        if kind == "group":
            return f"+({body})", "groups", atoms
        return f"-({body})", "must_not", atoms
    tok, atom = draw(_word_atoms())
    if kind == "must":
        return f"+{tok}", "groups", [atom]
    if kind == "not":
        return f"-{tok}", "must_not", [atom]
    return tok, "should", atom


@given(st.lists(_clauses(), min_size=1, max_size=8))
@settings(max_examples=300, deadline=None)
def test_assembled_query_round_trips(clauses):
    query = " ".join(tok for tok, _, _ in clauses)
    bq = parse_query(query)
    want = BooleanQuery()
    for _, bucket, exp in clauses:
        if bucket == "should":
            want.should.append(exp)
        elif bucket == "groups":
            want.groups.append(exp)
        elif bucket == "must_not":
            want.must_not.extend(exp)
        elif bucket == "phrases":
            want.phrases.append(exp)
        elif bucket == "near":
            want.near.append(exp)
        else:
            want.filters.append(exp)
    assert bq.should == want.should
    assert bq.groups == want.groups
    assert bq.must_not == want.must_not
    assert bq.phrases == want.phrases
    assert bq.near == want.near
    assert bq.filters == want.filters


@given(st.text(max_size=60))
@settings(max_examples=500, deadline=None)
def test_arbitrary_text_valueerror_or_parses(s):
    try:
        bq = parse_query(s)
    except ValueError:
        return
    # whatever parsed is structurally sound
    for a in bq.should + [x for g in bq.groups for x in g] + bq.must_not:
        assert a.kind in ("term", "prefix", "fuzzy")
        assert a.boost > 0
        assert a.max_dist >= 1
    for f in bq.filters:
        assert (f.value is None) != (f.lo is None and f.hi is None)
