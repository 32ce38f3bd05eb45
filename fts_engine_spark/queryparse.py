"""Boolean query-string parser (Lucene-lite).

Grammar (whitespace-separated clauses, one line):

    query   := clause+
    clause  := ['+' | '-'] (atom | filter)
    atom    := group | phrase | word
    group   := '(' word (['OR'] word)* ')'
    phrase  := '"' word+ '"'['~' digits]  -- trailing ~N = proximity slop
    word    := pattern['^' float]  -- trailing ^N = term boost (weight)
    pattern := text['*']           -- trailing * = prefix pattern
             | text'~'[digits]     -- trailing ~[N] = fuzzy pattern (default 1)
    filter  := ident ':' value     -- metadata equality gate (lang:en)
             | ident ':[' v ' TO ' v ']'  -- inclusive metadata range

Semantics (resolved by ``FtsIndex.search_boolean``):

* bare word / bare group — SHOULD: contributes to the BM25 score, does
  not gate candidacy (the reference's OR-accumulate, ``engine.go:82-158``).
* ``+atom`` — MUST: a required group; every result doc must match at
  least one of the group's terms (``+word`` is a singleton group, so
  ``+a +b`` is AND; ``+(a OR b)`` is "a or b, required").
* ``-atom`` — MUST NOT: docs matching any of the atom's terms are
  dropped (boolean NOT; ``-(a b)`` excludes both).
* ``"a b"`` — PHRASE, always required: docs must contain the exact
  analyzed-token sequence; the phrase's terms also contribute to the
  score like SHOULD terms.
* ``"a b"~N`` — PROXIMITY (Lucene's sloppy phrase, resolved as an
  ordered span-near): the analyzed terms must appear IN ORDER within
  ``len(terms) + N`` tokens. ``~0`` is the exact phrase; the terms
  score like SHOULD terms, same as phrases.
* prefix/fuzzy words expand against the index dictionary at search
  time; inside a ``+`` clause the whole expansion is ONE required group
  ("at least one word with this prefix"), matching ``term LIKE 'p%'``.
* ``word^2.5`` — BOOST: multiplies the word's BM25 weight (Lucene's
  ``^``); on a pattern the boost applies to every expanded term.
* ``field:value`` / ``field:[lo TO hi]`` — FIELD FILTER: required
  metadata gate against a stored docs-table column (``lang:en``,
  ``doclen:[100 TO 500]``); ``-field:...`` negates. Filters never touch
  the inverted index — they resolve to a doc-id restriction (the
  ``within`` mechanism) intersected with the scored candidates.

Top-level ``OR`` / ``AND`` keywords are separators only (space already
means OR; use ``+`` for AND) — they are skipped case-insensitively so
queries pasted from other engines don't error. The parser is analyzer-
agnostic: words carry raw text; normalization/stemming happens at
resolution time so parsing never needs the index.

Extension over the reference (its query surface is the plain OR query,
``engine.go:82-158``); the grammar mirrors Lucene's classic query-parser
subset that web search boxes expose.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["Atom", "BooleanQuery", "FieldFilter", "parse_query"]

_SEPARATORS = {"or", "and", "||", "&&"}

# a clause is a field filter when it looks like `ident:rest` with a
# non-empty rest that is not a URL-ish `//...` (so a literal token like
# doc://5 keeps parsing as a word — the analyzer splits it anyway)
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(?!//)(.+)$", re.S)
_RANGE_RE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$", re.I)


@dataclass(frozen=True)
class Atom:
    """One query word: exact term, prefix pattern, or fuzzy pattern."""

    kind: str  # 'term' | 'prefix' | 'fuzzy'
    text: str  # raw text, pre-normalization (no trailing * / ~N / ^boost)
    max_dist: int = 1  # fuzzy only
    boost: float = 1.0  # multiplicative term weight (`word^2.5`)


@dataclass(frozen=True)
class FieldFilter:
    """Metadata gate `field:value` / `field:[lo TO hi]` — the ES
    ``query_string`` field-query analog, restricted to stored document
    metadata (it never touches the inverted index). `-field:...`
    negates. Equality compares the stored column as a string; range
    endpoints are cast to the column's type at resolution time, both
    ends inclusive (Lucene's `[a TO b]`)."""

    field: str
    negate: bool = False
    value: str | None = None  # equality (exclusive with lo/hi)
    lo: str | None = None  # range, inclusive
    hi: str | None = None


@dataclass
class BooleanQuery:
    should: list[Atom] = field(default_factory=list)
    groups: list[list[Atom]] = field(default_factory=list)  # required, OR within
    must_not: list[Atom] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)  # required, raw text
    # required ordered-proximity clauses `"a b"~N`: (raw text, slop > 0)
    near: list[tuple[str, int]] = field(default_factory=list)
    filters: list[FieldFilter] = field(default_factory=list)  # all required

    def is_empty(self) -> bool:
        return not (
            self.should
            or self.groups
            or self.must_not
            or self.phrases
            or self.near
            or self.filters
        )


def _split_boost(token: str, where: str) -> tuple[str, float]:
    """Strip a trailing `^<float>` boost. `^` is not an analyzer
    character, so a bare trailing caret is always a malformed boost —
    raise rather than silently searching for a literal caret."""
    caret = token.rfind("^")
    if caret <= 0:
        return token, 1.0
    suffix = token[caret + 1:]
    try:
        boost = float(suffix)
    except ValueError:
        raise ValueError(f"malformed boost {token!r} in {where}") from None
    if not boost > 0:
        raise ValueError(f"boost must be > 0: {token!r} in {where}")
    return token[:caret], boost


def _classify(token: str, where: str = "query") -> Atom:
    """term / trailing-* prefix / trailing-~N fuzzy, each with an
    optional trailing ^boost (`word^2`, `pre*^1.5`, `word~2^3`)."""
    token, boost = _split_boost(token, where)
    if len(token) > 1 and token.endswith("*"):
        return Atom("prefix", token[:-1], boost=boost)
    tilde = token.rfind("~")
    if tilde > 0:  # at least one char before ~
        suffix = token[tilde + 1:]
        if suffix == "":
            return Atom("fuzzy", token[:tilde], 1, boost)
        if suffix.isdigit():
            return Atom("fuzzy", token[:tilde], max(1, int(suffix)), boost)
    return Atom("term", token, boost=boost)


def _field_filter(name: str, rest: str, negate: bool) -> FieldFilter:
    m = _RANGE_RE.match(rest)
    if m:
        return FieldFilter(name, negate, lo=m.group(1), hi=m.group(2))
    if rest.startswith("["):
        raise ValueError(
            f"malformed range filter {name}:{rest!r} (want [lo TO hi])"
        )
    return FieldFilter(name, negate, value=rest)


def parse_query(query: str) -> BooleanQuery:
    """Parse a boolean query string. Raises ``ValueError`` on unbalanced
    quotes/parens, an empty group, a negated phrase (``-"a b"`` — the
    scan cost of "docs NOT containing a phrase" is a full verify over
    the corpus, deliberately unsupported), or a nested group."""
    bq = BooleanQuery()
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch.isspace():
            i += 1
            continue
        sign = ""
        if ch in "+-":
            sign = ch
            i += 1
            if i >= n or query[i].isspace():
                raise ValueError(f"dangling {sign!r} in query {query!r}")
            ch = query[i]
        if ch == '"':
            end = query.find('"', i + 1)
            if end < 0:
                raise ValueError(f"unbalanced quote in query {query!r}")
            phrase = query[i + 1:end].strip()
            if sign == "-":
                raise ValueError('negated phrases (-"...") are unsupported')
            if not phrase:
                raise ValueError("empty phrase")
            i = end + 1
            slop = 0
            if i < n and query[i] == "~":  # `"a b"~N` proximity slop
                j = i + 1
                while j < n and query[j].isdigit():
                    j += 1
                if j == i + 1:
                    raise ValueError(
                        f"malformed phrase slop in query {query!r}"
                    )
                slop = int(query[i + 1:j])
                i = j
            if slop:
                bq.near.append((phrase, slop))
            else:  # `~0` IS the exact phrase
                bq.phrases.append(phrase)
            continue
        if ch == "(":
            end = query.find(")", i + 1)
            if end < 0:
                raise ValueError(f"unbalanced paren in query {query!r}")
            body = query[i + 1:end]
            if "(" in body or '"' in body:
                raise ValueError("nested groups / phrases in groups unsupported")
            atoms = [
                _classify(t)
                for t in body.split()
                if t.lower() not in _SEPARATORS
            ]
            if not atoms:
                raise ValueError(f"empty group in query {query!r}")
            if sign == "-":
                bq.must_not.extend(atoms)
            elif sign == "+":
                bq.groups.append(atoms)
            else:
                bq.should.extend(atoms)  # bare group = OR = should terms
            i = end + 1
            continue
        # plain word: read to whitespace or a closing paren typo
        j = i
        while j < n and not query[j].isspace() and query[j] not in '()"':
            j += 1
        if j == i:
            # the only way to get here without consuming a char is a
            # stray ')' (quotes and '(' are handled above) — before this
            # check it was an infinite loop, found by the grammar
            # property test
            raise ValueError(f"unbalanced ) in query {query!r}")
        token = query[i:j]
        i = j
        # a field range filter (`ts:[lo TO hi]`) contains spaces — if the
        # token opens a bracket it did not close, keep scanning to `]`
        if _FIELD_RE.match(token) and "[" in token and "]" not in token:
            end = query.find("]", i)
            if end < 0:
                raise ValueError(f"unbalanced [ in query {query!r}")
            token += query[j:end + 1]
            i = end + 1
        if token.lower() in _SEPARATORS:
            if sign:
                raise ValueError(f"{sign}{token} is not a clause")
            continue
        fm = _FIELD_RE.match(token)
        if fm:
            bq.filters.append(
                _field_filter(fm.group(1), fm.group(2), sign == "-")
            )
            continue
        atom = _classify(token, query)
        if sign == "-":
            bq.must_not.append(atom)
        elif sign == "+":
            bq.groups.append([atom])
        else:
            bq.should.append(atom)
    return bq
