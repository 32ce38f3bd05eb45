"""Boolean query-string parser (Lucene-lite).

Grammar (whitespace-separated clauses, one line):

    query   := clause+
    clause  := ['+' | '-'] atom
    atom    := group | phrase | word
    group   := '(' word (['OR'] word)* ')'
    phrase  := '"' word+ '"'
    word    := text['*']          -- trailing * = prefix pattern
             | text'~'[digits]    -- trailing ~[N] = fuzzy pattern (default 1)

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
* prefix/fuzzy words expand against the index dictionary at search
  time; inside a ``+`` clause the whole expansion is ONE required group
  ("at least one word with this prefix"), matching ``term LIKE 'p%'``.

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

from dataclasses import dataclass, field

__all__ = ["Atom", "BooleanQuery", "parse_query"]

_SEPARATORS = {"or", "and", "||", "&&"}


@dataclass(frozen=True)
class Atom:
    """One query word: exact term, prefix pattern, or fuzzy pattern."""

    kind: str  # 'term' | 'prefix' | 'fuzzy'
    text: str  # raw text, pre-normalization (no trailing * / ~N)
    max_dist: int = 1  # fuzzy only


@dataclass
class BooleanQuery:
    should: list[Atom] = field(default_factory=list)
    groups: list[list[Atom]] = field(default_factory=list)  # required, OR within
    must_not: list[Atom] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)  # required, raw text

    def is_empty(self) -> bool:
        return not (self.should or self.groups or self.must_not or self.phrases)


def _classify(token: str) -> Atom:
    """term / trailing-* prefix / trailing-~N fuzzy."""
    if len(token) > 1 and token.endswith("*"):
        return Atom("prefix", token[:-1])
    tilde = token.rfind("~")
    if tilde > 0:  # at least one char before ~
        suffix = token[tilde + 1:]
        if suffix == "":
            return Atom("fuzzy", token[:tilde], 1)
        if suffix.isdigit():
            return Atom("fuzzy", token[:tilde], max(1, int(suffix)))
    return Atom("term", token)


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
            bq.phrases.append(phrase)
            i = end + 1
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
        token = query[i:j]
        i = j
        if token.lower() in _SEPARATORS:
            if sign:
                raise ValueError(f"{sign}{token} is not a clause")
            continue
        atom = _classify(token)
        if sign == "-":
            bq.must_not.append(atom)
        elif sign == "+":
            bq.groups.append([atom])
        else:
            bq.should.append(atom)
    return bq
