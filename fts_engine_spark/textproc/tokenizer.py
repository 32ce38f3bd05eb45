"""Rune-class tokenizer, byte-identical to the reference.

Reference: ``AlnumTokenizer.Tokenize`` (``/root/reference/pkg/textproc/
tokenizer.go:14-40``): emit maximal runs of runes where
``unicode.IsLetter(r) || unicode.IsDigit(r)``. Go's ``IsLetter`` is Unicode
category L*, ``IsDigit`` is category Nd — i.e. the regex class
``[\\p{L}\\p{Nd}]+`` (note: Nd, not N — 'Ⅷ' (Nl) and '½' (No) are
separators in the reference, so they are separators here too).
"""

from __future__ import annotations

import regex as _re

_TOKEN_RE = _re.compile(r"[\p{L}\p{Nd}]+")


def tokenize(text: str) -> list[str]:
    """Split ``text`` into maximal letter/decimal-digit runs."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)
