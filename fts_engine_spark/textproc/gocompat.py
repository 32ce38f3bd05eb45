"""Go-compatible primitives for byte-identical text processing.

The reference pipeline (``/root/reference/pkg/textproc/pipeline.go``) relies on
Go stdlib semantics that differ subtly from Python defaults. Each helper here
pins the Go behavior:

- ``go_lower``       — ``strings.ToLower`` (simple per-rune Unicode lowercase,
                       no Final_Sigma context rule, U+0130 'İ' -> 'i').
- ``utf8_len``       — Go ``len(string)`` is BYTE length
                       (``pipeline.go:109`` min-length check).
- ``is_numeric_token`` — ``strconv.ParseUint(tok, 10, 64)`` success
                       (``pipeline.go:302-308``): ASCII digits only, no sign,
                       value <= 2^64-1.
- ``token_script``   — ``tokenScript`` (``pipeline.go:268-300``): Latin /
                       Cyrillic / Mixed / Unknown via Unicode script classes,
                       short-circuiting to Mixed.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import regex as _re

_UINT64_MAX = 2**64 - 1

# Python str.lower() applies two behaviors Go's strings.ToLower does not:
#   * U+0130 'İ' -> 'i' + U+0307 combining dot (full mapping); Go maps to 'i'.
#   * Greek capital sigma gets the contextual Final_Sigma rule; Go always
#     simple-maps Σ (U+03A3) -> σ (U+03C3).
_GO_LOWER_SPECIAL = str.maketrans({"İ": "i", "Σ": "σ"})


def go_lower(s: str) -> str:
    """Go ``strings.ToLower``: simple (non-contextual) Unicode lowercase."""
    if "İ" in s or "Σ" in s:
        s = s.translate(_GO_LOWER_SPECIAL)
    return s.lower()


def utf8_len(s: str) -> int:
    """Go ``len(string)``: number of UTF-8 bytes."""
    return len(s.encode("utf-8"))


def is_numeric_token(token: str) -> bool:
    """Mirror ``strconv.ParseUint(token, 10, 64) == nil``.

    ASCII decimal digits only (no sign, no underscores for base 10), and the
    value must fit in uint64 — a 21-digit string is NOT numeric.
    """
    if not token:
        return False
    if not token.isascii() or not token.isdigit():
        return False
    # token.isdigit() on an ASCII string accepts only 0-9.
    if len(token) > 20:
        return False
    return int(token) <= _UINT64_MAX


SCRIPT_UNKNOWN = 0
SCRIPT_LATIN = 1
SCRIPT_CYRILLIC = 2
SCRIPT_MIXED = 3

_LATIN_RE = _re.compile(r"\p{Latin}")
_CYRILLIC_RE = _re.compile(r"\p{Cyrillic}")


@lru_cache(maxsize=65536)
def _char_script(ch: str) -> int:
    lat = bool(_LATIN_RE.match(ch))
    cyr = bool(_CYRILLIC_RE.match(ch))
    if lat and cyr:  # impossible in practice, but mirror the Go flags
        return SCRIPT_MIXED
    if lat:
        return SCRIPT_LATIN
    if cyr:
        return SCRIPT_CYRILLIC
    return SCRIPT_UNKNOWN


def token_script(token: str) -> int:
    """``tokenScript`` (``pipeline.go:268-300``): short-circuit to Mixed."""
    has_latin = False
    has_cyrillic = False
    for ch in token:
        s = _char_script(ch)
        if s == SCRIPT_LATIN:
            has_latin = True
        elif s == SCRIPT_CYRILLIC:
            has_cyrillic = True
        if has_latin and has_cyrillic:
            return SCRIPT_MIXED
    if has_latin:
        return SCRIPT_LATIN
    if has_cyrillic:
        return SCRIPT_CYRILLIC
    return SCRIPT_UNKNOWN


def nfc(s: str) -> str:
    """Convenience NFC normalization (NOT applied by the reference; exposed
    for callers that need it explicitly)."""
    return unicodedata.normalize("NFC", s)
