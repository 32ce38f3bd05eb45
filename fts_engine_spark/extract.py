"""HTML → text extraction and text cleaning (the per-row invariant).

``clean_text`` is byte-identical to the reference's ``utils.Clean``
(``/root/reference/internal/utils/clean.go:8-16``):

    1. collapse runs of ``\\n`` to a single space,
    2. strip every rune outside Unicode classes L / N / P / Z,
    3. trim leading/trailing whitespace (Go ``strings.TrimSpace``).

``extract_text`` parses the stored ``html:binary`` column back to the page
text: strip ``<script>``/``<style>`` blocks, drop tags, unescape entities,
then ``clean_text``. The corpus generator (``tools/gen_corpus.py``) renders
``text`` into HTML such that ``extract_text(html) == clean_text(text)``
byte-for-byte — the invariant pinned by ``tests/test_extract.py``.

The reference's own HTML handling is the Wikipedia API's ``explaintext``
fetch + ``Clean`` (``internal/adapters/loader/wiki/loader.go:119-161``); the
tag-stripping step here replaces the API's server-side extraction, which is
out of scope for a batch engine (SURVEY.md §2.1 S4).
"""

from __future__ import annotations

import html as _htmllib

import regex as _re

_NEWLINES_RE = _re.compile(r"\n+")
# Go \p{N} = all number categories (Nd, Nl, No); \p{P} punctuation;
# \p{Z} separators. RE2 and the Python `regex` module agree on these classes.
_DISALLOWED_RE = _re.compile(r"[^\p{L}\p{N}\p{P}\p{Z}]")

_SCRIPT_STYLE_RE = _re.compile(
    r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
)
_TAG_RE = _re.compile(r"(?s)<[^>]+>")
# Go strings.TrimSpace trims unicode.IsSpace = the White_Space property.
# Python str.strip() additionally strips U+001C..U+001F, but those are Cc and
# already removed by _DISALLOWED_RE, so explicit escapes keep this exact.
_GO_SPACE = (
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def clean_text(text: str) -> str:
    """Byte-identical port of ``utils.Clean`` (``clean.go:8-16``)."""
    text = _NEWLINES_RE.sub(" ", text)
    text = _DISALLOWED_RE.sub("", text)
    return text.strip(_GO_SPACE)


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Extract visible text from an HTML byte blob, then ``clean_text``.

    Block-level tags become a space separator so adjacent words don't fuse;
    entity references are unescaped before cleaning.
    """
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    raw = _SCRIPT_STYLE_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmllib.unescape(raw)
    return clean_text(raw)
