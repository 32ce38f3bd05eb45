"""Tests for clean_text (byte-identical to utils.Clean, clean.go:8-16) and
extract_text (html:binary -> text invariant)."""

from __future__ import annotations

from fts_engine_spark.extract import clean_text, extract_text


def test_clean_newlines_collapsed():
    assert clean_text("a\n\n\nb") == "a b"
    assert clean_text("a\nb\nc") == "a b c"


def test_clean_strips_disallowed_categories():
    # control chars, symbols outside L/N/P/Z removed; punctuation kept
    assert clean_text("a\x00b") == "ab"
    assert clean_text("price: 5€?") == "price: 5?"  # € is Sc (symbol) -> removed
    assert clean_text("math + stuff") == "math  stuff"  # '+' is Sm -> removed
    assert clean_text("hy-phen, dot.") == "hy-phen, dot."


def test_clean_trims():
    assert clean_text("  hello  ") == "hello"
    assert clean_text(" hello　") == "hello"


def test_clean_keeps_all_number_classes():
    # \p{N} includes Nl and No (unlike the tokenizer's Nd)
    assert clean_text("Ⅷ ½ 8") == "Ⅷ ½ 8"


def test_extract_basic_roundtrip():
    html = "<html><head><title>T</title></head><body><p>Hello world</p></body></html>".encode()
    # each stripped tag leaves one space; clean_text does not collapse spaces
    assert extract_text(html) == "T    Hello world"


def test_extract_strips_script_style():
    html = b"<p>keep</p><script>var x = 1;</script><style>.a{}</style><p>this</p>"
    out = extract_text(html)
    assert "var" not in out
    assert "keep" in out and "this" in out


def test_extract_unescapes_entities():
    assert extract_text(b"<p>a&amp;b</p>") == "a&b"


def test_extract_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_extract_equals_clean_of_text():
    # The generator invariant: rendering text into simple HTML and extracting
    # reproduces clean_text(text) byte-for-byte.
    text = "Fast  turtle search. Машины в 1990!"
    html = f"<html><body><p>{text}</p></body></html>".encode()
    assert extract_text(html) == clean_text(text)
