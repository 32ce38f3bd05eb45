"""Corpus generator invariants (FIXTURES.md §1): input_hint schema,
determinism, and the per-row byte-identical extraction invariant."""

from __future__ import annotations

import pyarrow.parquet as pq

from fts_engine_spark.extract import extract_text
from tools.gen_corpus import gen_rows


def test_schema_and_determinism(small_corpus):
    t = pq.read_table(small_corpus)
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text", "lang"]
    urls1, _, htmls1, texts1, _ = gen_rows(50)
    urls2, _, htmls2, texts2, _ = gen_rows(50)
    assert urls1 == urls2 and htmls1 == htmls2 and texts1 == texts2


def test_extraction_invariant(small_corpus):
    """text == extract_text(html), byte-for-byte, for every row."""
    t = pq.read_table(small_corpus)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html) == text


def test_corpus_properties(small_corpus):
    t = pq.read_table(small_corpus).to_pydict()
    langs = set(t["lang"])
    assert langs <= {"en", "ru"} and "en" in langs and "ru" in langs
    assert len(set(t["url"])) == len(t["url"])  # unique urls
    # head-term skew present
    turtle_docs = sum("turtle" in x for x in t["text"])
    assert turtle_docs > len(t["text"]) * 0.35
    # script stripped from html during extraction
    assert not any("tracker" in x for x in t["text"])
