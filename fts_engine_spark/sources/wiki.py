"""Wikipedia abstract dump source — the reference's native input format.

Reference: ``LoadDocuments`` (``/root/reference/internal/adapters/loader/
wiki/loader.go:32-78``) streams a gzipped XML feed of ``<doc>`` elements
``{title, url, abstract}``; ``generateID`` (``loader.go:96-100``) derives the
DocID as ``md5(title + "|" + url + "|" + abstract)``.

Spark-side: the built-in XML reader (Spark 4 merged spark-xml) with
``rowTag=doc`` — gzip handled transparently by the Hadoop codecs. The
``parser="regex"`` fallback reads the dump as text split on ``</doc>``
boundaries and extracts fields with JVM regexes (no Python stage) for
environments without the XML data source. The returned frame carries both
the reference DocID (``ref_doc_id``) and the ``(url, text, lang)`` shape the
index build expects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _finish(title: Column, url: Column, abstract: Column, lang: str):
    # a missing/empty element is the empty string, never NULL — the Go
    # loader's fmt.Sprintf("%s|%s|%s") has no NULL notion, and concat_ws
    # would otherwise skip a NULL field and change the DocID
    title = F.coalesce(title, F.lit(""))
    url = F.coalesce(url, F.lit(""))
    abstract = F.coalesce(abstract, F.lit(""))
    return [
        title.alias("title"),
        url.alias("url"),
        abstract.alias("abstract"),
        # generateID (loader.go:96-100): md5(Title|URL|Abstract)
        F.md5(F.concat_ws("|", title, url, abstract)).alias("ref_doc_id"),
        F.concat_ws(" ", title, abstract).alias("text"),
        F.lit(lang).alias("lang"),
    ]


def load_wiki_dump(
    spark: SparkSession, path: str, lang: str = "en", parser: str = "auto"
) -> DataFrame:
    """(title, url, abstract, ref_doc_id, text, lang) from a wiki abstract
    dump (.xml or .xml.gz). ``parser``: 'xml' (built-in data source),
    'regex' (text-split fallback, no XML source needed), or 'auto' (xml,
    falling back to regex if the XML source is unavailable)."""
    if parser not in ("auto", "xml", "regex"):
        raise ValueError(f"unknown parser {parser!r}")
    if parser == "regex":
        return _load_wiki_regex(spark, path, lang)
    try:
        raw = spark.read.format("xml").option("rowTag", "doc").load(path)
    except Exception:
        if parser == "xml":
            raise
        return _load_wiki_regex(spark, path, lang)
    cols = {c.lower(): c for c in raw.columns}
    title = F.col(cols.get("title", "title")).cast("string")
    url = F.col(cols.get("url", "url")).cast("string")
    abstract = F.col(cols.get("abstract", "abstract")).cast("string")
    return raw.select(*_finish(title, url, abstract, lang))


def _xml_unescape(col: Column) -> Column:
    """The five predefined XML entities (&amp; last, as an unescaper must)."""
    for pat, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        col = F.regexp_replace(col, pat, rep)
    return col


def _load_wiki_regex(spark: SparkSession, path: str, lang: str) -> DataFrame:
    """Fallback parser: split the stream on ``</doc>`` (one row per doc
    element, Hadoop codecs still handle .gz) and pull the three fields with
    JVM regexes. Entity-unescapes the standard five; byte parity with the
    XML reader on well-formed abstract dumps is pinned by
    tests/test_wiki_source.py."""
    rows = (
        spark.read.option("lineSep", "</doc>")
        .text(path)
        .where(F.col("value").contains("<title>"))
    )
    field = lambda tag: _xml_unescape(
        F.regexp_extract(F.col("value"), f"(?s)<{tag}>(.*?)</{tag}>", 1)
    )
    return rows.select(*_finish(field("title"), field("url"), field("abstract"), lang))
