"""Web-pages source — the engine's input-table abstraction.

The north-star input is an Iceberg table of Common-Crawl-style web pages
with columns ``(url string, warc_ts timestamp, html binary, text string,
lang string)``. This sandbox has no Iceberg runtime jars, so the reader is
format-agnostic by construction (SURVEY.md §6 "No Iceberg jars" row):

- a catalog table identifier (``warehouse.db.pages``) or an explicit
  ``fmt='iceberg'`` goes through the DataSource-v2 catalog path
  (``spark.read.table`` / ``spark.read.format('iceberg').load``) — the
  exact call a cluster with ``iceberg-spark-runtime`` on the classpath
  executes; locally it fails with a clear actionable error (tested for
  syntax, not execution);
- a filesystem path reads parquet (the local layout mirrors Iceberg's
  data files, so everything downstream — pushdown, partition pruning,
  the build DAG — is identical).

Either way the result is conformed to the canonical page schema and the
per-row invariant is enforced: ``text`` is **defined as**
``extract_text(html)`` (byte-identical to the reference Go pipeline,
``internal/extractor/extractor.go``), so rows missing ``text`` get it
derived from ``html`` via the vectorized Arrow UDF, never a different
extractor. Catalyst sees a plain relation: filters on ``url``/``lang``/
``warc_ts`` push down into the scan in both formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.udfs import extract_text_udf

#: Canonical page-table schema (BASELINE.json input_hint).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


class PagesSourceError(ValueError):
    """Raised when the pages table cannot be read or lacks required
    columns."""


def resolve_format(location: str, fmt: str | None = None) -> str:
    """'iceberg' | 'parquet' for ``location``.

    Explicit ``fmt`` wins. Otherwise a dotted identifier with no path
    separator (``catalog.db.table``) is a catalog table (iceberg path);
    anything that looks like a filesystem/object-store path is parquet.
    """
    if fmt is not None:
        if fmt not in ("iceberg", "parquet"):
            raise PagesSourceError(f"unknown pages format {fmt!r}")
        return fmt
    if "://" in location:  # s3a://..., hdfs://..., file://...
        return "parquet"
    if "/" not in location and "." in location:
        return "iceberg"
    return "parquet"


def read_pages(
    spark: SparkSession,
    location: str,
    fmt: str | None = None,
    default_lang: str = "en",
) -> DataFrame:
    """Read the web-pages input table and conform it to ``PAGES_SCHEMA``.

    ``location`` is a parquet path or an Iceberg catalog identifier (see
    ``resolve_format``). Missing optional columns are added as nulls
    (``warc_ts``/``html``) or defaults (``lang`` ← ``default_lang``);
    ``text`` is backfilled from ``html`` where null. ``url`` is required.
    """
    resolved = resolve_format(location, fmt)
    if resolved == "iceberg":
        try:
            if "/" in location:
                raw = spark.read.format("iceberg").load(location)
            else:
                raw = spark.read.table(location)
        except Exception as exc:  # jars absent, catalog unconfigured, ...
            raise PagesSourceError(
                f"cannot read Iceberg pages table {location!r}: {exc}. "
                "An Iceberg source needs iceberg-spark-runtime on the "
                "classpath and a configured catalog "
                "(spark.sql.catalog.<name>); on a jar-less environment "
                "pass a parquet path instead."
            ) from exc
    else:
        raw = spark.read.parquet(location)
    return conform_pages(raw, default_lang=default_lang)


def conform_pages(raw: DataFrame, default_lang: str = "en") -> DataFrame:
    """Project ``raw`` onto the canonical page schema (case-insensitive
    column match, casts, null backfills). The ``text``-from-``html``
    backfill runs the SAME Arrow extract UDF the build uses, preserving
    the byte-identical invariant; when every ``text`` is already present
    Catalyst prunes ``html`` out of the scan entirely."""
    by_lower = {c.lower(): c for c in raw.columns}
    if "url" not in by_lower:
        raise PagesSourceError(
            f"pages table has no 'url' column (found {raw.columns})"
        )

    def _col(name: str, dtype: str):
        if name in by_lower:
            return F.col(by_lower[name]).cast(dtype)
        return F.lit(None).cast(dtype)

    url = _col("url", "string")
    warc_ts = _col("warc_ts", "timestamp")
    html = _col("html", "binary")
    lang = _col("lang", "string")
    if "lang" in by_lower:
        lang = F.coalesce(lang, F.lit(default_lang))
    else:
        lang = F.lit(default_lang)

    if "text" in by_lower and "html" in by_lower:
        text = F.coalesce(
            F.col(by_lower["text"]).cast("string"), extract_text_udf(html)
        )
    elif "text" in by_lower:
        text = F.col(by_lower["text"]).cast("string")
    elif "html" in by_lower:
        text = extract_text_udf(html)
    else:
        raise PagesSourceError(
            "pages table needs a 'text' or 'html' column to index "
            f"(found {raw.columns})"
        )

    return raw.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
