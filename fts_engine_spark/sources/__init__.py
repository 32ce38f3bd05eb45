"""Input sources: the web-pages table reader (parquet locally, Iceberg
catalog path on a cluster with the runtime jars) and the wiki-dump scan."""

from .pages import PAGES_SCHEMA, PagesSourceError, conform_pages, read_pages, resolve_format
from .wiki import load_wiki_dump

__all__ = [
    "PAGES_SCHEMA",
    "PagesSourceError",
    "conform_pages",
    "read_pages",
    "resolve_format",
    "load_wiki_dump",
]
