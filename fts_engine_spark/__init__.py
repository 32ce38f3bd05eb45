"""PySpark-native full-text search engine (see ARCHITECTURE.md)."""

__version__ = "0.1.0"

__all__ = [
    "engine",
    "build",
    "query",
    "codec",
    "extract",
    "checkpoint",
    "session",
]
