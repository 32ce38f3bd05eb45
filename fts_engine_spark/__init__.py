"""PySpark-native full-text search engine (see ARCHITECTURE.md)."""

from .workertune import tune_worker as _tune_worker

# Runs once per process; a no-op everywhere except inside a PySpark
# worker, where it removes two fixed per-task costs (zip-directory
# re-reads in importlib.invalidate_caches, full-heap gc.collect between
# tasks) — see workertune.py for the measurements.
_tune_worker()

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
