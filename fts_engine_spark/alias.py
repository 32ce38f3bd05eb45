"""Index aliases: a stable name over a swappable index directory.

The Elasticsearch operational pattern the reindex primitive needs to be
usable in production: clients resolve a NAME; an operator rebuilds the
index under a new analyzer/layout (``mutate.reindex``) into a fresh
directory and atomically repoints the name — zero downtime, instant
rollback (the previous target is left intact until explicitly removed).
An extension beyond the reference, whose single in-process engine has no
multi-version serving story (``engine.go``).

The alias is ONE small JSON file (``<name>.alias.json``)::

    {"alias_version": 3, "index_dir": "/data/webidx_v3", "history": [...]}

written with the same temp+fsync+rename primitive every other commit in
this repo uses (:func:`..checkpoint.atomic_write_json`), so a reader
sees either the old pointer or the new one, never a torn file. On an
object store the file maps to a single-key conditional put. A serving
process re-resolves the alias whenever it (re)opens the index — live
handles keep reading the directory they opened, exactly the posture the
meta-pointer versioned tables establish inside one index dir; the alias
is the same idea one level up (whole-index swap instead of per-table).

``reindex_swap`` composes the two primitives into the classic
zero-downtime migration: resolve → reindex into ``<name>_v{N+1}`` →
flip. A crash before the flip leaves the alias untouched — the
half-built new dir is inert, and re-running the swap rebuilds it from
scratch (the build itself is internally resumable, but the swap does
not depend on that); a crash after the flip is just done.
"""

from __future__ import annotations

import json
import os
import time

from .checkpoint import atomic_write_json

ALIAS_SUFFIX = ".alias.json"
# how many superseded targets the alias file remembers (rollback aid;
# the DIRECTORIES are never deleted by this module)
HISTORY_KEEP = 10


class AliasError(RuntimeError):
    """Missing or malformed alias file."""


def _alias_path(alias: str) -> str:
    return alias if alias.endswith(ALIAS_SUFFIX) else alias + ALIAS_SUFFIX


def set_alias(alias: str, index_dir: str) -> dict:
    """Point ``alias`` at ``index_dir`` (atomic create-or-repoint).
    Returns the written alias record. The target must look like an index
    (have a ``meta.json``) so a typo cannot publish an empty dir.

    SINGLE-WRITER precondition: the write itself is atomic (readers see
    the old record or the new one, never a torn file), but the
    read-modify-write of ``alias_version``/``history`` is not a compare-
    and-swap — two operators repointing the SAME alias concurrently can
    both read version N and write N+1, silently losing one repoint.
    Alias mutation must be serialized by the operator (one deploy
    process per alias); on an object store use a conditional put keyed
    on the previous version."""
    if not os.path.isfile(os.path.join(index_dir, "meta.json")):
        raise AliasError(
            f"{index_dir} has no meta.json — not an index directory"
        )
    path = _alias_path(alias)
    prev = None
    version = 1
    if os.path.isfile(path):
        prev = read_alias(alias)
        version = int(prev["alias_version"]) + 1
    history = list(prev.get("history", ())) if prev else []
    if prev and prev["index_dir"] != os.path.abspath(index_dir):
        history = [prev["index_dir"]] + history
    record = {
        "alias_version": version,
        "index_dir": os.path.abspath(index_dir),
        "updated_unix": time.time(),
        "history": history[:HISTORY_KEEP],
    }
    atomic_write_json(path, record)
    return record


def read_alias(alias: str) -> dict:
    path = _alias_path(alias)
    try:
        with open(path) as f:
            record = json.load(f)
    except FileNotFoundError:
        raise AliasError(f"alias file {path} does not exist") from None
    except (OSError, json.JSONDecodeError) as e:
        raise AliasError(f"alias file {path} is unreadable: {e}") from e
    if "index_dir" not in record:
        raise AliasError(f"alias file {path} has no index_dir")
    return record


def resolve_alias(alias: str) -> str:
    """The index directory the alias currently names."""
    return read_alias(alias)["index_dir"]


def reindex_swap(spark, alias: str, cfg, keep_old: bool = True) -> dict:
    """Zero-downtime reindex: rebuild the alias's current index under
    ``cfg`` (from its stored-fields sidecar — :func:`..mutate.reindex`)
    into ``<alias>_v{N+1}`` and atomically repoint the alias. Live
    readers of the old directory are unaffected; new opens resolve the
    new one. ``keep_old=False`` removes the superseded directory AFTER
    the flip — only safe when no reader can still hold it (the same
    drain discipline ``compact_keep_old`` documents) AND when ``cfg``
    writes a stored-fields sidecar: reindex reads the corpus text from
    the OLD index's stored table (the premise is that the source table
    is archived), so deleting the old dir after building a
    ``store_text=False`` target would destroy the only copy of the text
    and permanently end the reindex chain — refused loudly here (the
    ``jobs/mutate.py`` alias-swap CLI enforces the same invariant by
    forcing ``store_text=True``). Returns the new alias record."""
    import shutil

    from .mutate import reindex

    if not keep_old and not getattr(cfg, "store_text", False):
        raise AliasError(
            "reindex_swap(keep_old=False) with store_text=False would "
            "delete the only stored copy of the corpus text (the old "
            "index's stored sidecar is the reindex source); pass "
            "keep_old=True or a BuildConfig with store_text=True"
        )
    record = read_alias(alias)
    old_dir = record["index_dir"]
    base = _alias_path(alias)[: -len(ALIAS_SUFFIX)]
    new_dir = f"{base}_v{int(record['alias_version']) + 1}"
    reindex(spark, old_dir, new_dir, cfg)
    out = set_alias(alias, new_dir)
    if not keep_old:
        shutil.rmtree(old_dir, ignore_errors=True)
        out["history"] = [h for h in out["history"] if h != old_dir]
        atomic_write_json(_alias_path(alias), out)
    return out
