"""Document deletion: logical tombstones, physically purged at compaction.

The reference engine is append-only (no ``Delete`` anywhere in
``pkg/fts``); a production index over a crawled corpus is not — takedowns,
decontamination lists (see ``operators.curation.decontaminate``) and
re-crawls all need document removal. The design follows the
Lucene/segment-file posture, re-expressed over the repo's sharded layout:

* :func:`delete_documents` resolves urls to doc ids against the docs
  table and appends them to a small ``tombstones`` parquet table,
  committed via the same versioned-dir + meta-pointer flip every other
  mutation uses (:mod:`.layout`) — crash-atomic, idempotent (re-deleting
  is a distinct-union no-op), and O(deletes), never touching postings.
* Every serving path excludes tombstoned doc ids *inside* its pruning
  boundary (the WAND kernels take the set pre-theta via the existing
  ``excl_docs`` mechanism, so top-k truncation can never resurrect a
  deleted doc; relational paths anti-join) — see ``FtsIndex._dead_*``.
* BM25 **stats stay stale until compaction** (df/cf/n_docs/avgdl still
  count deleted docs) — exactly Lucene's semantics for deleted-but-unmerged
  segments. ``compact_index`` applies tombstones physically: affected
  shards are re-encoded without the dead docs (the untouched full-shard
  prefix is still file-copied), doc ids are densely renumbered with the
  same monotone remap compaction already uses, per-term df/cf are
  corrected by the dead docs' exact contributions (an O(tail) pass), and
  avgdl/n_docs are recomputed — after which search results are
  hash-identical to a fresh build of the surviving corpus
  (tests/test_delete.py asserts this).

Scale posture: the tombstone set between compactions rides to executors
as ONE sorted int64 broadcast (8 B/entry — 10M pending deletes = 80 MB,
sent once per executor, not per task). Above
``FtsIndex.dead_broadcast_max`` pending deletes the WAND paths fall back
to the relational plan (anti-join — fully distributed, no driver array)
and the fix is to compact. Deletion volume per epoch is operator-bounded
the same way delta-shard count is.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpoint import Manifest, atomic_write_json
from .layout import next_version_dir, table_path

TOMBSTONES_SCHEMA = "doc_id long, url string"


def read_tombstones(spark: SparkSession, index_dir: str, meta: dict) -> DataFrame | None:
    """The live tombstone table, or None when the index has none."""
    if not meta.get("tombstones_dir"):
        return None
    return spark.read.parquet(table_path(index_dir, meta, "tombstones"))


def delete_documents(
    spark: SparkSession,
    index_dir: str,
    urls: list[str] | DataFrame,
) -> dict:
    """Tombstone every index document whose url is in ``urls``.

    ``urls`` is a list (bounded, pushed into the docs scan as an ``isin``)
    or a DataFrame with a ``url`` column (unbounded — e.g. the output of a
    decontamination sweep; a plain join, so Catalyst/AQE pick the
    strategy). Unknown urls are ignored; re-deleting is a no-op.

    Returns ``{"matched": docs newly+already tombstoned in this url set,
    "n_deleted": total live tombstones, "meta": committed meta}``.

    Commit is the standard versioned-dir + single atomic meta write; a
    crash at any point leaves the previous tombstone table (or none)
    live. Serving handles opened BEFORE the commit keep their snapshot
    (delete-invisible), exactly like every other mutation here; reopen
    ``FtsIndex`` to observe the deletes.
    """
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    from .build import META_VERSION

    if int(meta.get("version", -1)) != META_VERSION:
        from .query import IndexVersionError

        raise IndexVersionError(
            f"index at {index_dir} has meta version {meta.get('version')}, "
            f"this build mutates version {META_VERSION}"
        )

    docs = spark.read.parquet(table_path(index_dir, meta, "docs"))
    if isinstance(urls, DataFrame):
        url_rel = urls.select(F.col("url").cast("string")).distinct()
        matched = docs.join(url_rel, "url", "left_semi")
    else:
        if not urls:
            matched = docs.where(F.lit(False))
        else:
            matched = docs.where(F.col("url").isin(list(urls)))
    matched = matched.select("doc_id", "url")
    n_matched = matched.count()

    prev = read_tombstones(spark, index_dir, meta)
    if n_matched == 0 and prev is not None:
        return {
            "matched": 0,
            "n_deleted": int(meta.get("n_deleted", 0)),
            "meta": meta,
        }
    combined = (
        matched if prev is None else prev.unionByName(matched).distinct()
    )

    new_dir, _, ptr = next_version_dir(index_dir, meta, "tombstones")
    shutil.rmtree(new_dir, ignore_errors=True)
    # tombstones are tiny relative to the index (bounded per epoch);
    # a handful of files is fine and keeps the write distributed
    combined.write.mode("overwrite").parquet(new_dir)
    n_total = spark.read.parquet(new_dir).count()

    old_dir = (
        table_path(index_dir, meta, "tombstones")
        if meta.get("tombstones_dir")
        else None
    )
    meta = dict(meta)
    meta.update(ptr)
    meta["n_deleted"] = int(n_total)
    atomic_write_json(meta_path, meta)
    Manifest(index_dir).mark_done(
        f"delete_{ptr['tombstones_dir']}", {"matched": n_matched, "n_deleted": n_total}
    )
    if old_dir and os.path.abspath(old_dir) != os.path.abspath(new_dir):
        shutil.rmtree(old_dir, ignore_errors=True)
    return {"matched": int(n_matched), "n_deleted": int(n_total), "meta": meta}
