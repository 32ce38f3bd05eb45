"""spark-submit job: compact an incrementally-grown index's delta shards.

    spark-submit --py-files dist/fts_engine_spark.zip jobs/compact.py \
        --index /path/to/index [--bloom-ndv N] [--keep-old]

Merges under-filled (delta) shards back to full shards and commits
atomically (see fts_engine_spark/streaming/compact.py). The pointer flip
is atomic; by default the OLD table directories are removed right after
the commit, which breaks readers that resolved their paths before it —
pass --keep-old on deployments with long-lived readers and
garbage-collect superseded *_vN directories after a reader drain.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from fts_engine_spark.build import BuildConfig
from fts_engine_spark.streaming.compact import compact_index


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--bloom-ndv", type=int, default=None)
    ap.add_argument("--keep-old", action="store_true")
    args = ap.parse_args()
    spark = SparkSession.builder.appName("fts-compact").getOrCreate()
    # no --bloom-ndv: compact_index reuses the bloom sizing recorded in
    # the index's meta; an explicit value resizes deliberately
    meta = compact_index(
        spark, args.index, BuildConfig(),
        remove_old=not args.keep_old, bloom_ndv=args.bloom_ndv,
    )
    print(json.dumps({
        "n_docs": meta["n_docs"],
        "n_shards": meta["n_shards"],
        "compactions": meta.get("compactions", 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
