"""spark-submit job: mutate a live index — delete / upsert / merge.

    # tombstone urls (a file with one url per line, or a parquet/csv of urls)
    spark-submit --py-files dist/fts_engine_spark.zip jobs/mutate.py \
        delete --index /path/to/index --urls urls.txt
    spark-submit ... jobs/mutate.py delete --index IX --urls-table urls.parquet

    # upsert re-crawled pages (same (url, text, lang) table as the build)
    spark-submit ... jobs/mutate.py update --index IX --docs recrawl.parquet

    # merge a segment index into a global one
    spark-submit ... jobs/mutate.py merge --index IX --src /path/to/segment \
        [--no-compact]

    # rebuild under a new config (analyzer preset, shard size, sidecars)
    # from the index's OWN stored-fields sidecar — no source table needed;
    # pending deletes become physical (ES _reindex analog)
    spark-submit ... jobs/mutate.py reindex --index IX --dst /path/new_ix \
        [--preset by_lang] [--shard-size 1000000] [--store-text] \
        [--store-positions]

    # aliases: publish a stable name over a swappable index dir, and the
    # zero-downtime migration (reindex into <name>_v{N+1}, atomic flip;
    # live readers keep the dir they opened)
    spark-submit ... jobs/mutate.py alias-set --name /srv/webidx --target IX
    spark-submit ... jobs/mutate.py alias-swap --name /srv/webidx \
        [--preset by_lang] [--shard-size 1000000] [--rm-old]

    # (re)build the opt-in sidecars without touching the index proper:
    # positional table (index-only phrase) and/or stored fields (snippet
    # text point-reads) — also the way to refresh a sidecar that went
    # stale after appends/compaction
    spark-submit ... jobs/mutate.py retrofit --index IX --docs corpus.parquet \
        [--positions] [--stored]

Deletes tombstone immediately (excluded on every serving path) and purge
physically at the next compaction (jobs/compact.py or --compact here);
see fts_engine_spark/mutate.py for semantics and crash-safety.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from fts_engine_spark.build import BuildConfig
from fts_engine_spark.mutate import (
    delete_documents,
    merge_indexes,
    update_documents,
)
from fts_engine_spark.streaming.compact import compact_index


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("--urls", help="text file, one url per line")
    d.add_argument("--urls-table", help="parquet/csv table with a url column")
    d.add_argument("--compact", action="store_true",
                   help="purge physically right after tombstoning")

    u = sub.add_parser("update")
    u.add_argument("--index", required=True)
    u.add_argument("--docs", required=True,
                   help="parquet table of (url, text, lang) re-crawls")
    u.add_argument("--compact", action="store_true")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True, help="destination (grows)")
    m.add_argument("--src", required=True, help="segment index to merge in")
    m.add_argument("--no-compact", action="store_true")

    x = sub.add_parser("reindex")
    x.add_argument("--index", required=True, help="source (needs stored fields)")
    x.add_argument("--dst", required=True, help="new index dir")
    x.add_argument("--preset", default=None,
                   help="new analyzer preset (default: keep the source's)")
    x.add_argument("--shard-size", type=int, default=None)
    x.add_argument("--store-text", action="store_true")
    x.add_argument("--store-positions", action="store_true")

    al = sub.add_parser("alias-set")
    al.add_argument("--name", required=True, help="alias name/path")
    al.add_argument("--target", required=True, help="index dir to publish")

    aw = sub.add_parser("alias-swap")
    aw.add_argument("--name", required=True, help="alias name/path")
    aw.add_argument("--preset", default=None)
    aw.add_argument("--shard-size", type=int, default=None)
    aw.add_argument("--rm-old", action="store_true",
                    help="remove the superseded index dir after the flip "
                         "(only when no reader can still hold it)")

    r = sub.add_parser("retrofit")
    r.add_argument("--index", required=True)
    r.add_argument("--docs", required=True,
                   help="the exact corpus the index currently holds "
                        "(url, text [, lang])")
    r.add_argument("--positions", action="store_true")
    r.add_argument("--stored", action="store_true")

    args = ap.parse_args()
    spark = SparkSession.builder.appName(f"fts-{args.cmd}").getOrCreate()

    if args.cmd == "delete":
        if bool(args.urls) == bool(args.urls_table):
            ap.error("delete needs exactly one of --urls / --urls-table")
        if args.urls:
            with open(args.urls) as f:
                urls = [line.strip() for line in f if line.strip()]
            out = delete_documents(spark, args.index, urls)
        else:
            fmt = "csv" if args.urls_table.endswith(".csv") else "parquet"
            tbl = (
                spark.read.option("header", "true").csv(args.urls_table)
                if fmt == "csv"
                else spark.read.parquet(args.urls_table)
            )
            out = delete_documents(spark, args.index, tbl)
        if args.compact:
            compact_index(spark, args.index, BuildConfig())
        print(json.dumps(
            {"matched": out["matched"], "n_deleted": out["n_deleted"],
             "compacted": bool(args.compact)}
        ))
    elif args.cmd == "update":
        docs = spark.read.parquet(args.docs)
        out = update_documents(spark, args.index, docs)
        if args.compact:
            compact_index(spark, args.index, BuildConfig())
        print(json.dumps(
            {"replaced": out["replaced"], "compacted": bool(args.compact)}
        ))
    elif args.cmd == "merge":
        meta = merge_indexes(
            spark, args.index, args.src,
            compact_after=not args.no_compact,
        )
        print(json.dumps(
            {"n_docs": meta["n_docs"], "n_shards": meta["n_shards"]}
        ))
    elif args.cmd == "reindex":
        import os

        from fts_engine_spark.mutate import reindex

        with open(os.path.join(args.index, "meta.json")) as f:
            src_meta = json.load(f)
        cfg = BuildConfig(
            preset=args.preset or src_meta["preset"],
            shard_size=args.shard_size or int(src_meta["shard_size"]),
            store_text=args.store_text,
            store_positions=args.store_positions,
            meta_cols=tuple(src_meta.get("meta_cols", ()) or ()),
        )
        meta = reindex(spark, args.index, args.dst, cfg)
        print(json.dumps(
            {"n_docs": meta["n_docs"], "preset": cfg.preset,
             "shard_size": cfg.shard_size}
        ))
    elif args.cmd == "alias-set":
        from fts_engine_spark.alias import set_alias

        rec = set_alias(args.name, args.target)
        print(json.dumps(
            {"alias_version": rec["alias_version"],
             "index_dir": rec["index_dir"]}
        ))
    elif args.cmd == "alias-swap":
        import os

        from fts_engine_spark.alias import reindex_swap, resolve_alias

        cur = resolve_alias(args.name)
        with open(os.path.join(cur, "meta.json")) as f:
            src_meta = json.load(f)
        cfg = BuildConfig(
            preset=args.preset or src_meta["preset"],
            shard_size=args.shard_size or int(src_meta["shard_size"]),
            store_text=True,  # keep the swap chain reindexable
            # inherit the positional sidecar from the source: swapping a
            # positions-bearing index must not silently stop serving
            # phrase queries on the new target (ADVICE r5)
            store_positions=bool(src_meta.get("positions")),
            meta_cols=tuple(src_meta.get("meta_cols", ()) or ()),
        )
        rec = reindex_swap(
            spark, args.name, cfg, keep_old=not args.rm_old
        )
        print(json.dumps(
            {"alias_version": rec["alias_version"],
             "index_dir": rec["index_dir"], "removed_old": args.rm_old}
        ))
    else:
        if not (args.positions or args.stored):
            ap.error("retrofit needs --positions and/or --stored")
        docs = spark.read.parquet(args.docs)
        done = []
        if args.positions:
            from fts_engine_spark.positions import add_positions_to_index

            add_positions_to_index(spark, args.index, docs)
            done.append("positions")
        if args.stored:
            from fts_engine_spark.stored import add_stored_fields

            add_stored_fields(spark, args.index, docs)
            done.append("stored")
        print(json.dumps({"retrofitted": done}))


if __name__ == "__main__":
    main()
