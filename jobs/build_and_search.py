"""spark-submit entry point: build the index over a web-page table, then
answer queries — the whole job ships via ``--py-files``.

Usage:
    spark-submit --py-files dist/fts_engine_spark.zip jobs/build_and_search.py \
        --corpus /path/pages.parquet --index /path/index \
        [--query "french hotel"] [--k 10] [--scorer bm25] [--mode wand] \
        [--shard-size 1048576] [--waves 4] [--preset by_lang]

On a cluster the same invocation runs unchanged at N or 4N executors — the
job contains no local[.]-specific logic; parallelism comes entirely from
``--master`` / executor conf.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet with (url, warc_ts, html, text, lang)")
    ap.add_argument("--index", required=True, help="index output directory")
    ap.add_argument("--query", action="append", default=[], help="query (repeatable)")
    ap.add_argument("--k", type=int, default=10)
    # None = "not passed": falls back to --config file values, then to
    # EngineOptions defaults (flag > file > default, the reference's
    # flag/env/default priority, config.go:106-115)
    ap.add_argument("--scorer", default=None, choices=["bm25", "reference"])
    ap.add_argument("--mode", default=None, choices=["wand", "relational"])
    ap.add_argument("--conjunctive", action="store_true",
                    help="AND semantics: only docs containing every query term")
    ap.add_argument("--boolean", action="append", default=[],
                    help="boolean query string: +must, -not, +(a OR b), "
                         '"phrase", pre*, word~N, word^2.5 boost, '
                         "field:value / field:[lo TO hi] metadata filters "
                         "(repeatable)")
    ap.add_argument("--like", action="append", default=[],
                    help="more-like-this source url (repeatable)")
    ap.add_argument("--suggest", action="append", default=[],
                    help="did-you-mean: suggest corrections (repeatable)")
    ap.add_argument("--phrase", action="append", default=[],
                    help="positional phrase query (repeatable; analyzed-"
                         "token-space contiguous match)")
    ap.add_argument("--near", action="append", default=[],
                    metavar="SLOP:PHRASE",
                    help="ordered proximity query (repeatable): terms in "
                         "order within len(terms)+SLOP analyzed tokens, "
                         "e.g. --near '2:french hotel' (requires "
                         "store_positions; equals --phrase at slop 0)")
    ap.add_argument("--wildcard", action="append", default=[],
                    help="wildcard query: tokens may contain * (any run) "
                         "and ? (one char), mid-string/leading included "
                         "(repeatable)")
    ap.add_argument("--regexp", action="append", default=[],
                    help="regexp query: /pattern/ tokens fully match "
                         "the term dictionary (Lucene RegexpQuery; "
                         "repeatable)")
    ap.add_argument("--after", default=None, metavar="SCORE,DOC_ID",
                    help="cursor pagination for each --query: return "
                         "the page strictly after this (score, doc_id) "
                         "boundary — deep paging at page-1 cost")
    ap.add_argument("--collapse", default=None, metavar="COLUMN",
                    help="field collapsing for each --query: best doc "
                         "per COLUMN value, top-k groups")
    ap.add_argument("--significant-terms", default=None, metavar="QUERY",
                    help="print the terms over-represented in QUERY's "
                         "match set vs the corpus (integer lift)")
    ap.add_argument("--facet-stats", default=None, metavar="QUERY",
                    help="print count/min/max/avg/sum of doclen over the "
                         "full match set of QUERY")
    ap.add_argument("--sort-by", default=None, metavar="COLUMN[:asc]",
                    help="field-sorted retrieval for each --query: top-k "
                         "of the match set by this docs column (desc "
                         "default; ':asc' suffix ascending), no scoring")
    ap.add_argument("--facet-cardinality", default=None, metavar="QUERY",
                    help="print the approx (HLL++) distinct-lang count "
                         "over the full match set of QUERY")
    ap.add_argument("--facet-percentiles", default=None, metavar="QUERY",
                    help="print exact doclen percentiles (p25/50/75/95) "
                         "over the full match set of QUERY")
    ap.add_argument("--synonyms", default=None,
                    help='JSON map of query-time synonym groups, e.g. '
                         '\'{"fast": ["quick"]}\' — each --query then '
                         "scores groups with SynonymQuery semantics "
                         "(tf-sum, df-max)")
    ap.add_argument("--preset", default=None)
    ap.add_argument("--shard-size", type=int, default=None)
    ap.add_argument("--waves", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--config", default=None,
                    help="YAML/JSON engine config (reference MustLoad role; "
                         "flags below override file values)")
    ap.add_argument("--extract-html", action="store_true",
                    help="materialize text from the html column first")
    args = ap.parse_args()

    # late imports so --py-files zip resolution happens after Spark setup
    from fts_engine_spark.engine import EngineOptions, FtsEngine
    from fts_engine_spark.functions.udfs import extract_text_udf

    spark = SparkSession.builder.appName("fts-build-and-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.corpus)
    if args.extract_html:
        docs = docs.withColumn("text", extract_text_udf(docs["html"]))

    from dataclasses import replace

    if args.config:
        # file + FTS_SPARK__* env overrides, validated (config.py)
        engine = FtsEngine.from_config(spark, args.config)
        engine.index_dir = args.index
    else:
        engine = FtsEngine(spark, args.index, EngineOptions())
    overrides = {
        k: v
        for k, v in dict(
            preset=args.preset,
            shard_size=args.shard_size,
            n_waves=args.waves,
            scorer=args.scorer,
            mode=args.mode,
        ).items()
        if v is not None
    }
    if overrides:
        engine.options = replace(engine.options, **overrides)
    t0 = time.monotonic()
    meta = engine.index_documents(docs, resume=not args.no_resume)
    build_secs = time.monotonic() - t0
    print(json.dumps({"built": meta, "build_secs": round(build_secs, 2)}))

    syn_map = json.loads(args.synonyms) if args.synonyms else None

    after = None
    if args.after:
        s, d = args.after.split(",")
        after = (float(s), int(d))

    for q in args.query:
        t0 = time.monotonic()
        if args.sort_by is not None:
            col, _, asc = args.sort_by.partition(":")
            rows = engine.search_sorted(
                q, by=col, ascending=asc == "asc", k=args.k
            ).collect()
        elif args.collapse is not None:
            rows = engine.search_collapsed(
                q, collapse=args.collapse, k=args.k
            ).collect()
        elif after is not None:
            rows = engine.search(q, k=args.k, hydrate=True, after=after).collect()
        elif syn_map is not None:
            rows = engine.search_synonyms(q, syn_map, k=args.k).collect()
        elif args.conjunctive:
            rows = engine.index.search_bm25(
                q, k=args.k, mode=engine.options.mode, hydrate=True,
                conjunctive=True,
            ).collect()
        else:
            rows = engine.search(q, k=args.k, hydrate=True).collect()
        ms = (time.monotonic() - t0) * 1000
        out = {
            "query": q,
            "ms": round(ms, 1),
            "results": [
                {k: r[k] for k in r.asDict() if k != "html"} for r in rows
            ],
        }
        if syn_map is not None:
            out["synonyms"] = syn_map
        print(json.dumps(out, default=str))

    for p in args.phrase:
        t0 = time.monotonic()
        rows = engine.search_phrase(docs, p, k=args.k).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "phrase": p,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    for spec in args.near:
        slop_s, _, p = spec.partition(":")
        if not p or not slop_s.isdigit():
            raise SystemExit(f"--near wants SLOP:PHRASE, got {spec!r}")
        t0 = time.monotonic()
        rows = engine.search_near(p, slop=int(slop_s), k=args.k).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "near": p,
            "slop": int(slop_s),
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    for q in args.wildcard:
        t0 = time.monotonic()
        rows = engine.search_wildcard(q, k=args.k).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "wildcard": q,
            "ms": round(ms, 1),
            "results": [
                {k: r[k] for k in r.asDict() if k != "html"} for r in rows
            ],
        }, default=str))

    for q in args.regexp:
        t0 = time.monotonic()
        rows = engine.search_regexp(q, k=args.k).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "regexp": q,
            "ms": round(ms, 1),
            "results": [
                {k: r[k] for k in r.asDict() if k != "html"} for r in rows
            ],
        }, default=str))

    if args.significant_terms:
        t0 = time.monotonic()
        rows = engine.significant_terms(args.significant_terms).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "significant_terms": args.significant_terms,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    if args.facet_stats:
        t0 = time.monotonic()
        rows = engine.facet_stats(args.facet_stats).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "facet_stats": args.facet_stats,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    if args.facet_cardinality:
        t0 = time.monotonic()
        rows = engine.facet_cardinality(args.facet_cardinality).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "facet_cardinality": args.facet_cardinality,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    if args.facet_percentiles:
        t0 = time.monotonic()
        rows = engine.facet_percentiles(args.facet_percentiles).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "facet_percentiles": args.facet_percentiles,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    for q in args.boolean:
        t0 = time.monotonic()
        rows = engine.search_boolean(q, k=args.k).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "boolean": q,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    for u in args.like:
        t0 = time.monotonic()
        rows = engine.more_like_this(url=u, k=args.k, docs=docs).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "like": u,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    for q in args.suggest:
        t0 = time.monotonic()
        rows = engine.suggest(q).collect()
        ms = (time.monotonic() - t0) * 1000
        print(json.dumps({
            "suggest": q,
            "ms": round(ms, 1),
            "results": [r.asDict() for r in rows],
        }, default=str))

    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
