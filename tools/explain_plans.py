"""Plan review: print formatted physical plans for the headline paths and
grep them for the properties we require (pushdown, broadcast, partial agg,
whole-stage codegen). Run: python tools/explain_plans.py [index_dir corpus]"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from fts_engine_spark.query import FtsIndex
    from fts_engine_spark.operators import search
    from fts_engine_spark.session import get_spark

    index_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smoke_index"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions="8")

    checks: list[tuple[str, str, list[str]]] = []

    fts = FtsIndex(spark, index_dir)
    posts = fts.postings_for(["turtle", "hotel"])
    p = explain_str(posts)
    checks.append(("postings scan (term gate)", p, ["PushedFilters: [In(term", "Scan parquet"]))

    rel = fts.search_bm25("turtle hotel", k=10, mode="relational")
    p = explain_str(rel)
    checks.append((
        "BM25 relational",
        p,
        ["BroadcastHashJoin", "HashAggregate", "TakeOrderedAndProject"],
    ))

    wand = fts.search_bm25("turtle hotel", k=10, mode="wand")
    p = explain_str(wand)
    checks.append(("BM25 wand", p, ["FlatMapGroupsInPandas", "TakeOrderedAndProject"]))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    direct = search.search_bm25_direct(docs, ["table", "value"], 10)
    p = explain_str(direct)
    checks.append((
        "direct relational search",
        p,
        ["partial_count", "BroadcastHashJoin", "TakeOrderedAndProject"],
    ))

    direct_tokens = search.postings_tf(docs)
    p = explain_str(direct_tokens)
    checks.append(("postings_tf", p, ["HashAggregate", "partial_count", "Batched: true"]))

    failed = 0
    for name, plan, needles in checks:
        print(f"\n{'='*70}\n## {name}\n{'='*70}")
        print(plan[:4000])
        for n in needles:
            ok = n in plan
            print(f"  CHECK {'OK ' if ok else 'FAIL'}: {n!r}")
            failed += 0 if ok else 1
    print(f"\n{failed} plan checks failed")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
