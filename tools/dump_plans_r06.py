"""Dump .explain('formatted') for the query surfaces touched in r6.

Usage: python tools/dump_plans_r06.py <repo_root> <out_dir> <suffix>

Runs against the leftover 30k bench index (the exact serving shape the
bench measures). Measurement/documentation only — not part of the driver
contract.
"""

import os
import sys

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
sys.path.insert(0, REPO)

os.makedirs(OUT, exist_ok=True)

from fts_engine_spark.query import FtsIndex  # noqa: E402
from fts_engine_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"plans-r06-{SUFFIX}", master="local[8]",
    shuffle_partitions="128",
)
INDEX_DIR = "/tmp/fts_bench_index_30000_32"
fts = FtsIndex(spark, INDEX_DIR).warm()
fts_cold = FtsIndex(spark, INDEX_DIR)
q = "french hotel"


def plan_str(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump(name, df):
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(plan_str(df))
    print("dumped", name)


dump("bm25_wand_warm", fts.search_bm25(q, k=10, mode="wand"))
dump("bm25_wand_cold", fts_cold.search_bm25(q, k=10, mode="wand"))
dump("bm25_relational", fts.search_bm25(q, k=10, mode="relational"))
dump("facet_stats", fts.facet_stats(q, col="doclen"))
dump("facet_counts", fts.facet_counts(q, facet="lang"))
dump("collapse", fts.search_bm25_collapsed(q, collapse="lang", k=10))
dump("explain_bm25", fts.explain_bm25(q, k=10))
dump("significant_terms", fts.significant_terms(q, k=20, min_fg_df=3))
dump("decay", fts.search_bm25_decay(q, k=10, field="doclen", origin=40.0,
                                    scale=60.0, decay=0.5))
dump("boosted", fts.search_bm25_boosted(
    q, k=10,
    boost=spark.createDataFrame([("u", 2.0)], "url string, boost double"),
))
dump("phrase_positional", fts_cold.search_phrase_positional(q, k=10))
dump("rescore", fts_cold.search_bm25_rescored(q, q, k=10, n_candidates=100))
docs = spark.read.parquet("/tmp/fts_bench_corpus_30000_s20_60.parquet")
from fts_engine_spark.operators.search import search_phrase  # noqa: E402

dump("search_phrase_verify", search_phrase(fts_cold, docs, q, k=10))
spark.stop()
print("ALL_DUMPED")
