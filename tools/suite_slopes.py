"""Per-operator suite scaling slopes: sf0.01 vs sf0.1 (10x input) at one
parallelism (local[8]). Each query: 1 unmeasured warm-up + 3 measured,
median reported. Quantifies how much of each suite row is fixed per-job
cost vs data-proportional work (VERDICT r3 next #8)."""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from fts_engine_spark.session import get_spark

SUITE = [
    "fts_postings_tf", "fts_term_stats", "fts_search_coordinate",
    "fts_search_bm25", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_simhash",
    "ann_cosine_topk", "text_quality", "text_token_counts",
]

spark = get_spark(app_name="suite-slopes", master="local[8]",
                  shuffle_partitions="32")
queries = entry_mod.queries()
out = {}
for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    res = {}
    for name in SUITE:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        res[name] = {"median": round(statistics.median(runs), 3), "trials": runs}
    out[sf_dir] = res
spark.stop()
print(json.dumps(out))
