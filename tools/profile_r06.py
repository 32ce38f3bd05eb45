"""Interactive profiling setup for optimization round 6.

Replicates bench.py's session shape (local[32], shuffle_partitions=128,
driver mem) over the leftover 30k bench index, builds a warm ``fts``
handle and a cold ``fts_pos`` handle exactly like the bench does, and
exposes ``t(fn, n)`` / ``plan(df)`` helpers. Run with ``python -i`` in
tmux and drive phases interactively. Measurement-only: nothing here is
part of the driver contract.
"""

import statistics
import time

REPO = "/root/repo"
import sys

sys.path.insert(0, REPO)

import os

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

from fts_engine_spark.query import FtsIndex
from fts_engine_spark.session import get_spark

CPUS = "32"
spark = get_spark(
    app_name="fts-profile-r06",
    master=f"local[{CPUS}]",
    shuffle_partitions=str(4 * int(CPUS)),
)

INDEX_DIR = "/tmp/fts_bench_index_30000_32"
CORPUS = "/tmp/fts_bench_corpus_30000_s20_60.parquet"
SF_DIR = "/root/testdata/sf0.1"

docs = spark.read.parquet(CORPUS)

from tools.gen_corpus import REFERENCE_QUERIES

fts = FtsIndex(spark, INDEX_DIR).warm()
fts_pos = FtsIndex(spark, INDEX_DIR)  # cold handle, like bench 3d3
pg_q = REFERENCE_QUERIES[0]["query"]


def t(fn, n=3, label=None):
    """Median-of-n wall ms for fn() (first call unmeasured warm-up)."""
    if label:
        spark.sparkContext.setJobDescription(label)
    fn()
    lat = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        lat.append((time.monotonic() - t0) * 1000)
    spark.sparkContext.setJobDescription(None)
    med = statistics.median(lat)
    print(f"{label or ''}: median {med:.1f} ms  (all: {[round(x,1) for x in lat]})")
    return med


def plan(df, path=None):
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if path:
        with open(path, "w") as f:
            f.write(s)
    print(s[:4000])
    return s


def warm5(fn_of_q, n=3, label=None):
    """bench-style: median over 3 passes x REFERENCE_QUERIES[:5]."""
    fn_of_q(REFERENCE_QUERIES[0]["query"])  # warm
    lat = []
    if label:
        spark.sparkContext.setJobDescription(label)
    for _ in range(n):
        for qd in REFERENCE_QUERIES[:5]:
            t0 = time.monotonic()
            fn_of_q(qd["query"])
            lat.append((time.monotonic() - t0) * 1000)
    spark.sparkContext.setJobDescription(None)
    med = statistics.median(lat)
    print(f"{label or ''}: median {med:.1f} ms  (min {min(lat):.1f} max {max(lat):.1f})")
    return med


print("ready: spark, fts (warm), fts_pos (cold), docs, pg_q, t(), warm5(), plan()")
