"""Gate-probe micro-bench at many buckets (VERDICT r4 next #6).

The 10^9-term story for the probabilistic term gate is per-RANGE-BUCKET
filters (filters.BucketedTermGate): fit memory is bounded by the largest
bucket, and a probe is one bisect over bucket mins + one filter probe.
This script puts numbers on that story at a vocabulary the sandbox can
hold: fit wall time, snapshot save/load, per-``gate_terms``-call latency
for 4-term queries (the serving path's per-query driver-side cost), and
the gate's total bytes — at several bucket counts. Results go into the
table in BENCH/SERVING.md.

Run: python tools/gate_probe_bench.py [n_terms] (default 2,000,000).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from fts_engine_spark.operators.filters import BucketedTermGate
    from fts_engine_spark.session import get_spark

    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(
        app_name="gate-probe", master="local[8]", shuffle_partitions="16"
    )
    # synthetic vocabulary: md5 hex of the id — uniform in range space,
    # 32 chars each (longer than typical terms: a conservative probe)
    terms_df = spark.range(n_terms).select(
        F.md5(F.col("id").cast("string")).alias("term")
    )
    terms_df.persist().count()

    # probe queries: 4 terms each, half present / half absent
    present = [r["term"] for r in terms_df.limit(2000).collect()]
    absent = [f"absent-{i}" for i in range(2000)]
    queries = [
        [present[2 * i], absent[2 * i], present[2 * i + 1], absent[2 * i + 1]]
        for i in range(1000)
    ]

    rows = []
    for n_buckets in (16, 128, 512):
        t0 = time.monotonic()
        gate = BucketedTermGate.fit_distributed(
            terms_df, kind="cuckoo", n_buckets=n_buckets
        )
        fit_s = time.monotonic() - t0

        snap = f"/tmp/gate_probe_snap_{n_buckets}"
        shutil.rmtree(snap, ignore_errors=True)
        t0 = time.monotonic()
        gate.save(snap)
        save_s = time.monotonic() - t0
        t0 = time.monotonic()
        loaded = BucketedTermGate.load(snap)
        load_s = time.monotonic() - t0
        shutil.rmtree(snap, ignore_errors=True)

        lat_us = []
        for q in queries:  # warm pass folded in: first call differs by ns
            t0 = time.perf_counter()
            kept = [t for t in q if t in loaded]
            lat_us.append((time.perf_counter() - t0) * 1e6)
            assert len(kept) >= 2  # both present terms must pass
        lat_us.sort()
        rows.append(
            {
                "n_buckets": gate.n_buckets,
                "fit_s": round(fit_s, 2),
                "save_s": round(save_s, 3),
                "load_s": round(load_s, 3),
                "gate_mib": round(gate.nbytes / (1 << 20), 2),
                "probe_p50_us": round(statistics.median(lat_us), 1),
                "probe_p99_us": round(lat_us[int(0.99 * len(lat_us))], 1),
            }
        )
        print(json.dumps(rows[-1]))
    spark.stop()
    print(json.dumps({"n_terms": n_terms, "rows": rows}))


if __name__ == "__main__":
    main()
