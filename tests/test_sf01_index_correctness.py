"""Index-path correctness at sf0.1 (10x the driver's gate): build the real
sharded compressed index over the sf0.1 documents table and hash-match both
BM25 execution modes against the DuckDB oracle — the scale-up check VERDICT
r1 asked for (the driver only gates at sf0.01)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.1"


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="sf0.1 testdata not present",
)
def test_index_bm25_sf01_matches_oracle(spark):
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle_rows = None
    for name in ("fts_index_bm25_wand", "fts_index_bm25_relational"):
        sdf = entry_mod.queries()[name](spark, SF_DIR)
        got = sorted(
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in sdf.collect()
        )
        if oracle_rows is None:
            res = con.execute(entry_mod.oracle_sql()[name])
            oracle_rows = sorted(
                (int(r[0]), round(float(r[1]), 9)) for r in res.fetchall()
            )
        assert len(got) == len(oracle_rows) == 10, name
        for (gd, gs), (wd, ws) in zip(got, oracle_rows):
            assert gd == wd, name
            assert math.isclose(gs, ws, abs_tol=1e-4), (name, gd, gs, ws)
