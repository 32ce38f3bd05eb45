"""North-rule shipping path: the whole job runs via
``spark-submit --py-files dist/fts_engine_spark.zip`` with NO repo on the
PYTHONPATH — proving the package is self-contained and the
jobs/build_and_search.py entry point works end-to-end (build → search)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_roundtrip(small_corpus, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        if not os.path.exists(spark_submit):
            pytest.skip("no spark-submit on PATH")

    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "fts_engine_spark.zip"))
    index_dir = str(tmp_path / "ix")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"

    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "build_and_search.py"),
            "--corpus", small_corpus,
            "--index", index_dir,
            "--query", "turtle hotel",
            "--phrase", "french hotel",
            "--wildcard", "h?tel t*le",
            "--regexp", "/h.tel/ turtle",
            "--significant-terms", "turtle hotel",
            "--facet-stats", "turtle hotel",
            "--boolean", "+french +(hotel OR castle) turtle",
            "--suggest", "hotl frnch",
            "--synonyms", '{"turtle": ["castle"]}',
            "--k", "5",
            "--shard-size", "64",
            "--waves", "2",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    built = json.loads(lines[0])
    assert built["built"]["n_docs"] == 120
    result = json.loads(lines[1])
    assert result["query"] == "turtle hotel"
    assert len(result["results"]) == 5
    # --synonyms switches --query to SynonymQuery-semantics scoring
    assert result["synonyms"] == {"turtle": ["castle"]}
    assert all("score" in r and "url" in r for r in result["results"])
    phr = json.loads(lines[2])
    assert phr["phrase"] == "french hotel"
    assert phr["results"], "phrase must match docs in the synthetic corpus"
    assert all(r["phrase_count"] >= 1 for r in phr["results"])
    wc = json.loads(lines[3])
    assert wc["wildcard"] == "h?tel t*le" and wc["results"]
    rx = json.loads(lines[4])
    assert rx["regexp"] == "/h.tel/ turtle" and rx["results"]
    sig = json.loads(lines[5])
    assert sig["significant_terms"] == "turtle hotel"
    assert sig["results"] and all(
        r["fg_df"] <= r["bg_df"] for r in sig["results"]
    )
    fs = json.loads(lines[6])
    assert fs["facet_stats"] == "turtle hotel"
    (fs_row,) = fs["results"]
    assert fs_row["n_docs"] > 0 and fs_row["min_v"] <= fs_row["max_v"]
    boo = json.loads(lines[7])
    assert boo["boolean"].startswith("+french") and boo["results"]
    sug = json.loads(lines[8])
    assert sug["suggest"] == "hotl frnch"
    assert {r["suggestion"] for r in sug["results"]} & {"hotel", "french"}
    assert os.path.exists(os.path.join(index_dir, "meta.json"))
