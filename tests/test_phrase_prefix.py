"""match_phrase_prefix (ES autocomplete analog): the last token of the
phrase is a dictionary prefix; matches sum phrase counts over its
df-desc/term-asc expansions. Asserted against a pure-Python naive
counter, point tier identical to the distributed path, deterministic
max_expansions truncation, single-token (empty head) autocomplete,
and a no-expansion prefix returning empty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.query import FtsIndex
from fts_engine_spark.textproc.pipeline import get_pipeline

ROWS = [
    (0, "merge sort beats merge select every time"),
    (1, "the merge sequence ends with a merge sort"),
    (2, "sort merge join beats hash join"),
    (3, "merge settings then merge sort and merge sequence"),
    (4, "selection sort is not merge sort"),
    (5, "nothing relevant here at all"),
    (6, "merge"),
    (7, "sequence sort select settings"),
]


@pytest.fixture(scope="module")
def pp_index(spark, tmp_path_factory):
    from fts_engine_spark.build import BuildConfig, build_index

    docs = spark.createDataFrame(
        [(f"doc://{i}", t, "en") for i, t in ROWS],
        "url string, text string, lang string",
    )
    d = str(tmp_path_factory.mktemp("ppix") / "ix")
    build_index(
        spark,
        docs,
        d,
        BuildConfig(
            preset="simple", shard_size=3, id_buckets=4, n_waves=1,
            store_positions=True,
        ),
        resume=False,
    )
    return d


@pytest.fixture(scope="module")
def fts(spark, pp_index):
    return FtsIndex(spark, pp_index).warm().enable_point_serving()


@pytest.fixture(scope="module")
def id_map(fts):
    rows = fts.docs().select("doc_id", "url").collect()
    return {int(r["url"][6:]): r["doc_id"] for r in rows}


def _naive(phrase_head, prefix, max_exp, id_map):
    """Pure-Python match_phrase_prefix over the analyzed corpus."""
    pipe = get_pipeline("simple")
    toks = {i: pipe.process(t) for i, t in ROWS}
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    exps = sorted(
        (t for t in df if t.startswith(prefix)),
        key=lambda t: (-df[t], t),
    )[:max_exp]
    fixed = pipe.process(phrase_head) if phrase_head else []
    out: dict[int, int] = {}
    for i, ts in toks.items():
        n = 0
        L = len(fixed)
        for s in range(len(ts) - L):
            if ts[s : s + L] == fixed and ts[s + L] in set(exps):
                n += 1
        if n:
            out[id_map[i]] = n
    return out


def _by_doc(rows):
    return {int(r["doc_id"]): int(r["phrase_count"]) for r in rows}


@pytest.mark.parametrize("max_exp", [50, 2, 1])
def test_matches_naive(fts, id_map, max_exp):
    got = _by_doc(
        fts.search_phrase_prefix("merge se", k=0, max_expansions=max_exp)
        .collect()
    )
    assert got == _naive("merge", "se", max_exp, id_map)
    assert got  # non-trivial on this corpus


def test_point_identical(fts):
    for q, me in (("merge se", 50), ("merge se", 1), ("sort", 50)):
        dist = sorted(
            (int(r["doc_id"]), int(r["phrase_count"]))
            for r in fts.search_phrase_prefix(
                q, k=0, max_expansions=me
            ).collect()
        )
        pt = sorted(fts.search_phrase_prefix_point(q, k=0, max_expansions=me))
        assert dist == pt, (q, me)


def test_single_token_autocomplete(fts, id_map):
    """Empty head: counted prefix-term matches (ES degenerate case)."""
    got = _by_doc(fts.search_phrase_prefix("se", k=0).collect())
    assert got == _naive("", "se", 50, id_map)
    assert got


def test_trailing_star_accepted(fts):
    a = sorted(
        (int(r["doc_id"]), int(r["phrase_count"]))
        for r in fts.search_phrase_prefix("merge se*", k=0).collect()
    )
    b = sorted(
        (int(r["doc_id"]), int(r["phrase_count"]))
        for r in fts.search_phrase_prefix("merge se", k=0).collect()
    )
    assert a == b and a


def test_no_expansion_prefix(fts):
    assert fts.search_phrase_prefix("merge zzz", k=0).collect() == []
    assert fts.search_phrase_prefix_point("merge zzz", k=0) == []


def test_topk_order(fts):
    rows = fts.search_phrase_prefix("merge se", k=2).collect()
    assert len(rows) == 2
    counts = [int(r["phrase_count"]) for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_plain_phrase_unchanged(fts, id_map):
    """Regression guard: the variant refactor must not change the
    single-sequence phrase path."""
    got = {
        int(r["doc_id"]): int(r["phrase_count"])
        for r in fts.search_phrase_positional("merge sort", k=0).collect()
    }
    pipe = get_pipeline("simple")
    want = {}
    for i, t in ROWS:
        ts = pipe.process(t)
        n = sum(
            1
            for s in range(len(ts) - 1)
            if ts[s] == "merge" and ts[s + 1] == "sort"
        )
        if n:
            want[id_map[i]] = n
    assert got == want and got
