"""Multi-field search (fielded.FieldedIndex): ES multi_match semantics
over per-field sub-indexes — most_fields (Σ weighted per-field BM25)
and best_fields (dis_max + tie_breaker) — asserted score- and
rank-identical to a pure-Python two-field oracle, point tier identical
to the distributed path, and internal doc-id alignment across
sub-indexes (the invariant the combine join relies on)."""

from __future__ import annotations

import pytest

from fts_engine_spark.fielded import FieldedIndex, build_fielded_index
from fts_engine_spark.query import _round6

from .oracle import OracleIndex

# title = a short prefix of the body (token subset: every title match is
# also a body match), plus one doc whose title/body diverge via casing
BODIES = [
    "fast cars fast lane merge ahead",
    "quick cars on the open road today",
    "quick quick quick cars everywhere now",
    "rapid transit cars schedule change",
    "slow roads everywhere this evening",
    "fast quick rapid together benchmark run",
    "unrelated text entirely about turtles",
    "merge sort beats bubble sort always",
    "cars cars cars cars cars dealership",
    "the lane next to the merge point",
]
TITLES = [" ".join(b.split()[:3]) for b in BODIES]


@pytest.fixture(scope="module")
def fielded_dir(spark, tmp_path_factory):
    from fts_engine_spark.build import BuildConfig

    docs = spark.createDataFrame(
        [
            (f"doc://{i}", TITLES[i], BODIES[i], "en")
            for i in range(len(BODIES))
        ],
        "url string, title string, body string, lang string",
    )
    d = str(tmp_path_factory.mktemp("fieldedix") / "ix")
    build_fielded_index(
        spark,
        docs,
        d,
        fields={"title": "title", "body": "body"},
        cfg=BuildConfig(preset="simple", shard_size=4, id_buckets=4, n_waves=1),
        resume=False,
    )
    return d


@pytest.fixture(scope="module")
def fidx(spark, fielded_dir):
    return FieldedIndex(spark, fielded_dir).warm().enable_point_serving()


@pytest.fixture(scope="module")
def id_map(fidx):
    """url -> internal doc_id from the primary sub-index."""
    rows = fidx.indexes["title"].docs().select("doc_id", "url").collect()
    return {r["url"]: r["doc_id"] for r in rows}


@pytest.fixture(scope="module")
def oracles(id_map):
    t, b = OracleIndex(preset="simple"), OracleIndex(preset="simple")
    for i in range(len(BODIES)):
        did = id_map[f"doc://{i}"]
        t.index_document(did, TITLES[i])
        b.index_document(did, BODIES[i])
    return t, b


def _oracle_combine(oracles, query, weights, mode, tie_breaker=0.0, k=10):
    t, b = oracles
    per = [
        (weights.get("title", 1.0), dict(t.search_bm25(query, k=0))),
        (weights.get("body", 1.0), dict(b.search_bm25(query, k=0))),
    ]
    ids = set()
    for _, d in per:
        ids.update(d)
    rows = []
    for did in ids:
        vals = [w * d.get(did, 0.0) for w, d in per]
        if mode == "most_fields":
            s = sum(vals)
        else:
            mx = max(vals)
            s = mx + tie_breaker * (sum(vals) - mx)
        rows.append((did, s))
    rows.sort(key=lambda r: (-_round6(r[1]), r[0]))
    return rows[:k] if k > 0 else rows


def _oracle_cross(oracles, query, weights, tie_breaker, k=10):
    """Term-centric combine from oracle internals: per (doc, term) the
    best field's contribution + tie_breaker * the rest, summed per doc."""
    from fts_engine_spark.query import B, K1, bm25_idf

    t, b = oracles
    fields = [(weights.get("title", 1.0), t), (weights.get("body", 1.0), b)]
    mult = {}
    for tok in t._query_tokens(query):
        mult[tok] = mult.get(tok, 0) + 1
    per_doc = {}
    for tok, m in mult.items():
        contribs = {}
        for fi, (w, o) in enumerate(fields):
            plist = o.postings.get(tok)
            if not plist:
                continue
            idf = bm25_idf(o.n_docs, len(plist))
            for doc, tf in plist.items():
                dl = o.doclen[doc]
                c = (
                    m * idf * tf * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * dl / o.avgdl))
                ) * w
                contribs.setdefault(doc, [0.0, 0.0])[fi] = c
        for doc, vals in contribs.items():
            mx = max(vals)
            per_doc[doc] = per_doc.get(doc, 0.0) + mx + tie_breaker * (
                sum(vals) - mx
            )
    rows = sorted(per_doc.items(), key=lambda r: (-_round6(r[1]), r[0]))
    return rows[:k] if k > 0 else rows


def test_docid_alignment(fidx):
    t = {
        r["url"]: r["doc_id"]
        for r in fidx.indexes["title"].docs().select("doc_id", "url").collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in fidx.indexes["body"].docs().select("doc_id", "url").collect()
    }
    assert t == b and len(t) == len(BODIES)


@pytest.mark.parametrize(
    "mode,tie", [("most_fields", 0.0), ("best_fields", 0.3)]
)
def test_matches_oracle(fidx, oracles, mode, tie):
    w = {"title": 2.0, "body": 1.0}
    got = [
        (r["doc_id"], r["score"])
        for r in fidx.search(
            "fast cars merge", k=10, weights=w, mode=mode, tie_breaker=tie
        ).collect()
    ]
    want = _oracle_combine(oracles, "fast cars merge", w, mode, tie, k=10)
    assert [g[0] for g in got] == [x[0] for x in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_cross_fields_matches_oracle(fidx, oracles):
    w = {"title": 2.0, "body": 1.0}
    got = [
        (r["doc_id"], r["score"])
        for r in fidx.search(
            "fast cars merge", k=10, weights=w, mode="cross_fields",
            tie_breaker=0.2,
        ).collect()
    ]
    want = _oracle_cross(oracles, "fast cars merge", w, 0.2, k=10)
    assert [g[0] for g in got] == [x[0] for x in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)
    # a doc matching ALL terms via its best fields must not be
    # double-counted: cross <= most_fields per doc for tie < 1
    most = dict(
        (r["doc_id"], r["score"])
        for r in fidx.search(
            "fast cars merge", k=0, weights=w, mode="most_fields"
        ).collect()
    )
    for did, s in got:
        assert s <= most[did] + 1e-9


def test_point_tier_identical(fidx):
    w = {"title": 3.0, "body": 1.0}
    for mode, tie in (("most_fields", 0.0), ("best_fields", 0.25),
                      ("cross_fields", 0.2)):
        dist = [
            (r["doc_id"], _round6(r["score"]))
            for r in fidx.search(
                "quick merge", k=10, weights=w, mode=mode, tie_breaker=tie
            ).collect()
        ]
        pt = [
            (d, _round6(s))
            for d, s in fidx.search_point(
                "quick merge", k=10, weights=w, mode=mode, tie_breaker=tie
            )
        ]
        assert dist == pt


def test_zero_title_weight_equals_body_search(fidx):
    """Title tokens are a subset of body tokens, so weights (0, 1) on
    most_fields must reproduce the plain body-field search exactly."""
    got = [
        (r["doc_id"], _round6(r["score"]))
        for r in fidx.search(
            "fast cars", k=0, weights={"title": 0.0, "body": 1.0}
        ).collect()
    ]
    want = [
        (r["doc_id"], _round6(r["score"]))
        for r in fidx.indexes["body"]
        .search_bm25("fast cars", k=0, mode="relational")
        .collect()
    ]
    assert sorted(got) == sorted(want)


def test_title_boost_reranks(fidx, id_map):
    """Under a strong title boost, every title-matching doc must outrank
    every body-only match — the relevance lever the surface exists for."""
    boosted = [
        r["doc_id"]
        for r in fidx.search("cars", k=0, weights={"title": 50.0}).collect()
    ]
    title_hits = {
        id_map[f"doc://{i}"]
        for i in range(len(BODIES))
        if "cars" in TITLES[i].split()
    }
    body_only = {
        id_map[f"doc://{i}"]
        for i in range(len(BODIES))
        if "cars" in BODIES[i].split() and "cars" not in TITLES[i].split()
    }
    assert title_hits and body_only
    ranks = {d: r for r, d in enumerate(boosted)}
    assert max(ranks[d] for d in title_hits) < min(ranks[d] for d in body_only)


def test_k0_returns_all_and_hydrate(fidx, id_map):
    out = fidx.search("cars", k=0, hydrate=True).collect()
    assert {c for c in out[0].asDict()} >= {"doc_id", "url", "score"}
    # every doc whose title or body contains 'cars'
    want = {
        id_map[f"doc://{i}"]
        for i in range(len(BODIES))
        if "cars" in BODIES[i] or "cars" in TITLES[i]
    }
    assert {r["doc_id"] for r in out} == want


def test_empty_and_errors(fidx):
    assert fidx.search("the", k=10).collect() == []  # stopword-only
    assert fidx.search_point("the", k=10) == []
    with pytest.raises(KeyError):
        fidx.search("cars", weights={"nope": 2.0})
    with pytest.raises(ValueError):
        fidx.search("cars", mode="phrase_prefix")
