"""Boolean query strings (queryparse.py + FtsIndex.search_boolean) — the
r5 composition surface: SHOULD words, +MUST groups, -MUST NOT, "phrases",
prefix*/fuzzy~ patterns, all in one Lucene-lite string.

Pins (a) the parser's grammar and error cases, (b) wand == relational ==
an independent referee (pure-OR scores filtered by per-doc matched-term
sets from decoded_postings), (c) the WAND mask pruning stays exact under
top-k (prefix-of-full), (d) group/analyzer edge semantics (OOV required
term -> empty; stopword-only required clause drops; excluded group ->
empty), (e) phrase clauses restrict to the positional match set while
the phrase terms still score.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fts_engine_spark.query import FtsIndex
from fts_engine_spark.queryparse import Atom, parse_query


# ---------------------------------------------------------------- parser


def test_parse_basic_clauses():
    bq = parse_query("french +hotel -turtle castle")
    assert bq.should == [Atom("term", "french"), Atom("term", "castle")]
    assert bq.groups == [[Atom("term", "hotel")]]
    assert bq.must_not == [Atom("term", "turtle")]
    assert bq.phrases == []


def test_parse_group_phrase_patterns():
    bq = parse_query('+(french OR german) -(turtle river) "merge sort" hote* quik~2')
    assert bq.groups == [[Atom("term", "french"), Atom("term", "german")]]
    assert bq.must_not == [Atom("term", "turtle"), Atom("term", "river")]
    assert bq.phrases == ["merge sort"]
    assert bq.should == [Atom("prefix", "hote"), Atom("fuzzy", "quik", 2)]


def test_parse_separators_skipped():
    bq = parse_query("french OR hotel AND castle || turtle && river")
    assert [a.text for a in bq.should] == [
        "french", "hotel", "castle", "turtle", "river"
    ]
    assert not bq.groups and not bq.must_not


def test_parse_fuzzy_default_and_star_edge():
    assert parse_query("a~").should == [Atom("fuzzy", "a", 1)]
    assert parse_query("a~3").should == [Atom("fuzzy", "a", 3)]
    # lone "*" is a term, not an empty prefix
    assert parse_query("*").should == [Atom("term", "*")]
    # non-numeric suffix after ~ stays a plain term
    assert parse_query("a~b").should == [Atom("term", "a~b")]


@pytest.mark.parametrize(
    "bad",
    [
        '"unbalanced',
        "(unbalanced",
        "+()",
        "+",
        "- ",
        '-"a b"',
        "((nested))",
        "+AND",
        ")",  # stray close-paren: was an infinite loop pre-fix
        "foo) bar",
    ],
)
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


# ---------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _meta = small_index
    return FtsIndex(spark, index_dir)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), round(float(r["score"]), 9)) for r in df.collect()
    )


def _norm(fts: FtsIndex, word: str) -> str:
    terms = list(fts._query_mult(word))
    assert len(terms) == 1, (word, terms)
    return terms[0]


def _referee(fts: FtsIndex, should, groups, excl):
    """Pure-OR relational scores over every scoring word, filtered by
    per-doc matched-term sets read independently via decoded_postings —
    no mask machinery involved."""
    words = list(should) + [w for g in groups for w in g]
    base = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in fts.search_bm25(
            " ".join(words), k=0, mode="relational"
        ).collect()
    }
    norm = {w: _norm(fts, w) for w in set(words) | set(excl)}
    matched: dict[int, set[str]] = {}
    for r in (
        fts.decoded_postings(sorted(set(norm.values())))
        .select("term", "doc_id")
        .collect()
    ):
        matched.setdefault(int(r["doc_id"]), set()).add(r["term"])
    out = []
    for d, s in base.items():
        mt = matched.get(d, set())
        if any(norm[w] in mt for w in excl):
            continue
        if all(any(norm[w] in mt for w in g) for g in groups):
            out.append((d, s))
    return sorted(out)


CASES = [
    ("+french +hotel turtle", ["turtle"], [["french"], ["hotel"]], []),
    ("+(french OR german) -turtle", [], [["french", "german"]], ["turtle"]),
    ("castle +(hotel river) -french -german", ["castle"],
     [["hotel", "river"]], ["french", "german"]),
]


@pytest.mark.parametrize("query,should,groups,excl", CASES)
def test_boolean_wand_relational_referee(fts, query, should, groups, excl):
    want = _referee(fts, should, groups, excl)
    assert want, "case must have survivors to be meaningful"
    wand = _rows(fts.search_boolean(query, k=0, mode="wand"))
    rel = _rows(fts.search_boolean(query, k=0, mode="relational"))
    assert wand == want
    assert rel == want
    # the boolean structure actually gated something: pure-OR is larger
    full = _rows(
        fts.search_bm25(
            " ".join(should + [w for g in groups for w in g]),
            k=0,
            mode="wand",
        )
    )
    assert len(wand) < len(full)


def test_boolean_topk_prefix_of_full(fts):
    """Top-k under group masks == first k of the k=0 result — the segment
    mask skip and theta pruning stay exact together."""
    q = "+french +hotel turtle"
    allr = _rows(fts.search_boolean(q, k=0, mode="wand"))
    allr.sort(key=lambda x: (-x[1], x[0]))
    for k in (1, 3, 5):
        top = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in fts.search_boolean(q, k=k, mode="wand").collect()
        ]
        assert top == allr[:k]


def test_boolean_oov_required_term_empty(fts):
    assert fts.search_boolean("+zzzqqqxx hotel", k=0).count() == 0
    assert (
        fts.search_boolean("+zzzqqqxx hotel", k=0, mode="relational").count()
        == 0
    )


def test_boolean_stopword_clause_drops(fts):
    """A required clause the analyzer empties (pure stopword) drops like
    Lucene's; the query degrades to the remaining terms."""
    got = _rows(fts.search_boolean("+the hotel", k=0))
    want = _rows(fts.search_bm25("hotel", k=0, mode="relational"))
    assert got == want


def test_boolean_excluded_group_empty(fts):
    """Excluding every member of a required group makes it unmatchable."""
    assert fts.search_boolean("+french hotel -french", k=0).count() == 0


def test_boolean_pure_negative_empty(fts):
    assert fts.search_boolean("-hotel", k=0).count() == 0


def test_boolean_no_structure_equals_bm25(fts):
    got = _rows(fts.search_boolean("french hotel turtle", k=0))
    want = _rows(fts.search_bm25("french hotel turtle", k=0, mode="wand"))
    assert got == want


def test_boolean_prefix_equals_prefix_search(fts):
    got = _rows(fts.search_boolean("hote* turtle", k=0))
    want = _rows(fts.search_bm25_prefix("hote* turtle", k=0))
    assert got == want


def test_boolean_required_prefix_gates(fts):
    """+pre* = "at least one dictionary expansion of pre* matches"."""
    exp = fts.expand_terms("hote", "prefix")
    assert exp
    base = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in fts.search_bm25_prefix(
            "hote* turtle", k=0, mode="relational"
        ).collect()
    }
    matched = {
        int(r["doc_id"])
        for r in fts.decoded_postings(exp).select("doc_id").collect()
    }
    want = sorted((d, s) for d, s in base.items() if d in matched)
    got = _rows(fts.search_boolean("+hote* turtle", k=0))
    assert got == want
    assert len(got) < len(base)


def test_boolean_required_pattern_no_expansion_empty(fts):
    assert fts.search_boolean("+zzzqqq* hotel", k=0).count() == 0


def test_boolean_hydrate_and_offset(fts):
    out = fts.search_boolean("+french hotel", k=3, hydrate=True, offset=2)
    rows = out.collect()
    assert {"doc_id", "score", "url"} <= set(out.columns)
    allr = _rows(fts.search_boolean("+french hotel", k=0))
    allr.sort(key=lambda x: (-x[1], x[0]))
    assert [(d, s) for d, s, in ((int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows)] == allr[2:5]


def test_boolean_group_cap(fts):
    q = " ".join(f"+qqqword{i}" for i in range(64)) + " hotel"
    with pytest.raises(ValueError, match="required groups"):
        fts.search_boolean(q, k=0)


def test_engine_facade_boolean(spark, small_index):
    from fts_engine_spark.engine import FtsEngine

    index_dir, _meta = small_index
    eng = FtsEngine(spark, index_dir)
    out = eng.search_boolean("+french hotel", k=5)
    assert {"doc_id", "score", "url"} <= set(out.columns)
    rows = out.collect()
    assert rows
    want = _rows(eng.index.search_boolean("+french hotel", k=5))
    assert sorted((int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows) == want


# ------------------------------------------------------------- point tier


POINT_QUERIES = [
    "+french +hotel turtle",
    "+(french OR german) -turtle castle",
    "+hote* turtle",
    "quik~2 +hotel",
    "+zzzqqqxx hotel",
    "-hotel",
]


def test_boolean_point_matches_distributed(spark, small_index):
    """The point tier serves boolean queries in-process with rows exactly
    equal to the distributed surface (same kernel, same masks)."""
    index_dir, _meta = small_index
    fts = FtsIndex(spark, index_dir).enable_point_serving()
    try:
        for q in POINT_QUERIES:
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts.search_boolean(q, k=10).collect()
            ]
            got = fts.search_boolean_point(q, k=10)
            assert got == want, q
            # pagination parity
            assert fts.search_boolean_point(q, k=3, offset=2) == [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts.search_boolean(q, k=3, offset=2).collect()
            ], q
    finally:
        fts.close()


def test_boolean_point_phrase_falls_back(spark, small_index):
    """A phrase clause needs the positional job — the point surface must
    delegate, not crash; on an index without positions that raises the
    documented error either way."""
    from fts_engine_spark.positions import PositionsUnavailableError

    index_dir, _meta = small_index
    fts = FtsIndex(spark, index_dir).enable_point_serving()
    try:
        with pytest.raises(PositionsUnavailableError):
            fts.search_boolean_point('"french hotel"', k=5)
    finally:
        fts.close()


# ------------------------------------------------------------- phrases


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from fts_engine_spark.build import BuildConfig, build_index

    rows = [
        (0, "merge sort is a classic merge sort algorithm", "en"),
        (1, "the merge of the sort", "en"),
        (2, "sort merge join beats hash join", "en"),
        (3, "merge then sorting data", "en"),
        (4, "big merge sort merge sort merge sort run", "en"),
        (5, "nothing relevant here", "en"),
        (6, "merge", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    )
    d = str(tmp_path_factory.mktemp("boolposix") / "ix")
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


def test_boolean_phrase_restricts_and_scores(spark, pos_index):
    fts = FtsIndex(spark, pos_index)
    # phrase-only boolean query: candidates = positional match set,
    # scored over the phrase's terms
    got = fts.search_boolean('"merge sort"', k=0)
    got_ids = {int(r["doc_id"]) for r in got.collect()}
    want_ids = {
        int(r["doc_id"])
        for r in fts.search_phrase_positional("merge sort", k=0).collect()
    }
    assert got_ids == want_ids and got_ids
    # phrase + NOT composes: drop docs containing 'join'
    narrowed = fts.search_boolean('"merge sort" -join', k=0)
    nar_ids = {int(r["doc_id"]) for r in narrowed.collect()}
    joined = {
        int(r["doc_id"])
        for r in fts.decoded_postings(["join"]).select("doc_id").collect()
    }
    assert nar_ids == got_ids - joined
    # scores equal the plain OR scores of the phrase terms on those docs
    base = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in fts.search_bm25(
            "merge sort", k=0, mode="relational"
        ).collect()
    }
    for r in got.collect():
        assert round(float(r["score"]), 9) == base[int(r["doc_id"])]


# --------------------------------------------- boosts + field filters (r5)


def test_parse_boosts():
    bq = parse_query("french^2.5 hote*^1.5 quik~2^3 plain")
    assert bq.should == [
        Atom("term", "french", boost=2.5),
        Atom("prefix", "hote", boost=1.5),
        Atom("fuzzy", "quik", 2, 3.0),
        Atom("term", "plain"),
    ]
    # boosts parse inside required/negated clauses and groups too
    bq2 = parse_query("+castle^2 +(french^0.5 OR german) -turtle")
    assert bq2.groups == [
        [Atom("term", "castle", boost=2.0)],
        [Atom("term", "french", boost=0.5), Atom("term", "german")],
    ]


@pytest.mark.parametrize("bad", ["word^", "word^0", "word^-1", "word^x"])
def test_parse_boost_errors(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_parse_field_filters():
    from fts_engine_spark.queryparse import FieldFilter

    bq = parse_query(
        "turtle lang:en -lang:ru doclen:[5 TO 30] +source:web"
    )
    assert bq.filters == [
        FieldFilter("lang", value="en"),
        FieldFilter("lang", negate=True, value="ru"),
        FieldFilter("doclen", lo="5", hi="30"),
        FieldFilter("source", value="web"),  # '+' is a no-op: required anyway
    ]
    assert [a.text for a in bq.should] == ["turtle"]
    # URL-ish colon tokens stay words (the analyzer splits them later)
    assert parse_query("doc://5").should == [Atom("term", "doc://5")]
    # range keyword is case-insensitive, bracket may contain spaces
    assert parse_query("warc_ts:[2020-01-01 to 2021-01-01]").filters[0].hi == (
        "2021-01-01"
    )


@pytest.mark.parametrize("bad", ["lang:[x]", "ts:[1 TO", "lang:[a TO b TO c]"])
def test_parse_field_filter_errors(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_boost_equals_duplicate_multiplicity(fts):
    """`word^2` must be bit-identical to writing the word twice — both
    are weight 2.0 on the same mult/idf factoring, in every mode."""
    for mode in ("wand", "relational"):
        want = _rows(fts.search_boolean("french french turtle", k=0, mode=mode))
        got = _rows(fts.search_boolean("french^2 turtle", k=0, mode=mode))
        assert got == want and got


def test_boost_reweights_per_term_scores(fts):
    """BM25 is per-term additive, so boosted scores must equal the
    boost-weighted sum of single-term scores."""
    s_fr = {
        int(r["doc_id"]): float(r["score"])
        for r in fts.search_bm25("french", k=0, mode="relational").collect()
    }
    s_tu = {
        int(r["doc_id"]): float(r["score"])
        for r in fts.search_bm25("turtle", k=0, mode="relational").collect()
    }
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in fts.search_boolean("french^2.5 turtle^0.5", k=0).collect()
    }
    want = {}
    for d in set(s_fr) | set(s_tu):
        want[d] = 2.5 * s_fr.get(d, 0.0) + 0.5 * s_tu.get(d, 0.0)
    assert set(got) == set(want)
    for d, s in got.items():
        assert s == pytest.approx(want[d], abs=1e-9), d


def test_field_filter_gates_not_rescores(fts):
    """`lang:en` restricts candidacy via the docs table; surviving docs
    keep their unfiltered scores, in both modes."""
    en_ids = {
        int(r["doc_id"])
        for r in fts.docs().where(F.col("lang") == "en").select("doc_id").collect()
    }
    base = dict(_rows(fts.search_boolean("turtle castle", k=0)))
    for mode in ("wand", "relational"):
        got = _rows(fts.search_boolean("turtle castle lang:en", k=0, mode=mode))
        assert got == sorted(
            (d, s) for d, s in base.items() if d in en_ids
        ), mode
    # negated filter = the complement
    got_not = _rows(fts.search_boolean("turtle castle -lang:en", k=0))
    assert got_not == sorted(
        (d, s) for d, s in base.items() if d not in en_ids
    )


def test_field_range_filter_numeric(fts):
    """doclen:[lo TO hi] casts to the column type — numeric, inclusive
    on both ends, composing with the boolean gates."""
    dlen = {
        int(r["doc_id"]): int(r["doclen"])
        for r in fts.docs().select("doc_id", "doclen").collect()
    }
    lo, hi = 10, 40
    base = dict(_rows(fts.search_boolean("turtle +hotel", k=0)))
    got = _rows(
        fts.search_boolean(f"turtle +hotel doclen:[{lo} TO {hi}]", k=0)
    )
    assert got == sorted(
        (d, s) for d, s in base.items() if lo <= dlen[d] <= hi
    )
    assert got  # the range must actually keep something


def test_field_filter_unknown_field_raises(fts):
    with pytest.raises(ValueError, match="unknown filter field"):
        fts.search_boolean("turtle nosuchfield:x", k=5).collect()


def test_filters_only_query_empty(fts):
    """No scoring clause -> empty, like a pure-negative query (the
    engine ranks; it is not a metadata SELECT)."""
    assert fts.search_boolean("lang:en", k=10).count() == 0


def test_boolean_point_boost_matches_distributed(spark, small_index):
    """Float boosts thread through the point tier's in-process sweep
    bit-identically to the executors' kernel."""
    index_dir, _meta = small_index
    fts2 = FtsIndex(spark, index_dir).enable_point_serving()
    try:
        for q in ("french^2.5 turtle^0.5", "+castle^2 turtle"):
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts2.search_boolean(q, k=10).collect()
            ]
            assert fts2.search_boolean_point(q, k=10) == want, q
        # a field filter resolves ONE _filters_df job on first use, then
        # the include array serves from the per-filter LRU: identical
        # rows, and the repeat schedules ZERO Spark jobs
        for q in (
            "turtle castle lang:en",
            "french^2 turtle -lang:ru doclen:[10 TO 40]",
        ):
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts2.search_boolean(q, k=10).collect()
            ]
            assert fts2.search_boolean_point(q, k=10) == want, q
            tracker = spark.sparkContext.statusTracker()
            before = set(tracker.getJobIdsForGroup(None) or [])
            assert fts2.search_boolean_point(q, k=10) == want, q
            after = set(tracker.getJobIdsForGroup(None) or [])
            assert after == before, f"warm filtered point query ran a job: {q}"
        # a filter matching nothing -> empty, no sweep
        assert fts2.search_boolean_point("turtle lang:xx", k=10) == []
        assert fts2.search_boolean("turtle lang:xx", k=10).count() == 0
    finally:
        fts2.close()


# --------------------------------------------- proximity clauses (r5)


def test_parse_phrase_slop():
    bq = parse_query('"merge sort"~3 other')
    assert bq.near == [("merge sort", 3)] and bq.phrases == []
    assert [a.text for a in bq.should] == ["other"]
    # ~0 IS the exact phrase
    bq0 = parse_query('"merge sort"~0')
    assert bq0.phrases == ["merge sort"] and bq0.near == []
    # slop binds to the closing quote only when digits follow
    with pytest.raises(ValueError, match="slop"):
        parse_query('"merge sort"~')
    with pytest.raises(ValueError, match="negated"):
        parse_query('-"merge sort"~2')


def test_boolean_near_restricts_and_scores(spark, pos_index):
    """A `"a b"~N` clause restricts candidates to the span-near match
    set while its terms score like SHOULD terms (same contract as exact
    phrases)."""
    fts = FtsIndex(spark, pos_index)
    got = fts.search_boolean('"merge algorithm"~4', k=0)
    got_rows = got.collect()
    got_ids = {int(r["doc_id"]) for r in got_rows}
    want_ids = {
        int(r["doc_id"])
        for r in fts.search_near_positional(
            "merge algorithm", 4, k=0
        ).collect()
    }
    assert got_ids == want_ids and got_ids
    base = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in fts.search_bm25(
            "merge algorithm", k=0, mode="relational"
        ).collect()
    }
    for r in got_rows:
        assert round(float(r["score"]), 9) == base[int(r["doc_id"])]
    # the same clause with too small a window matches nothing
    assert fts.search_boolean('"merge algorithm"~0', k=0).count() == 0


def test_boolean_point_phrase_and_near_in_process(spark, pos_index):
    """Phrase and proximity clauses serve on the point tier: rows
    identical to the distributed surface, and warm repeats schedule
    ZERO Spark jobs (the positional point cache resolves the clause
    in-process)."""
    fts = FtsIndex(spark, pos_index).warm().enable_point_serving()
    try:
        queries = (
            '"merge sort"',
            '"merge sort" -join',
            '"merge algorithm"~4',
            '"merge sort"~1 data',
            '+sort "merge algorithm"~1',
        )
        for q in queries:
            want = [
                (int(r["doc_id"]), float(r["score"]))
                for r in fts.search_boolean(q, k=10).collect()
            ]
            assert fts.search_boolean_point(q, k=10) == want, q
            assert want, q  # every case exercises a non-empty result
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        for q in queries:
            fts.search_boolean_point(q, k=10)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert after == before, "warm phrase point query ran a Spark job"
        # a conjunction that provably matches nothing -> [] (both tiers)
        assert fts.search_boolean_point('"merge nothing"', k=10) == []
        assert fts.search_boolean('"merge nothing"', k=10).count() == 0
    finally:
        fts.close()
