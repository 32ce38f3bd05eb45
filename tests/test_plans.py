"""Plan-regression tests: the physical properties that make these operators
scale are asserted, not assumed (SURVEY.md §4: what Catalyst must deliver)."""

from __future__ import annotations

import pytest

from fts_engine_spark.operators import dedup, search, similarity
from fts_engine_spark.plans.review import assert_plan, assert_plan_absent
from fts_engine_spark.query import FtsIndex


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_postings_scan_pushdown(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    posts = fts.postings_for(["turtle", "hotel"])
    # the term-gate predicate must reach the parquet scan
    assert_plan(posts, "PushedFilters: [In(term", "Scan parquet")


def test_relational_search_shape(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.search_bm25("turtle hotel", k=10, mode="relational")
    # r6: query stats ride the decode kernel closure — the per-query plan
    # has NO join at all (each BroadcastExchange cost ~250-300 ms of
    # fixed serving latency), just scan -> decode -> aggregate -> top-k
    assert_plan(df, "MapInPandas", "TakeOrderedAndProject", "HashAggregate")
    assert_plan_absent(
        df, "SortMergeJoin", "CartesianProduct", "BroadcastExchange"
    )


def test_wand_shape(spark, small_index):
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.search_bm25("turtle hotel", k=10, mode="wand")
    assert_plan(df, "FlatMapGroupsInPandas", "TakeOrderedAndProject")


def test_direct_search_partial_agg(spark, docs):
    df = search.postings_tf(docs)
    # map-side combine before the exchange; batched columnar scan
    assert_plan(df, "partial_count", "Batched: true")


def test_direct_bm25_broadcasts(spark, docs):
    df = search.search_bm25_direct(docs, ["table", "value"], 10)
    assert_plan(df, "BroadcastHashJoin", "TakeOrderedAndProject")
    assert_plan_absent(df, "CartesianProduct")


def test_column_pruning(spark, docs):
    df = search.doc_tokens(docs)
    # only doc_id + text may be read from a 5-column table
    assert_plan(df, "ReadSchema: struct<doc_id:bigint,text:string>")


def test_ann_bruteforce_broadcast(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.ann_bruteforce_topk(emb, [0, 1], 3)
    assert_plan(df, "BroadcastNestedLoopJoin")


def test_exact_dedup_partial_agg(spark, docs):
    df = dedup.exact_dedup(docs)
    assert_plan(df, "partial_min")


def test_ann_lsh_no_cartesian(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.ann_lsh_topk(emb, [0, 1, 2], 3, n_bands=4, band_bits=4)
    # candidate generation must be a (band, sig) hash join, never a cross
    assert_plan_absent(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_srp_signatures_zero_shuffle(spark):
    """Signature computation is a narrow per-row projection (driver-side
    hyperplane literals + posexplode): NO exchange anywhere — the r2 plan
    shuffled n_bits x N rows through a groupBy(id, band)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sig = similarity.srp_band_signatures(emb, n_bands=8, band_bits=4)
    assert_plan_absent(sig, "Exchange", "HashAggregate")


def test_bucket_cap_windows_are_salted(spark):
    """The exact-cap window partitions by (band, sig, _salt), never by bare
    (band, sig) — a hot bucket is pre-thinned by the hash-threshold filter
    and then sorted only in salt-sized slices (VERDICT r2 wrong #4)."""
    import re

    from fts_engine_spark.plans.review import formatted_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sig = similarity.srp_band_signatures(emb, n_bands=2, band_bits=2)
    plan = formatted_plan(similarity._cap_buckets(sig, 8))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, f"no window in cap plan:\n{plan[:2000]}"
    for spec in specs:
        assert "_salt" in spec, f"unsalted window over: {spec}"


def test_ivf_fit_sample_bounds_seeding(spark):
    """With fit_frac < 1 the seeding top-K and Lloyd passes read the
    md5-threshold sample, not the full corpus: the hash filter sits in the
    plan and the seed is a TakeOrdered (no global Sort of all vectors)."""
    from fts_engine_spark.plans.review import formatted_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, 8, 1, fit_frac=0.5)
    plan = formatted_plan(cents)
    assert "conv(substring(md5(" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan


def test_embedding_dedup_lsh_no_cartesian(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = dedup.embedding_cosine_dups_lsh(emb, 0.42, n_bands=4, band_bits=4)
    assert_plan_absent(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_jaccard_lsh_no_shingle_selfjoin(spark, docs):
    df = dedup.ngram_jaccard_pairs_lsh(docs, 3, 0.12)
    # the only self-join keys are (band, band_hash) / (doc_id, shingle):
    # no join keyed by shingle alone (the unbounded hot-shingle explosion)
    assert_plan_absent(df, "CartesianProduct")
    from fts_engine_spark.plans.review import formatted_plan

    plan = formatted_plan(df)
    import re

    for m in re.finditer(r"hashjoin \[([^\]]*)\]", plan, re.I):
        keys = m.group(1)
        if "shingle" in keys:
            assert "b_id" in keys or "doc_id" in keys, (
                f"shingle-only join: {keys}"
            )


def test_postings_parquet_has_term_bloom_filter(spark, small_index):
    """The postings (and terms) files carry a parquet bloom filter on
    `term` — the reference's probabilistic-filter role (SURVEY.md §2.5,
    pkg/filter/bloom.go) at the storage layer."""
    import glob
    import os

    index_dir, _ = small_index
    files = glob.glob(os.path.join(index_dir, "postings", "**", "*.parquet"),
                      recursive=True)
    assert files
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(f"file://{files[0]}")
    footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(conf, path)
    blocks = footer.getBlocks()
    assert blocks.size() > 0
    cols = blocks.get(0).getColumns()
    offsets = {
        str(cols.get(i).getPath()): cols.get(i).getBloomFilterOffset()
        for i in range(cols.size())
    }
    assert offsets.get("[term]", -1) > 0, f"no bloom filter on term: {offsets}"


def test_serving_plans_have_no_broadcast_exchange(spark, small_index):
    """r6 broadcast-tax fix: a BroadcastExchange costs ~250-300 ms of
    fixed per-query latency (driver collect + relation build + torrent
    blocks), so NO serving-path plan may contain one. Query-term
    restriction is an isin predicate on both tiers (string literals live
    in the codegen references array, not the generated source, so the old
    JIT-churn rationale for the semi-join did not apply), and per-term
    stats ride the decode-kernel closure. Warm plans still serve from the
    cache; cold plans still push the isin into the parquet scan."""
    from fts_engine_spark.plans.review import formatted_plan

    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir).warm()
    try:
        mult = {"turtle": 1, "hotel": 1}
        for df in (
            fts._query_postings(mult),
            fts._decoded_with_stats(mult),
            fts._bm25_scored(mult),
            fts.search_bm25("turtle hotel", k=5, mode="relational"),
            fts.search_bm25("turtle hotel", k=5, mode="wand"),
        ):
            plan = formatted_plan(df)
            assert "BroadcastExchange" not in plan, plan
        assert "InMemoryTableScan" in formatted_plan(
            fts._query_postings(mult)
        )  # served from the warmed cache
        # cold mode pushes the isin literals into the parquet scan
        cold = FtsIndex(spark, index_dir)
        cold_plan = formatted_plan(cold._query_postings(mult))
        assert "turtle" in cold_plan
        assert "BroadcastExchange" not in formatted_plan(
            cold.search_bm25("turtle hotel", k=5, mode="wand")
        )
    finally:
        fts._postings_df.unpersist()
        fts._terms_df.unpersist()


def test_tombstones_and_within_keep_wand_plan_shape(
    spark, small_index, tmp_path
):
    """Pending deletes and the `within` restriction filter ride BROADCAST
    VARIABLES into the WAND kernel, not plan nodes: the warm serving plan
    stays literally identical (zero exchanges, no extra joins) with and
    without them — the serving-floor story survives mutations."""
    import re
    import shutil

    from fts_engine_spark.mutate import delete_documents
    from fts_engine_spark.plans.review import formatted_plan

    index_dir, _ = small_index
    work = str(tmp_path / "ix")
    shutil.copytree(index_dir, work)

    def warm_wand_plan(d, **kw):
        fts = FtsIndex(spark, d).warm()
        try:
            df = fts.search_bm25("turtle hotel", k=5, **kw)
            plan = re.sub(r"#\d+L?", "#N", formatted_plan(df))
            return re.sub(r"plan_id=\d+", "plan_id=N", plan)
        finally:
            fts._postings_df.unpersist()
            if fts._terms_df is not None:
                fts._terms_df.unpersist()

    base = warm_wand_plan(work)
    url0 = spark.read.parquet(f"{work}/docs").select("url").first()["url"]
    delete_documents(spark, work, [url0])
    with_dead = warm_wand_plan(work)
    assert with_dead == base
    with_within = warm_wand_plan(work, within=[url0])
    assert with_within == base
    for plan in (base, with_dead, with_within):
        # Zero exchanges in the per-query plan: the only Exchange sits
        # inside the InMemoryRelation subtree (cache population, runs once
        # at warm()), never above the InMemoryTableScan that serves queries.
        tree = plan.split("\n\n", 1)[0]
        above_cache = tree.split("InMemoryRelation", 1)[0]
        assert "Exchange" not in above_cache, tree


def test_boolean_masks_keep_wand_plan_shape(spark, small_index):
    """MUST-group bitmasks travel in the kernel CLOSURE, not the plan:
    a boolean query's warm WAND plan is literally identical to the plain
    OR query's (zero exchanges above the cache scan, no extra joins)."""
    import re

    from fts_engine_spark.plans.review import formatted_plan

    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir).warm()
    try:
        def norm(df):
            plan = re.sub(r"#\d+L?", "#N", formatted_plan(df))
            return re.sub(r"plan_id=\d+", "plan_id=N", plan)

        base = norm(fts.search_bm25("turtle hotel french", k=5))
        boolq = norm(
            fts.search_boolean("+turtle +(hotel OR french)", k=5)
        )
        assert boolq == base
        above_cache = boolq.split("\n\n", 1)[0].split("InMemoryRelation", 1)[0]
        assert "Exchange" not in above_cache, boolq
    finally:
        fts._postings_df.unpersist()
        if fts._terms_df is not None:
            fts._terms_df.unpersist()


def test_build_postings_wave_plan_has_no_jvm_sort(spark, docs):
    """The r3 postings plan ships packed doc rows through ONE exchange into
    the encode kernel — the (shard, term, doc) sort lives inside the kernel
    (numpy lexsort), so the physical plan must contain NO JVM Sort node and
    exactly one shuffle."""
    import re

    from pyspark.sql import functions as F

    from fts_engine_spark.build import (
        BuildConfig,
        _term_tf_col,
        postings_wave_plan,
    )
    from fts_engine_spark.plans.review import formatted_plan

    cfg = BuildConfig(preset="english", shard_size=64, enc_partitions=16)
    web = docs.select(
        "text",
        F.concat(F.lit("u://"), F.col("doc_id").cast("string")).alias("url"),
        "lang",
    )
    ttf = _term_tf_col(cfg)
    tokens = (
        web.withColumn("pairs", ttf(web))
        .withColumn("doc_id", F.monotonically_increasing_id())
        .select(
            (F.col("doc_id") / cfg.shard_size).cast("long").alias("shard_id"),
            "doc_id",
            F.aggregate("pairs", F.lit(0), lambda a, x: a + x["tf"])
            .cast("long")
            .alias("dl"),
            "pairs",
        )
    )
    plan = formatted_plan(postings_wave_plan(spark, tokens, cfg, 0, 8))
    assert not re.search(r"\(\d+\) Sort\b", plan), f"JVM Sort in plan:\n{plan}"
    # formatted explain lists each node once in the tree and once in the
    # details section — count detail headers only
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    # the exchange carries packed doc rows, not exploded postings: the
    # generator (salt sequence) must come BEFORE the exchange and no
    # Generate(explode(pairs)) may exist anywhere
    assert not re.search(r"Generate explode\(pairs", plan), plan


def test_assign_doc_ids_join_path_matches_literal_map(spark, docs, monkeypatch):
    """Dense-id assignment must be identical whether offsets ship as a
    literal map (small bucket counts) or a broadcast-join relation (the
    auto-scaled path for large clusters, where a create_map literal would
    be a 100k+-node expression tree)."""
    from pyspark.sql import functions as F

    import fts_engine_spark.build as B

    web = docs.select(
        F.concat(F.lit("u://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
        "lang",
    ).limit(300)
    lit_df, n1 = B.assign_doc_ids(web, 48)
    lit_ids = {r["url"]: r["doc_id"] for r in lit_df.select("url", "doc_id").collect()}

    monkeypatch.setattr(B, "_OFFSET_MAP_MAX_BUCKETS", 0)
    join_df, n2 = B.assign_doc_ids(web, 48)
    join_ids = {r["url"]: r["doc_id"] for r in join_df.select("url", "doc_id").collect()}

    assert n1 == n2 == 300
    assert lit_ids == join_ids
    assert sorted(lit_ids.values()) == list(range(300))


def test_compaction_tail_scan_is_partition_pruned(spark, small_index):
    """Compaction must read only the delta tail: the shard_id >= P
    predicate is on the partition column, so whole prefix-shard
    directories are pruned at the scan (the full-shard prefix is carried
    by file copy, never decoded)."""
    from fts_engine_spark.streaming.compact import _tail_postings

    index_dir, _ = small_index
    import os

    tail = _tail_postings(spark, os.path.join(index_dir, "postings"), 2)
    assert_plan(tail, "PartitionFilters")
    from fts_engine_spark.plans.review import formatted_plan

    plan = formatted_plan(tail)
    # the partition filter actually carries the shard predicate
    assert "shard_id" in plan.split("PartitionFilters", 1)[1][:200]


def test_match_count_reads_only_doc_blob(spark, small_index):
    """The pre-truncation total (VERDICT r4 wrong #3) decodes doc ids
    only: tf_blob/dl_blob must be PRUNED from the scan — the projection
    sits before mapInPandas, so the count path never re-reads the bytes
    the block-partial WAND kernel skipped."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts._match_count_df({"turtle": 1, "hotel": 1})
    assert_plan(df, "ReadSchema: struct<term:string,doc_blob:binary>")
    assert_plan_absent(df, "tf_blob", "dl_blob")


def test_facet_counts_plan_prunes_blobs_and_docs_columns(spark, small_index):
    """The facet panel rides the same doc-blob-only decode as the count
    path (no tf/dl bytes), and its docs-table scan reads ONLY the key and
    the facet column — at 10^12 docs reading url/url_md5/doclen for a
    two-column join would multiply the scan bytes."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.facet_counts("turtle hotel", facet="lang")
    assert_plan(df, "ReadSchema: struct<term:string,doc_blob:binary>")
    assert_plan(df, "ReadSchema: struct<doc_id:bigint,lang:string>")
    assert_plan_absent(df, "tf_blob", "dl_blob", "url_md5", "doclen")


def test_phrase_verify_pushes_candidate_urls_into_docs_scan(
    spark, docs, tmp_path_factory
):
    """search_phrase's verify must not scan the corpus: with a bounded
    candidate set, the candidate urls are pushed as an In() predicate
    into the parquet scan of the docs table (at 10^12 docs the full text
    scan would BE the query cost)."""
    from pyspark.sql import functions as F

    from fts_engine_spark.build import BuildConfig, build_index

    d = str(tmp_path_factory.mktemp("phrplan") / "ix")
    idx_docs = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    # write as parquet so the verify side is a real file scan with pushdown
    src = str(tmp_path_factory.mktemp("phrplan") / "src.parquet")
    idx_docs.write.parquet(src)
    pdocs = spark.read.parquet(src)
    build_index(
        spark, pdocs.withColumn("lang", F.lit("en")), d,
        BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1),
        resume=False,
    )
    fts = FtsIndex(spark, d)
    out = search.search_phrase(fts, pdocs, "merge sort", k=0)
    assert_plan(out, "PushedFilters: [In(url", "Scan parquet")
    assert out.count() > 0


def test_phrase_verify_falls_back_to_join_over_cap(spark, docs, tmp_path_factory):
    """max_pushdown=0 disables the collect: the verify is the distributed
    semi-join (no url In() pushdown, no driver collect of candidates)."""
    from pyspark.sql import functions as F

    from fts_engine_spark.build import BuildConfig, build_index

    d = str(tmp_path_factory.mktemp("phrplan2") / "ix")
    idx_docs = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    build_index(
        spark, idx_docs.withColumn("lang", F.lit("en")), d,
        BuildConfig(preset="simple", shard_size=64, id_buckets=4, n_waves=1),
        resume=False,
    )
    fts = FtsIndex(spark, d)
    joined = search.search_phrase(fts, idx_docs, "merge sort", k=0, max_pushdown=0)
    pushed = search.search_phrase(fts, idx_docs, "merge sort", k=0)
    a = sorted((r["url"], int(r["phrase_count"])) for r in joined.collect())
    b = sorted((r["url"], int(r["phrase_count"])) for r in pushed.collect())
    assert a == b and a


def test_facet_histogram_plan_prunes_blobs_and_docs_columns(spark, small_index):
    """The histogram facet rides the same doc-blob-only decode as the
    facet panel, and its docs-table scan reads ONLY (doc_id, doclen) —
    the bucketing expression must not widen the scan."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.facet_histogram("turtle hotel", col="doclen", width=50)
    assert_plan(df, "ReadSchema: struct<term:string,doc_blob:binary>")
    assert_plan(df, "ReadSchema: struct<doc_id:bigint,doclen:int>")
    assert_plan_absent(df, "tf_blob", "dl_blob", "url_md5")


def test_boosted_search_docs_scan_reads_key_and_url_only(spark, small_index):
    """search_bm25_boosted resolves boost urls through the docs table:
    that scan must read ONLY (doc_id, url) — hydration columns and doclen
    stay pruned — and the scored side keeps the posting-pruned point
    lookup (In(term) pushdown)."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    boost = spark.createDataFrame([("u1", 2.0)], "url string, boost double")
    df = fts.search_bm25_boosted("turtle hotel", k=10, boost=boost)
    assert_plan(df, "ReadSchema: struct<doc_id:bigint,url:string>")
    assert_plan(df, "PushedFilters: [In(term")
    assert_plan_absent(df, "url_md5", "doclen:")


def test_significant_terms_plan_prunes_tf_dl_blobs(spark, small_index):
    """Both decodes inside significant_terms are doc-blob-only: the
    foreground pass over the WHOLE postings table must never read
    tf_blob/dl_blob — at production blob sizes that projection is the
    difference between scanning ~1/3 of the index and all of it. The
    per-term count must also partial-aggregate (map-side combine) before
    the exchange."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.significant_terms("turtle hotel", k=10, min_fg_df=1)
    assert_plan(df, "ReadSchema: struct<term:string,doc_blob:binary>")
    assert_plan_absent(df, "tf_blob", "dl_blob")
    from fts_engine_spark.plans.review import formatted_plan

    # r6: the foreground count happens inside the decode kernel against
    # the broadcast match-id array; only |distinct terms| partial counts
    # cross the exchange (partial_sum), not per-posting rows
    assert "partial_sum" in formatted_plan(df)


def test_collapse_plan_partial_aggregates(spark, small_index):
    """The per-group argmax is a max_by AGGREGATION: the plan must show
    a partial aggregate before the group exchange (the property that
    makes a skewed group cost one combiner row per partition, where a
    window would sort the whole group on one task) and no window
    operator at all."""
    index_dir, _ = small_index
    fts = FtsIndex(spark, index_dir)
    df = fts.search_bm25_collapsed("turtle hotel", collapse="lang", k=5)
    from fts_engine_spark.plans.review import formatted_plan

    plan = formatted_plan(df)
    assert "partial_max_by" in plan
    assert "Window" not in plan
    # the docs-side scan reads only the key and the collapse column
    assert_plan(df, "ReadSchema: struct<doc_id:bigint,lang:string>")
