"""Direct (in-process) tests of the block-max WAND kernel, focused on the
block-PARTIAL decode path (VERDICT r3 next #1): a selective query must
decode only the skip blocks whose segments survive the theta test — verified
through the kernel's decoded-blocks/bytes counters — while returning exactly
the brute-force BM25 top-k.

The kernel is a plain function, so these tests run it without Spark; the
``counters`` dict is therefore visible (in executors each worker mutates its
own copy, which is discarded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fts_engine_spark.codec import (
    _block_byte_offsets,
    encode_postings,
    varbyte_encode,
)
from fts_engine_spark.query import B, K1, bm25_idf, make_wand_kernel

SHARD_SIZE = 1 << 20
SKIP = 128


def make_posting_row(term, doc_ids, tfs, dls, mult, df, shard_id=0):
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, base_doc=shard_id * SHARD_SIZE, skip=SKIP)
    return dict(
        term=term,
        shard_id=shard_id,
        count=enc.count,
        tf_sum=int(tfs.sum()),
        doc_blob=enc.doc_blob,
        tf_blob=enc.tf_blob,
        dl_blob=varbyte_encode(dls.astype(np.uint64)),
        skip_last_doc=enc.skip_last_doc.tolist(),
        skip_max_tf=enc.skip_max_tf.tolist(),
        skip_doc_off=enc.skip_doc_off.tolist(),
        skip_tf_off=enc.skip_tf_off.tolist(),
        skip_dl_off=_block_byte_offsets(dls.astype(np.uint64), SKIP).tolist(),
        mult=mult,
        df=df,
    )


def bm25_score(mult, n_docs, df, tf, dl, avgdl):
    idf = bm25_idf(n_docs, df)
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return mult * idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def run_kernel(rows, n_docs, avgdl, k, counters):
    kernel = make_wand_kernel(
        n_docs, SHARD_SIZE, avgdl, k, counters=counters
    )
    out = kernel(None, pd.DataFrame(rows))
    return sorted(
        zip(out["doc_id"].astype(int), out["score"].astype(float)),
        key=lambda r: (-r[1], r[0]),
    )


def test_selective_query_decodes_few_blocks():
    """One head term where only block 0 holds high-tf postings: once the
    heap fills from block 0, every later segment's UB is below theta, so no
    other block of the 157-block list may be decoded."""
    n = 20_000
    doc_ids = np.arange(n)
    tfs = np.ones(n, dtype=np.int64)
    tfs[:SKIP] = 50  # block 0 only
    dls = np.full(n, 100, dtype=np.int64)
    avgdl = 100.0
    row = make_posting_row("common", doc_ids, tfs, dls, mult=1, df=n)

    counters: dict[str, int] = {}
    got = run_kernel([row], n_docs=n, avgdl=avgdl, k=10, counters=counters)

    n_blocks = (n + SKIP - 1) // SKIP
    assert counters["blocks_total"] == n_blocks
    assert counters.get("full_decodes", 0) == 0
    # block 0 always decodes; theta then kills every tf=1 segment
    assert counters["blocks_decoded"] == 1
    blob_bytes = len(row["doc_blob"]) + len(row["tf_blob"]) + len(row["dl_blob"])
    assert counters["bytes_decoded"] < blob_bytes / 50

    # exact result: the 10 lowest doc_ids of block 0 (equal scores,
    # doc_id-asc tie-break)
    expect_score = float(bm25_score(1, n, n, 50, 100, avgdl))
    assert [d for d, _ in got] == list(range(10))
    for _, s in got:
        assert abs(s - expect_score) < 1e-12


def test_partial_decode_matches_bruteforce_multiterm():
    """Two-term query with varied tf/dl: kernel top-k must equal the numpy
    brute-force BM25 ranking exactly, while still decoding fewer blocks
    than the full lists."""
    rng = np.random.default_rng(7)
    n = 12_800  # 100 blocks
    common_docs = np.arange(n)
    common_tfs = rng.integers(1, 4, size=n)
    common_tfs[3 * SKIP : 4 * SKIP] = 60  # one hot block in the middle
    dls = (80 + (common_docs % 40)).astype(np.int64)
    avgdl = float(dls.mean())

    # concentrated in docs [2000, 4000): blocks outside that range hold
    # only low-idf common postings, so theta kills them once the sweep
    # passes the rare region
    rare_docs = np.sort(rng.choice(np.arange(2000, 4000), size=300, replace=False))
    rare_tfs = rng.integers(5, 30, size=300)
    rare_dls = dls[rare_docs]

    rows = [
        make_posting_row("common", common_docs, common_tfs, dls, mult=1, df=n),
        make_posting_row("rare", rare_docs, rare_tfs, rare_dls, mult=2, df=300),
    ]

    counters: dict[str, int] = {}
    k = 15
    got = run_kernel(rows, n_docs=n, avgdl=avgdl, k=k, counters=counters)

    # brute force over the union
    scores = np.zeros(n)
    scores[common_docs] += bm25_score(1, n, n, common_tfs, dls, avgdl)
    scores[rare_docs] += bm25_score(2, n, 300, rare_tfs, rare_dls, avgdl)
    order = np.lexsort((np.arange(n), -scores))
    expect = [(int(d), float(scores[d])) for d in order[:k]]

    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, sg), (_, se) in zip(got, expect):
        assert abs(sg - se) < 1e-9

    # partial decode really happened: common blocks before/inside the rare
    # region may decode (~33 of 100), but everything after doc 4000 must be
    # skipped undecoded
    assert counters["blocks_decoded"] < counters["blocks_total"]
    assert counters["blocks_decoded"] < 60


def test_tiny_list_takes_full_decode_path():
    """Lists of <=2 blocks skip block bookkeeping and full-decode once."""
    n = 150  # 2 blocks
    doc_ids = np.arange(n)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 50, dtype=np.int64)
    row = make_posting_row("tiny", doc_ids, tfs, dls, mult=1, df=n)
    counters: dict[str, int] = {}
    got = run_kernel([row], n_docs=n, avgdl=50.0, k=5, counters=counters)
    assert counters["full_decodes"] == 1
    assert counters["blocks_decoded"] == counters["blocks_total"] == 2
    assert [d for d, _ in got] == list(range(5))


def test_block_partial_equals_full_decode_kernel():
    """The block-partial kernel and a kernel forced down the full-decode
    path (term_stats absent vs... same path, so instead: compare against a
    run where every list is <=2 blocks by re-encoding with a huge skip)
    must produce identical top-k on identical logical postings."""
    rng = np.random.default_rng(42)
    n = 5_000
    docs_a = np.sort(rng.choice(n, size=2_000, replace=False))
    tfs_a = rng.integers(1, 20, size=2_000)
    dl_all = (60 + (np.arange(n) % 30)).astype(np.int64)
    docs_b = np.sort(rng.choice(n, size=400, replace=False))
    tfs_b = rng.integers(1, 40, size=400)
    avgdl = float(dl_all.mean())

    rows = [
        make_posting_row("a", docs_a, tfs_a, dl_all[docs_a], mult=1, df=2_000),
        make_posting_row("b", docs_b, tfs_b, dl_all[docs_b], mult=1, df=400),
    ]
    got = run_kernel(rows, n_docs=n, avgdl=avgdl, k=20, counters={})

    scores = np.zeros(n)
    scores[docs_a] += bm25_score(1, n, 2_000, tfs_a, dl_all[docs_a], avgdl)
    scores[docs_b] += bm25_score(1, n, 400, tfs_b, dl_all[docs_b], avgdl)
    order = np.lexsort((np.arange(n), -scores))
    expect = [int(d) for d in order[:20]]
    assert [d for d, _ in got] == expect


def test_k_zero_returns_all_matches():
    """k<=0 is the reference's 'return all' (engine.go k<=0 semantics):
    the kernel must score and return EVERY matching doc — this crashed
    with an IndexError on an empty heap before r4."""
    n = 1_000
    doc_ids = np.arange(0, n, 2)  # 500 matching docs
    tfs = (1 + (doc_ids % 7)).astype(np.int64)
    dls = np.full(len(doc_ids), 90, dtype=np.int64)
    row = make_posting_row("t", doc_ids, tfs, dls, mult=1, df=len(doc_ids))
    got = run_kernel([row], n_docs=n, avgdl=90.0, k=0, counters={})
    assert len(got) == 500
    expect = bm25_score(1, n, 500, tfs, dls, 90.0)
    by_doc = dict(got)
    for d, e in zip(doc_ids.tolist(), expect.tolist()):
        assert abs(by_doc[d] - e) < 1e-12


def test_batch_kernel_shares_decode_across_queries():
    """Two queries sharing a term: the shared term's blocks decode ONCE
    for the whole batch (caches hold weight-free base scores), and each
    query's results equal its single-query run."""
    from fts_engine_spark.query import make_wand_batch_kernel

    rng = np.random.default_rng(3)
    n = 6_400  # 50 blocks
    docs_c = np.arange(n)
    tfs_c = rng.integers(1, 6, size=n)
    dls = (70 + (docs_c % 20)).astype(np.int64)
    avgdl = float(dls.mean())
    docs_r = np.sort(rng.choice(n, size=200, replace=False))
    tfs_r = rng.integers(3, 20, size=200)

    rows = [
        make_posting_row("shared", docs_c, tfs_c, dls, mult=1, df=n),
        make_posting_row("rare", docs_r, tfs_r, dls[docs_r], mult=1, df=200),
    ]
    per_query = {
        0: {"shared": (1, n), "rare": (1, 200)},
        1: {"shared": (2, n)},  # different multiplicity, same term
    }
    counters: dict[str, int] = {}
    kernel = make_wand_batch_kernel(
        n, SHARD_SIZE, avgdl, 10, per_query, counters=counters
    )
    out = kernel(None, pd.DataFrame(rows))
    # blocks_total counted once per term table, decode shared: decoded
    # blocks cannot exceed the union of both lists' blocks
    assert counters["blocks_decoded"] <= counters["blocks_total"]

    # equality with per-query single kernels
    for qid, stats in per_query.items():
        single_rows = [
            make_posting_row(
                t,
                docs_c if t == "shared" else docs_r,
                tfs_c if t == "shared" else tfs_r,
                dls if t == "shared" else dls[docs_r],
                mult=stats[t][0],
                df=stats[t][1],
            )
            for t in stats
        ]
        single = run_kernel(single_rows, n_docs=n, avgdl=avgdl, k=10, counters={})
        got = sorted(
            (
                (int(r.doc_id), float(r.score))
                for r in out[out["query_id"] == qid].itertuples()
            ),
            key=lambda r: (-r[1], r[0]),
        )
        assert [d for d, _ in got] == [d for d, _ in single]
        for (_, a), (_, b) in zip(got, single):
            assert abs(a - b) < 1e-12


def _make_row_skip(term, doc_ids, tfs, dls, mult, df, skip, shard_id=0):
    """make_posting_row with a custom skip-block size (adversarial block
    geometry for the property test)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, base_doc=shard_id * SHARD_SIZE, skip=skip)
    return dict(
        term=term,
        shard_id=shard_id,
        count=enc.count,
        tf_sum=int(tfs.sum()),
        doc_blob=enc.doc_blob,
        tf_blob=enc.tf_blob,
        dl_blob=varbyte_encode(dls.astype(np.uint64)),
        skip_last_doc=enc.skip_last_doc.tolist(),
        skip_max_tf=enc.skip_max_tf.tolist(),
        skip_doc_off=enc.skip_doc_off.tolist(),
        skip_tf_off=enc.skip_tf_off.tolist(),
        skip_dl_off=_block_byte_offsets(dls.astype(np.uint64), skip).tolist(),
        mult=mult,
        df=df,
    )


def test_wand_sweep_matches_bruteforce_property():
    """Property test (VERDICT r4 next #8): randomized corpora with
    adversarial skip-block sizes (down to 1 posting/block), shard bases,
    duplicate-doc overlaps across terms and every k regime — the sweep
    must always return a valid exact top-k with per-doc scores equal to
    the brute-force BM25 sum."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(10, 400),
        skip=st.sampled_from([1, 2, 3, 5, 16, 128]),
        k=st.sampled_from([0, 1, 3, 10, 999]),
        shard_id=st.integers(0, 3),
        n_terms=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, skip, k, shard_id, n_terms, seed):
        rng = np.random.default_rng(seed)
        base = shard_id * SHARD_SIZE
        dls_all = rng.integers(1, 200, size=n).astype(np.int64)
        avgdl = float(dls_all.mean())
        rows = []
        brute = np.zeros(n)
        matched = np.zeros(n, dtype=bool)
        for ti in range(n_terms):
            m = int(rng.integers(1, n + 1))
            local = np.sort(rng.choice(n, size=m, replace=False))
            tfs = rng.integers(1, 50, size=m).astype(np.int64)
            mult = int(rng.integers(1, 4))
            rows.append(
                _make_row_skip(
                    f"t{ti}", local + base, tfs, dls_all[local],
                    mult=mult, df=m, skip=skip, shard_id=shard_id,
                )
            )
            brute[local] += bm25_score(mult, n, m, tfs, dls_all[local], avgdl)
            matched[local] = True
        counters: dict[str, int] = {}
        kernel = make_wand_kernel(n, SHARD_SIZE, avgdl, k, counters=counters)
        out = kernel(None, pd.DataFrame(rows))
        got = {
            int(d) - base: float(s)
            for d, s in zip(out["doc_id"], out["score"])
        }
        # per-doc score exactness (to float tolerance)
        for d, s in got.items():
            assert abs(s - brute[d]) < 1e-9, (d, s, brute[d])
        n_match = int(matched.sum())
        if k <= 0 or n_match <= k:
            # every matching doc returned
            assert set(got) == set(np.nonzero(matched)[0].tolist())
        else:
            assert len(got) == k
            # a valid top-k: no returned doc scores below the true kth
            # (tolerance covers float-sum order differences at ties)
            kth = np.sort(brute[matched])[::-1][k - 1]
            assert all(brute[d] >= kth - 1e-9 for d in got)

    check()

def test_conjunctive_basic():
    """require_n = n_terms: only docs carrying every term are returned,
    scored identically to the OR run restricted to those docs."""
    n = 2_000
    docs_a = np.arange(0, n, 2)          # evens
    docs_b = np.arange(0, n, 3)          # multiples of 3
    dls = np.full(n, 80, dtype=np.int64)
    tfs_a = (1 + (docs_a % 5)).astype(np.int64)
    tfs_b = (1 + (docs_b % 7)).astype(np.int64)
    avgdl = 80.0
    rows = [
        make_posting_row("a", docs_a, tfs_a, dls[docs_a], mult=1, df=len(docs_a)),
        make_posting_row("b", docs_b, tfs_b, dls[docs_b], mult=1, df=len(docs_b)),
    ]
    kernel = make_wand_kernel(n, SHARD_SIZE, avgdl, 0, counters={}, require_n=2)
    out = kernel(None, pd.DataFrame(rows))
    got = dict(zip(out["doc_id"].astype(int), out["score"].astype(float)))
    expect_docs = set(range(0, n, 6))    # evens ∩ multiples of 3
    assert set(got) == expect_docs
    sa = bm25_score(1, n, len(docs_a), tfs_a, dls[docs_a], avgdl)
    sb = bm25_score(1, n, len(docs_b), tfs_b, dls[docs_b], avgdl)
    by_a = dict(zip(docs_a.tolist(), sa.tolist()))
    by_b = dict(zip(docs_b.tolist(), sb.tolist()))
    for d, s in got.items():
        assert abs(s - (by_a[d] + by_b[d])) < 1e-9


def test_conjunctive_missing_term_in_shard_returns_empty():
    """Postings are doc-sharded, so a query term with no postings in the
    shard rules out every doc there — the kernel must return empty without
    decoding anything."""
    n = 1_000
    docs = np.arange(n)
    dls = np.full(n, 60, dtype=np.int64)
    rows = [
        make_posting_row("present", docs, np.ones(n, dtype=np.int64), dls,
                         mult=1, df=n),
    ]
    counters: dict[str, int] = {}
    kernel = make_wand_kernel(
        n, SHARD_SIZE, 60.0, 10, counters=counters, require_n=2
    )
    out = kernel(None, pd.DataFrame(rows))
    assert len(out) == 0
    assert counters.get("blocks_decoded", 0) == 0


def test_conjunctive_prunes_disjoint_blocks():
    """AND of a head term with a term confined to one doc range: the head
    term's blocks outside that range can never complete a conjunction and
    must not be decoded."""
    n = 20_000                            # 157 blocks of the head term
    head_docs = np.arange(n)
    head_tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 100, dtype=np.int64)
    rare_docs = np.arange(5 * SKIP, 6 * SKIP)   # exactly one head block
    rare_tfs = np.full(len(rare_docs), 4, dtype=np.int64)
    rows = [
        make_posting_row("head", head_docs, head_tfs, dls, mult=1, df=n),
        make_posting_row("rare", rare_docs, rare_tfs, dls[rare_docs],
                         mult=1, df=len(rare_docs)),
    ]
    counters: dict[str, int] = {}
    kernel = make_wand_kernel(
        n, SHARD_SIZE, 100.0, 10, counters=counters, require_n=2
    )
    out = kernel(None, pd.DataFrame(rows))
    assert set(out["doc_id"].astype(int)) <= set(rare_docs.tolist())
    assert len(out) == 10
    # the whole sweep may touch at most the blocks overlapping the rare
    # range (head block 5 + the rare list's own 1-2 blocks)
    assert counters["blocks_decoded"] <= 4


def test_conjunctive_matches_bruteforce_property():
    """Conjunctive sweep vs brute force on randomized corpora: returned
    set must be exactly the docs matched by ALL terms (top-k thereof) with
    OR-identical scores."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(10, 300),
        skip=st.sampled_from([1, 3, 16, 128]),
        k=st.sampled_from([0, 1, 5, 999]),
        n_terms=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, skip, k, n_terms, seed):
        rng = np.random.default_rng(seed)
        dls_all = rng.integers(1, 200, size=n).astype(np.int64)
        avgdl = float(dls_all.mean())
        rows = []
        brute = np.zeros(n)
        match_cnt = np.zeros(n, dtype=np.int64)
        for ti in range(n_terms):
            m = int(rng.integers(1, n + 1))
            local = np.sort(rng.choice(n, size=m, replace=False))
            tfs = rng.integers(1, 50, size=m).astype(np.int64)
            mult = int(rng.integers(1, 4))
            rows.append(
                _make_row_skip(
                    f"t{ti}", local, tfs, dls_all[local],
                    mult=mult, df=m, skip=skip,
                )
            )
            brute[local] += bm25_score(mult, n, m, tfs, dls_all[local], avgdl)
            match_cnt[local] += 1
        kernel = make_wand_kernel(
            n, SHARD_SIZE, avgdl, k, counters={}, require_n=n_terms
        )
        out = kernel(None, pd.DataFrame(rows))
        got = {
            int(d): float(s) for d, s in zip(out["doc_id"], out["score"])
        }
        conj = match_cnt == n_terms
        for d, s in got.items():
            assert conj[d]
            assert abs(s - brute[d]) < 1e-9
        n_match = int(conj.sum())
        if k <= 0 or n_match <= k:
            assert set(got) == set(np.nonzero(conj)[0].tolist())
        else:
            assert len(got) == k
            kth = np.sort(brute[conj])[::-1][k - 1]
            assert all(brute[d] >= kth - 1e-9 for d in got)

    check()


def test_group_masks_match_bruteforce_property():
    """Boolean MUST-group masks vs brute force on randomized corpora
    with adversarial block boundaries: the returned set must be exactly
    the docs whose matched terms cover EVERY group (top-k thereof) with
    OR-identical scores — the segment/shard coverage skips must never
    change results, only decode work."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(10, 300),
        skip=st.sampled_from([1, 3, 16, 128]),
        k=st.sampled_from([0, 1, 5, 999]),
        n_terms=st.integers(1, 12),
        n_groups=st.integers(0, 3),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, skip, k, n_terms, n_groups, seed):
        rng = np.random.default_rng(seed)
        dls_all = rng.integers(1, 200, size=n).astype(np.int64)
        avgdl = float(dls_all.mean())
        # random group membership: every group gets >= 1 member term
        gmask = np.zeros(n_terms, dtype=np.int64)
        for g in range(n_groups):
            members = rng.choice(
                n_terms, size=int(rng.integers(1, n_terms + 1)), replace=False
            )
            for ti in members:
                gmask[ti] |= 1 << g
        full_mask = (1 << n_groups) - 1
        rows = []
        brute = np.zeros(n)
        cover = np.zeros(n, dtype=np.int64)
        term_gmask = {}
        for ti in range(n_terms):
            m = int(rng.integers(1, n + 1))
            local = np.sort(rng.choice(n, size=m, replace=False))
            tfs = rng.integers(1, 50, size=m).astype(np.int64)
            mult = int(rng.integers(1, 4))
            rows.append(
                _make_row_skip(
                    f"t{ti}", local, tfs, dls_all[local],
                    mult=mult, df=m, skip=skip,
                )
            )
            brute[local] += bm25_score(mult, n, m, tfs, dls_all[local], avgdl)
            cover[local] |= int(gmask[ti])
            term_gmask[f"t{ti}"] = int(gmask[ti])
        kernel = make_wand_kernel(
            n, SHARD_SIZE, avgdl, k, counters={},
            term_gmask=term_gmask, full_mask=full_mask,
        )
        out = kernel(None, pd.DataFrame(rows))
        got = {
            int(d): float(s) for d, s in zip(out["doc_id"], out["score"])
        }
        ok = (cover & full_mask) == full_mask
        matched = brute > 0  # only docs with >= 1 posting can appear
        ok &= matched
        for d, s in got.items():
            assert ok[d]
            assert abs(s - brute[d]) < 1e-9
        n_match = int(ok.sum())
        if k <= 0 or n_match <= k:
            assert set(got) == set(np.nonzero(ok)[0].tolist())
        else:
            assert len(got) == k
            kth = np.sort(brute[ok])[::-1][k - 1]
            assert all(brute[d] >= kth - 1e-9 for d in got)

    check()


def test_dense_path_bit_identical_to_segment_sweep():
    """Force both executions of the same wide query: the dense
    full-decode accumulate must return the SAME docs with BIT-IDENTICAL
    scores as the per-segment sweep (same per-doc summation order), under
    masks + exclusion + require_n."""
    import fts_engine_spark.query as q
    from fts_engine_spark.query import _wand_sweep

    rng = np.random.default_rng(7)
    n = 400
    dls_all = rng.integers(1, 200, size=n).astype(np.int64)
    avgdl = float(dls_all.mean())
    weighted, gmasks = [], []
    for ti in range(10):
        m = int(rng.integers(5, n + 1))
        local = np.sort(rng.choice(n, size=m, replace=False))
        tfs = rng.integers(1, 50, size=m).astype(np.int64)
        row = _make_row_skip(
            f"t{ti}", local, tfs, dls_all[local], mult=1, df=m, skip=16
        )
        from fts_engine_spark.query import _parse_posting_row, bm25_idf

        class R:
            pass

        r = R()
        for k_, v in row.items():
            setattr(r, k_, v)
        t = _parse_posting_row(r, 0, None)
        weighted.append((bm25_idf(n, m), t))
        gmasks.append(1 if ti < 2 else 0)
    excl = np.array(sorted(rng.choice(n, size=20, replace=False)), dtype=np.int64)
    for k in (0, 5, 50):
        dense = _wand_sweep(
            [(w, dict(t, decoded=None, blocks={})) for w, t in weighted],
            k, 0, avgdl, None, 2, excl, None, gmasks, 1,
        )
        old = q._DENSE_TERM_THRESHOLD
        q._DENSE_TERM_THRESHOLD = 99  # force the segment path
        try:
            seg = _wand_sweep(
                [(w, dict(t, decoded=None, blocks={})) for w, t in weighted],
                k, 0, avgdl, None, 2, excl, None, gmasks, 1,
            )
        finally:
            q._DENSE_TERM_THRESHOLD = old
        d_d = dict(zip(dense[0].tolist(), dense[1].tolist()))
        d_s = dict(zip(seg[0].tolist(), seg[1].tolist()))
        assert set(d_d) == set(d_s)
        for doc in d_d:
            assert d_d[doc] == d_s[doc], (doc, d_d[doc], d_s[doc])


def test_cursor_pages_tile_full_ordering_property():
    """Property test for search_after inside the kernel: on randomized
    corpora with adversarial block sizes, chained cursor pages —
    admission at round-6 with doc_id tiebreaks (_after_keep) — must tile
    the full (round6(score) desc, doc_id asc) ordering exactly, for
    every page size, with no doc repeated, dropped, or reordered.

    Corpora are restricted to ROUND-6-CLEAN score sets (no two distinct
    raw scores rounding to the same 6th decimal): within such a tie the
    kernel's raw emission order and the cursor's round-6 order can
    legitimately disagree (the same latent tie ambiguity every serving
    surface has vs the round-6 oracle ordering), which is documented on
    ``search_bm25`` rather than papered over here — hypothesis found the
    case immediately on integer-valued synthetic corpora, where distinct
    (tf, dl) pairs collide at 1e-6 far more often than real BM25 scores
    do."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    from fts_engine_spark.query import _round6, make_wand_kernel

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(10, 300),
        skip=st.sampled_from([1, 3, 16, 128]),
        page=st.sampled_from([1, 3, 7, 10]),
        n_terms=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, skip, page, n_terms, seed):
        rng = np.random.default_rng(seed)
        dls_all = rng.integers(1, 200, size=n).astype(np.int64)
        avgdl = float(dls_all.mean())
        rows = []
        for ti in range(n_terms):
            m = int(rng.integers(1, n + 1))
            local = np.sort(rng.choice(n, size=m, replace=False))
            tfs = rng.integers(1, 50, size=m).astype(np.int64)
            rows.append(
                _make_row_skip(
                    f"t{ti}", local, tfs, dls_all[local],
                    mult=int(rng.integers(1, 4)), df=m, skip=skip,
                    shard_id=0,
                )
            )
        pdf = pd.DataFrame(rows)
        full_kernel = make_wand_kernel(n, SHARD_SIZE, avgdl, 0)
        out = full_kernel(None, pdf)
        full = sorted(
            zip(out["doc_id"].astype(int), out["score"].astype(float)),
            key=lambda r: (-_round6(r[1]), r[0]),
        )
        # round-6-clean: distinct raw scores must not share a 6-decimal
        # rounding (see docstring) — collisions void the tiling guarantee
        by_s6: dict[float, float] = {}
        for _, s in full:
            s6 = _round6(s)
            if s6 in by_s6 and by_s6[s6] != s:
                assume(False)
            by_s6[s6] = s
        pages, cursor = [], None
        for _ in range(len(full) // page + 2):
            kern = make_wand_kernel(
                n, SHARD_SIZE, avgdl, page, after=cursor
            )
            o = kern(None, pdf)
            rows_p = sorted(
                zip(o["doc_id"].astype(int), o["score"].astype(float)),
                key=lambda r: (-_round6(r[1]), r[0]),
            )
            if not rows_p:
                break
            pages.extend(rows_p)
            cursor = (_round6(rows_p[-1][1]), rows_p[-1][0])
        assert [d for d, _ in pages] == [d for d, _ in full]
        for (_, sa), (_, sb) in zip(pages, full):
            assert abs(sa - sb) < 1e-12

    check()
