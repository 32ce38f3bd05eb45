"""Property tests for the compaction renumbering (compact.remap_ids):
random shard geometry, occupancy gaps (delta shards) and delete sets —
the remap must equal "rank among live ids in old-id order", stay
monotone, and produce a dense id space. Pure numpy; no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from fts_engine_spark.streaming.compact import remap_ids


@st.composite
def _scenario(draw):
    """A plausible index id space: full prefix shards, then tail shards
    that are each contiguous-from-base but possibly under-filled (the
    delta-shard invariant), plus a dead subset of the tail."""
    shard_size = draw(st.sampled_from([4, 8, 16, 64]))
    n_full = draw(st.integers(0, 3))
    n_tail = draw(st.integers(1, 5))
    occ = {}
    for s in range(n_full):
        occ[s] = shard_size
    tail_shards = []
    for i in range(n_tail):
        s = n_full + draw(st.integers(0, 1)) + (tail_shards[-1] - n_full + 1 if tail_shards else 0)
        fill = draw(st.integers(1, shard_size))
        occ[s] = fill
        tail_shards.append(s)
    ids = []
    for s, fill in occ.items():
        ids.extend(range(s * shard_size, s * shard_size + fill))
    ids = np.array(sorted(ids), dtype=np.int64)
    # dead subset drawn from the TAIL only (delete_documents can hit the
    # prefix, but compact_index then lowers P so those shards become tail
    # — remap_ids is always called with P at or below the first dead id)
    tail_ids = ids[ids >= n_full * shard_size]
    n_dead = draw(st.integers(0, max(0, len(tail_ids) - 1)))
    dead_idx = draw(
        st.sets(
            st.integers(0, len(tail_ids) - 1), min_size=n_dead, max_size=n_dead
        )
    ) if len(tail_ids) else set()
    dead = np.array(sorted(int(tail_ids[i]) for i in dead_idx), dtype=np.int64)
    return shard_size, n_full, occ, ids, dead


@given(_scenario())
@settings(max_examples=300, deadline=None)
def test_remap_is_rank_among_live(scenario):
    shard_size, P, occ, ids, dead = scenario
    base = P * shard_size
    shift_arr = np.zeros(
        (max(s for s in occ) if occ else 0) - P + 1, dtype=np.int64
    )
    acc = base
    for s in sorted(s for s in occ if s >= P):
        shift_arr[s - P] = acc - s * shard_size
        acc += occ[s]

    live = ids[~np.isin(ids, dead)]
    got = remap_ids(live, P, shard_size, shift_arr, dead)

    # ground truth: prefix unchanged; live tail ids renumber densely from
    # base in old order
    want = live.copy()
    tail_mask = live >= base
    want[tail_mask] = base + np.arange(int(tail_mask.sum()))
    assert np.array_equal(got, want)
    # monotone + dense by construction
    assert np.all(np.diff(got) > 0)
    assert got[-1] == len(live) - 1 if P == 0 else True


@given(_scenario())
@settings(max_examples=300, deadline=None)
def test_remap_subset_consistency(scenario):
    """Remapping any subset of the live ids gives the same values as
    remapping all of them — the property that lets the postings kernel
    (per-shard slices) and the docs rewrite (arbitrary partitions) share
    the function without coordination."""
    shard_size, P, occ, ids, dead = scenario
    base = P * shard_size
    shift_arr = np.zeros(
        (max(s for s in occ) if occ else 0) - P + 1, dtype=np.int64
    )
    acc = base
    for s in sorted(s for s in occ if s >= P):
        shift_arr[s - P] = acc - s * shard_size
        acc += occ[s]
    live = ids[~np.isin(ids, dead)]
    full = dict(
        zip(
            live.tolist(),
            remap_ids(live, P, shard_size, shift_arr, dead).tolist(),
        )
    )
    subset = live[::2]
    got = remap_ids(subset, P, shard_size, shift_arr, dead)
    assert got.tolist() == [full[i] for i in subset.tolist()]