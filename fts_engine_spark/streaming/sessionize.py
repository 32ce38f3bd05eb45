"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch engine sessionizes with two per-user window functions
(``operators/relational.py:sessionize``). On an unbounded stream the same
gap-based semantics need CUSTOM STATE: a user's open session must survive
across micro-batches and close only when event time (the watermark) passes
``session_end + gap`` — the canonical ``applyInPandasWithState`` shape
(state schema + event-time timeout), which ``groupBy(window(...))``
aggregation cannot express because a session's extent depends on the data,
not a fixed grid.

Late-data correctness: a session is NOT final the moment a later in-batch
event exceeds the gap — a late-but-within-watermark event arriving in a
later micro-batch can still land inside it, before it, or BRIDGE two
provisional sessions into one. State therefore holds the full list of
provisional sessions per user (each an interval whose internal event gaps
are <= gap), new events are merged interval-style (start = min, end = max,
counts summed; an event connects to a session iff it lies within ``gap``
of its boundary), and a session is emitted only once the watermark passes
``end + gap`` — at which point no admissible event (Spark drops rows older
than the watermark) can ever connect to it. Emission is append-mode and
deterministic in event time: the emitted set equals the batch operator's
output over the same (non-late) events, independent of micro-batch
boundaries (asserted in tests/test_streaming_sessionize.py, including a
late event that splits differently than in-order processing would).

Checkpoint migration: the state schema changed in r4 from one scalar
(start, end, n) triple to parallel array columns (provisional-session
list). A checkpoint written by the pre-r4 operator cannot be restarted
under this version; the ``STATE_FORMAT_VERSION`` stamp written into the
checkpoint dir (``check_state_format``) turns such a restart into an
actionable error at stream start — restart from a fresh checkpoint
(in-flight sessions re-derive from reprocessed input when the source
retains it).

Scale: state is the provisional-session list per ACTIVE user — O(active
users * sessions inside the watermark horizon), evenly hash-partitioned by
user_id; watermark-driven emission garbage-collects state, so it does not
grow with stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

# Bumped on every incompatible _STATE_SCHEMA change (v2 = the r4 move from
# one scalar (start, end, n) triple to parallel array columns). Spark's
# state-store schema validation rejects SOME mismatched restarts, but
# applyInPandasWithState state rows are opaque serialized rows in some
# Spark versions — a pre-v2 checkpoint could deserialize garbage or crash
# deep in the worker instead of failing clearly (ADVICE r4 #5). The stamp
# makes the mismatch an actionable error at stream start.
STATE_FORMAT_VERSION = 2


def check_state_format(checkpoint_dir: str) -> None:
    """Stamp/validate this operator's state-format version in
    ``checkpoint_dir``. First use writes the stamp; a restart against a
    checkpoint stamped with (or predating) another version fails loudly
    BEFORE any state row is deserialized. Local-filesystem checkpoints
    only (remote stores: manage the stamp alongside the checkpoint)."""
    import json
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    stamp = os.path.join(checkpoint_dir, "fts_state_format.json")
    if os.path.exists(stamp):
        with open(stamp) as f:
            got = int(json.load(f).get("sessionize_state_version", -1))
        if got != STATE_FORMAT_VERSION:
            raise RuntimeError(
                f"checkpoint {checkpoint_dir} holds sessionize state format "
                f"v{got}; this build reads v{STATE_FORMAT_VERSION}. Restart "
                "from a fresh checkpoint (in-flight sessions re-derive from "
                "reprocessed input when the source retains it)."
            )
    elif any(
        os.path.isdir(os.path.join(checkpoint_dir, d))
        for d in ("state", "offsets", "commits")
    ):
        raise RuntimeError(
            f"checkpoint {checkpoint_dir} predates the state-format stamp "
            f"(pre-v{STATE_FORMAT_VERSION} sessionize state); restart from "
            "a fresh checkpoint."
        )
    else:
        with open(stamp, "w") as f:
            json.dump({"sessionize_state_version": STATE_FORMAT_VERSION}, f)


_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
# provisional sessions, parallel arrays sorted by start
_STATE_SCHEMA = "starts array<long>, ends array<long>, ns array<long>"


def _merge(
    sessions: list[tuple[int, int, int]], epochs: list[int], gap: int
) -> list[tuple[int, int, int]]:
    """Merge new event times into the provisional-session list.

    Both inputs represent gap-connected event sets, so connectivity is
    purely boundary proximity: sweep all items in start order, connecting
    an item whenever its start is within ``gap`` of the running end. This
    reproduces exactly the batch semantics (sort ALL events, split where
    consecutive diff > gap) — a late event can extend a session backwards
    (start = min) or bridge two provisional sessions into one.
    """
    items = sorted(sessions + [(t, t, 1) for t in epochs])
    out: list[tuple[int, int, int]] = []
    cs, ce, cn = items[0]
    for s, e, n in items[1:]:
        if s - ce <= gap:
            ce = max(ce, e)
            cn += n
        else:
            out.append((cs, ce, cn))
            cs, ce, cn = s, e, n
    out.append((cs, ce, cn))
    return out


def _make_update_fn(gap_seconds: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(sessions),
                    "session_start": [
                        pd.Timestamp(s, unit="s") for s, _, _ in sessions
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="s") for _, e, _ in sessions
                    ],
                    "n_events": [n for _, _, n in sessions],
                }
            )

        sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, ns = state.get
            sessions = [
                (int(s), int(e), int(n)) for s, e, n in zip(starts, ends, ns)
            ]

        if not state.hasTimedOut:
            epochs: list[int] = []
            for pdf in pdfs:
                ts = pd.to_datetime(pdf["ts"])
                epochs.extend((ts.astype("int64") // 10**9).tolist())
            if epochs:
                sessions = _merge(sessions, epochs, gap_seconds)

        # final = watermark STRICTLY past end + gap. Strict, because Spark
        # admits rows with event time == watermark, and the batch operator
        # joins an event at exactly gap distance (split only when
        # diff > gap): with wm == end+gap, an admissible event t == wm
        # would still connect. Any admissible t has t >= wm > end + gap,
        # so t - end > gap — it cannot connect to a finalized session.
        wm_sec = state.getCurrentWatermarkMs() // 1000
        final = [x for x in sessions if x[1] + gap_seconds < wm_sec]
        pending = [x for x in sessions if x[1] + gap_seconds >= wm_sec]

        if pending:
            state.update(
                (
                    [s for s, _, _ in pending],
                    [e for _, e, _ in pending],
                    [n for _, _, n in pending],
                )
            )
            # re-arm so the timeout fires once wm_sec > min_end + gap:
            # fires when wm_ms > ts, and wm_sec >= end+gap+1 iff
            # wm_ms >= (end+gap+1)*1000. setTimeoutTimestamp requires
            # ts > current watermark, hence the max().
            min_end = min(e for _, e, _ in pending)
            ts = (min_end + gap_seconds + 1) * 1000 - 1
            state.setTimeoutTimestamp(
                max(ts, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if final:
            yield emit(sorted(final))

    return update


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Gap-based sessions over a streaming (user_id, ts, ...) DataFrame.

    Returns an append-mode stream of closed sessions
    (user_id, session_start, session_end, n_events).

    Pass the query's ``checkpoint_dir`` to stamp/validate the state-format
    version before start (:func:`check_state_format`) — a restart against
    an incompatible checkpoint then fails with an actionable message
    instead of crashing inside state deserialization.
    """
    if checkpoint_dir is not None:
        check_state_format(checkpoint_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(gap_seconds),
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
