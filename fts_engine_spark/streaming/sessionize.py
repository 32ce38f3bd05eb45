"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch engine sessionizes with two per-user window functions
(``operators/relational.py:sessionize``). On an unbounded stream the same
gap-based semantics need CUSTOM STATE: a user's open session must survive
across micro-batches and close either when a later event exceeds the gap
or when event time (the watermark) passes ``session_end + gap`` — the
canonical ``applyInPandasWithState`` shape (state schema + event-time
timeout), which ``groupBy(window(...))`` aggregation cannot express
because a session's extent depends on the data, not a fixed grid.

Scale: state is one (start, end, n) triple per ACTIVE user — O(active
users), evenly hash-partitioned by user_id; timeouts garbage-collect
closed sessions, so state does not grow with stream length. Emission is
append-mode and deterministic in event time: a session is final once the
watermark passes its end + gap, independent of micro-batch boundaries
(asserted against the batch operator in tests/test_streaming_sessionize.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start long, end long, n long"


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

        if state.hasTimedOut:
            # watermark passed session_end + gap: the open session is final
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield emit([(int(s), int(e), int(n))])
            return

        epochs: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            epochs.extend((ts.astype("int64") // 10**9).tolist())
        epochs.sort()

        if state.exists:
            s, e, n = (int(x) for x in state.get)
        else:
            s = e = -1
            n = 0

        closed: list[tuple[int, int, int]] = []
        for t in epochs:
            if n == 0:
                s = e = t
                n = 1
            elif t - e > gap_seconds:
                closed.append((s, e, n))
                s = e = t
                n = 1
            else:
                e = max(e, t)
                n += 1

        if n > 0:
            state.update((s, e, n))
            state.setTimeoutTimestamp((e + gap_seconds) * 1000)
        if closed:
            yield emit(closed)

    return update


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions over a streaming (user_id, ts, ...) DataFrame.

    Returns an append-mode stream of closed sessions
    (user_id, session_start, session_end, n_events).
    """
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
