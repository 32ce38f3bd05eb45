"""Stateful streaming sessionization (applyInPandasWithState) must produce
exactly the batch sessionize() sessions once the watermark has closed them,
independent of micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

import pytest

from fts_engine_spark.operators.relational import sessionize
from fts_engine_spark.streaming.sessionize import sessionize_stream

GAP = 600  # 10 min


def _events():
    """Two users, three sessions each, plus a far-future flush user that
    advances the watermark past everything else."""
    base = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = []
    eid = 0

    def add(user, offsets):
        nonlocal eid
        for off in offsets:
            rows.append((eid, user, base + dt.timedelta(seconds=off)))
            eid += 1

    # user 1: sessions [0..120], [1000..1030], [5000]
    add(1, [0, 60, 120, 1000, 1030, 5000])
    # user 2: sessions [30..90], [2000], [4000..4700 (chained within gap)]
    add(2, [30, 90, 2000, 4000, 4500, 4700])
    return rows


def _flush_row(eid):
    return (eid, 999, dt.datetime(2025, 6, 2, 12, 0, 0))


@pytest.fixture(scope="module")
def stream_result(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    rows = _events()
    schema = "event_id long, user_id long, ts timestamp"

    # batch 1: first half; batch 2: rest; batch 3: watermark flush.
    # Each logical batch is ONE part file: the file source turns every
    # file into a micro-batch (maxFilesPerTrigger=1), and a multi-part
    # write would split a batch into arbitrarily-ordered micro-batches
    # whose watermark advance could drop earlier events as late.
    # split by event TIME (not by user): the watermark advances to
    # max(ts)-5min after each batch, so a later batch must not carry
    # earlier timestamps or they are dropped as late
    rows.sort(key=lambda r: r[2])
    spark.createDataFrame(rows[:8], schema).repartition(1).write.parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP, watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[8:], schema).repartition(1).write.parquet(f"{src}/b2")
        q.processAllAvailable()
        spark.createDataFrame([_flush_row(100)], schema).repartition(1).write.parquet(f"{src}/b3")
        q.processAllAvailable()
        # one more empty-ish trigger so event-time timeouts registered in the
        # previous batch fire against the advanced watermark
        spark.createDataFrame([_flush_row(101)], schema).repartition(1).write.parquet(f"{src}/b4")
        q.processAllAvailable()
        out = spark.table("sessions_out").collect()
    finally:
        q.stop()
    return out


def test_stream_sessions_match_batch(spark, stream_result):
    rows = _events()
    batch_df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, gap_seconds=GAP).collect()
    }
    fmt = "%Y-%m-%d %H:%M:%S"
    got = {
        (
            r["user_id"],
            r["session_start"].strftime(fmt),
            r["session_end"].strftime(fmt),
            r["n_events"],
        )
        for r in stream_result
        if r["user_id"] in (1, 2)
    }
    assert got == expected


def test_late_event_resplits_provisional_sessions(spark, tmp_path):
    """ADVICE r3 (medium): a late-but-within-watermark event arriving in a
    LATER micro-batch must land exactly where batch semantics put it — here
    events [0, 1000] then late 800 with gap 600 must yield sessions
    (0,0,1) and (800..1000,2), NOT (1000,2). Requires gap-closed sessions
    to stay provisional until the watermark passes end+gap, and session
    start to move down on merge."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2025, 6, 1, 12, 0, 0)
    schema = "event_id long, user_id long, ts timestamp"

    def write(name, rows):
        spark.createDataFrame(rows, schema).repartition(1).write.parquet(
            f"{src}/{name}"
        )

    def at(off):
        return base + dt.timedelta(seconds=off)

    write("b1", [(0, 7, at(0)), (1, 7, at(1000))])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP, watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("sessions_late")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is now 1000-300=700s: 800 is late relative to arrival
        # order but still admissible
        write("b2", [(2, 7, at(800))])
        q.processAllAvailable()
        write("b3", [(3, 999, dt.datetime(2025, 6, 2, 12, 0, 0))])
        q.processAllAvailable()
        write("b4", [(4, 999, dt.datetime(2025, 6, 2, 13, 0, 0))])
        q.processAllAvailable()
        out = spark.table("sessions_late").collect()
    finally:
        q.stop()

    got = {
        (r["session_start"], r["session_end"], r["n_events"])
        for r in out
        if r["user_id"] == 7
    }
    assert got == {(at(0), at(0), 1), (at(800), at(1000), 2)}

    # and the emitted set equals the batch operator over the same events
    # (the batch operator formats timestamps as strings)
    batch_df = spark.createDataFrame(
        [(0, 7, at(0)), (1, 7, at(1000)), (2, 7, at(800))], schema
    )
    expected = {
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, gap_seconds=GAP).collect()
    }
    fmt = "%Y-%m-%d %H:%M:%S"
    assert {
        (s.strftime(fmt), e.strftime(fmt), n) for s, e, n in got
    } == expected


def test_stream_sessions_closed_by_gap_and_timeout(stream_result):
    by_user = {}
    for r in stream_result:
        if r["user_id"] in (1, 2):
            by_user.setdefault(r["user_id"], []).append(r)
    # 3 sessions per user, including the trailing ones only a timeout closes
    assert len(by_user[1]) == 3
    assert len(by_user[2]) == 3
    n_events = sorted(r["n_events"] for r in by_user[2])
    assert n_events == [1, 2, 3]


def test_state_format_stamp(tmp_path):
    """ADVICE r4 #5: the checkpoint dir carries a state-format stamp so a
    restart against an incompatible (or pre-stamp) checkpoint fails with
    an actionable error instead of deserializing garbage state."""
    import json
    import os

    import pytest

    from fts_engine_spark.streaming.sessionize import (
        STATE_FORMAT_VERSION,
        check_state_format,
    )

    # fresh checkpoint: stamp written, idempotent re-check passes
    ckpt = str(tmp_path / "ck")
    check_state_format(ckpt)
    stamp = os.path.join(ckpt, "fts_state_format.json")
    with open(stamp) as f:
        assert json.load(f)["sessionize_state_version"] == STATE_FORMAT_VERSION
    check_state_format(ckpt)

    # mismatched version: loud failure
    with open(stamp, "w") as f:
        json.dump({"sessionize_state_version": STATE_FORMAT_VERSION - 1}, f)
    with pytest.raises(RuntimeError, match="state format"):
        check_state_format(ckpt)

    # unstamped checkpoint that already holds state: pre-stamp = loud failure
    old = str(tmp_path / "old")
    os.makedirs(os.path.join(old, "state"))
    with pytest.raises(RuntimeError, match="predates"):
        check_state_format(old)
