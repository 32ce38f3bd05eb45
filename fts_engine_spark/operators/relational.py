"""Generic relational operators over the driver's TPC-H-ish/events tables.

The reference implements no joins/windows/set-ops (SURVEY.md §2.10); these
exist to prove the engine's generic relational breadth for pipeline work
around the FTS core (sessionization, rollups, dimensional joins) — each with
a DuckDB oracle twin. Timestamps are emitted as formatted strings so the
cross-engine value-hash is timezone-representation-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

TS_FMT = "yyyy-MM-dd HH:mm:ss"
SESSION_GAP_SECONDS = 1800


def events_hourly(events: DataFrame) -> DataFrame:
    """(hour, event_type, n_events, total_value) — time-bucketed rollup."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events).

    Classic gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``. Two window
    functions (lag + running sum), both partitioned by user — scale-safe
    (per-user state, no global window).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (driver parquet); route through LTZ (session tz
    # is pinned to UTC) so epoch seconds match DuckDB's floor(epoch(ts)).
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0),
    )
    with_sid = flagged.withColumn(
        "session_id", F.sum("new_session").over(w).cast("long")
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def top_customers_by_revenue(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, n: int = 10
) -> DataFrame:
    """(c_custkey, c_name, revenue) — two-join agg + deterministic top-k.

    Plan shape: lineitem⋈orders shuffles on the fact keys; the customer dim
    is broadcast; revenue agg is partial-aggregated; top-k is
    TakeOrderedAndProject."""
    rev = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            rev["o_custkey"] == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(n)
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped aggregate (returnflag/linestatus rollup)."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )
