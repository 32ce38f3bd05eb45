"""Physical-plan introspection helpers.

Encodes the ".explain and iterate" discipline as assertable properties so
plan quality is locked by CI, not by one-off manual reviews: predicate
pushdown reaching the parquet scan, broadcast joins on small sides,
map-side partial aggregation, batched columnar scans.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_contains(df: DataFrame, *markers: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {m: (m in plan) for m in markers}


def assert_plan(df: DataFrame, *markers: str) -> None:
    plan = formatted_plan(df)
    missing = [m for m in markers if m not in plan]
    if missing:
        raise AssertionError(
            f"plan missing markers {missing}; plan:\n{plan[:4000]}"
        )


def assert_plan_absent(df: DataFrame, *markers: str) -> None:
    plan = formatted_plan(df)
    present = [m for m in markers if m in plan]
    if present:
        raise AssertionError(
            f"plan unexpectedly contains {present}; plan:\n{plan[:4000]}"
        )
