"""Cohort retention — "of the users who first appeared in period P, how
many were active again P+1, P+2, ..." — the other canonical event-stream
rollup next to funnels (operators/funnel.py) and sessions
(operators/sessions.py).

Shape: two key-bounded shuffles, both unavoidable and both small —

    1. window ``min(ts) OVER (PARTITION BY key)`` tags every event with its
       key's cohort period (hash exchange on key; unordered min, no sort),
    2. ``groupBy(cohort, offset).agg(count_distinct(key))`` (exchange on the
       (cohort, offset) pair — cardinality ≈ periods², tiny).

The distinct-count is exact; at 100 TB the heavy first exchange is keyed by
user (the table's natural distribution) and the second groups a
pre-shrunken projection. Periods are integer micros-since-epoch divided by
the period length — pure BIGINT arithmetic, no calendar functions, so the
DuckDB twin (same two-stage SQL) hashes exactly; DST/calendar bucketing is
deliberately out of scope (use date_trunc variants when calendars matter —
at the cost of oracle portability across engines' tz models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _micros

_US_PER_DAY = 86_400_000_000


def cohort_retention(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    period_days: int = 7,
) -> DataFrame:
    """``(cohort_period, offset_periods, n_active)``: for each cohort (the
    period of the key's FIRST event) and each later period offset, the
    exact number of distinct keys with any activity in that period.
    ``offset_periods = 0`` is the cohort size itself."""
    if period_days <= 0:
        raise ValueError(f"period_days must be positive, got {period_days}")
    period_us = int(period_days) * _US_PER_DAY
    w = Window.partitionBy(key)
    # integer DIV, not `/`+cast: float division truncates wrong at exact
    # period boundaries (2816.999…95 → 2816) and diverges from DuckDB's `//`
    tagged = (
        df.withColumn("ts_us", _micros(df, ts))
        .withColumn("_first_us", F.min("ts_us").over(w))
        .select(
            F.col(key),
            F.expr(f"_first_us DIV {period_us}").alias("cohort_period"),
            F.expr(
                f"(ts_us DIV {period_us}) - (_first_us DIV {period_us})"
            ).alias("offset_periods"),
        )
    )
    return tagged.groupBy("cohort_period", "offset_periods").agg(
        F.count_distinct(F.col(key)).alias("n_active")
    )
