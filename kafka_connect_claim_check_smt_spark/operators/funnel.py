"""Ordered funnel analysis — step-sequence conversion over an event stream.

"Of the users who did `view`, how many later did `click`, and of those how
many later did `purchase` (each within the conversion window)?" — the
classic product-analytics query, and a stress test for expressing
*sequentially dependent* per-key aggregates without a per-row state
machine.

The scalable formulation: ONE hash exchange on the user key, then k
chained window aggregates over that same partitioning —

    t1 = min(ts)  FILTER (step = s1)                 OVER (PARTITION BY key)
    t2 = min(ts)  FILTER (step = s2 AND ts > t1)     OVER (PARTITION BY key)
    ...
    tk = min(ts)  FILTER (step = sk AND ts > t(k-1) AND tk - t1 <= window)

Each ``t_i`` is an unordered window aggregate (no sort needed), and because
``t_{i-1}`` is just a column by the time ``t_i`` is computed, the
"sequential dependency" costs nothing: Catalyst stacks k Window nodes over
the SAME HashPartitioning — one shuffle end-to-end, no state machine, no
UDF, no per-user event-list collection. Greedy-min semantics (each step
matches its EARLIEST qualifying event) — the standard funnel definition;
note greedy is not globally optimal under a conversion window (an exotic
late-first-step completion can be missed), which is the documented,
industry-standard trade.

Time is compared in integer microseconds (see operators/sessions.py) so
the DuckDB twin — the same chained window aggregates — hashes exactly.

At 100 TB: the only shuffle is keyed by user (the distribution the events
table already has); per-user work is k unordered min-aggregates, and the
funnel summary is a k-row result. Skew = events-per-hottest-user, same
bound as sessionization.

Reference scope: per-record SMTs have no cross-record analytics
(ClaimCheckSourceTransform.java:61-96 is record-at-a-time); this extends
SURVEY.md §2.2's window/aggregation categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _micros


def funnel_times(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    step_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per ``key`` with ``t1 .. tk`` (micros) — the greedy-min
    completion time of each funnel step, NULL from the first step the key
    never reached (``t1..tk``/``ts_us`` are reserved output names and
    overwrite same-named inputs). ``within_seconds`` bounds FULL-funnel
    latency: every step after the first must land within that window of
    ``t1``."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {len(steps)}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(f"within_seconds must be positive, got {within_seconds}")
    within_us = None if within_seconds is None else int(within_seconds) * 1_000_000

    w = Window.partitionBy(key)
    out = df.withColumn("ts_us", _micros(df, ts))
    for i, step in enumerate(steps, start=1):
        cond = F.col(step_col) == F.lit(step)
        if i > 1:
            cond = cond & F.col(f"t{i - 1}").isNotNull() & (
                F.col("ts_us") > F.col(f"t{i - 1}")
            )
            if within_us is not None:
                cond = cond & (F.col("ts_us") - F.col("t1") <= F.lit(within_us))
        out = out.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("ts_us"))).over(w)
        )
    t_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    return out.groupBy(key).agg(*[F.first(c).alias(c) for c in t_cols])


def funnel_counts(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    step_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """The funnel summary: ``(step_index, step_name, n_keys)`` — how many
    distinct keys reached each step in order. Monotone non-increasing in
    ``step_index`` by construction."""
    bad = [s for s in steps if "'" in s or "\\" in s]
    if bad:
        raise ValueError(f"step names must not contain quotes/backslashes: {bad}")
    times = funnel_times(
        df, key=key, ts=ts, step_col=step_col, steps=steps,
        within_seconds=within_seconds,
    )
    # ONE aggregation over the per-key times (k sums in a single pass),
    # then stack() to long format — not k jobs over the funnel pipeline
    counts = times.agg(
        *[
            F.sum(F.col(f"t{i}").isNotNull().cast("long")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{i}L, '{step}', n{i}" for i, step in enumerate(steps, start=1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_index, step_name, n_keys)"
    )
