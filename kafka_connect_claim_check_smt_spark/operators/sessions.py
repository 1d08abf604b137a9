"""Sessionization — gap-based session assignment over an event stream.

The canonical events-pipeline operator the reference's Kafka-centric world
leaves to the warehouse: group each user's events into sessions separated
by >= ``gap`` of inactivity, tag every row with its session, and roll
sessions up to (start, end, duration, count).

Two implementations, deliberately:

* :func:`sessionize` — row-level session ids via gaps-and-islands: ONE
  hash shuffle keyed by ``key``, then two window passes over the same
  partitioning (the second window's ``(key, session_idx)`` clustering is
  satisfied by the first exchange — HashPartitioning(key) satisfies
  ClusteredDistribution(key, session_idx), so Catalyst inserts a sort but
  NO second exchange). This is the engine-portable, oracle-checkable path.
* :func:`session_stats` — per-session aggregates via Spark's native
  ``F.session_window`` (Tungsten ``UpdatingSessions`` path, the same
  operator Structured Streaming uses for watermarked session windows).
  Native merging semantics: an event extends a session while
  ``ts < session_end`` (end = prev ts + gap), i.e. a NEW session starts
  when the inactivity gap is **>= gap** — :func:`sessionize` uses the
  same boundary so the two paths agree exactly (pytest-asserted).

Boundary semantics: gap >= ``gap_seconds`` starts a new session (matches
``F.session_window``). Timestamps are compared in integer MICROSECONDS
(``unix_micros`` / DuckDB ``epoch_us``) — no float time arithmetic, so the
DuckDB twin hashes bit-identically. Ties on ``ts`` are broken by
``tiebreak`` (default the timestamp itself; pass the event id column for
full determinism when equal timestamps are possible).

At 100 TB: one shuffle keyed by user — the same key distribution the rest
of the pipeline already has; per-user state is a sort + running sum, no
buffering beyond the partition sort. Skewed power users are bounded by
events-per-user, not corpus size. The streaming variant is the SAME
aggregation with a watermark (see streaming/replay.py's windowed surfaces).

Reference scope: the SMT has no session operator (it is a per-record
transform — ClaimCheckSourceTransform.java:60-96); this belongs to the
target-pipeline §2.2 window/aggregation categories in SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _micros(df: DataFrame, ts: str) -> F.Column:
    """Event time as integer micros since epoch, timezone-independent.

    ``unix_micros`` only accepts TIMESTAMP (with local-tz semantics); the
    testdata's parquet carries TIMESTAMP_NTZ, where casting to TIMESTAMP
    would shift by the SESSION timezone — a hash divergence vs DuckDB's
    ``epoch_us`` whenever the driver session isn't UTC. ``timestampdiff``
    from an NTZ epoch literal is exact and tz-free (verified equal to
    DuckDB ``epoch_us`` under a non-UTC session tz)."""
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), {ts})"
        )
    return F.unix_micros(F.col(ts))


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Tag every row with ``session_idx`` (1-based per ``key``) and
    ``ts_us`` (event time in integer micros). All input columns pass
    through (``ts_us``/``session_idx``, if present, are overwritten — the
    engine's reserved-output-name convention). A new session starts when
    the gap since the previous event of the same ``key`` is >=
    ``gap_seconds``."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    order = [F.col("ts_us").asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    out = df.withColumn("ts_us", _micros(df, ts))
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("ts_us") - prev >= F.lit(gap_us)), 1
    ).otherwise(0)
    # running sum over the SAME partitioning: sort-only, no second exchange
    return out.withColumn("_is_new", is_new).withColumn(
        "session_idx",
        F.sum("_is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_is_new")


def session_rollup(
    df: DataFrame, *, key: str, ts: str, gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessions rolled up to one row per session:
    ``(key, session_idx, session_start_us, session_end_us, duration_us,
    n_events)``. The groupBy clustering is satisfied by the window's
    exchange — the whole rollup is one shuffle end-to-end."""
    tagged = sessionize(
        df, key=key, ts=ts, gap_seconds=gap_seconds, tiebreak=tiebreak
    )
    return tagged.groupBy(key, "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.count("*").alias("n_events"),
    )


def session_stats(
    df: DataFrame, *, key: str, ts: str, gap_seconds: int
) -> DataFrame:
    """Native-Spark per-session aggregates via ``F.session_window`` —
    the Tungsten session-merge operator (and the exact shape a
    Structured Streaming job with a watermark would use). Emits the same
    columns as :func:`session_rollup` except ``session_idx`` (native
    windows are identified by their time range, not an ordinal)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    sw = F.session_window(F.col(ts), f"{int(gap_seconds)} seconds")
    us = _micros(df, ts)
    return (
        df.groupBy(F.col(key), sw.alias("w"))
        .agg(
            F.min(us).alias("session_start_us"),
            F.max(us).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_us", F.col("session_end_us") - F.col("session_start_us")
        )
        .drop("w")
    )
