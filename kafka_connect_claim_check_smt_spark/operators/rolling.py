"""Rolling (trailing-window) per-event metrics — the RANGE-frame analytic.

"How many events did this user produce in the hour ENDING at this event,
and how many payload bytes?" — rate limiting, burst detection, velocity
features for abuse/quality models. This is the one window-frame family the
rest of the engine doesn't already exercise: a RANGE frame over event time
(sessions/funnel use unordered aggregates and ROWS frames; SCD/asof use
lag/last). The frame is value-based — ``RANGE BETWEEN w PRECEDING AND
CURRENT ROW`` over integer micros — so ties in event time are all included
regardless of sort-tiebreak, making the result deterministic without an id
tiebreak (unlike ROWS frames).

One hash exchange on ``key`` + a sort; per-row evaluation slides two
pointers over the sorted partition (Spark's bounded-RANGE WindowExec keeps
the frame incrementally — no per-row rescan). At 100 TB the cost model is
the same as sessionization: shuffle keyed by the stream's natural key,
per-key work linear in events-per-key.

Time arithmetic is integer micros end-to-end (see operators/sessions.py),
so the DuckDB twin (identical RANGE frame) hashes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _micros


def rolling_counts(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    window_seconds: int,
    bytes_col: str | None = None,
) -> DataFrame:
    """All input columns + ``ts_us`` + ``n_trailing`` (events of the same
    ``key`` in the closed interval ``[ts - window, ts]``) and, when
    ``bytes_col`` is given, ``bytes_trailing`` (total octet_length of that
    string/binary column over the same frame — integer, oracle-exact).
    The three output names are reserved and overwrite same-named inputs."""
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    window_us = int(window_seconds) * 1_000_000
    out = df.withColumn("ts_us", _micros(df, ts))
    w = (
        Window.partitionBy(key)
        .orderBy("ts_us")
        .rangeBetween(-window_us, Window.currentRow)
    )
    out = out.withColumn("n_trailing", F.count(F.lit(1)).over(w))
    if bytes_col is not None:
        out = out.withColumn(
            "bytes_trailing", F.sum(F.octet_length(F.col(bytes_col))).over(w)
        )
    return out
