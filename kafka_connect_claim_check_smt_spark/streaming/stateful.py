"""Custom stateful streaming operators — the surfaces the foreachBatch replay
deliberately does NOT need (streaming/replay.py's determinism note) but a
consumer-facing engine must still offer:

- :func:`lww_changelog_stream` — continuous per-key LWW compaction via
  ``applyInPandasWithState``: the state store holds each key's winning
  ``(order, tiebreaker)`` and a micro-batch emits a key's row only when it
  BEATS the stored ordering. Downstream consumers get a changelog of winner
  CHANGES instead of re-reading merged state — the push-based complement to
  the MERGE pipeline (stale out-of-order updates are suppressed at the
  stream, not at the sink). State is two longs per key regardless of payload
  width; on restart Structured Streaming rebuilds it from the checkpointed
  state store.

- :func:`windowed_ingest_metrics` — event-time tumbling-window ingest
  metrics (rows / bytes / oversized per window) with a watermark: late
  events inside the allowed lateness still update their window, events
  older than the watermark are dropped by the engine. Pure built-in
  ``withWatermark`` + ``window()`` aggregation — the canonical late-data
  pattern, no Python in the hot path.

- :func:`session_activity_stream` — watermarked ``session_window``
  sessionization: the continuous twin of ``operators/sessions.py``
  (boundary-identical gap semantics), finalized sessions emitted once in
  append mode via the engine's native session-merge operator.

Scale shape: applyInPandasWithState shuffles by key (uniform for
``(repo, path)``) and streams each group through Arrow; the windowed agg is
a standard partial-aggregated stateful hash agg keyed by window. Both
checkpoint through the engine's state store like any stateful query.

These are streaming-only semantics (state across micro-batches) — covered by
pytest against batch LWW oracles, not by the DuckDB gate (the driver records
the weaker rows-only check for non-SQL-expressible ops by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def lww_changelog_stream(
    events: DataFrame,
    key_cols: list[str],
    order_col: str,
    *,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Per-key LWW changelog: emits, per micro-batch, at most one row per key
    — the batch's winner — and only when it beats the key's stored ordering.

    Ordering is ``(order_col, tiebreaker)`` lexicographic, strictly-greater
    wins (ties lose to the incumbent — replays of the same event never
    re-emit, matching the MERGE's ``u.order > t.order`` clause). Both
    ordering columns must be integral."""
    schema = events.schema
    for c in key_cols + [order_col] + ([tiebreaker] if tiebreaker else []):
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in stream schema")
    out_schema = schema
    state_schema = T.StructType(
        [T.StructField("o", T.LongType()), T.StructField("t", T.LongType())]
    )
    ord_cols = [order_col] + ([tiebreaker] if tiebreaker else [])
    col_order = list(schema.names)

    # NOTE: no type annotations on the inner fn — `from __future__ import
    # annotations` stringifies them and Spark's signature inspection rejects
    # that (round-1 gotcha, applies to every pandas-facing UDF here).
    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        stored = state.get if state.exists else None  # (o, t)
        best = None  # (o, t, row_tuple)
        for pdf in pdfs:
            if pdf.empty:
                continue
            # batch-local winner: sort is overkill for argmax — idxmax over
            # the composite via sort_values on the two ordering columns
            pdf = pdf.sort_values(ord_cols, ascending=False, kind="mergesort")
            top = pdf.iloc[0]
            cand = (int(top[order_col]), int(top[tiebreaker]) if tiebreaker else 0)
            if best is None or cand > best[:2]:
                best = (*cand, tuple(top[c] for c in col_order))
        if best is None:
            return
        if stored is not None and (best[0], best[1]) <= (stored[0], stored[1]):
            return  # incumbent wins — suppress the stale update
        state.update((best[0], best[1]))
        yield pd.DataFrame([best[2]], columns=col_order)

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def windowed_ingest_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    *,
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
    threshold_bytes: int = 4096,
    content_col: str = "content",
) -> DataFrame:
    """Watermarked tumbling-window ingest metrics.

    Late events within ``watermark`` of the max seen event time still update
    their window; older ones are dropped by the engine (the standard
    late-data contract). Output: one row per event-time window with row /
    byte / oversized counts — the streaming twin of the replay's per-epoch
    lineage metrics, but by EVENT time rather than by micro-batch."""
    size = F.octet_length(F.col(content_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(size).alias("bytes_in"),
            F.sum((size > threshold_bytes).cast("long")).alias("oversized_rows"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "rows_in",
            "bytes_in",
            "oversized_rows",
        )
    )


def session_activity_stream(
    events: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: watermarked ``session_window`` aggregation
    per ``key`` — the continuous twin of ``operators/sessions.py`` (same
    merge semantics; a session closes once the watermark passes its end,
    i.e. last event + ``gap``). In append mode each finalized session is
    emitted exactly once: ``(key, session_start, session_end, n_events)``.

    State is one open session per active key (merged in the engine's
    session-merge operator, not in Python); the shuffle is keyed by
    ``(key)`` groups like every stateful agg. Late events inside the
    watermark extend/merge their session; older ones are engine-dropped —
    the identical late-data contract as :func:`windowed_ingest_metrics`."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), sw.alias("__s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n_events",
        )
    )
