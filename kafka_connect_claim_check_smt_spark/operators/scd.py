"""Slowly-changing-dimension Type 2 history from a change log.

LWW replay (the engine's main path) keeps only each key's final state; a
warehouse dimension usually needs the full version history with validity
intervals — SCD Type 2. Given the change log, every event becomes one
history row with

    valid_from  = its own commit order
    valid_to    = the NEXT event's order for the same key (NULL while open)
    is_current  = no later event exists AND the row isn't a delete

A delete closes the key's history (the tombstone row itself carries
``is_current = false``), and a later re-insert opens a new interval — the
standard warehouse treatment.

This composes with the rest of the engine: `asof_join` against the history
resolves "state as of T" queries, and the output is a plain DataFrame to
MERGE into a LakeTable keyed (keys..., valid_from) — every history row has a
unique key, so the write stays an idempotent insert-only merge.

Scale: ONE window pass — hash shuffle by key, sort by order within key
(identical shape to lww_dedup's window strategy); no self-join, no range
join. Skew follows the key distribution like every other keyed op here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    events: DataFrame,
    key_cols: list[str],
    order_col: str,
    *,
    op_col: str | None = None,
    delete_value: str = "delete",
    tiebreaker: str | None = None,
) -> DataFrame:
    """All events annotated with ``valid_from`` / ``valid_to`` /
    ``is_current``. ``tiebreaker`` (a unique event id) makes interval
    boundaries deterministic when ``order_col`` can tie within a key."""
    order = [F.col(order_col).asc()] + ([F.col(tiebreaker).asc()] if tiebreaker else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(order_col).over(w)
    is_delete = (
        (F.col(op_col) == F.lit(delete_value)) if op_col else F.lit(False)
    )
    return events.select(
        "*",
        F.col(order_col).alias("valid_from"),
        nxt.alias("valid_to"),
        (nxt.isNull() & ~F.coalesce(is_delete, F.lit(False))).alias("is_current"),
    )
