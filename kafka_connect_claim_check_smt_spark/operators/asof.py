"""As-of (temporal) join — an operator Spark lacks natively.

CDC pipelines constantly need "each fact row joined to the dimension state
that was current WHEN the fact happened": events against the latest earlier
repo metadata snapshot, trades against the prevailing quote, a change row
against the schema version it was written under. Spark has no ASOF JOIN;
the naive spelling (range join + row_number) explodes to |L|·|R| per key
before pruning.

This is the scalable formulation: tag both sides, UNION them, and resolve
with ONE window pass —

    union → hash-shuffle by key → sort by (event order, right-before-left on
    ties) → last_value(right attrs, ignoreNulls) → keep left rows

Exactly one shuffle keyed by the join keys (the same shape as the engine's
LWW dedup), no range explosion, no skew beyond what the key distribution
already has. Ties (right.order == left.order) match, i.e. backward-inclusive
— the same semantics as DuckDB's ASOF JOIN (``l.t >= r.t``), which is the
oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_order: str,
    right_order: str | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains, for each of
    ``right_cols``, the value from the LATEST ``right`` row with the same
    ``on`` keys and ``right_order <= left_order`` (NULL when no such row).

    ``right_order`` defaults to ``left_order`` (same column name both
    sides). Output = all left columns + ``right_cols`` (which must not
    collide with left column names — rename on the right side first).
    """
    right_order = right_order or left_order
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_order
    ]
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_cols {sorted(collisions)} collide with left columns — "
            "alias them on the right side first"
        )
    # the right payload rides as ONE struct: a matched right row whose
    # attributes are all NULL still matches (the struct itself is non-null),
    # unlike per-column last(ignorenulls) which would skip past it
    r_struct = right.select(
        *on,
        F.col(right_order).cast("long").alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_cols).alias("__r"),
    )
    l_tagged = left.select(
        *on,
        F.col(left_order).cast("long").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct.schema["__r"].dataType).alias("__r"),
    )
    r_tagged = r_struct.withColumn(
        "__l", F.lit(None).cast(l_tagged.schema["__l"].dataType)
    )
    u = l_tagged.unionByName(r_tagged)
    # ties: right (__is_left=0) sorts before left, so an equal-order right
    # row IS visible to the left row — backward-inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = u.select(
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    ).filter(F.col("__is_left") == 1)
    return resolved.select("__l.*", *[F.col(f"__r.{c}").alias(c) for c in right_cols])
