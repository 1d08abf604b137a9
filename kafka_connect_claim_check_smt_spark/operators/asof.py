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
from pyspark.sql import types as T

from .sessions import _micros

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _order_expr(df: DataFrame, col: str) -> tuple[F.Column, str]:
    """(order-as-BIGINT expression, unit tag) for an as-of order column.

    TIMESTAMP / TIMESTAMP_NTZ go through :func:`sessions._micros` — a bare
    ``cast("long")`` would truncate to epoch SECONDS, so two right rows in
    the same second would tie arbitrarily and sub-second backward-
    inclusiveness would be wrong (DuckDB's ASOF oracle compares at full
    precision). Integral types pass through; DATE becomes epoch days.
    Anything else (DOUBLE, DECIMAL, STRING…) is rejected rather than
    silently truncated. The unit tag makes cross-side mismatches (left
    TIMESTAMP vs right BIGINT) a hard error instead of a unit bug.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _micros(df, col), "micros"
    if isinstance(dt, _INTEGRAL):
        return F.col(col).cast("long"), "integral"
    if isinstance(dt, T.DateType):
        return F.unix_date(F.col(col)).cast("long"), "days"
    raise TypeError(
        f"asof order column {col!r} has non-temporal, non-integral type "
        f"{dt.simpleString()}; cast it explicitly to a timestamp or integer"
    )


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
    l_expr, l_unit = _order_expr(left, left_order)
    r_expr, r_unit = _order_expr(right, right_order)
    if l_unit != r_unit:
        raise TypeError(
            f"asof order columns disagree: left {left_order!r} is {l_unit}, "
            f"right {right_order!r} is {r_unit} — align the types first"
        )
    # ASOF never matches on a NULL order: a NULL right order would cast to
    # NULL, sort FIRST under asc, and last(ignorenulls) would then hand it
    # to every left row as a phantom "match" — drop such rows up front.
    right = right.filter(F.col(right_order).isNotNull())
    # the right payload rides as ONE struct: a matched right row whose
    # attributes are all NULL still matches (the struct itself is non-null),
    # unlike per-column last(ignorenulls) which would skip past it
    r_struct = right.select(
        *on,
        r_expr.alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_cols).alias("__r"),
    )
    l_tagged = left.select(
        *on,
        l_expr.alias("__t"),
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
