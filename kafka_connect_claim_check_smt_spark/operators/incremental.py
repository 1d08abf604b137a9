"""Incremental view maintenance over the change data feed.

Downstream rollups of a CDC-ingested table (per-repo counts, bytes, language
mixes, ...) shouldn't rescan 100 TB per refresh. For additive measures
(SUM/COUNT — the self-maintainable class from the materialized-view
literature), the delta between two table versions is itself an aggregate of
the CDF rows with a sign: postimages and inserts add, preimages and deletes
subtract. Maintaining the view is then

    view(v2) = apply_agg_delta(view(v1), agg_delta(read_changes(v1, v2)))

— one shuffle over the (small) delta plus one join against the current view,
never a scan of the base table. The reference SMT has no table format, so this
extends the engine's lake layer rather than mirroring reference behavior.

Scale: ``agg_delta`` map-side combines before its single hash shuffle;
``apply_agg_delta`` is a full-outer join keyed by the group columns — the view
side is the aggregate (orders of magnitude smaller than the base table) and
the delta side is proportional to the change set. Groups whose row count
reaches zero are dropped, so deletes retract cleanly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def agg_delta(
    changes: DataFrame,
    group_cols: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Signed aggregate of a CDF frame: for each group, the net amount each
    additive measure moved between the two versions.

    ``measures`` maps output column name → per-row contribution expression
    (``F.lit(1)`` for a row count, ``F.octet_length("content")`` for bytes).
    Contributions must be additive; MIN/MAX are not maintainable from deltas
    alone and belong in a recompute, not here.
    """
    sign = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    rows = changes.select(
        *group_cols,
        *[(sign * m.cast("long")).alias(k) for k, m in measures.items()],
    )
    return rows.groupBy(*group_cols).agg(
        *[F.sum(k).alias(k) for k in measures]
    )


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    count_col: str,
) -> DataFrame:
    """Merge an ``agg_delta`` result into the current view state.

    Full-outer join on the group columns, coalesced sum per measure; groups
    whose ``count_col`` (the row-count measure) lands at zero are dropped —
    a group fully deleted from the base table disappears from the view.
    Non-zero measures with a zero count would mean a non-additive measure or
    a malformed delta; they are dropped with the group by design.
    """
    measures = [c for c in delta.columns if c not in group_cols]
    if count_col not in measures:
        raise ValueError(f"count_col {count_col!r} not among delta measures {measures}")
    v = view.select(*group_cols, *[F.col(c).alias(f"__v_{c}") for c in measures])
    d = delta.select(*group_cols, *[F.col(c).alias(f"__d_{c}") for c in measures])
    merged = v.join(d, on=group_cols, how="full_outer").select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(f"__v_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in measures
        ],
    )
    return merged.filter(F.col(count_col) > 0)


def aggregate_view(
    table_df: DataFrame,
    group_cols: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Full recompute of the same view shape — the bootstrap (and the oracle
    the incremental path must equal): ``aggregate_view(read(v2)) ==
    apply_agg_delta(aggregate_view(read(v1)), agg_delta(cdf))`` exactly."""
    rows = table_df.select(
        *group_cols, *[m.cast("long").alias(k) for k, m in measures.items()]
    )
    return rows.groupBy(*group_cols).agg(*[F.sum(k).alias(k) for k in measures])
