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

MIN/MAX — not self-maintainable under deletion — get the standard
flag-and-recompute treatment instead (:func:`apply_minmax_delta`): groups
whose delta is purely additive are maintained from the delta alone;
groups touched by a delete/update-preimage are recomputed from the base
snapshot filtered to exactly those groups.
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


_MM_AGG = {"min": F.min, "max": F.max}
_MM_COMBINE = {"min": F.least, "max": F.greatest}  # both skip NULL args


def minmax_view(
    table_df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, Column]],
) -> DataFrame:
    """Full recompute of a MIN/MAX view: ``measures`` maps output column →
    ``("min"|"max", per-row expression)``. The bootstrap, and the oracle
    :func:`apply_minmax_delta` must equal exactly."""
    for k, (kind, _) in measures.items():
        if kind not in _MM_AGG:
            raise ValueError(f"measure {k!r}: kind must be 'min' or 'max', got {kind!r}")
    rows = table_df.select(
        *group_cols, *[m.alias(k) for k, (_, m) in measures.items()]
    )
    return rows.groupBy(*group_cols).agg(
        *[_MM_AGG[kind](k).alias(k) for k, (kind, _) in measures.items()]
    )


def apply_minmax_delta(
    view: DataFrame,
    changes: DataFrame,
    base: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, Column]],
) -> DataFrame:
    """Maintain a MIN/MAX view from a CDF frame — flag-and-recompute.

    MIN/MAX are NOT self-maintainable under deletion (removing the current
    extreme needs the runner-up, which the view no longer has), so groups are
    split by what their delta contains:

    - **clean groups** (additive changes only — inserts/update-postimages):
      the new extreme is ``least/greatest(old, extreme(adds))`` — pure delta
      math, no base access. This is the overwhelmingly common CDC case
      (append-mostly logs).
    - **dirty groups** (any subtractive row — delete/update-preimage): the
      removed row MAY have been the extreme, so the group is recomputed from
      the post-change base snapshot, filtered to exactly the dirty groups.
      Conservative on purpose: deciding "the deleted value wasn't the
      extreme" needs the value compared per-measure; flagging the group is
      one cheap distinct over the delta.

    ``base`` is the CURRENT table snapshot (e.g. ``table.read()``). Scale:
    the dirty set is proportional to the delete slice of the delta, not the
    table; the recompute is a semi-join-filtered scan (broadcastable dirty
    side, group predicates reach the parquet row-group stats), and when
    ``group_cols`` is a prefix of the lake key the caller can pre-prune with
    the manifest's bucket file lists (``plans/lake.py::lookup``) instead of
    passing the full ``read()``. Groups fully deleted from the base vanish
    from the view (the recompute returns no rows for them).
    """
    add_rows = changes.filter(F.col("_change_type").isin(*_ADD))
    sub_rows = changes.filter(F.col("_change_type").isin(*_SUB))
    dirty = sub_rows.select(*group_cols).distinct()

    add_delta = (
        add_rows.select(*group_cols, *[m.alias(k) for k, (_, m) in measures.items()])
        .groupBy(*group_cols)
        .agg(*[_MM_AGG[kind](k).alias(k) for k, (kind, _) in measures.items()])
    )
    clean_view = view.join(dirty, group_cols, "left_anti").select(
        *group_cols, *[F.col(k).alias(f"__v_{k}") for k in measures]
    )
    clean_delta = add_delta.join(dirty, group_cols, "left_anti").select(
        *group_cols, *[F.col(k).alias(f"__d_{k}") for k in measures]
    )
    clean = clean_view.join(clean_delta, group_cols, "full_outer").select(
        *group_cols,
        *[
            _MM_COMBINE[kind](F.col(f"__v_{k}"), F.col(f"__d_{k}")).alias(k)
            for k, (kind, _) in measures.items()
        ],
    )
    recomputed = minmax_view(
        base.join(dirty, group_cols, "left_semi"), group_cols, measures
    )
    return clean.unionByName(recomputed)


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
