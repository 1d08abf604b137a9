"""Key dedup operators — CDC last-writer-wins resolution.

The reference has no relational operators (SURVEY.md §2); LWW dedup is required
by the target pipeline (north rule: "resolves per-key last-writer-wins using
window/row_number dedup on (repo, path) keyed by commit ordering").

Two physical strategies, same semantics:

- ``strategy="agg"`` (default): ``groupBy(keys).agg(max_by(struct(*), order))``.
  Hash aggregation with **map-side partial aggregation** — each task reduces its
  partition to at most |distinct keys| rows before the shuffle. At 10^10 events
  with heavy update skew this moves a tiny fraction of the input through the
  shuffle. This is the plan you want at 100 TB.

- ``strategy="window"``: ``row_number() OVER (PARTITION BY keys ORDER BY order
  DESC) = 1``. Shuffles **every** row to its key's reducer and sorts. Kept
  because it is the literal north-rule formulation and as an oracle for the agg
  strategy (tests assert both produce identical results).

Ordering must be total per key: pass a ``tiebreaker`` column (e.g. event_id)
when the order column can tie; otherwise winners are nondeterministic under
retries — unacceptable for exactly-once replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreaker: str | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """Keep, per key, the row with the greatest (order_col, tiebreaker)."""
    ord_cols = [order_col] + ([tiebreaker] if tiebreaker else [])
    payload = [c for c in df.columns if c not in key_cols]

    if strategy == "window":
        w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in ord_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    if strategy != "agg":
        raise ValueError(f"unknown strategy {strategy!r}")

    ordering = F.struct(*[F.col(c) for c in ord_cols])
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), ordering).alias("__w")
    out = df.groupBy(*key_cols).agg(winner)
    return out.select(
        *[F.col(c) if c in key_cols else F.col(f"__w.{c}").alias(c) for c in df.columns]
    )


def exact_dedup(df: DataFrame, content_col: str = "content", keep: str = "min", id_col: str | None = None) -> DataFrame:
    """Exact content dedup: one representative row per distinct content hash.

    Hash-groupBy with partial aggregation — the canonical web-scale exact-dedup
    plan (shuffle key = sha256, uniform by construction, no skew)."""
    h = F.sha2(F.col(content_col), 256).alias("__h")
    if id_col is None:
        id_col = df.columns[0]
    agg = F.min_by if keep == "min" else F.max_by
    payload = F.struct(*[F.col(c) for c in df.columns])
    out = df.select(h, F.col(id_col).alias("__id"), payload.alias("__p"))
    out = out.groupBy("__h").agg(agg(F.col("__p"), F.col("__id")).alias("__w"))
    return out.select([F.col(f"__w.{c}").alias(c) for c in df.columns])


def committed_epoch_anti_join(updates: DataFrame, committed: DataFrame, epoch_col: str = "epoch_id") -> DataFrame:
    """Drop updates belonging to already-committed epochs.

    ``left_anti`` against the (tiny) committed-epoch set — Catalyst broadcasts
    the right side, so this is a map-side filter, no shuffle. Part of the
    exactly-once guard (north rule: "checkpointed epoch/commit-id dedup")."""
    return updates.join(F.broadcast(committed.select(epoch_col).distinct()), on=epoch_col, how="left_anti")
