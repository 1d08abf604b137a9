"""Near-duplicate cluster resolution — the ACTION step of web-scale dedup.

The pair-producing operators (minhash/simhash/ngram/embedding near-dup) emit
edges; deduplicating a corpus additionally needs the transitive closure of
those edges (doc A ~ B, B ~ C ⇒ {A,B,C} are one duplicate cluster) and a
deterministic representative per cluster. This module supplies both:

- :func:`connected_components` — min-label propagation with pointer jumping
  (the DataFrame spelling of the classic MapReduce "hash-to-min" connected
  components): each round takes the min label over neighbors, then shortcuts
  label→label-of-label. Pointer jumping makes convergence O(log diameter)
  rounds instead of O(diameter); near-dup clusters are in practice
  star-/clique-shaped, so 2-4 rounds settle real corpora. Each round is two
  shuffles (a groupBy(node) and a label join), both keyed by uniform doc
  ids. The edge list is localCheckpointed once; labels are re-checkpointed
  per round so the iterative lineage never grows. The fixed point (min id
  reachable) is unique, so results are independent of round count — fully
  deterministic and oracle-checkable.
- :func:`assign_clusters` — annotate a corpus with ``cluster_id`` (the min
  doc id of its component; singletons label themselves) and
  ``is_representative`` (the canonical keep/drop flag: keeping exactly the
  representatives dedups the corpus).

Both have exact DuckDB twins (``WITH RECURSIVE`` reachability + min), so the
full pipeline corpus → candidate pairs → clusters → representatives is
hash-oracle-checked end-to-end.

Scale note (10^10 docs): rounds are O(log diameter); the dominant cost is
the per-round edge-label join, O(|edges|) shuffled bytes carrying only
(id, id) pairs; convergence detection is an exact decimal label-sum scan
(labels are monotone decreasing) for numeric ids — no per-round old⋈new
join. Pathological mega-components (everything transitively
similar) concentrate one label's updates but not one REDUCER's keys — the
groupBy key is the node, not the label, so there is no hot key. The
upstream ``max_candidates_per_doc`` / ``max_doc_freq`` caps bound |edges|
to ~cap·docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Connected components did not settle within max_iterations."""


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iterations: int = 25,
    small_graph_rows: int = 1_000_000,
) -> DataFrame:
    """(id, cluster_id) for every id appearing in ``pairs``; cluster_id is
    the component's minimum id (lexicographic for string ids — any total
    order works, min is just the canonical deterministic choice).

    ``small_graph_rows``: when the (already materialized) edge list has at
    most this many rows, the iteration runs single-partition — 3-4 rounds of
    2-shuffle joins otherwise pay ~32 tasks of pure scheduling overhead per
    stage on a few hundred edges (measured 24 s → seconds at sf0.1). The
    count is free (edges are localCheckpointed first) and the 100 TB path —
    edge lists above the threshold — is untouched."""
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    small = edges.count() <= small_graph_rows
    if small:
        edges = edges.coalesce(1)
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint()
    )
    # Convergence detection: labels only ever DECREASE, so for numeric ids
    # the exact total sum(lab) strictly decreases iff any label changed —
    # one aggregate scan per round instead of an old⋈new |V|-join (which
    # costs a full shuffle join per round at corpus scale). DECIMAL(38,0)
    # keeps the sum exact far past 10^10 docs × 64-bit ids (a wrapped
    # BIGINT sum could alias a real change to "unchanged" = wrong labels).
    # Non-numeric ids (no total sum) keep the exact join check.
    numeric_ids = labels.schema["lab"].dataType.typeName() in {
        "byte", "short", "integer", "long",
    }

    def _labsum(df: DataFrame):
        return df.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _labsum(labels) if numeric_ids else None
    for _ in range(max_iterations):
        # min label over neighbors, then least(own, neighbors')
        lab_b = labels.select(F.col("id").alias("b"), F.col("lab").alias("nlab"))
        nbr_min = (
            edges.join(lab_b, "b")
            .groupBy("a")
            .agg(F.min("nlab").alias("nmin"))
            .select(F.col("a").alias("id"), "nmin")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id", F.least("lab", F.coalesce("nmin", "lab")).alias("lab")
        )
        # pointer jump: lab := lab(lab). Labels only ever decrease and every
        # label is itself a node id, so the parent join always matches and
        # parent.lab <= own lab — O(log diameter) total rounds.
        parent = stepped.select(F.col("id").alias("__pid"), F.col("lab").alias("plab"))
        jumped = stepped.join(
            parent, stepped["lab"] == parent["__pid"], "left"
        ).select("id", F.coalesce("plab", "lab").alias("lab"))
        if small:
            jumped = jumped.coalesce(1)
        jumped = jumped.localCheckpoint()
        if numeric_ids:
            new_sum = _labsum(jumped)
            settled = new_sum == prev_sum
            prev_sum = new_sum
        else:
            settled = (
                jumped.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .count()
            ) == 0
        labels = jumped
        if settled:
            return labels.select("id", F.col("lab").alias("cluster_id"))
    raise ConvergenceError(
        f"connected components not settled after {max_iterations} rounds — "
        "pass a larger max_iterations (diameter/log-diameter bound exceeded)"
    )


def assign_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Corpus + ``cluster_id`` + ``is_representative``.

    Docs in no pair are singleton clusters of themselves. Keeping rows where
    ``is_representative`` dedups the corpus to one doc per near-dup cluster
    (the min-id doc — deterministic under replay)."""
    comp = connected_components(
        pairs, id_a, id_b, max_iterations=max_iterations
    ).select(F.col("id").alias(id_col), "cluster_id")
    out = df.join(comp, id_col, "left")
    cid = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return out.withColumn("cluster_id", cid).withColumn(
        "is_representative", F.col("cluster_id") == F.col(id_col)
    )


def connected_components_sql(
    pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b"
) -> str:
    """DuckDB twin of :func:`connected_components`: enumerate reachability
    with WITH RECURSIVE (UNION dedup ⇒ termination), take min per node.
    Exponential-free for oracle-scale graphs; the Spark side is the engine
    for real corpora."""
    return f"""
WITH RECURSIVE __cc_pairs AS (
  SELECT * FROM ({pairs_sql}) __p
),
__cc_edges AS (
  SELECT {id_a} AS a, {id_b} AS b FROM __cc_pairs
  UNION
  SELECT {id_b} AS a, {id_a} AS b FROM __cc_pairs
),
__cc_reach(id, r) AS (
  SELECT a, a FROM __cc_edges
  UNION
  SELECT __cc_reach.id, e.b FROM __cc_reach JOIN __cc_edges e ON e.a = __cc_reach.r
)
SELECT id, min(r) AS cluster_id FROM __cc_reach GROUP BY id
"""


def assign_clusters_sql(
    table: str,
    id_col: str,
    pairs_sql: str,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    select: str | None = None,
) -> str:
    """DuckDB twin of :func:`assign_clusters`."""
    cols = select or f"{table}.{id_col}"
    return f"""
WITH __cc AS (
  {connected_components_sql(pairs_sql, id_a, id_b)}
)
SELECT {cols},
       coalesce(__cc.cluster_id, {table}.{id_col}) AS cluster_id,
       (coalesce(__cc.cluster_id, {table}.{id_col}) = {table}.{id_col})
           AS is_representative
FROM {table} LEFT JOIN __cc ON __cc.id = {table}.{id_col}
"""
