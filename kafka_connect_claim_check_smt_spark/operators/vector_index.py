"""VectorIndex — a PERSISTENT IVF-flat ANN index over a LakeTable.

The batch operator (:func:`~.similarity.ivf_cosine_topk` with a prebuilt
``index=`` frame) already established the production IVF shape: cell
assignment is the expensive part and must be amortized across query batches
(the round-3 scale probe showed inline assignment ≈ brute force). This module
makes that shape DURABLE and INCREMENTAL, the ANN sibling of
:class:`~.dedup_index.MinHashIndex`:

- **Centroids are trained once** — the first ``n_list`` vectors (by id) of
  the FIRST indexed batch, pinned to ``_index.json`` as exact
  repr-round-tripped doubles. Every later ``add``/``topk`` reuses them, so
  cell assignments never shift as the index grows (growing "first n_list of
  the table" centroids would silently reassign old vectors).
- **Assignments live in a LakeTable** keyed ``(cell, vec_id)`` and
  **bucketed by cell only** (``bucket_cols`` prefix bucketing), storing the
  embedding and its precomputed norm. A query batch resolves its ``n_probe``
  nearest cells from the centroid literals (no join, no shuffle) and reads
  ONLY those cells' buckets (:meth:`~..plans.lake.LakeTable.probe`) — at
  10^10 indexed vectors a query batch touches ~n_probe/n_list of the files.
- ``add`` is idempotent per ``epoch_id`` (streaming replay safe). Re-adding
  a vec_id with a DIFFERENT embedding is fully supported: a companion
  ``_ids`` LakeTable (keyed + bucketed by vec_id) maps every indexed id to
  its current cell, so each add bucket-probes it with the batch's ids
  (O(batch), never O(index)) and tombstones the old-cell row when the new
  assignment moves — round 4 left the stale row in the old cell and ``topk``
  could return a dead embedding forever (round-4 ADVICE). Same-cell
  re-adds were always safe (same key, newer seq wins).

Exact-arithmetic note: cosines are computed with the same left-fold
summation order as DuckDB's ``list_dot_product`` and the centroid literals
parse back to identical doubles, so :func:`vector_index_sql` replays the
whole index lifecycle (train → assign → probe → re-rank) bit-identically.

Reference parity: the reference SMT (core/src/main/.../ClaimCheckTransform.java)
has no vector search; this is one of the training-data-pipeline extensions
the build brief asks for, composed from the engine's own primitives.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import ClaimCheckError
from ..plans.lake import LakeTable
from .similarity import (
    Window,
    _bounded_topk,
    _centroid_cosines_from_values,
    _infer_dim,
    _ivf_assign,
    _pick_dot,
)


class VectorIndex:
    """Persistent incremental IVF-flat cosine ANN index."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        n_list: int = 8,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.root = Path(root).absolute()
        self.n_list = n_list
        self._cents: list[list[float]] | None = None
        ppath = self.root / "_index.json"
        if ppath.exists():
            stored = json.loads(ppath.read_text())
            if stored["n_list"] != n_list:
                raise ClaimCheckError(
                    f"index at {self.root} was built with n_list={stored['n_list']}, "
                    f"opened with n_list={n_list} — cell layout would not match"
                )
            self._cents = stored["centroids"] or None
        self.table = LakeTable(
            spark,
            str(self.root / "vectors"),
            key_cols=["cell", "vec_id"],
            order_col="seq",
            bucket_cols=["cell"],
            num_buckets=num_buckets,
            op_col="op",
        )
        # vec_id -> current cell map, bucketed by vec_id: lets add() find a
        # re-added id's OLD cell with a bucket-pruned probe (O(batch)) so the
        # stale vectors-table row can be tombstoned instead of lingering;
        # also the lookup path for remove()
        self.ids_t = LakeTable(
            spark,
            str(self.root / "ids"),
            key_cols=["vec_id"],
            order_col="seq",
            num_buckets=num_buckets,
            op_col="op",
        )

    def _save_params(self) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        # json round-trips Python floats exactly (repr-based), so reloaded
        # centroid literals parse to the identical doubles
        (self.root / "_index.json").write_text(
            json.dumps({"n_list": self.n_list, "centroids": self._cents or []})
        )

    def _centroids(self, first_batch: DataFrame | None, id_col: str, vec_col: str):
        if self._cents is None:
            if first_batch is None:
                raise ClaimCheckError(
                    f"index at {self.root} has no centroids yet — add() a batch first"
                )
            # validate into a LOCAL before touching self._cents: a failed
            # training attempt must leave the handle untouched, or a retry
            # with a big-enough batch would skip training and pin nothing
            # (round-4 ADVICE, medium)
            cents = [
                [float(x) for x in r[1]]
                for r in first_batch.select(id_col, vec_col)
                .orderBy(id_col)
                .take(self.n_list)
            ]
            if len(cents) < self.n_list:
                raise ClaimCheckError(
                    f"first batch has only {len(cents)} vectors; "
                    f"n_list={self.n_list} centroids need at least that many"
                )
            self._cents = cents
            self._save_params()
        return self._cents

    # -- write path ----------------------------------------------------------

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        epoch_id: str | int | None = None,
        assume_new: bool = False,
    ) -> dict:
        """Assign the batch to its cells (per-row fold over the pinned
        centroid literals — no shuffle) and write into the cell-bucketed
        table, keyed by (cell, vec_id) bucket.

        Write path is SPLIT by novelty so steady-state ingest is O(batch):
        ids never seen before (the common case — detected by the same
        bucket-pruned ``_ids`` probe that re-add handling already needs) are
        APPENDED (``LakeTable.append`` — no copy-on-write of existing cell
        files, whose rewrite cost would otherwise scale with the cells the
        batch lands in, i.e. with the index); re-added ids go through the
        LWW MERGE, which also plants a delete tombstone in the old cell when
        the embedding moved. The two cell-table commits use derived epoch
        ids (``{epoch}#m`` / ``{epoch}#a``) so each is independently
        idempotent, and the ids map commits LAST so a replayed ``epoch_id``
        recomputes the identical novelty split and skips exactly the commits
        that already landed (see the commit-order comment in the body).

        ``assume_new=True`` skips the ids-map probe (pure O(batch) — the
        common declared-insert-only stream never reads existing state);
        re-adding a vec_id under that promise leaves a duplicate or stale
        cell row — same contract class as ``LakeTable.append``."""
        # the ids map commits LAST (see commit-order comment below), so its
        # epoch log proves the ENTIRE add landed — a fully-replayed epoch
        # short-circuits here, before the split inputs (the map itself) have
        # moved under the novelty computation and before any featurize cost
        if epoch_id is not None and str(epoch_id) in self.ids_t.committed_epochs():
            return {"skipped": True, "epoch_id": str(epoch_id)}
        cents = self._centroids(vectors, id_col, vec_col)
        dim = len(cents[0])
        dot, _ = _pick_dot(vectors, dim)
        assigned = _ivf_assign(
            vectors, id_col, vec_col, _centroid_cosines_from_values(cents), dot
        )
        seq = self.table.current_version() + 1
        # one row per id even if the caller sent duplicates — the merge path
        # would LWW-collapse them, the append path would not
        rows = assigned.dropDuplicates([id_col]).select(
            F.col("__cell").alias("cell"),
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            F.col("__nv").alias("nv"),
            F.lit(seq).cast("long").alias("seq"),
            F.lit("upsert").alias("op"),
        ).localCheckpoint()  # feeds the ids merge, the novelty split, and both writes
        emb_t = rows.schema["embedding"].dataType
        if not assume_new and self.ids_t.current_version() > 0:
            prior = self.ids_t.probe(rows.select("vec_id")).select(
                "vec_id", F.col("cell").alias("__old_cell")
            )
            new_rows = rows.join(prior.select("vec_id"), "vec_id", "left_anti")
            readds = rows.join(prior, "vec_id")
            tombstones = readds.filter(F.col("cell") != F.col("__old_cell")).select(
                F.col("__old_cell").alias("cell"),
                "vec_id",
                F.lit(None).cast(emb_t).alias("embedding"),
                F.lit(None).cast("double").alias("nv"),
                F.lit(seq).cast("long").alias("seq"),
                F.lit("delete").alias("op"),
            )
            merge_rows = readds.drop("__old_cell").unionByName(tombstones)
        else:
            new_rows, merge_rows = rows, None
        # COMMIT ORDER: cell table first (merge then append), ids map LAST.
        # The novelty split above is a function of the ids map, so the map
        # must only advance once both cell commits are durable — then an
        # at-least-once replay recomputes the IDENTICAL split and each
        # sub-epoch guard skips exactly the commits that already landed.
        # (Map-first would reclassify the crashed batch's new ids as re-adds
        # on replay, route them to the already-committed merge sub-epoch, and
        # silently drop them.) The window where a moved vector's cells are
        # updated but the map still says the old cell only affects
        # remove()'s cell location, and heals at the replay like any other
        # partial crash.
        sub = lambda tag: None if epoch_id is None else f"{epoch_id}#{tag}"
        # an empty side is skipped WITHOUT committing (no wasted write job /
        # version churn in the steady state where every batch is new ids, or
        # all re-adds) — replay-safe because the novelty split recomputes
        # identically, so the same side is empty on every attempt
        merged = (
            self.table.merge(merge_rows, epoch_id=sub("m"))
            if merge_rows is not None and not merge_rows.isEmpty()
            else {"skipped": True}
        )
        appended = (
            self.table.append(new_rows, epoch_id=sub("a"))
            if not new_rows.isEmpty()
            else {"skipped": True}
        )
        id_seq = self.ids_t.current_version() + 1
        id_stats = self.ids_t.merge(
            rows.select(
                "vec_id",
                "cell",
                F.lit(id_seq).cast("long").alias("seq"),
                F.lit("upsert").alias("op"),
            ),
            epoch_id=epoch_id,
        )
        return {
            "skipped": bool(
                id_stats.get("skipped")
                and merged.get("skipped")
                and appended.get("skipped")
            ),
            "ids": id_stats,
            "merged": merged,
            "appended": appended,
        }

    def remove(
        self,
        ids: DataFrame,
        id_col: str = "vec_id",
        *,
        epoch_id: str | int | None = None,
    ) -> dict:
        """Retract vectors from the index (right-to-be-forgotten / CDC
        deletes), idempotently per ``epoch_id``. O(batch): the ids
        bucket-probe the ``_ids`` map for their current cells, then both the
        cell row and the map entry are tombstoned. Removed vectors stop
        appearing in topk/neardup immediately; files shrink at the normal
        compact/vacuum cycle. Unknown ids are a no-op."""
        if self.ids_t.current_version() == 0:
            return {"skipped": True}
        keys = ids.select(F.col(id_col).alias("vec_id")).distinct()
        located = self.ids_t.probe(keys).select("vec_id", "cell").localCheckpoint()
        seq = self.table.current_version() + 1
        emb_t = self.table._schema(
            self.table._manifest(self.table.current_version())
        )["embedding"].dataType
        vec_stats = self.table.merge(
            located.select(
                "cell",
                "vec_id",
                F.lit(None).cast(emb_t).alias("embedding"),
                F.lit(None).cast("double").alias("nv"),
                F.lit(seq).cast("long").alias("seq"),
                F.lit("delete").alias("op"),
            ),
            epoch_id=epoch_id,
        )
        id_seq = self.ids_t.current_version() + 1
        id_stats = self.ids_t.merge(
            located.select(
                "vec_id",
                "cell",
                F.lit(id_seq).cast("long").alias("seq"),
                F.lit("delete").alias("op"),
            ),
            epoch_id=epoch_id,
        )
        return {"vectors": vec_stats, "ids": id_stats}

    # -- query path ----------------------------------------------------------

    def _scored(
        self,
        queries: DataFrame,
        query_id_col: str,
        query_vec_col: str,
        n_probe: int,
        round_to: int,
    ) -> DataFrame:
        """(query_id, vec_id, cosine) for every candidate in each query's
        n_probe nearest cells — the shared probe core of :meth:`topk` and
        :meth:`neardup`."""
        cents = self._centroids(None, "", "")
        dim = len(cents[0])
        qvec = F.col(query_vec_col)
        dot, _ = _pick_dot(queries, dim)
        cent_cosines = _centroid_cosines_from_values(cents)
        q = (
            queries.select(query_id_col, query_vec_col)
            .withColumn("__nq", F.sqrt(dot(qvec, qvec)))
            .withColumn("__dots", cent_cosines(qvec, F.col("__nq")))
        )
        probes = q.select(
            query_id_col,
            query_vec_col,
            "__nq",
            F.posexplode("__dots").alias("cell", "__ccos"),
        )
        w = Window.partitionBy(query_id_col).orderBy(F.desc("__ccos"), F.asc("cell"))
        probes = (
            probes.withColumn("__pr", F.row_number().over(w))
            .filter(F.col("__pr") <= n_probe)
            .select(
                query_id_col, query_vec_col, "__nq", F.col("cell").cast("int").alias("cell")
            )
        )
        cand = self.table.probe(probes.select("cell"))
        return cand.join(F.broadcast(probes), "cell").select(
            F.col(query_id_col),
            F.col("vec_id"),
            F.round(
                dot(F.col("embedding"), F.col(query_vec_col))
                / (F.col("nv") * F.col("__nq")),
                round_to,
            ).alias("cosine"),
        )

    def topk(
        self,
        queries: DataFrame,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        k: int = 10,
        n_probe: int = 2,
        round_to: int = 6,
    ) -> DataFrame:
        """Approximate cosine top-k of each query against the indexed
        vectors: ``(query_id, vec_id, cosine, rank)``.

        Plan shape: per-query centroid cosines from the pinned literals
        (no join), window top-n_probe cells, ONE bucket-pruned scan of those
        cells' files, broadcast the query batch onto the candidates, exact
        re-rank with the pre-exchange WindowGroupLimit top-k. Nothing scales
        with the index except the probed-cell fraction."""
        scored = self._scored(queries, query_id_col, query_vec_col, n_probe, round_to)
        return _bounded_topk(scored, query_id_col, "vec_id", "cosine", k)

    def neardup(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        threshold: float = 0.9,
        n_probe: int = 2,
        round_to: int = 6,
    ) -> DataFrame:
        """``(probe_id, indexed_id, cosine)`` for every batch vector whose
        cosine against an already-indexed vector reaches ``threshold`` — the
        EMBEDDING sibling of :meth:`MinHashIndex.probe` (semantic near-dup
        against everything previously ingested, O(batch) via the same
        n_probe-cell bucket-pruned scan as :meth:`topk`). A vector re-sent
        under its own id is not its own duplicate. Recall caveat is standard
        IVF: a duplicate whose indexed copy sits outside the probe's n_probe
        nearest cells is missed — raise n_probe to trade cost for recall."""
        scored = self._scored(
            vectors.select(
                F.col(id_col).alias("__pid"), F.col(vec_col).alias("__pvec")
            ),
            "__pid",
            "__pvec",
            n_probe,
            round_to,
        )
        return (
            scored.filter(
                (F.col("cosine") >= F.lit(threshold))
                & (F.col("__pid") != F.col("vec_id"))
            )
            .select(
                F.col("__pid").alias("probe_id"),
                F.col("vec_id").alias("indexed_id"),
                "cosine",
            )
        )

    def compact(
        self,
        *,
        sort_by_key: bool = True,
        resolve_lww: bool = True,
        min_files_per_bucket: int | None = None,
    ) -> dict:
        """Consolidate both tables' per-epoch files and (default) drop rows
        superseded by merged re-adds/tombstones — the maintenance tick for a
        streaming index. ``min_files_per_bucket=N`` bounds the rewrite to
        buckets recent epochs touched (O(recent appends), never O(index))."""
        kw = dict(
            sort_by_key=sort_by_key,
            resolve_lww=resolve_lww,
            min_files_per_bucket=min_files_per_bucket,
        )
        return {"vectors": self.table.compact(**kw), "ids": self.ids_t.compact(**kw)}

    def vacuum(self, keep_versions: int = 1) -> dict:
        """Drop data files referenced only by expired versions (run after
        :meth:`compact`; ≙ Iceberg snapshot expiry)."""
        return {
            "vectors": self.table.vacuum(keep_versions),
            "ids": self.ids_t.vacuum(keep_versions),
        }

    def expire_versions(self, keep_versions: int = 16) -> dict:
        """Bound manifest history on both index tables (see
        ``MinHashIndex.expire_versions``)."""
        return {
            "vectors": self.table.expire_versions(keep_versions),
            "ids": self.ids_t.expire_versions(keep_versions),
        }

    def describe(self) -> dict:
        """Index health (both LakeTables) + last probe's pruning counters —
        topk's bucket-pruned cell scan is assertable from ``last_probe``."""
        return {
            "n_list": self.n_list,
            "trained": self._cents is not None,
            "vectors": self.table.stats(),
            "ids": self.ids_t.stats(),
            "last_probe": getattr(self.table, "last_probe_stats", None),
        }


def vector_index_sql(
    table: str,
    queries_sql: str,
    *,
    centroid_pred: str,
    indexed_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_list: int = 8,
    n_probe: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB oracle twin of the :class:`VectorIndex` lifecycle. Centroids
    are the first ``n_list`` vectors by id among rows matching
    ``centroid_pred`` (the Spark side's first-add batch); the indexed corpus
    is rows matching ``indexed_pred`` (the union of every add). Both
    predicates see the column ``vec_id``. Same fold order and doubles as the
    Spark plan → byte-identical rows."""
    return f"""
WITH v AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS e FROM {table}),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS c,
         sqrt(list_dot_product(e, e)) AS cn
  FROM v WHERE {centroid_pred} ORDER BY vec_id LIMIT {n_list}
),
idx AS (SELECT * FROM v WHERE {indexed_pred}),
vassign AS (
  SELECT vec_id, e, nv, cell FROM (
    SELECT idx.vec_id, idx.e, sqrt(list_dot_product(idx.e, idx.e)) AS nv, cents.cell,
           row_number() OVER (
             PARTITION BY idx.vec_id
             ORDER BY list_dot_product(idx.e, cents.c)
                        / (sqrt(list_dot_product(idx.e, idx.e)) * cents.cn) DESC,
                      cents.cell
           ) AS rn
    FROM idx CROSS JOIN cents
  ) WHERE rn = 1
),
q AS (SELECT query_id, query_vec::DOUBLE[] AS qv FROM ({queries_sql})),
probes AS (
  SELECT query_id, qv, nq, cell FROM (
    SELECT q.query_id, q.qv, sqrt(list_dot_product(q.qv, q.qv)) AS nq, cents.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, cents.c)
                        / (sqrt(list_dot_product(q.qv, q.qv)) * cents.cn) DESC,
                      cents.cell
           ) AS pr
    FROM q CROSS JOIN cents
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.query_id, va.vec_id,
         round(list_dot_product(va.e, p.qv) / (va.nv * p.nq), {round_to}) AS cosine
  FROM vassign va JOIN probes p USING (cell)
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def vector_index_neardup_sql(
    table: str,
    probe_sql: str,
    *,
    centroid_pred: str,
    indexed_pred: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_list: int = 8,
    n_probe: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :meth:`VectorIndex.neardup`: identical train → assign →
    n_probe cell probe → exact cosine, thresholded instead of top-k'd.
    ``probe_sql`` yields ``(query_id, query_vec)`` for the probe batch."""
    base = vector_index_sql(
        table,
        probe_sql,
        centroid_pred=centroid_pred,
        indexed_pred=indexed_pred,
        id_col=id_col,
        vec_col=vec_col,
        k=1,  # unused — final SELECT below replaces the top-k reduction
        n_list=n_list,
        n_probe=n_probe,
        round_to=round_to,
    )
    # reuse everything up to `scored`, swap the final reduction
    head = base[: base.rindex("SELECT query_id, vec_id, cosine, rank FROM (")]
    return (
        head
        + f"""SELECT query_id AS probe_id, vec_id AS indexed_id, cosine
FROM scored WHERE cosine >= {threshold} AND query_id <> vec_id
"""
    )
