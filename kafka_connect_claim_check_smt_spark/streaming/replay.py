"""Structured Streaming CDC replay: change-log tail → claim-check offload →
salted repartition → idempotent MERGE, resumable from checkpoint.

This is the engine's entry point 3 (SURVEY.md §3): the Spark-native replacement
for the Connect runtime that pushes records through the reference SMTs. Kafka
Connect's offset management becomes a Structured Streaming checkpoint; its
at-least-once delivery is upgraded to exactly-once by the LakeTable epoch guard
(re-delivered micro-batches are skipped by batch id) plus the idempotent keyed
MERGE plus content-addressed blob writes — three independent idempotency
layers (SURVEY.md §7 "what's hard").

Design choice (deterministic > stateful): dedup is **batch-local LWW** inside
``foreachBatch`` and **cross-batch ordering is resolved by the MERGE's
commit-ordering comparison** (WHEN MATCHED AND u.commit_seq > t.commit_seq) —
no applyInPandasWithState, no watermark state to rebuild on resume; a replayed
batch recomputes byte-identical results.

Pipeline per micro-batch:
  1. LWW dedup within the batch (map-side combine, one shuffle on the key)
  2. claim-check offload (only oversized rows cross into Python)
  3. salted repartition of the oversized slice (hot-repo skew: a single repo's
     giant blobs spread across all executors — north rule requirement)
  4. MERGE into the lake table, epoch_id = micro-batch id
  5. lineage: offsets (min/max commit_seq), row/offload counts, bytes — stored
     on the epoch entry in the table manifest
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ClaimCheckConfig
from ..operators.claimcheck import CLAIM_CHECK_COL, offload
from ..operators.dedup import lww_dedup
from ..plans.lake import LakeTable


def apply_cdc_batch(
    batch: DataFrame,
    batch_id: int,
    table: LakeTable,
    cfg: ClaimCheckConfig,
    *,
    key_cols: list[str] = ("repo", "path"),
    order_col: str = "commit_seq",
    salt_partitions: int | None = None,
    uploaded_at_ms: int | None = None,
) -> dict:
    """One micro-batch through the full pipeline. Also usable for batch replay
    (call it per chunk with increasing batch_id)."""
    if str(batch_id) in table.committed_epochs():
        # fast path: skip all work for a replayed batch, not just the commit
        return {"skipped": True, "epoch_id": str(batch_id)}

    batch = batch.persist()
    try:
        # lineage inputs: offset range + row count of the raw batch
        agg = batch.agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.min(order_col).alias("offset_start"),
            F.max(order_col).alias("offset_end"),
            F.sum(F.octet_length("content")).alias("bytes_in"),
            F.sum(
                (F.octet_length("content") > cfg.threshold_bytes).cast("long")
            ).alias("oversized_rows"),
        ).collect()[0]
        if agg.rows_in == 0:
            return {"skipped": True, "epoch_id": str(batch_id), "empty": True}

        deduped = lww_dedup(batch, list(key_cols), order_col, strategy="agg")
        checked = offload(
            deduped,
            cfg,
            uploaded_at_ms=uploaded_at_ms,
            salt_partitions=salt_partitions
            or batch.sparkSession.sparkContext.defaultParallelism,
        )
        metrics = {
            "rows_in": agg.rows_in,
            "offset_start": agg.offset_start,
            "offset_end": agg.offset_end,
            "bytes_in": int(agg.bytes_in or 0),
            "oversized_rows": int(agg.oversized_rows or 0),
        }
        return table.merge(checked, epoch_id=batch_id, metrics=metrics, precombined=True)
    finally:
        batch.unpersist()


def replay_stream(
    spark: SparkSession,
    changelog_dir: str,
    table: LakeTable,
    cfg: ClaimCheckConfig,
    checkpoint_dir: str,
    *,
    schema=None,
    key_cols: list[str] = ("repo", "path"),
    order_col: str = "commit_seq",
    salt_partitions: int | None = None,
    uploaded_at_ms: int | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """Tail a parquet change-log directory and replay it into ``table``.

    ``availableNow`` trigger: processes everything present, then stops — rerun
    after new files land, or kill mid-run and rerun to resume from checkpoint
    (offsets + epoch guard make the rerun exactly-once).
    """
    if schema is None:
        schema = spark.read.parquet(changelog_dir).schema

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)

    def run_batch(df: DataFrame, bid: int) -> None:
        apply_cdc_batch(
            df,
            bid,
            table,
            cfg,
            key_cols=key_cols,
            order_col=order_col,
            salt_partitions=salt_partitions,
            uploaded_at_ms=uploaded_at_ms,
        )

    q = (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def read_back(spark: SparkSession, table: LakeTable, cfg: ClaimCheckConfig) -> DataFrame:
    """Hydrated view of the final table state (claim-checked content inlined)."""
    from ..operators.claimcheck import hydrate

    return hydrate(table.read(), cfg)
