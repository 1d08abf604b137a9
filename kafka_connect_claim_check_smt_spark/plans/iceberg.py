"""IcebergTable — the same sink interface as LakeTable, backed by a real
Apache Iceberg catalog table and SQL ``MERGE INTO``.

The north rule's sink is "key-partitioned MERGE INTO upserts to the Iceberg
sink with idempotent exactly-once semantics". LakeTable (plans/lake.py)
implements that architecture from scratch because this sandbox ships no
Iceberg runtime jar; this adapter is the production path when one is present
(``--packages org.apache.iceberg:iceberg-spark-runtime-...`` + a configured
catalog). Everything Iceberg gives natively — snapshot isolation, bucket
partition transforms, schema evolution, MERGE row-level operations — replaces
LakeTable's manifest plumbing 1:1:

  LakeTable mechanism                  | Iceberg native feature
  -------------------------------------|---------------------------------
  _versions/v{n}.json + _latest        | snapshots + current metadata ptr
  pmod(xxhash64(keys), N) bucket col   | PARTITIONED BY (bucket(N, key))
  union + window LWW + bucket rewrite  | MERGE INTO (copy-on-write)
  reconcile_schemas + conform casts    | mergeSchema / ALTER TABLE evolution
  epochs[] in the manifest             | companion _epochs append-only table
  tombstone rows + read() filter       | same (op column kept, filtered)

Delete semantics intentionally mirror LakeTable's tombstones (the op column
is retained and filtered at read) rather than MERGE's physical DELETE —
physically removing the row loses the commit-ordering watermark and lets a
stale out-of-order update resurrect the key (see lake.py's tombstone note).

Epoch guard caveat: the epoch record is appended to the companion table after
the MERGE commits, so a crash between the two re-runs the MERGE on replay —
harmless, because the MERGE itself is idempotent (keyed LWW with an ordering
predicate). Iceberg's WAP/commit-metadata could make the two atomic; not
needed for correctness.

Interface-compatibility is pytest-enforced against LakeTable
(tests/test_lake.py::test_iceberg_adapter_interface); the live path needs an
Iceberg catalog and is constructor-gated via :func:`iceberg_available`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import ClaimCheckError
from ..operators.dedup import lww_dedup
from .lake import iceberg_available


class IcebergTable:
    """Sink adapter over a real Iceberg catalog table. Same public surface as
    LakeTable: merge / read / committed_epochs / lineage_df / compact /
    vacuum / rollback / expire_versions, plus key_cols / order_col /
    num_buckets attributes."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key_cols: list[str],
        order_col: str = "commit_seq",
        *,
        num_buckets: int = 16,
        op_col: str | None = None,
        delete_value: str = "delete",
    ):
        if not iceberg_available(spark):
            raise ClaimCheckError(
                "no Iceberg runtime on the classpath — add the "
                "iceberg-spark-runtime package and a catalog config, or use "
                "plans.lake.LakeTable (same interface, self-contained format)"
            )
        self.spark = spark
        self.identifier = identifier
        self.key_cols = list(key_cols)
        self.order_col = order_col
        self.num_buckets = num_buckets
        self.op_col = op_col
        self.delete_value = delete_value
        self._epochs = f"{identifier}_epochs"

    # -- DDL -------------------------------------------------------------

    def _ensure_tables(self, like: DataFrame) -> None:
        """Create the sink (bucket-partitioned on the first key column —
        ≙ LakeTable's pmod(xxhash64(keys), N)) and the epoch companion."""
        if not self.spark.catalog.tableExists(self.identifier):
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in like.schema.fields)
            bucket_key = self.key_cols[0]
            self.spark.sql(
                f"CREATE TABLE {self.identifier} ({ddl}) USING iceberg "
                f"PARTITIONED BY (bucket({self.num_buckets}, {bucket_key}))"
            )
        if not self.spark.catalog.tableExists(self._epochs):
            self.spark.sql(
                f"CREATE TABLE {self._epochs} "
                "(epoch_id string, committed_at timestamp, metrics string, "
                "sequence_number bigint) USING iceberg"
            )
        elif "sequence_number" not in self.spark.table(self._epochs).columns:
            # migration for companion tables created before sequence
            # attribution existed; legacy rows keep NULL — rollback() treats
            # NULL as "attribution unknown" and DELETES them (see its note:
            # over-deletion only re-allows an idempotent re-merge, while
            # under-deletion silently skips a corrected replay)
            self.spark.sql(
                f"ALTER TABLE {self._epochs} ADD COLUMN sequence_number bigint"
            )

    # -- sink interface ----------------------------------------------------

    def committed_epochs(self) -> list[str]:
        if not self.spark.catalog.tableExists(self._epochs):
            return []
        return [r.epoch_id for r in self.spark.table(self._epochs).select("epoch_id").collect()]

    def merge(
        self,
        updates: DataFrame,
        *,
        epoch_id: str | int | None = None,
        metrics: dict | None = None,
        precombined: bool = False,
        strategy: str = "sort",  # accepted for interface parity; Iceberg plans the join
        pre_write_transform=None,
        touched_hint: list[int] | None = None,  # Iceberg prunes via partition stats
        tiebreaker: str | None = None,
    ) -> dict:
        """Idempotent LWW upsert via SQL MERGE INTO. ``WHEN MATCHED AND
        u.order > t.order THEN UPDATE`` is the literal north-rule clause here;
        intra-batch dedup runs first so the MERGE source has one row per key
        (SQL MERGE requires it)."""
        eid = str(epoch_id) if epoch_id is not None else None
        if eid is not None and eid in self.committed_epochs():
            return {"skipped": True, "epoch_id": eid}
        resolved = (
            updates
            if precombined
            else lww_dedup(updates, self.key_cols, self.order_col, tiebreaker=tiebreaker)
        )
        if pre_write_transform is not None:
            resolved = pre_write_transform(resolved)
        self._ensure_tables(resolved)
        # per-merge unique view name (uuid, not Python's per-process-salted
        # hash(): two identifiers colliding mod 1e8 would let concurrent
        # merges createOrReplaceTempView over each other's source), dropped
        # in a finally so the session catalog doesn't accumulate views
        import uuid

        view = f"__cc_updates_{uuid.uuid4().hex}"
        resolved.createOrReplaceTempView(view)
        try:
            on = " AND ".join(f"t.{k} = u.{k}" for k in self.key_cols)
            newer = f"u.{self.order_col} > t.{self.order_col}"
            if tiebreaker:
                newer = (
                    f"({newer} OR (u.{self.order_col} = t.{self.order_col} "
                    f"AND u.{tiebreaker} > t.{tiebreaker}))"
                )
            self.spark.sql(
                f"MERGE INTO {self.identifier} t USING {view} u ON {on} "
                f"WHEN MATCHED AND {newer} THEN UPDATE SET * "
                f"WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)

        # no epoch row without an epoch id: appending NULL rows would bloat
        # the exactly-once guard table with entries that can never match a
        # future skip-check (committed_epochs compares real ids)
        if eid is not None:
            import json as _json

            # attribute the epoch to the table's newest SEQUENCE NUMBER —
            # monotonic and unique per commit, unlike snapshot ids (random
            # 64-bit values, so "id > restored id" means nothing) or
            # committed_at (ms ties; and the restored snapshot's own epoch
            # row is written after its commit, so a timestamp cutoff would
            # off-by-one it). A zero-change MERGE creates no new snapshot
            # and attributes to the PREVIOUS sequence — correct: the epoch's
            # (empty) effect is contained in every snapshot from there on.
            # Concurrent-writer skew errs toward a LATER sequence, i.e.
            # toward rollback() over-deleting — safe, because re-merging a
            # forgotten epoch whose rows are already present is an
            # idempotent LWW no-op; under-deletion (skipping a corrected
            # replay) is the direction that must never happen.
            snap = self.spark.sql(
                f"SELECT sequence_number FROM {self.identifier}.snapshots "
                "ORDER BY sequence_number DESC LIMIT 1"
            ).collect()
            seq = int(snap[0][0]) if snap else None
            # parameterized via a DataFrame write, never string-built SQL:
            # Python repr escaping is not SQL escaping (quotes/backslashes in
            # epoch ids or metrics would corrupt the INSERT and with it the
            # exactly-once guard)
            (
                self.spark.createDataFrame(
                    [(eid, _json.dumps(metrics or {}), seq)],
                    "epoch_id string, metrics string, sequence_number long",
                )
                .withColumn("committed_at", F.current_timestamp())
                .select("epoch_id", "committed_at", "metrics", "sequence_number")
                .writeTo(self._epochs)
                .append()
            )
        return {"skipped": False, "epoch_id": eid}

    def read(self, version: int | None = None, include_tombstones: bool = False) -> DataFrame:
        df = (
            self.spark.table(self.identifier)
            if version is None
            else self.spark.read.option("snapshot-id", version).table(self.identifier)
        )
        if not include_tombstones and self.op_col and self.op_col in df.columns:
            df = df.filter(
                F.coalesce(F.col(self.op_col) != F.lit(self.delete_value), F.lit(True))
            )
        return df

    def lineage_df(self) -> DataFrame:
        return self.spark.table(self._epochs)

    def compact(self, tombstone_watermark: int | None = None) -> dict:
        """≙ LakeTable.compact: rewrite data files, expire old tombstones."""
        if tombstone_watermark is not None and self.op_col:
            dv = self.delete_value.replace("'", "''")  # SQL escaping, not repr
            self.spark.sql(
                f"DELETE FROM {self.identifier} "
                f"WHERE {self.op_col} = '{dv}' "
                f"AND {self.order_col} < {int(tombstone_watermark)}"
            )
        self.spark.sql(
            f"CALL system.rewrite_data_files(table => '{self.identifier}')"
        )
        return {"skipped": False}

    def vacuum(self, keep_versions: int = 1) -> int:
        """≙ LakeTable.vacuum: expire all but the newest snapshots."""
        rows = self.spark.sql(
            f"CALL system.expire_snapshots(table => '{self.identifier}', "
            f"retain_last => {keep_versions})"
        ).collect()
        return int(rows[0][0]) if rows else 0

    def expire_versions(self, keep_versions: int = 16) -> int:
        """≙ LakeTable.expire_versions. Iceberg's expire_snapshots covers
        both halves (data files AND snapshot metadata), so this delegates
        to :meth:`vacuum` — kept as a distinct method for interface parity
        with LakeTable, where the two halves are separate operations."""
        return self.vacuum(keep_versions)

    def rollback(self, to_version: int) -> dict:
        """≙ LakeTable.rollback (Iceberg ``rollback_to_snapshot``;
        ``to_version`` is a snapshot id). The epoch-forgetting half: the
        procedure restores only the data table, so the adapter deletes the
        companion rows committed after the restored snapshot itself —
        keyed on the snapshot's monotonic SEQUENCE NUMBER (snapshot ids are
        random and cannot be compared). Rows with NULL sequence_number
        (written before the migration, or raced) are deleted too: forgetting
        an epoch whose rows survive only re-allows an idempotent re-merge,
        while keeping a stale row would silently skip a corrected replay."""
        rows = self.spark.sql(
            f"SELECT sequence_number FROM {self.identifier}.snapshots "
            f"WHERE snapshot_id = {int(to_version)}"
        ).collect()
        if not rows:
            raise ClaimCheckError(
                f"snapshot {to_version} not found on {self.identifier} "
                "(expired or never committed)"
            )
        restored_seq = int(rows[0][0])
        # Companion rows go FIRST (round-5 ADVICE, medium): a crash between
        # the two statements then errs toward OVER-deletion — the forgotten
        # epochs' data still present until a retried rollback — which only
        # re-allows an idempotent re-merge. Deleting after the restore would
        # leave the opposite window: data restored but stale epoch rows
        # surviving, so a corrected replay of a forgotten epoch is silently
        # skipped — the exact under-deletion this method must never allow.
        self.spark.sql(
            f"DELETE FROM {self._epochs} "
            f"WHERE sequence_number > {restored_seq} OR sequence_number IS NULL"
        )
        self.spark.sql(
            f"CALL system.rollback_to_snapshot(table => '{self.identifier}', "
            f"snapshot_id => {int(to_version)})"
        )
        return {"skipped": False, "restored": int(to_version)}
