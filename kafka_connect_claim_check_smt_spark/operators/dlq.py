"""Dead-letter routing for malformed change events.

Kafka Connect runs the reference SMT under ``errors.tolerance=all`` +
``errors.deadletterqueue.topic.name`` so one corrupt record doesn't stall the
connector (reference behavior: ClaimCheckSinkTransform throws on unparseable
claim-check metadata — the Connect runtime catches and routes). This module is
that contract for the Spark pipeline: classify each event against the CDC
sink's invariants, quarantine violators with a reason, and let the rest flow.

Classification is pure Catalyst (one pass, no UDF) and ordered by first-match
priority so a row with several defects lands one deterministic reason —
reasons are therefore oracle-checkable in DuckDB with the same CASE ladder.

Scale: routing adds a handful of null/length predicates to the existing batch
scan — no extra shuffle, no extra pass. The DLQ write per epoch is an
overwrite of ``<dlq>/epoch=<id>`` so a replayed micro-batch rewrites the same
quarantine rows instead of duplicating them (idempotent alongside the epoch
guard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "_dlq_reason"

#: classification priority (first match wins)
NULL_KEY = "null_key"
BAD_ORDER = "bad_order"
BAD_METADATA = "bad_metadata"
EMPTY_PAYLOAD = "empty_payload"
RECORD_TOO_LARGE = "record_too_large"


def classify_events(
    events: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    content_col: str = "content",
    op_col: str | None = None,
    delete_value: str = "delete",
    metadata_col: str | None = None,
    max_record_bytes: int | None = None,
) -> DataFrame:
    """Tag every event with ``_dlq_reason`` (NULL = valid).

    Rules, in priority order:
    - ``null_key``: any key column NULL or empty string — an unroutable row
      (no bucket, no LWW identity).
    - ``bad_order``: NULL or negative ``order_col`` — breaks LWW and the
      lineage offsets.
    - ``bad_metadata``: ``metadata_col`` (a claim-check header string) present
      but not parseable as JSON (≙ the reference's strict header parse).
    - ``empty_payload``: NULL content on a non-delete event (deletes
      legitimately carry no payload).
    - ``record_too_large``: content above the hard cap (≙ broker
      ``max.message.bytes`` — rows too big to have entered the log).
    """
    if not key_cols:
        raise ValueError(
            "classify_events requires at least one key column — with no key "
            "there is no routing identity to validate"
        )
    checks: list[tuple[Column, str]] = []
    key_bad = None
    for c in key_cols:
        cond = F.col(c).isNull() | (F.col(c).cast("string") == F.lit(""))
        key_bad = cond if key_bad is None else (key_bad | cond)
    checks.append((key_bad, NULL_KEY))
    checks.append(
        (F.col(order_col).isNull() | (F.col(order_col) < F.lit(0)), BAD_ORDER)
    )
    if metadata_col is not None:
        parsed = F.try_parse_json(F.col(metadata_col))
        checks.append((F.col(metadata_col).isNotNull() & parsed.isNull(), BAD_METADATA))
    is_delete = (
        (F.col(op_col) == F.lit(delete_value)) if op_col else F.lit(False)
    )
    checks.append((F.col(content_col).isNull() & ~F.coalesce(is_delete, F.lit(False)), EMPTY_PAYLOAD))
    if max_record_bytes is not None:
        checks.append(
            (F.octet_length(content_col) > F.lit(max_record_bytes), RECORD_TOO_LARGE)
        )
    out = None
    for cond, tag in checks:
        c = F.coalesce(cond, F.lit(False))
        out = F.when(c, F.lit(tag)) if out is None else out.when(c, F.lit(tag))
    return events.withColumn(REASON_COL, out.otherwise(F.lit(None).cast("string")))


def split_dlq(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, dead): valid rows with the reason column dropped, dead rows
    with it kept. Two filters over one plan — Catalyst reuses the scan."""
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    dead = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, dead


def write_dlq(dead: DataFrame, dlq_path: str, epoch_id: str | int) -> None:
    """Quarantine one epoch's dead rows: overwrite ``<dlq>/epoch=<id>`` so a
    replayed batch rewrites, never duplicates (pairs with the epoch guard)."""
    dead.withColumn("_dlq_epoch", F.lit(str(epoch_id))).write.mode(
        "overwrite"
    ).parquet(f"{dlq_path}/epoch={epoch_id}")


def read_dlq(spark, dlq_path: str) -> DataFrame:
    """All quarantined rows under ``dlq_path``, across epochs AND across the
    namespaces :func:`route_cdc_batch` writes (``<dlq>/<table>/epoch=*`` plus
    ``<dlq>/unknown_table/epoch=*``) as well as the flat single-table layout
    (``<dlq>/epoch=*``). ``recursiveFileLookup`` walks every layout in one
    scan; the epoch id is carried in the ``_dlq_epoch`` data column (written
    by :func:`write_dlq`), so no partition-dir inference is needed."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", "true")
        .parquet(dlq_path)
    )
