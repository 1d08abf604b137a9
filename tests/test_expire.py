"""Snapshot/manifest expiry (``LakeTable.expire_versions`` ≙ Iceberg
expire_snapshots, metadata half).

A micro-batch stream commits one version per batch: at 10^10 events that is
millions of slot manifests that ``_head_version`` must glob per conflict
rebase, and unbounded metadata bytes. Expiry bounds both WITHOUT losing the
things correctness depends on: the exactly-once epoch history (rotated jsonl
+ head-inline tail), the current state, and loud errors — never silent wrong
answers — for reads of expired versions.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable


@pytest.fixture()
def lake_dir():
    d = tempfile.mkdtemp(prefix="lake-expire-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, lo, n, tag):
    return spark.range(n).select(
        F.format_string("k%04d", F.col("id") % 100).alias("key"),
        (F.col("id") + lo).alias("seq"),
        F.lit("upsert").alias("op"),
        F.lit(tag).alias("payload"),
    )


def _table(spark, lake_dir, **kw):
    kw.setdefault("num_buckets", 4)
    return LakeTable(spark, lake_dir, ["key"], "seq", op_col="op", **kw)


def _slots(lake_dir):
    from pathlib import Path

    return sorted(
        int(p.stem[1:]) for p in (Path(lake_dir) / "_versions").glob("v*.json")
    )


def test_expire_bounds_manifests_keeps_state_and_epochs(spark, lake_dir):
    t = _table(spark, lake_dir, epoch_tail=2)  # rotate epochs aggressively
    for i in range(6):
        t.merge(_events(spark, 1000 * i, 150, f"e{i}"), epoch_id=i)
    assert len(_slots(lake_dir)) == 6
    removed = t.expire_versions(keep_versions=2)
    assert removed == 4 and _slots(lake_dir) == [5, 6]
    # state intact, exactly-once history intact (incl. epochs whose entries
    # only survive in the rotated jsonl), new commits fine
    assert {p for p in (r.payload for r in t.read().collect())} == {"e5"}
    for i in range(6):
        assert t.merge(_events(spark, 0, 10, "dup"), epoch_id=i)["skipped"]
    t.merge(_events(spark, 9000, 150, "new"), epoch_id=99)
    assert {r.payload for r in t.read().collect()} == {"new"}
    # lineage still shows the FULL history
    assert {r.epoch_id for r in t.lineage_df().collect() if r.epoch_id is not None} == {
        str(i) for i in range(6)
    } | {"99"}


def test_expired_reads_fail_loudly_not_silently(spark, lake_dir):
    t = _table(spark, lake_dir)
    for i in range(4):
        t.merge(_events(spark, 1000 * i, 100, f"e{i}"), epoch_id=i)
    t.expire_versions(keep_versions=1)
    for fn in (
        lambda: t.read(version=1).collect(),
        lambda: t.lookup([("k0001",)], version=2).collect(),
        lambda: t.read_changes(1).collect(),
        lambda: t.rollback(2),
    ):
        with pytest.raises(ClaimCheckError, match="expired|never committed"):
            fn()
    # reads at the head and CDF from the head keep working
    assert t.read().count() == 100
    assert t.read_changes(t.current_version()).count() == 0


def test_expire_reconciles_stale_pointer_first(spark, lake_dir):
    """current_version() walks FORWARD from the _latest pointer; expiry must
    bump the pointer to the head before deleting slots, or a stale pointer
    below the gap would strand every reader at a deleted version."""
    t = _table(spark, lake_dir)
    for i in range(5):
        t.merge(_events(spark, 1000 * i, 100, f"e{i}"), epoch_id=i)
    # simulate the crash window: pointer lags the true head
    (t.root / "_latest").write_text("1")
    t.expire_versions(keep_versions=2)
    fresh = _table(spark, lake_dir)
    assert fresh.current_version() == 5
    assert {r.payload for r in fresh.read().collect()} == {"e4"}


def test_expire_then_vacuum_and_bounds(spark, lake_dir):
    t = _table(spark, lake_dir)
    for i in range(4):
        t.merge(_events(spark, 1000 * i, 100, f"e{i}"), epoch_id=i)
    t.expire_versions(keep_versions=2)
    # vacuum with a keep range reaching below the expired cutoff must skip
    # the expired versions, not raise
    t.vacuum(keep_versions=10)
    assert {r.payload for r in t.read().collect()} == {"e3"}
    with pytest.raises(ClaimCheckError):
        t.expire_versions(keep_versions=0)
    # idempotent: nothing left to expire
    assert t.expire_versions(keep_versions=2) == 0


def test_stats_surface_maintenance_state(spark, lake_dir):
    t = _table(spark, lake_dir)
    for i in range(4):
        t.merge(_events(spark, 1000 * i, 100, f"e{i}"), epoch_id=i)
    s = t.stats()
    assert s["manifests_retained"] == 4 and s["excluded_version_ranges"] == []
    t.rollback(2)
    t.expire_versions(keep_versions=2)
    s = t.stats()
    assert s["manifests_retained"] == 2
    assert s["excluded_version_ranges"] == [[3, 4]]


def test_pointer_regression_below_expired_slot_heals(spark, lake_dir):
    """The residual check-then-flip race in _commit can land a STALE pointer
    value after expire_versions deleted that slot; current_version must fall
    back to the glob head (and repair the pointer) instead of stranding
    every reader at a deleted version."""
    t = _table(spark, lake_dir)
    for i in range(5):
        t.merge(_events(spark, 1000 * i, 100, f"e{i}"), epoch_id=i)
    t.expire_versions(keep_versions=2)
    (t.root / "_latest").write_text("1")  # the raced, now-expired pointer
    fresh = _table(spark, lake_dir)
    assert fresh.current_version() == 5
    assert {r.payload for r in fresh.read().collect()} == {"e4"}
    # the pointer was repaired, so the next read is O(1) again
    assert int((t.root / "_latest").read_text()) == 5
    # and a table whose pointer file is gone entirely also recovers
    (t.root / "_latest").unlink()
    assert _table(spark, lake_dir).current_version() == 5
