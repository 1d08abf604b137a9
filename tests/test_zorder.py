"""Z-order (Morton) clustering compaction: ``compact(cluster_by=[...])``.

Why it exists: ``sort_by_key`` gives tight file/row-group stats on the
LEADING key only — a predicate on any other column still scans every file
of every admitted bucket. Z-ordering sorts each bucket by the interleaved
quantile-rank bits of N columns, and with ``max_records_per_file`` each
data file becomes a contiguous multi-dimensional range, so the manifest
zone maps prune files for predicates on ANY clustered column
(≙ Iceberg/Delta z-order rewrite_data_files). At 10^10 rows this is the
difference between "range scans are fast on the one column we sorted by"
and "range scans are fast on every dimension analysts actually filter on".
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
from kafka_connect_claim_check_smt_spark.plans.lake import (
    LakeTable,
    _zorder_boundaries,
    _zrank_expr,
    _zvalue_expr,
)


@pytest.fixture()
def lake_dir():
    d = tempfile.mkdtemp(prefix="lake-z-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _morton(ranks: list[int], bits: int) -> int:
    z = 0
    nd = len(ranks)
    for i in range(bits):
        for d, r in enumerate(ranks):
            z |= ((r >> i) & 1) << (i * nd + d)
    return z


# -- expression units ---------------------------------------------------------


def test_zvalue_interleave_matches_model(spark):
    df = spark.createDataFrame(
        [(rx, ry) for rx in range(8) for ry in range(8)], "rx int, ry int"
    )
    got = {
        (r.rx, r.ry): r.z
        for r in df.withColumn(
            "z", _zvalue_expr([F.col("rx"), F.col("ry")], bits=3)
        ).collect()
    }
    for (rx, ry), z in got.items():
        assert z == _morton([rx, ry], 3), (rx, ry)


def test_zrank_counts_boundaries_and_sends_null_low(spark):
    df = spark.createDataFrame(
        [(5,), (10,), (25,), (35,), (None,)], "v int"
    )
    out = {
        r.v: r.rank
        for r in df.withColumn("rank", _zrank_expr("v", [10, 20, 30])).collect()
    }
    assert out == {5: 0, 10: 1, 25: 2, 35: 3, None: 0}


def test_boundaries_are_quantiles_and_bounded(spark):
    df = spark.range(4000).select(
        (F.col("id") % 64).alias("x"),
        F.concat(F.lit("s"), F.format_string("%04d", F.col("id") % 100)).alias("s"),
    )
    b = _zorder_boundaries(df, ["x", "s"], bits=3, n_rows_est=4000)
    assert 1 <= len(b["x"]) <= 7 and b["x"] == sorted(b["x"])
    assert 1 <= len(b["s"]) <= 7 and all(isinstance(v, str) for v in b["s"])


# -- table-level behavior ------------------------------------------------------


def _xy_table(spark, lake_dir, n=4000, buckets=2):
    """Event-keyed table with two independent low-cardinality dims: x is
    id-aligned, y is decorrelated (multiplicative shuffle) — the shape where
    one sort order cannot serve both predicates."""
    t = LakeTable(
        spark, lake_dir, ["event_id"], "seq", num_buckets=buckets,
        stats_cols=["event_id", "seq"],
    )
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("seq"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37 + 11) % 64).alias("y"),
    )
    t.append(df.filter(F.col("id") % 2 == 0), epoch_id="e0")
    t.append(df.filter(F.col("id") % 2 == 1), epoch_id="e1")
    return t, df


def test_cluster_compact_prunes_both_dimensions(spark, lake_dir):
    t, df = _xy_table(spark, lake_dir)
    r = t.compact(cluster_by=["x", "y"], cluster_bits=4, max_records_per_file=256)
    assert not r["skipped"]
    # multiple z-contiguous files per bucket — the pruning granularity
    assert t.stats()["files"] > t.num_buckets

    for col in ("x", "y"):
        got = sorted(
            row.event_id
            for row in t.read(where={col: (0, 7)}).select("event_id").collect()
        )
        want = sorted(r[0] for r in df.filter(F.col(col) <= 7).select("event_id").collect())
        assert got == want, f"row results wrong under {col} pruning"
        assert t.last_scan_stats["files_skipped_by_stats"] > 0, (
            col,
            t.last_scan_stats,
        )


def test_zorder_prunes_secondary_dim_where_key_sort_cannot(spark, lake_dir):
    t, _ = _xy_table(spark, lake_dir)
    t.compact(sort_by_key=True, max_records_per_file=256)
    t.read(where={"y": (0, 7)})
    keysort_skipped = t.last_scan_stats["files_skipped_by_stats"]

    zdir = tempfile.mkdtemp(prefix="lake-z2-")
    try:
        t2, _ = _xy_table(spark, zdir)
        t2.compact(cluster_by=["x", "y"], cluster_bits=4, max_records_per_file=256)
        t2.read(where={"y": (0, 7)})
        z_skipped = t2.last_scan_stats["files_skipped_by_stats"]
    finally:
        shutil.rmtree(zdir, ignore_errors=True)

    # key order is id order; y is decorrelated from id, so every key-sorted
    # file spans ~the full y range and zone maps cannot skip on y
    assert keysort_skipped == 0
    assert z_skipped > 0


def test_cluster_compact_preserves_lww_read_state(spark, lake_dir):
    t = LakeTable(
        spark, lake_dir, ["repo", "path"], "commit_seq", op_col="op", num_buckets=4
    )
    mk = lambda lo, n, tag: spark.range(n).select(  # noqa: E731
        F.lit("r1").alias("repo"),
        F.format_string("f%03d", F.col("id") % 80).alias("path"),
        (F.col("id") + lo).alias("commit_seq"),
        F.when(F.col("id") % 17 == 0, "delete").otherwise("upsert").alias("op"),
        F.lit(tag).alias("payload"),
    )
    t.merge(mk(0, 200, "a"), epoch_id=0)
    t.append(mk(1000, 200, "b"), epoch_id=1)
    before = sorted(map(tuple, t.read().collect()))
    r = t.compact(cluster_by=["commit_seq"], cluster_bits=5, max_records_per_file=64)
    assert not r["skipped"]
    after = sorted(map(tuple, t.read().collect()))
    assert after == before
    # single-column clustering = range clustering; the order col prunes
    t.read(where={"commit_seq": (1000, 1050)})
    assert t.last_scan_stats["files_skipped_by_stats"] > 0


def test_cluster_by_string_column_prunes(spark, lake_dir):
    t = LakeTable(spark, lake_dir, ["event_id"], "seq", num_buckets=2)
    langs = ["c", "go", "java", "py", "rs", "ts"]
    df = spark.range(3000).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("seq"),
        F.element_at(
            F.array(*[F.lit(v) for v in langs]),
            ((F.col("id") * 13 + 5) % 6 + 1).cast("int"),
        ).alias("lang"),
    )
    t.append(df, epoch_id="e0")
    t.compact(cluster_by=["lang"], cluster_bits=3, max_records_per_file=200)
    got = sorted(r.event_id for r in t.read(where={"lang": ("go", "go")}).collect())
    want = sorted(r[0] for r in df.filter(F.col("lang") == "go").select("event_id").collect())
    assert got == want
    assert t.last_scan_stats["files_skipped_by_stats"] > 0


def test_cluster_probe_and_lookup_survive(spark, lake_dir):
    t, df = _xy_table(spark, lake_dir)
    t.compact(cluster_by=["x", "y"], cluster_bits=4, max_records_per_file=256)
    keys = [(7,), (123,), (2222,)]
    got = sorted(r.event_id for r in t.lookup(keys).collect())
    assert got == [7, 123, 2222]


def test_cluster_by_validation_errors(spark, lake_dir):
    t, _ = _xy_table(spark, lake_dir, n=100)
    with pytest.raises(ClaimCheckError, match="mutually exclusive"):
        t.compact(sort_by_key=True, cluster_by=["x"])
    with pytest.raises(ClaimCheckError, match="not in table schema"):
        t.compact(cluster_by=["nope"])
    with pytest.raises(ClaimCheckError, match="62 bits"):
        t.compact(cluster_by=["x", "y"], cluster_bits=32)
