"""Physical-plan shape assertions for entry-module queries whose scale
safety depends on a specific Catalyst strategy (not just on the rows being
right at sf0.01)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from conftest import SF_SMOKE


def test_hot_keys_uses_distributed_topk(spark):
    """cdc_hot_keys must compile to TakeOrderedAndProject (per-partition
    partial top-k + driver merge), never a single-partition global
    row_number window — at 10^10 (repo, path) groups the latter funnels the
    whole counts relation through one task. Pinned here because Spark's
    WindowGroupLimit rewrite does NOT fire on empty partition specs, which
    is exactly the trap a global-rank query falls into."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["cdc_hot_keys"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i].n_events >= rows[i + 1].n_events for i in range(len(rows) - 1))


def test_time_travel_pins_prefix_state(spark):
    """cdc_time_travel must return the LWW state of the FIRST half of the log
    only — if the pinned version leaked rows from the later merge, max
    commit_seq would exceed the cut. Cross-checked against lww_dedup over the
    same prefix (engine-internal twin; the DuckDB twin runs in the gate)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from kafka_connect_claim_check_smt_spark.operators.dedup import lww_dedup
    from kafka_connect_claim_check_smt_spark.sources.changelog import (
        testdata_change_events,
    )

    got = entrymod.queries()["cdc_time_travel"](spark, SF_SMOKE)
    ev = testdata_change_events(spark, SF_SMOKE)
    hi = ev.agg(F.max("commit_seq")).collect()[0][0] + 1
    assert got.agg(F.max("commit_seq")).collect()[0][0] < hi // 2
    want = lww_dedup(
        ev.filter(F.col("commit_seq") < hi // 2), ["repo", "path"], "commit_seq"
    ).select(
        "repo", "path", "commit_seq", "commit",
        F.sha2("content", 256).alias("content_sha"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_lineage_metrics_are_faithful(spark):
    """cdc_lineage's per-epoch metrics must reproduce the batch aggregates:
    rows_in sums to the full log, offset ranges tile it without overlap, and
    oversized_rows matches the engine-independent threshold count."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from kafka_connect_claim_check_smt_spark.sources.changelog import (
        testdata_change_events,
    )

    lin = {r.epoch_id: r for r in
           entrymod.queries()["cdc_lineage"](spark, SF_SMOKE).collect()}
    assert set(lin) == {"0", "1", "2"}
    ev = testdata_change_events(spark, SF_SMOKE)
    total, oversized = ev.agg(
        F.count(F.lit(1)),
        F.sum((F.octet_length("content") > entrymod.THRESHOLD).cast("long")),
    ).collect()[0]
    assert sum(r.rows_in for r in lin.values()) == total
    assert sum(r.oversized_rows for r in lin.values()) == oversized
    # offset ranges tile: epoch i ends strictly before epoch i+1 starts
    for a, b in (("0", "1"), ("1", "2")):
        assert lin[a].offset_end < lin[b].offset_start
