"""ChangeFeedConsumer: durable poll/commit cursor over the CDF.

The contract under test: at-least-once delivery with never-skipped spans
(crash between poll and commit re-polls the SAME span), per-consumer
independent positions, silent advance over pure-relayout (rebucket) commits,
loud refusal at lossy (resolve_lww) ones, and convergence through a rollback
(the restore span IS the retraction)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
from kafka_connect_claim_check_smt_spark.plans.feed import ChangeFeedConsumer
from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable


@pytest.fixture()
def lake_dir():
    d = tempfile.mkdtemp(prefix="lake-feed-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, lo, n, tag, keys=40):
    return spark.range(n).select(
        F.format_string("k%04d", F.col("id") % keys).alias("key"),
        (F.col("id") + lo).alias("seq"),
        F.when(F.col("id") % 11 == 0, "delete").otherwise("upsert").alias("op"),
        F.lit(tag).alias("payload"),
    )


def _table(spark, lake_dir, **kw):
    kw.setdefault("num_buckets", 4)
    return LakeTable(spark, lake_dir, ["key"], "seq", op_col="op", **kw)


from conftest import cdf_materialize as _materialize  # noqa: E402
from conftest import cdf_snapshot as _snapshot  # noqa: E402


def test_poll_commit_converges_with_table(spark, lake_dir):
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "indexer")
    view = {}
    for i in range(4):
        t.merge(_events(spark, 1000 * i, 120, f"e{i}"), epoch_id=i)
        batch = c.poll()
        assert batch is not None
        changes, upto = batch
        view = _materialize(view, changes)
        c.commit(upto)
        assert view == _snapshot(t)
    assert c.poll() is None  # caught up


def test_crash_between_poll_and_commit_repolls_same_span(spark, lake_dir):
    t = _table(spark, lake_dir)
    t.merge(_events(spark, 0, 120, "a"), epoch_id=0)
    c = ChangeFeedConsumer(t, "idx")
    changes1, upto1 = c.poll()
    rows1 = sorted((r._change_type, r.key, r.seq) for r in changes1.collect())
    # "crash": no commit — a fresh consumer object re-polls the same span
    c2 = ChangeFeedConsumer(_table(spark, lake_dir), "idx")
    changes2, upto2 = c2.poll()
    assert upto2 == upto1
    assert sorted((r._change_type, r.key, r.seq) for r in changes2.collect()) == rows1
    c2.commit(upto2)
    assert c2.poll() is None


def test_independent_consumers_and_monotonic_commit(spark, lake_dir):
    t = _table(spark, lake_dir)
    t.merge(_events(spark, 0, 80, "a"), epoch_id=0)
    fast, slow = ChangeFeedConsumer(t, "fast"), ChangeFeedConsumer(t, "slow")
    _, upto = fast.poll()
    fast.commit(upto)
    assert slow.position() == 0 and fast.position() == upto
    with pytest.raises(ClaimCheckError, match="backwards"):
        fast.commit(0)
    with pytest.raises(ClaimCheckError, match="table is at"):
        fast.commit(upto + 7)


def test_rebucket_is_skipped_as_logical_noop(spark, lake_dir):
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "idx")
    t.merge(_events(spark, 0, 120, "a"), epoch_id=0)
    view = _materialize({}, c.poll()[0])
    c.commit(c.poll()[1])
    t.rebucket(16)
    t.merge(_events(spark, 1000, 120, "b"), epoch_id=1)
    changes, upto = c.poll()  # must silently advance across the rebucket
    view = _materialize(view, changes)
    c.commit(upto)
    assert view == _snapshot(t)
    assert c.poll() is None


def test_resolve_lww_boundary_raises(spark, lake_dir):
    """Spans BEFORE the lossy boundary stay consumable; the boundary itself
    raises once adjacent (consume-then-refuse, never skip-then-diverge)."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "idx")
    t.append(_events(spark, 0, 60, "a").filter(F.col("op") != "delete"), epoch_id=0)
    t.append(_events(spark, 1000, 60, "b").filter(F.col("op") != "delete"), epoch_id=1)
    t.compact(resolve_lww=True)
    changes, upto = c.poll()  # the two append spans, cut before the boundary
    assert upto == t.current_version() - 1
    assert changes.count() > 0
    c.commit(upto)
    with pytest.raises(ClaimCheckError, match="resolve_lww"):
        c.poll()


def test_rollback_span_is_the_retraction(spark, lake_dir):
    """A consumer that processed the poisoned span converges back to the
    table through the rollback's net-retraction span — no reset."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "idx")
    t.merge(_events(spark, 0, 120, "good"), epoch_id=0)
    v_good = t.current_version()
    view = _materialize({}, c.poll()[0])
    c.commit(c.poll()[1])
    t.merge(_events(spark, 1000, 120, "poison"), epoch_id=1)
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    assert view == _snapshot(t)  # poisoned but consistent
    t.rollback(v_good)
    t.merge(_events(spark, 2000, 120, "fixed"), epoch_id=1)
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    assert view == _snapshot(t)
    assert all(p == "fixed" for _, p in view.values())


def test_consumer_id_validation(spark, lake_dir):
    t = _table(spark, lake_dir)
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ClaimCheckError):
            ChangeFeedConsumer(t, bad)


def test_rollback_over_rebucket_raises_never_skips(spark, lake_dir):
    """A rollback that restores a different bucket count carries the
    relayout flag, but it CHANGED logical rows (the retraction) — the
    consumer must raise, never skip it as a relayout no-op (skipping would
    keep the rolled-back rows downstream forever)."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "idx")
    t.merge(_events(spark, 0, 120, "good"), epoch_id=0)
    v_good = t.current_version()
    view = _materialize({}, c.poll()[0])
    c.commit(c.poll()[1])
    t.rebucket(16)
    t.merge(_events(spark, 1000, 120, "poison"), epoch_id=1)
    # consume across the rebucket (skipped) + the poison span
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    t.rollback(v_good)
    with pytest.raises(ClaimCheckError, match="rollback_over_relayout"):
        c.poll()
    # documented recovery: rebuild from a snapshot read, commit past it
    view = _snapshot(t)
    c.commit(t.current_version())
    t.merge(_events(spark, 2000, 120, "fixed"), epoch_id=1)
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    assert view == _snapshot(t)
    assert all(p == "fixed" for _, p in view.values())


def test_hidden_interior_boundary_consumed_up_to_rollback(spark, lake_dir):
    """Finding-3 regression: a rollback's excluded version ranges hide the
    dead span's interior rebucket from the HEAD manifest, but read_changes
    classifies on the span-end manifest. poll() must re-check boundaries on
    each cut — consuming the pre-rollback spans (skipping the interior
    rebucket) and then raising loudly AT the rollback, never wedging on a
    refusal it cannot see coming."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "idx")
    t.merge(_events(spark, 0, 120, "good"), epoch_id=0)
    v_good = t.current_version()
    view = _materialize({}, c.poll()[0])
    c.commit(c.poll()[1])
    t.rebucket(16)                                    # interior relayout
    t.merge(_events(spark, 1000, 120, "poison"), epoch_id=1)
    t.rollback(v_good)                                # hides [rebucket, poison]
    # first poll: consumes the poison span up to just before the rollback
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    assert upto == t.current_version() - 1
    # second poll: the rollback boundary is now adjacent — loud raise
    with pytest.raises(ClaimCheckError, match="rollback_over_relayout"):
        c.poll()
    view = _snapshot(t)
    c.commit(t.current_version())
    assert c.poll() is None and view == _snapshot(t)


def test_consumer_drives_incremental_view_maintenance(spark, lake_dir):
    """The realistic downstream-materializer composition: a consumer tails
    the feed and maintains an aggregate view via agg_delta/apply_agg_delta —
    including through a rollback (whose span is the retraction delta). At
    every commit point the incrementally-maintained view must equal the
    full recompute over the live table, exactly."""
    from kafka_connect_claim_check_smt_spark.operators.incremental import (
        agg_delta,
        aggregate_view,
        apply_agg_delta,
    )

    groups, measures = ["payload"], {"n_rows": F.lit(1), "sum_seq": F.col("seq")}

    def rows(df):
        return sorted((r.payload, r.n_rows, r.sum_seq) for r in df.collect())

    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "ivm")

    def consume():
        nonlocal view
        batch = c.poll()
        if batch is None:
            return
        changes, upto = batch
        view = apply_agg_delta(
            view, agg_delta(changes, groups, measures), groups, "n_rows"
        ).localCheckpoint()
        c.commit(upto)

    # snapshot-then-tail bootstrap: materialize the view from a full read,
    # then park the consumer at the version the snapshot covers
    t.merge(_events(spark, 0, 120, "good"), epoch_id=0)
    v_good = t.current_version()
    view = aggregate_view(t.read(), groups, measures).localCheckpoint()
    c.commit(v_good)
    assert rows(view) == rows(aggregate_view(t.read(), groups, measures))
    t.merge(_events(spark, 1000, 120, "poison"), epoch_id=1)
    consume()
    assert rows(view) == rows(aggregate_view(t.read(), groups, measures))
    t.rollback(v_good)  # the rollback span retracts the poison group
    t.merge(_events(spark, 2000, 120, "fixed"), epoch_id=1)
    consume()
    want = aggregate_view(t.read(), groups, measures)
    assert rows(view) == rows(want)
    # the corrected batch overwrites every key, so only "fixed" is live —
    # the load-bearing check is that no poison survived the rollback
    assert {r.payload for r in want.collect()} == {"fixed"}
    assert "poison" not in {p for p, _, _ in rows(view)}


def test_consumer_behind_retention_window(spark, lake_dir):
    """The Kafka offset-out-of-range analog: a consumer whose position fell
    below the expire_versions cutoff gets actionable guidance, and the
    documented rebuild-and-commit recovery resumes the feed."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "laggard")
    t.merge(_events(spark, 0, 120, "a"), epoch_id=0)
    _, upto = c.poll()
    c.commit(upto)
    for i in range(1, 4):
        t.merge(_events(spark, 1000 * i, 120, f"e{i}"), epoch_id=i)
    t.expire_versions(keep_versions=1)  # the laggard's position expires
    with pytest.raises(ClaimCheckError, match="retention window"):
        c.poll()
    view = _snapshot(t)
    c.commit(t.current_version())
    t.merge(_events(spark, 9000, 120, "new"), epoch_id=9)
    changes, upto = c.poll()
    view = _materialize(view, changes)
    c.commit(upto)
    assert view == _snapshot(t)


def test_consumer_behind_retention_with_max_versions(spark, lake_dir):
    """``max_versions`` can cut ``to`` below the expiry cutoff, so the
    boundary scan (resolving_versions on manifest(to)) hits the expired
    manifest BEFORE read_changes does — it must surface the same actionable
    fell-behind guidance, not a raw ExpiredVersionError (round-5 ADVICE,
    low)."""
    t = _table(spark, lake_dir)
    c = ChangeFeedConsumer(t, "laggard2")
    t.merge(_events(spark, 0, 120, "a"), epoch_id=0)
    _, upto = c.poll()
    c.commit(upto)
    for i in range(1, 5):
        t.merge(_events(spark, 1000 * i, 120, f"e{i}"), epoch_id=i)
    t.expire_versions(keep_versions=1)
    with pytest.raises(ClaimCheckError, match="retention window"):
        c.poll(max_versions=1)  # to = pos+1, an expired manifest
