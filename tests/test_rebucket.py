"""Bucket-count evolution (``rebucket``) and layout adoption on open.

The hazard class: ``bucket_expr`` hashes keys modulo the HANDLE's count, so
a handle whose count disagrees with the table's stored layout routes keys
away from their existing rows — bucket-pruned merges and lookups then
silently miss them. Adoption makes the stored count win (≙ Iceberg: the
table's partition spec, not your create-time argument, governs an existing
table), and ``rebucket()`` is the sanctioned way to change it: a full
rewrite committed as a normal CAS version, with version-pinned reads still
hashing under the count their manifest was written with.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable


@pytest.fixture()
def lake_dir():
    d = tempfile.mkdtemp(prefix="lake-rb-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, lo, n, tag):
    return spark.range(n).select(
        F.format_string("k%04d", F.col("id") % 300).alias("key"),
        (F.col("id") + lo).alias("seq"),
        F.when(F.col("id") % 19 == 0, "delete").otherwise("upsert").alias("op"),
        F.lit(tag).alias("payload"),
    )


def _table(spark, lake_dir, **kw):
    kw.setdefault("num_buckets", 4)
    return LakeTable(spark, lake_dir, ["key"], "seq", op_col="op", **kw)


def test_reopen_with_wrong_count_adopts_stored_layout(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=4)
    t.merge(_events(spark, 0, 400, "a"), epoch_id=0)
    # a second handle opened with a DIFFERENT default must adopt 4, then
    # route updates to the rows' existing buckets
    t2 = _table(spark, lake_dir, num_buckets=16)
    assert t2.num_buckets == 4
    t2.merge(_events(spark, 1000, 400, "b"), epoch_id=1)
    state = {r.key: (r.seq, r.payload) for r in t2.read().collect()}
    # every live key's winner is from the second batch
    assert state and all(p == "b" and s >= 1000 for s, p in state.values())
    # and a same-key lookup through yet another handle finds it
    t3 = _table(spark, lake_dir, num_buckets=32)
    got = t3.lookup([("k0001",)]).collect()
    assert [r.key for r in got] == ["k0001"]


def test_rebucket_grow_preserves_state_and_future_merges(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=2)
    t.merge(_events(spark, 0, 500, "a"), epoch_id=0)
    before = sorted(map(tuple, t.read().collect()))
    r = t.rebucket(8)
    assert (r["from"], r["to"]) == (2, 8) and not r["skipped"]
    assert t.num_buckets == 8
    assert sorted(map(tuple, t.read().collect())) == before
    # post-rebucket merge routes under the new layout
    t.merge(_events(spark, 1000, 500, "b"), epoch_id=1)
    state = {r.key: r.payload for r in t.read().collect()}
    assert state and set(state.values()) == {"b"}
    # fresh handle adopts the evolved count
    assert _table(spark, lake_dir, num_buckets=2).num_buckets == 8


def test_rebucket_preserves_tombstones_and_duplicates(spark, lake_dir):
    """Pure relayout: appended duplicate keys and delete tombstones survive
    byte-for-byte (internal read), so LWW resolution later still sees them."""
    t = _table(spark, lake_dir, num_buckets=2)
    t.merge(_events(spark, 0, 300, "a"), epoch_id=0)
    t.append(_events(spark, 1000, 300, "b"), epoch_id=1)  # duplicate keys
    before = sorted(
        map(tuple, t.read(internal=False, include_tombstones=True).collect())
    )
    t.rebucket(8)
    after = sorted(
        map(tuple, t.read(internal=False, include_tombstones=True).collect())
    )
    assert after == before


def test_version_pinned_lookup_hashes_with_old_count(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=4)
    t.merge(_events(spark, 0, 400, "a"), epoch_id=0)
    v_old = t.current_version()
    t.rebucket(16)
    got = t.lookup([("k0002",), ("k0123",)], version=v_old).collect()
    assert sorted(r.key for r in got) == ["k0002", "k0123"]
    # and the pruning stayed bucket-bounded under the OLD modulus
    assert t.last_probe_stats["buckets_scanned"] <= 2
    # head lookup under the new modulus finds the same keys
    got2 = t.lookup([("k0002",), ("k0123",)]).collect()
    assert sorted(r.key for r in got2) == ["k0002", "k0123"]


def test_probe_after_rebucket(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=2)
    t.merge(_events(spark, 0, 400, "a"), epoch_id=0)
    t.rebucket(8)
    # keys whose LWW winner is live (k0042's winner is a tombstone: id 342)
    keys = spark.createDataFrame([("k0007",), ("k0123",)], "key string")
    got = sorted(r.key for r in t.probe(keys).select("key").distinct().collect())
    assert got == ["k0007", "k0123"]
    assert t.last_probe_stats["buckets_scanned"] <= 2


def test_read_changes_refuses_span_across_rebucket(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=2)
    t.merge(_events(spark, 0, 200, "a"), epoch_id=0)
    v1 = t.current_version()
    t.rebucket(4)
    v2 = t.current_version()
    t.merge(_events(spark, 1000, 200, "b"), epoch_id=1)
    v3 = t.current_version()
    with pytest.raises(ClaimCheckError, match="rebucket"):
        t.read_changes(v1, v3)
    # a range strictly after the rebucket works
    feed = t.read_changes(v2, v3)
    assert feed.count() > 0


def test_minhash_index_survives_rebucket_of_its_tables(spark, lake_dir):
    """Feature composition: a persistent index whose band/sig LakeTables get
    rebucketed (the maintenance a 1000×-grown index needs — more buckets =
    more probe/merge parallelism) must return identical probe results before
    and after, and keep accepting ingest under the new layout."""
    from kafka_connect_claim_check_smt_spark.operators.dedup_index import MinHashIndex

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the late afternoon sun"
    )
    docs = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    idx = MinHashIndex(spark, lake_dir, hasher="md5", num_buckets=8, k=4)
    idx.add(docs([(1, base), (2, "completely unrelated content here")]), epoch_id="b1")
    probe = docs([(10, base + " extra"), (11, "nothing like the others at all")])
    before = sorted(
        (r.probe_id, r.indexed_id, r.est_jaccard_ppm)
        for r in idx.probe(probe, threshold=0.5).collect()
    )
    assert before and before[0][:2] == (10, 1)
    idx.bands_t.rebucket(32)
    idx.sigs_t.rebucket(32)
    after = sorted(
        (r.probe_id, r.indexed_id, r.est_jaccard_ppm)
        for r in idx.probe(probe, threshold=0.5).collect()
    )
    assert after == before
    # ingest continues under the evolved layout and is probe-visible
    idx.add(docs([(3, base + " trailing words")]), epoch_id="b2")
    got = {
        (r.probe_id, r.indexed_id)
        for r in idx.probe(docs([(20, base)]), threshold=0.5).collect()
    }
    assert (20, 1) in got and (20, 3) in got


def test_merge_racing_rebucket_refuses_rebase(spark, lake_dir):
    """A merge staged under the old modulus must NOT rebase onto a manifest
    a concurrent rebucket() committed: its files assign rows to old-layout
    buckets, and the per-bucket conflict check cannot see a bucket that was
    empty under both layouts. The layout guard refuses instead; re-running
    the merge against the new layout succeeds."""
    t = _table(spark, lake_dir, num_buckets=4, max_commit_retries=3)
    t.merge(_events(spark, 0, 300, "a"), epoch_id=0)
    other = _table(spark, lake_dir)

    def interleave(df):
        r = other.rebucket(16)
        assert not r["skipped"]
        return df

    from kafka_connect_claim_check_smt_spark.plans.lake import LakeConflictError

    with pytest.raises(LakeConflictError, match="rebucketed"):
        t.merge(
            _events(spark, 1000, 300, "b"),
            epoch_id=1,
            pre_write_transform=interleave,
        )
    # the re-run adopts the new layout and lands correctly
    t.merge(_events(spark, 1000, 300, "b"), epoch_id=1)
    assert t.num_buckets == 16
    state = {r.key: r.payload for r in t.read().collect()}
    assert state and set(state.values()) == {"b"}


def test_append_racing_rebucket_refuses_rebase(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=4, max_commit_retries=3)
    t.append(_events(spark, 0, 200, "a"), epoch_id=0)
    other = _table(spark, lake_dir)

    orig = t._bucket_write

    def hooked(out, vdir, **kw):
        t._bucket_write = orig  # fire once
        assert not other.rebucket(16)["skipped"]
        return orig(out, vdir, **kw)

    t._bucket_write = hooked
    from kafka_connect_claim_check_smt_spark.plans.lake import LakeConflictError

    with pytest.raises(LakeConflictError, match="rebucketed"):
        t.append(_events(spark, 1000, 200, "b"), epoch_id=1)
    t.append(_events(spark, 1000, 200, "b"), epoch_id=1)
    fresh = _table(spark, lake_dir)
    got = fresh.lookup([("k0005",)]).collect()
    assert {r.payload for r in got} >= {"b"}


def test_rebucket_skip_paths(spark, lake_dir):
    t = _table(spark, lake_dir, num_buckets=4)
    # empty table: no rewrite, but the next write uses the new count
    r = t.rebucket(8)
    assert r["skipped"] and t.num_buckets == 8
    t.merge(_events(spark, 0, 100, "a"), epoch_id=0)
    assert t.stats()["num_buckets"] == 8
    assert t.rebucket(8)["skipped"]
    with pytest.raises(ClaimCheckError, match="≥ 1"):
        t.rebucket(0)
