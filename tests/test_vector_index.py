"""VectorIndex (persistent incremental IVF ANN) — lifecycle, pruning
contract, centroid pinning, and the DuckDB twin on real testdata."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
from kafka_connect_claim_check_smt_spark.operators.vector_index import (
    VectorIndex,
    vector_index_sql,
)


@pytest.fixture()
def idx_dir():
    d = tempfile.mkdtemp(prefix="ccvidx-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(angle):
    return [math.cos(angle), math.sin(angle)]


def test_topk_finds_nearest_across_epochs(spark, idx_dir):
    """Four well-separated directions as centroids; vectors added over two
    epochs; a query near direction 0 must rank the direction-0 vectors top."""
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    near0 = [math.cos(0.1), math.sin(0.1)]
    idx.add(_vecs(spark, [(10, near0)]), epoch_id="e1")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    got = idx.topk(q, k=2, n_probe=1).collect()
    assert [(r.query_id, r.vec_id, r.rank) for r in got] == [(0, 0, 1), (0, 10, 2)]


def test_centroids_pinned_across_reopen(spark, idx_dir):
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    cents = idx._cents
    # reopening reloads the exact centroid doubles; a later add with new
    # vectors must NOT retrain
    again = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    again.add(_vecs(spark, [(20, _unit(0.3))]), epoch_id="e1")
    assert again._cents == cents
    with pytest.raises(ClaimCheckError, match="n_list"):
        VectorIndex(spark, idx_dir, n_list=8, num_buckets=8)


def test_topk_before_any_add_raises(spark, idx_dir):
    idx = VectorIndex(spark, idx_dir, n_list=4)
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    with pytest.raises(ClaimCheckError, match="no centroids"):
        idx.topk(q)


def test_first_batch_smaller_than_n_list_raises(spark, idx_dir):
    idx = VectorIndex(spark, idx_dir, n_list=4)
    with pytest.raises(ClaimCheckError, match="at least"):
        idx.add(_vecs(spark, [(0, [1.0, 0.0])]))


def test_add_idempotent_per_epoch(spark, idx_dir):
    base = [_unit(a) for a in (0.0, 1.0, 2.0, 3.0)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    batch = _vecs(spark, [(i, base[i]) for i in range(4)])
    idx.add(batch, epoch_id="b1")
    v = idx.table.current_version()
    assert idx.add(batch, epoch_id="b1")["skipped"]
    assert idx.table.current_version() == v


def test_probe_prunes_to_n_probe_cells(spark, idx_dir):
    """The scan behind topk must list strictly fewer files than the full
    snapshot — the cell-bucket pruning that makes a 10^10-vector index
    queryable."""
    import random

    rng = random.Random(7)
    rows = [(i, _unit(rng.uniform(0, 2 * math.pi))) for i in range(256)]
    idx = VectorIndex(spark, idx_dir, n_list=8, num_buckets=16)
    idx.add(_vecs(spark, rows), epoch_id="e0")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    out = idx.topk(q, k=3, n_probe=1)
    all_files = set(idx.table.read().inputFiles())
    probe_files = set(out.inputFiles())
    assert probe_files and probe_files < all_files
    assert out.count() == 3


def test_topk_invariant_to_epoch_split(spark, tmp_path):
    """Given the same centroid-training first batch, topk must not depend on
    how the remaining vectors were split across later epochs."""
    import random

    rng = random.Random(3)
    first = [(i, _unit(rng.uniform(0, 2 * math.pi))) for i in range(8)]
    rest = [(100 + i, _unit(rng.uniform(0, 2 * math.pi))) for i in range(40)]
    q = spark.createDataFrame(
        [(0, _unit(0.25)), (1, _unit(2.5))], "query_id long, query_vec array<double>"
    )
    one = VectorIndex(spark, str(tmp_path / "one"), n_list=8, num_buckets=8)
    one.add(_vecs(spark, first), epoch_id="e0")
    one.add(_vecs(spark, rest), epoch_id="e1")
    split = VectorIndex(spark, str(tmp_path / "split"), n_list=8, num_buckets=8)
    split.add(_vecs(spark, first), epoch_id="e0")
    split.add(_vecs(spark, rest[1::2]), epoch_id="e1")
    split.add(_vecs(spark, rest[0::2]), epoch_id="e2")
    a = sorted(map(tuple, one.topk(q, k=4, n_probe=2).collect()))
    b = sorted(map(tuple, split.topk(q, k=4, n_probe=2).collect()))
    assert a == b and a


def test_matches_duckdb_twin_on_testdata(spark, idx_dir):
    """Full lifecycle twin on sf0.001 embeddings: centroids from the first
    epoch, two epochs indexed, odd-id query batch — byte-identical rows."""
    import duckdb

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = VectorIndex(spark, idx_dir, n_list=8, num_buckets=16)
    idx.add(embs.filter(F.col("vec_id") % 4 == 0), epoch_id="e0")
    idx.add(embs.filter(F.col("vec_id") % 4 == 2), epoch_id="e1")
    q = (
        embs.filter(F.col("vec_id") % 2 == 1)
        .orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    got = sorted(map(tuple, idx.topk(q, k=5, n_probe=2).collect()))
    con = duckdb.connect()
    con.sql(
        "create view embeddings as select * from "
        "'/root/testdata/sf0.001/embeddings.parquet'"
    )
    rel = con.sql(
        vector_index_sql(
            "embeddings",
            "SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings "
            "WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 5",
            centroid_pred="vec_id % 4 = 0",
            indexed_pred="vec_id % 2 = 0",
            k=5,
            n_list=8,
            n_probe=2,
        )
    )
    want = sorted(tuple(d[c] for c in rel.columns) for d in rel.arrow().to_pylist())
    assert got == want and got


def test_failed_training_leaves_handle_untouched(spark, idx_dir):
    """A too-small first batch must not cache a short centroid list on the
    handle: the retry with a big-enough batch has to actually train and pin
    (round-4 ADVICE, medium)."""
    idx = VectorIndex(spark, idx_dir, n_list=4)
    with pytest.raises(ClaimCheckError, match="at least"):
        idx.add(_vecs(spark, [(0, [1.0, 0.0])]))
    assert idx._cents is None  # nothing cached by the failed attempt
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    assert len(idx._cents) == 4
    # and the layout was pinned — a reopened handle probes the same cells
    again = VectorIndex(spark, idx_dir, n_list=4)
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    got = again.topk(q, k=1, n_probe=1).collect()
    assert got[0].vec_id == 0


def test_readd_moved_embedding_tombstones_stale_row(spark, idx_dir):
    """Re-adding a vec_id whose new embedding lands in a DIFFERENT cell must
    remove the old-cell row: round 4 left it and topk could return the dead
    embedding forever (round-4 ADVICE / verdict #3)."""
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    # vec 10 starts near direction 0
    idx.add(_vecs(spark, [(10, _unit(0.1))]), epoch_id="e1")
    # ...then moves near direction 1 (different cell)
    idx.add(_vecs(spark, [(10, _unit(math.pi / 2 - 0.1))]), epoch_id="e2")
    q0 = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    q1 = spark.createDataFrame([(1, [0.0, 1.0])], "query_id long, query_vec array<double>")
    # probing the OLD cell must not surface the stale embedding
    got0 = idx.topk(q0, k=4, n_probe=1).collect()
    assert all(r.vec_id != 10 or abs(r.cosine - math.cos(math.pi / 2 - 0.1)) < 1e-6 for r in got0)
    assert 10 not in {r.vec_id for r in got0 if abs(r.cosine - math.cos(0.1)) < 1e-6}
    # the NEW cell serves the updated embedding at its correct rank (vec 1
    # IS the query direction, cosine 1.0; moved vec 10 is 0.1 rad off)
    got1 = idx.topk(q1, k=2, n_probe=1).collect()
    assert [(r.vec_id, r.rank) for r in got1] == [(1, 1), (10, 2)]
    # exactly one live row for vec 10 across the whole table
    live = idx.table.read().filter(F.col("vec_id") == 10).collect()
    assert len(live) == 1


def test_readd_same_cell_updates_in_place(spark, idx_dir):
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    idx.add(_vecs(spark, [(10, _unit(0.2))]), epoch_id="e1")
    idx.add(_vecs(spark, [(10, _unit(0.1))]), epoch_id="e2")  # same cell 0
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    got = idx.topk(q, k=2, n_probe=1).collect()
    ten = [r for r in got if r.vec_id == 10][0]
    assert abs(ten.cosine - math.cos(0.1)) < 1e-6
    assert idx.table.read().filter(F.col("vec_id") == 10).count() == 1


def test_neardup_finds_resent_vectors_not_strangers(spark, idx_dir):
    """neardup: a re-sent copy under a fresh id resolves to its original at
    cosine 1.0; well-separated directions stay below threshold; a vector
    re-sent under its OWN id is not its own duplicate."""
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    probe = _vecs(spark, [(100, base[1]), (101, _unit(1.0)), (1, base[1])])
    got = {(r.probe_id, r.indexed_id): r.cosine
           for r in idx.neardup(probe, threshold=0.95).collect()}
    assert set(got) == {(100, 1)}
    assert abs(got[(100, 1)] - 1.0) < 1e-9


def test_remove_retracts_vector_and_allows_readd(spark, idx_dir):
    base = [_unit(a * math.pi / 2) for a in range(4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    idx.add(_vecs(spark, [(10, _unit(0.1))]), epoch_id="e1")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    assert 10 in {r.vec_id for r in idx.topk(q, k=4, n_probe=1).collect()}
    ids = spark.createDataFrame([(10,), (999,)], "vec_id long")  # 999 unknown
    idx.remove(ids, epoch_id="rm0")
    assert 10 not in {r.vec_id for r in idx.topk(q, k=4, n_probe=1).collect()}
    # neardup also blind to it now (vec 0 at cos(0.1)=0.995 may still match;
    # the REMOVED vector, an exact copy at cosine 1.0, must not)
    nd = {r.indexed_id for r in
          idx.neardup(_vecs(spark, [(50, _unit(0.1))]), threshold=0.99).collect()}
    assert 10 not in nd
    # idempotent replay
    assert idx.remove(ids, epoch_id="rm0")["vectors"]["skipped"]
    # re-add after removal (fresh map entry, monotone seq beats tombstone)
    idx.add(_vecs(spark, [(10, _unit(0.1))]), epoch_id="e2")
    got = {r.vec_id for r in idx.topk(q, k=4, n_probe=1).collect()}
    assert 10 in got
    assert idx.table.read().filter(F.col("vec_id") == 10).count() == 1


def test_remove_on_empty_index_is_noop(spark, idx_dir):
    idx = VectorIndex(spark, idx_dir, n_list=4)
    assert idx.remove(spark.createDataFrame([(1,)], "vec_id long"))["skipped"]


def test_maintenance_cycle_topk_invariant(spark, idx_dir):
    """compact(resolve_lww)+vacuum consolidate appended epochs and drop
    superseded rows without moving any topk result."""
    base = [_unit(a) for a in (0.0, 0.8, 1.6, 2.4)]
    idx = VectorIndex(spark, idx_dir, n_list=4, num_buckets=8)
    idx.add(_vecs(spark, [(i, base[i]) for i in range(4)]), epoch_id="e0")
    idx.add(_vecs(spark, [(10, _unit(0.1)), (11, _unit(1.7))]), epoch_id="e1")
    idx.add(_vecs(spark, [(10, _unit(2.3))]), epoch_id="e2")  # moved re-add
    q = _vecs(spark, [(0, _unit(0.05))]).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    before = {(r.vec_id, r.cosine) for r in idx.topk(q, k=3).collect()}
    files_before = idx.table.stats()["files"]
    idx.compact(resolve_lww=True)
    idx.vacuum()
    assert idx.table.stats()["files"] < files_before
    after = {(r.vec_id, r.cosine) for r in idx.topk(q, k=3).collect()}
    assert before == after
    # manifest expiry: topk invariant, replayed epoch still skips
    expired = idx.expire_versions(keep_versions=1)
    assert expired["vectors"] > 0
    assert {(r.vec_id, r.cosine) for r in idx.topk(q, k=3).collect()} == before
    assert idx.add(_vecs(spark, [(10, _unit(2.3))]), epoch_id="e2")["skipped"]
