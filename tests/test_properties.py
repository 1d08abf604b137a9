"""Property-based tests (hypothesis): the engine-portable arithmetic that
every oracle depends on, checked against independent pure-Python models over
randomized inputs. These pin the MATH, complementing the example-based and
oracle tests which pin specific pipelines.

One shared SparkSession; hypothesis drives data generation, Spark evaluates
the production expressions, Python recomputes from scratch.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=20,  # each example is a Spark job — keep the suite bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _hash60_py(s: str, algo: str = "md5") -> int:
    digest = hashlib.md5(s.encode()).hexdigest() if algo == "md5" else hashlib.sha256(s.encode()).hexdigest()
    return int(digest[:15], 16)


texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40,
    ),
    min_size=1, max_size=12,
)


@settings(**_SETTINGS)
@given(vals=st.lists(st.text(alphabet="abcdef0123456789 .,-", min_size=0, max_size=50), min_size=1, max_size=10))
def test_hash60_matches_python_digest(spark, vals):
    """hash60 (the base of every near-dup signature, sample, and shard) must
    equal int(hexdigest[:15], 16) for BOTH algos on arbitrary strings."""
    from kafka_connect_claim_check_smt_spark.operators.minhash import hash60

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s", hash60(F.col("s"), "md5").alias("m"), hash60(F.col("s"), "sha256").alias("h")
    ).collect()
    for r in rows:
        assert r.m == _hash60_py(r.s, "md5")
        assert r.h == _hash60_py(r.s, "sha256")


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=4096),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_matches_python_model(spark, toks, budget, n_shards):
    """chunk_id / offsets must equal a from-scratch Python concat-and-chunk
    simulation for any token counts, budget, and shard count."""
    from kafka_connect_claim_check_smt_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(list(enumerate(toks)), "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.shard, r.chunk_id, r.chunk_local_start, r.chunk_local_end)
        for r in pack_sequences(df, "doc_id", "n_tok", budget=budget, n_shards=n_shards).collect()
    }
    # independent model: shard by hash60 % n_shards, order by (hash60, id),
    # cumulate, chunk = floor(before/budget)
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, t in enumerate(toks):
        h = _hash60_py(str(i))
        by_shard.setdefault(h % n_shards, []).append((h, i))
    want = {}
    for shard, members in by_shard.items():
        cum = 0
        for _, i in sorted(members):
            t = toks[i]
            want[i] = (shard, cum // budget, cum % budget, cum % budget + t)
            cum += t
    assert got == want


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(st.text(alphabet="xyz", min_size=1, max_size=3), st.integers(0, 10**6)),
        min_size=1, max_size=30, unique_by=lambda t: t[1],
    ),
    quota=st.integers(min_value=1, max_value=5),
)
def test_stratified_quota_matches_python_model(spark, vals, quota):
    """per_stratum mode: exact quotas, lowest-hash members win, ties
    impossible for distinct ids."""
    from kafka_connect_claim_check_smt_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(vals, "lang string, doc_id long")
    got = sorted((r.lang, r.doc_id) for r in
                 stratified_sample(df, "lang", "doc_id", per_stratum=quota).collect())
    by_stratum: dict[str, list[tuple[int, int]]] = {}
    for lang, i in vals:
        by_stratum.setdefault(lang, []).append((_hash60_py("s42" + str(i)), i))
    want = sorted(
        (lang, i)
        for lang, members in by_stratum.items()
        for _, i in sorted(members)[:quota]
    )
    assert got == want


@settings(**_SETTINGS)
@given(texts=texts)
def test_shingles_match_python_model(spark, texts):
    """Distinct hashed k-grams — incl. the short-input whole-text rule —
    must match a Python reimplementation on arbitrary printable text."""
    from kafka_connect_claim_check_smt_spark.operators.minhash import shingles

    k = 5
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", shingles("t", k, hasher="md5").alias("sh")).collect()
    for r in rows:
        t = texts[r.i]
        grams = (
            [t[j : j + k] for j in range(max(len(t) - k + 1, 1))] if t else [""]
        )
        want = sorted(set(_hash60_py(g) for g in grams))
        assert sorted(r.sh) == want, repr(t)


@settings(**_SETTINGS)
@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=2, max_size=16,
    )
)
def test_dot_strategies_agree_and_match_python(spark, vec):
    """Both dot-product strategies (unrolled codegen / HOF fold) must produce
    the identical left-fold sum, equal to Python's sequential fold — the
    invariant that makes _pick_dot a pure plan-shape knob."""
    from kafka_connect_claim_check_smt_spark.operators.similarity import (
        _dot,
        _dot_fixed,
    )

    dim = len(vec)
    df = spark.createDataFrame([(vec, vec)], f"a array<float>, b array<float>")
    r = df.select(
        _dot(F.col("a"), F.col("b")).alias("hof"),
        _dot_fixed(F.col("a"), F.col("b"), dim).alias("unrolled"),
    ).collect()[0]
    import numpy as np

    acc = 0.0
    for x in vec:
        x32 = float(np.float32(x))
        acc += x32 * x32
    assert r.hof == r.unrolled  # bit-identical: same fold order
    assert math.isclose(r.hof, acc, rel_tol=1e-6, abs_tol=1e-6)


def _sessions_py(events, gap_us):
    """Pure-Python gaps-and-islands model: events = [(user, ts_us, eid)]."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, t, e in events:
        per_user[u].append((t, e))
    out = {}
    for u, evs in per_user.items():
        evs.sort()
        sidx, prev = 0, None
        for t, _e in evs:
            if prev is None or t - prev >= gap_us:
                sidx += 1
            key = (u, sidx)
            if key not in out:
                out[key] = [t, t, 0]
            out[key][0] = min(out[key][0], t)
            out[key][1] = max(out[key][1], t)
            out[key][2] += 1
            prev = t
    return {
        k: (v[0], v[1], v[1] - v[0], v[2]) for k, v in out.items()
    }


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # user
            st.integers(min_value=0, max_value=500_000),  # ts_us
        ),
        min_size=1, max_size=30,
    ),
    gap_s=st.integers(min_value=1, max_value=2),
)
def test_session_rollup_matches_python_model(spark, events, gap_s):
    """session_rollup == the textbook per-user walk on arbitrary streams —
    including ts ties (tiebreak id), back-to-back gaps exactly == gap
    (new session, the session_window boundary), and single-event users."""
    from kafka_connect_claim_check_smt_spark.operators.sessions import (
        session_rollup,
    )

    rows = [(u, t, i) for i, (u, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long"
    ).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_id"
    )
    got = {
        (r.user_id, r.session_idx): (
            r.session_start_us, r.session_end_us, r.duration_us, r.n_events
        )
        for r in session_rollup(
            df, key="user_id", ts="ts", gap_seconds=gap_s, tiebreak="event_id"
        ).collect()
    }
    assert got == _sessions_py(rows, gap_s * 1_000_000)


def _funnel_py(events, steps, within_us):
    """Greedy-min chained-window model: events = [(user, ts_us, step)]."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, t, s in events:
        per_user[u].append((t, s))
    counts = [0] * len(steps)
    for evs in per_user.values():
        t_prev = None
        t1 = None
        for i, step in enumerate(steps):
            cand = [
                t for t, s in evs
                if s == step
                and (i == 0 or (t_prev is not None and t > t_prev))
                and (i == 0 or within_us is None or t - t1 <= within_us)
            ]
            t_i = min(cand) if cand and (i == 0 or t_prev is not None) else None
            if i == 0:
                t1 = t_i
            if t_i is not None:
                counts[i] += 1
            t_prev = t_i
    return counts


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["A", "B", "C", "x"]),
        ),
        min_size=1, max_size=30,
    ),
    within_s=st.one_of(st.none(), st.integers(min_value=1, max_value=20)),
)
def test_funnel_counts_match_python_model(spark, events, within_s):
    """funnel_counts == the greedy-min state walk under arbitrary orderings,
    repeated steps, ties, and conversion windows."""
    from kafka_connect_claim_check_smt_spark.operators.funnel import (
        funnel_counts,
    )

    rows = [(u, t * 1_000_000, s) for u, t, s in events]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_type string"
    ).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_type"
    )
    got = [
        r.n_keys
        for r in funnel_counts(
            df, key="user_id", ts="ts", step_col="event_type",
            steps=["A", "B", "C"], within_seconds=within_s,
        ).orderBy("step_index").collect()
    ]
    want = _funnel_py(
        [(u, t, s) for u, t, s in rows],
        ["A", "B", "C"],
        None if within_s is None else within_s * 1_000_000,
    )
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # user
            st.integers(min_value=0, max_value=10),      # day
        ),
        min_size=1, max_size=30,
    ),
    period_days=st.integers(min_value=1, max_value=3),
)
def test_cohort_retention_matches_python_model(spark, events, period_days):
    from collections import defaultdict

    from kafka_connect_claim_check_smt_spark.operators.retention import (
        cohort_retention,
    )

    day_us = 86_400_000_000
    rows = [(u, d * day_us + 123) for u, d in events]
    df = spark.createDataFrame(rows, "user long, us long").select(
        "user", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        (r.cohort_period, r.offset_periods): r.n_active
        for r in cohort_retention(
            df, key="user", ts="ts", period_days=period_days
        ).collect()
    }
    period_us = period_days * day_us
    first = {}
    for u, t in rows:
        first[u] = min(first.get(u, t), t)
    cells = defaultdict(set)
    for u, t in rows:
        c = first[u] // period_us
        cells[(c, t // period_us - c)].add(u)
    assert got == {k: len(v) for k, v in cells.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # user
            st.integers(min_value=0, max_value=50),      # ts seconds
            st.text(alphabet="ab", min_size=0, max_size=4),
        ),
        min_size=1, max_size=25,
    ),
    window_s=st.integers(min_value=1, max_value=20),
)
def test_rolling_counts_match_python_model(spark, events, window_s):
    """RANGE-frame trailing metrics == brute-force double loop — closed
    [t-w, t] interval, ties all mutually included, per-key isolation."""
    from kafka_connect_claim_check_smt_spark.operators.rolling import (
        rolling_counts,
    )

    s = 1_000_000
    rows = [(i, u, t * s, p) for i, (u, t, p) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, user long, us long, props string"
    ).select("event_id", "user", F.timestamp_micros(F.col("us")).alias("ts"), "props")
    got = {
        r.event_id: (r.n_trailing, r.bytes_trailing)
        for r in rolling_counts(
            df, key="user", ts="ts", window_seconds=window_s, bytes_col="props"
        ).collect()
    }
    w_us = window_s * s
    want = {}
    for i, u, t, _p in rows:
        frame = [r for r in rows if r[1] == u and t - w_us <= r[2] <= t]
        want[i] = (len(frame), sum(len(r[3].encode()) for r in frame))
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),      # key
                  st.integers(min_value=0, max_value=20)),    # order
        min_size=1, max_size=15,
    ),
    right=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.one_of(st.none(), st.integers(min_value=0, max_value=20))),
        min_size=0, max_size=15,
    ),
)
def test_asof_join_matches_python_model(spark, left, right):
    """Backward-inclusive as-of == the brute-force 'latest right row with
    r.t <= l.t' scan: ties between left and right orders match (inclusive),
    NULL right orders never match, no-prior rows get NULL. When several
    RIGHT rows tie on the winning order the engine's pick among them is
    sort-order-dependent, so the model asserts membership in the tie set."""
    from kafka_connect_claim_check_smt_spark.operators.asof import asof_join

    l_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    r_rows = [(k, t, 1000 + i) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(l_rows, "key long, t long, lid long")
    rdf = spark.createDataFrame(r_rows, "key long, t long, rid long")
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, on=["key"], left_order="t", right_cols=["rid"]
        ).collect()
    }
    # model: latest right (max t <= l.t, NULLs excluded); among right rows
    # tied on t, the engine's window sort is (t, is_left) with the input
    # order within ties unspecified — make the expectation well-defined by
    # only generating assertions where the tie set is a singleton, and
    # asserting membership otherwise
    for k, lt, lid in l_rows:
        cand = [(rt, rid) for rk, rt, rid in r_rows if rk == k and rt is not None and rt <= lt]
        if not cand:
            assert got[lid] is None
            continue
        best_t = max(rt for rt, _ in cand)
        tied = [rid for rt, rid in cand if rt == best_t]
        assert got[lid] in tied


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # key
            st.integers(min_value=0, max_value=12),       # order (ties likely)
            st.sampled_from(["insert", "update", "delete"]),
        ),
        min_size=1, max_size=25,
    ),
)
def test_scd2_history_matches_python_model(spark, events):
    """SCD2 intervals == the per-key sorted walk: valid_to chains to the next
    event's order, only the last non-delete row is current, deletes close
    history, re-inserts reopen it. Order ties are made deterministic with the
    event-id tiebreaker — the same knob the production pipeline uses."""
    from kafka_connect_claim_check_smt_spark.operators.scd import scd2_history

    rows = [(k, o, i, op) for i, (k, o, op) in enumerate(events)]
    df = spark.createDataFrame(rows, "key long, o long, eid long, op string")
    got = {
        r.eid: (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            df, ["key"], "o", op_col="op", tiebreaker="eid"
        ).collect()
    }
    # model sorts by (o, eid) — the exact engine tiebreak
    from collections import defaultdict

    per_key = defaultdict(list)
    for k, o, e, op in rows:
        per_key[k].append((o, e, op))
    want = {}
    for evs in per_key.values():
        evs.sort()
        for i, (o, e, op) in enumerate(evs):
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            want[e] = (o, nxt, nxt is None and op != "delete")
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    groups=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=10),
    order=st.randoms(use_true_random=False),
    n_epochs=st.integers(min_value=1, max_value=3),
)
def test_exact_index_commutative_under_random_epochs_and_interleaved_probes(
    spark, groups, order, n_epochs
):
    """ExactDupIndex claims add() is commutative/idempotent (min-id LWW): for
    ANY permutation of the docs, ANY partition into epochs, and probes
    interleaved between adds, every probe must match the model computed from
    exactly the docs added so far (representative = min id per content)."""
    import shutil as _sh
    import tempfile as _tf

    from kafka_connect_claim_check_smt_spark.operators.dedup_index import ExactDupIndex

    docs = [(i, f"content-group-{g}") for i, g in enumerate(groups)]
    perm = docs[:]
    order.shuffle(perm)
    # split the permutation into n_epochs contiguous chunks (some may be empty)
    cuts = sorted(order.randrange(len(perm) + 1) for _ in range(n_epochs - 1))
    epochs, lo = [], 0
    for c in cuts + [len(perm)]:
        epochs.append(perm[lo:c])
        lo = c

    root = _tf.mkdtemp(prefix="ccprop-exact-")
    try:
        idx = ExactDupIndex(spark, root, num_buckets=4)
        added = []
        for e, chunk in enumerate(epochs):
            if chunk:
                idx.add(
                    spark.createDataFrame(chunk, "doc_id long, text string"),
                    epoch_id=f"e{e}",
                )
                added.extend(chunk)
            # interleaved probe of the FULL corpus under fresh keys
            probe = spark.createDataFrame(
                [(i + 1000, t) for i, t in docs], "doc_id long, text string"
            )
            got = sorted(map(tuple, idx.probe(probe).collect()))
            rep = {}
            for i, t in added:
                rep[t] = min(rep.get(t, i), i)
            want = sorted((i + 1000, rep[t]) for i, t in docs if t in rep)
            assert got == want, (e, got, want)
    finally:
        _sh.rmtree(root, ignore_errors=True)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    groups=st.lists(st.integers(min_value=0, max_value=2), min_size=2, max_size=8),
    order=st.randoms(use_true_random=False),
)
def test_exact_index_string_ids_commutative(spark, groups, order):
    """Same convergence property for STRING ids (max-id representative)."""
    import shutil as _sh
    import tempfile as _tf

    from kafka_connect_claim_check_smt_spark.operators.dedup_index import ExactDupIndex

    docs = [(f"id-{i:03d}", f"grp-{g}") for i, g in enumerate(groups)]
    perm = docs[:]
    order.shuffle(perm)
    half = len(perm) // 2
    root = _tf.mkdtemp(prefix="ccprop-sexact-")
    try:
        idx = ExactDupIndex(spark, root, num_buckets=4)
        for e, chunk in enumerate([perm[:half], perm[half:]]):
            if chunk:
                idx.add(
                    spark.createDataFrame(chunk, "doc_id string, text string"),
                    epoch_id=f"e{e}",
                )
        probe = spark.createDataFrame(
            [(f"zz-{i}", t) for i, (_, t) in enumerate(docs)],
            "doc_id string, text string",
        )
        got = sorted(map(tuple, idx.probe(probe).collect()))
        rep = {}
        for i, t in docs:
            rep[t] = max(rep.get(t, i), i)
        want = sorted((f"zz-{i}", rep[t]) for i, (_, t) in enumerate(docs))
        assert got == want
    finally:
        _sh.rmtree(root, ignore_errors=True)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["add", "move", "remove"]),
            st.integers(min_value=4, max_value=8),
            st.floats(min_value=0.0, max_value=6.28, allow_nan=False),
        ),
        min_size=2,
        max_size=6,
    ),
)
def test_vector_index_lifecycle_matches_brute_force_model(spark, ops):
    """Random add / re-add-moved / remove sequences against a Python model:
    with n_probe = n_list every cell is probed, so IVF must return EXACTLY
    the brute-force cosine top-k over the live vectors — stale rows from
    moves or removals would surface immediately."""
    import math as m
    import shutil as _sh
    import tempfile as _tf

    from kafka_connect_claim_check_smt_spark.operators.vector_index import VectorIndex

    def unit(a):
        return [m.cos(a), m.sin(a)]

    root = _tf.mkdtemp(prefix="ccprop-vec-")
    try:
        idx = VectorIndex(spark, root, n_list=4, num_buckets=8)
        model: dict[int, list[float]] = {i: unit(i * m.pi / 2) for i in range(4)}
        idx.add(
            spark.createDataFrame(
                [(i, model[i]) for i in range(4)],
                "vec_id long, embedding array<double>",
            ),
            epoch_id="init",
        )
        for e, (kind, vid, angle) in enumerate(ops):
            if kind == "remove":
                idx.remove(
                    spark.createDataFrame([(vid,)], "vec_id long"),
                    epoch_id=f"rm{e}",
                )
                model.pop(vid, None)
            else:  # add / move are the same call; "move" re-adds a known id
                emb = unit(angle)
                idx.add(
                    spark.createDataFrame(
                        [(vid, emb)], "vec_id long, embedding array<double>"
                    ),
                    epoch_id=f"op{e}",
                )
                model[vid] = emb
        q = spark.createDataFrame(
            [(0, unit(0.7))], "query_id long, query_vec array<double>"
        )
        got = [
            (r.vec_id, r.cosine)
            for r in idx.topk(q, k=len(model), n_probe=4).orderBy("rank").collect()
        ]
        qv = unit(0.7)
        nq = m.sqrt(sum(x * x for x in qv))
        want = sorted(
            (
                (vid, round(sum(a * b for a, b in zip(v, qv))
                            / (m.sqrt(sum(x * x for x in v)) * nq), 6))
                for vid, v in model.items()
            ),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == want, (ops, got, want)
        # invariant: exactly one live row per live id, none for removed ids
        live = {r.vec_id for r in idx.table.read().collect()}
        assert live == set(model)
    finally:
        _sh.rmtree(root, ignore_errors=True)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    xy=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            st.one_of(st.none(), st.integers(-1000, 1000)),
        ),
        min_size=1,
        max_size=50,
    ),
    bits=st.integers(min_value=1, max_value=6),
    lo=st.integers(min_value=-1000, max_value=1000),
    span=st.integers(min_value=0, max_value=800),
)
def test_zorder_compact_is_pure_relayout(spark, xy, bits, lo, span):
    """compact(cluster_by=...) must never change WHAT a read returns — only
    which files it touches. Randomized over value distributions (including
    all-NULL columns, which degrade the rank to a constant), cluster_bits,
    and range predicates: the full read is multiset-identical to the input,
    and a where-bounded read equals the brute-force Python filter while the
    scan-stats ledger stays consistent."""
    import shutil as _shutil
    import tempfile as _tempfile

    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable

    d = _tempfile.mkdtemp(prefix="lake-zprop-")
    try:
        t = LakeTable(spark, d, ["event_id"], "seq", num_buckets=2)
        rows = [(i, i, x, y) for i, (x, y) in enumerate(xy)]
        df = spark.createDataFrame(rows, "event_id long, seq long, x int, y int")
        t.append(df, epoch_id="e0")
        t.compact(cluster_by=["x", "y"], cluster_bits=bits, max_records_per_file=7)

        got_all = sorted((r.event_id, r.x, r.y) for r in t.read().collect())
        assert got_all == sorted((i, x, y) for i, _, x, y in rows)

        hi = lo + span
        got = sorted(r.event_id for r in t.read(where={"x": (lo, hi)}).collect())
        want = sorted(i for i, _, x, _ in rows if x is not None and lo <= x <= hi)
        assert got == want
        st_ = t.last_scan_stats
        assert st_["files_scanned"] + st_["files_skipped_by_stats"] == st_["files_total"]
    finally:
        _shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"), st.integers(0, 2), st.integers(1, 15)),
            st.tuples(st.just("rollback"), st.integers(0, 97), st.just(0)),
            st.tuples(st.just("expire"), st.integers(1, 3), st.just(0)),
        ),
        min_size=2,
        max_size=6,
    )
)
def test_rollback_matches_version_history_model(spark, ops):
    """Random interleavings of merges (with REUSED epoch ids), rollbacks
    (to random earlier versions) and manifest expiry must leave the table
    equal to a pure-Python model that replays the same ops over an explicit
    version history: state restore, exactly-once skipping, epoch forgetting,
    and loud (never silent) failure for rollbacks below the expiry cutoff.
    The model is trivial by construction — history[v] is a dict snapshot —
    so any divergence is the engine's."""
    import shutil as _shutil
    import tempfile as _tempfile

    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable

    d = _tempfile.mkdtemp(prefix="lake-rbprop-")
    try:
        t = LakeTable(spark, d, ["key"], "seq", num_buckets=2)
        history = [{}]  # state per version; v0 = empty
        esets = [set()]  # live epoch ids per version
        seq_base = 0
        cutoff = 1  # oldest version whose manifest still exists
        for op, a, n in ops:
            if op == "merge":
                eid = str(a)  # ids 0-2, deliberately reused across the run
                rows = [(f"k{j % 7}", seq_base + j, f"p{seq_base + j}")
                        for j in range(n)]
                seq_base += n
                df = spark.createDataFrame(rows, "key string, seq long, payload string")
                res = t.merge(df, epoch_id=eid)
                if eid in esets[-1]:
                    assert res["skipped"], f"epoch {eid} must skip"
                    continue
                assert not res.get("skipped")
                state = dict(history[-1])
                for k, s, p in rows:
                    if k not in state or state[k][0] < s:
                        state[k] = (s, p)
                history.append(state)
                esets.append(esets[-1] | {eid})
            elif op == "expire":
                cur = len(history) - 1
                if cur < 1:
                    continue
                t.expire_versions(keep_versions=a)
                cutoff = max(cutoff, cur - a + 1)
            else:
                cur = len(history) - 1
                if cur < 1:
                    continue
                to = 1 + (a % cur)
                if to < cutoff and to != cur:
                    import pytest as _pytest

                    with _pytest.raises(Exception, match="expired|vacuumed"):
                        t.rollback(to)
                    continue
                res = t.rollback(to)
                if to == cur:
                    assert res["skipped"]
                    continue
                assert res["restored"] == to
                history.append(dict(history[to]))
                esets.append(set(esets[to]))
        got = {r.key: (r.seq, r.payload) for r in t.read().collect()}
        assert got == history[-1]
        assert set(t.committed_epochs()) == esets[-1]
        # a fresh handle (fresh rotated-log cache) agrees
        t2 = LakeTable(spark, d, ["key"], "seq", num_buckets=2)
        assert set(t2.committed_epochs()) == esets[-1]
    finally:
        _shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"), st.integers(0, 2), st.integers(1, 12)),
            st.tuples(st.just("rollback"), st.integers(0, 97), st.just(0)),
            st.tuples(st.just("rebucket"), st.sampled_from([2, 4, 8]), st.just(0)),
        ),
        min_size=2,
        max_size=6,
    )
)
def test_feed_consumer_always_converges(spark, ops):
    """Against ANY interleaving of merges, rollbacks and rebuckets, a
    consumer following the documented protocol — poll/materialize/commit,
    and on a boundary refusal rebuild-from-read + commit(head) — always
    converges its materialization to the live table. This is the invariant
    that makes the feed safe to build on: no op sequence leaves a correct
    consumer silently divergent or wedged."""
    import shutil as _shutil
    import tempfile as _tempfile

    from conftest import cdf_materialize, cdf_snapshot
    from kafka_connect_claim_check_smt_spark.errors import ClaimCheckError
    from kafka_connect_claim_check_smt_spark.plans.feed import ChangeFeedConsumer
    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable

    d = _tempfile.mkdtemp(prefix="lake-feedprop-")
    try:
        t = LakeTable(spark, d, ["key"], "seq", op_col="op", num_buckets=4)
        c = ChangeFeedConsumer(t, "prop")
        view: dict = {}
        seq_base, eid = 0, 0
        refusals = 0

        def snapshot():
            return cdf_snapshot(t)

        def drive():
            nonlocal refusals
            while True:
                try:
                    batch = c.poll()
                except ClaimCheckError:
                    # documented recovery: rebuild + resume past the boundary
                    refusals += 1
                    view.clear()
                    view.update(snapshot())
                    c.commit(t.current_version())
                    return
                if batch is None:
                    return
                changes, upto = batch
                cdf_materialize(view, changes)
                c.commit(upto)

        for op, a, n in ops:
            if op == "merge":
                rows = [
                    (f"k{j % 9}", seq_base + j, "delete" if j % 7 == 3 else "upsert",
                     f"p{seq_base + j}")
                    for j in range(n)
                ]
                seq_base += n
                t.merge(
                    spark.createDataFrame(
                        rows, "key string, seq long, op string, payload string"
                    ),
                    epoch_id=f"e{eid}",
                )
                eid += 1
            elif op == "rebucket":
                t.rebucket(a)
            else:
                cur = t.current_version()
                if cur >= 1:
                    to = 1 + (a % cur)
                    if to != cur:
                        t.rollback(to)
            drive()
            assert view == snapshot(), f"diverged after {op}"
        assert c.poll() is None
        # refusals are legitimate ONLY when a relayout happened: plain
        # merge/rollback sequences must always be incrementally consumable
        # (guards against a regression classifying every rollback as lossy —
        # which the rebuild-recovery above would otherwise mask)
        if not any(op == "rebucket" for op, _, _ in ops):
            assert refusals == 0, f"{refusals} refusals without any relayout"
    finally:
        _shutil.rmtree(d, ignore_errors=True)
