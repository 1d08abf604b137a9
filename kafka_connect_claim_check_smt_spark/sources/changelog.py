"""Change-log sources: the CDC stream the engine replays.

The reference sits inside Kafka Connect and has records *pushed* into it by
Debezium/JDBC connectors (ClaimCheckSourceTransform.java:61; README.md:49-62).
This engine owns its sources instead:

1. ``synth_change_events`` — a deterministic synthetic CDC stream over the
   (repo, path, commit, lang, content) key space (FIXTURES.md F2). Generated
   with **pure Catalyst expressions over spark.range(n)** — no driver-side
   loop, no Python row generation — so the same generator that makes 5k smoke
   rows makes 10^10 bench rows, embarrassingly parallel. Every field is a pure
   function of (event_id, seed) in IEEE-exact arithmetic, so the sequential
   Python twin ``synth_change_events_py`` reproduces it bit-for-bit: that twin
   feeds ``replay_oracle``, the golden-state generator (≙ the role the Java
   reference plays for correctness, SURVEY.md §5).

2. ``testdata_change_events`` — a deterministic SQL-expressible mapping of the
   driver's ``events.parquet`` into the CDC shape, with a matching DuckDB CTE
   (``TESTDATA_CHANGE_EVENTS_SQL``) so driver-side oracle checks can replay the
   same stream in pure ANSI SQL.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

M31 = 2**31
_LCG_A = 1103515245
_LCG_C = 12345
_MIX = 2654435761  # Knuth multiplicative hash

LANGS = ["py", "java", "scala", "sql", "md", "json"]


# ---------------------------------------------------------------------------
# shared derivation rules (Spark Column twin + Python twin, kept adjacent so
# drift is obvious in review)
# ---------------------------------------------------------------------------

def _rand_col(i: Column, seed: int, k: int) -> Column:
    """31-bit deterministic pseudo-random stream k of event i (Catalyst)."""
    base = F.pmod(i + F.lit(seed), F.lit(M31))
    return F.pmod(base * F.lit(_LCG_A) + F.lit(_LCG_C + k * _MIX), F.lit(M31))


def _rand_py(i: int, seed: int, k: int) -> int:
    base = (i + seed) % M31
    return (base * _LCG_A + _LCG_C + k * _MIX) % M31


def _skewed_key_col(i: Column, seed: int, n_keys: int) -> Column:
    # quadratic skew: few hot keys take a large share of events
    v = _rand_col(i, seed, 1).cast("double") / F.lit(float(M31))
    return F.floor(F.lit(float(n_keys)) * v * v).cast("long")


def _skewed_key_py(i: int, seed: int, n_keys: int) -> int:
    v = _rand_py(i, seed, 1) / float(M31)
    return math.floor(n_keys * v * v)


def _size_col(i: Column, seed: int, threshold: int) -> Column:
    """~70% small / 25% mid / 5% oversized (FIXTURES.md F1 size tiers)."""
    t = _rand_col(i, seed, 11) % 100
    r = _rand_col(i, seed, 12)
    return (
        F.when(t < 70, F.lit(64) + r % F.lit(448))
        .when(t < 95, F.lit(512) + r % F.lit(3584))
        .otherwise(F.lit(threshold + 1) + r % F.lit(threshold))
    ).cast("int")


def _size_py(i: int, seed: int, threshold: int) -> int:
    t = _rand_py(i, seed, 11) % 100
    r = _rand_py(i, seed, 12)
    if t < 70:
        return 64 + r % 448
    if t < 95:
        return 512 + r % 3584
    return threshold + 1 + r % threshold


def change_event_columns(
    i: Column,
    *,
    seed: int,
    n_keys: int,
    threshold: int,
    n_repos: int,
) -> dict[str, Column]:
    """The per-event derivation rules as pure Catalyst columns of the event
    index ``i`` — shared by the batch generator (over spark.range) and the
    rate-source streaming adapter (over the rate stream's ``value``)."""
    key = _skewed_key_col(i, seed, n_keys)

    repo_v = _rand_col(key, seed, 7).cast("double") / F.lit(float(M31))
    repo_id = F.floor(F.lit(float(n_repos)) * repo_v * repo_v).cast("long")
    repo = F.concat(F.lit("org"), (repo_id % 7).cast("string"), F.lit("/repo"), repo_id.cast("string"))

    ext_id = F.pmod(key, F.lit(len(LANGS)))
    ext = F.element_at(F.array(*[F.lit(x) for x in LANGS]), ext_id.cast("int") + 1)
    path = F.concat(
        F.lit("src/d"), (key % 13).cast("string"), F.lit("/f_"), key.cast("string"), F.lit("."), ext
    )

    size = _size_col(i, seed, threshold)
    token = F.concat(F.lit("k"), key.cast("string"), F.lit("c"), i.cast("string"), F.lit(" "))
    reps = (size / F.length(token)).cast("int") + F.lit(1)
    content = F.repeat(token, reps)

    commit = F.substring(
        F.sha2(F.concat(repo, F.lit(":"), path, F.lit(":"), i.cast("string")), 256), 1, 40
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + i)
    return {
        "key": key,
        "repo": repo,
        "path": path,
        "lang": ext,
        "content": content,
        "commit": commit,
        "ts": ts,
    }


def synth_change_events(
    spark: SparkSession,
    n_events: int,
    n_keys: int,
    *,
    seed: int = 42,
    threshold: int = 4096,
    delete_permille: int = 0,
    repos_per_key_space: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic CDC stream: (event_id, commit_seq, op, ts,
    repo, path, commit, lang, content). commit_seq == event_id (total order)."""
    n_repos = repos_per_key_space or max(1, n_keys // 50)
    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    cols = change_event_columns(i, seed=seed, n_keys=n_keys, threshold=threshold, n_repos=n_repos)

    out = df.select(
        i.alias("event_id"),
        i.alias("commit_seq"),
        cols["ts"].alias("ts"),
        cols["repo"].alias("repo"),
        cols["path"].alias("path"),
        cols["commit"].alias("commit"),
        cols["lang"].alias("lang"),
        cols["content"].alias("content"),
        cols["key"].alias("__key"),
        (_rand_col(i, seed, 5) % 1000 < delete_permille).alias("__del"),
    )
    w = Window.partitionBy("__key").orderBy("commit_seq")
    op = (
        F.when(F.col("__del") & (F.row_number().over(w) > 1), F.lit("delete"))
        .when(F.row_number().over(w) == 1, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return out.withColumn("op", op).drop("__key", "__del").select(
        "event_id", "commit_seq", "op", "ts", "repo", "path", "commit", "lang", "content"
    )


def synth_change_events_py(
    n_events: int,
    n_keys: int,
    *,
    seed: int = 42,
    threshold: int = 4096,
    delete_permille: int = 0,
    repos_per_key_space: int | None = None,
) -> list[dict]:
    """Sequential bit-exact twin of ``synth_change_events`` (oracle input)."""
    n_repos = repos_per_key_space or max(1, n_keys // 50)
    seen: set[int] = set()
    rows = []
    for i in range(n_events):
        key = _skewed_key_py(i, seed, n_keys)
        rv = _rand_py(key, seed, 7) / float(M31)
        repo_id = math.floor(n_repos * rv * rv)
        repo = f"org{repo_id % 7}/repo{repo_id}"
        ext = LANGS[key % len(LANGS)]
        path = f"src/d{key % 13}/f_{key}.{ext}"
        size = _size_py(i, seed, threshold)
        token = f"k{key}c{i} "
        content = token * (int(size / len(token)) + 1)
        commit = hashlib.sha256(f"{repo}:{path}:{i}".encode()).hexdigest()[:40]
        is_del = _rand_py(i, seed, 5) % 1000 < delete_permille
        if key in seen:
            op = "delete" if is_del else "update"
        else:
            op = "insert"
            seen.add(key)
        rows.append(
            {
                "event_id": i,
                "commit_seq": i,
                "op": op,
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": ext,
                "content": content,
            }
        )
    return rows


def replay_oracle(events: list[dict]) -> dict[tuple[str, str], dict]:
    """Sequential LWW replay → golden final state keyed by (repo, path), with
    content sha256 (FIXTURES.md F5). This is the correctness target the Spark
    pipeline must match (≙ replayed reference state, BASELINE.json)."""
    state: dict[tuple[str, str], dict] = {}
    for ev in sorted(events, key=lambda e: e["commit_seq"]):
        k = (ev["repo"], ev["path"])
        if ev["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = {
                "repo": ev["repo"],
                "path": ev["path"],
                "commit": ev["commit"],
                "commit_seq": ev["commit_seq"],
                "lang": ev["lang"],
                "content_sha256": hashlib.sha256(ev["content"].encode()).hexdigest(),
                "content": ev["content"],
            }
    return state


# ---------------------------------------------------------------------------
# driver-testdata mapping (oracle-checkable in DuckDB)
# ---------------------------------------------------------------------------

def testdata_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC shape over the driver's events.parquet.

    key = (repo ← user_id, path ← event_id mod 97): ~679 distinct keys, so at
    sf0.01 (~10k events) every key sees many updates — LWW is exercised hard.
    Twin SQL: ``TESTDATA_CHANGE_EVENTS_SQL`` (DuckDB).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    repo = F.concat(
        F.lit("org"), (F.col("user_id") % 7).cast("string"),
        F.lit("/repo"), (F.col("user_id") % 23).cast("string"),
    )
    path = F.concat(F.lit("src/f"), (F.col("event_id") % 97).cast("string"), F.lit(".py"))
    step1 = ev.select(
        F.col("event_id"),
        F.col("event_id").alias("commit_seq"),
        F.col("ts"),
        repo.alias("repo"),
        path.alias("path"),
        F.lower(F.col("event_type")).alias("lang"),
        F.repeat(
            F.concat(F.coalesce(F.col("props"), F.lit("")), F.lit("|")),
            (F.lit(1) + F.col("event_id") % 7).cast("int"),
        ).alias("content"),
    )
    commit = F.substring(
        F.sha2(F.concat(F.col("repo"), F.lit(":"), F.col("path"), F.lit(":"), F.col("event_id").cast("string")), 256),
        1, 40,
    )
    return step1.withColumn("commit", commit).select(
        "event_id", "commit_seq", "ts", "repo", "path", "commit", "lang", "content"
    )


TESTDATA_CHANGE_EVENTS_SQL = """
change_events AS (
  SELECT
    event_id,
    commit_seq,
    ts,
    repo,
    path,
    substr(sha256(repo || ':' || path || ':' || CAST(event_id AS VARCHAR)), 1, 40) AS commit,
    lang,
    content
  FROM (
    SELECT
      event_id,
      event_id AS commit_seq,
      ts,
      'org' || CAST(user_id % 7 AS VARCHAR) || '/repo' || CAST(user_id % 23 AS VARCHAR) AS repo,
      'src/f' || CAST(event_id % 97 AS VARCHAR) || '.py' AS path,
      lower(event_type) AS lang,
      repeat(coalesce(props, '') || '|', CAST(1 + event_id % 7 AS INT)) AS content
    FROM events
  )
)
"""
