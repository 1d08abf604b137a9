"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <e2e replay seconds>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "events_per_sec": ...,
 "offload_ratio": ..., "scaling": {...}}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_SCALING  "0" to skip the two-parallelism scaling runs
Internal: --replay-only runs just the CDC replay and prints its own JSON
(used by the scaling subprocesses so each parallelism level gets a fresh JVM).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCRATCH = Path(__file__).parent / ".scratch" / "bench"

REPLAY_EVENTS = 400_000  # synthetic change stream for replay/scaling runs
REPLAY_KEYS = 60_000
REPLAY_EPOCHS = 4
THRESHOLD = 4096


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"claimcheck-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_replay(spark, tag: str) -> dict:
    """E2E CDC replay: synth change stream → LWW dedup → claim-check offload →
    salted repartition → MERGE (epoch-guarded) → hydrated read-back count."""
    from pyspark.sql import functions as F

    from kafka_connect_claim_check_smt_spark import ClaimCheckConfig
    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable
    from kafka_connect_claim_check_smt_spark.sources.changelog import synth_change_events
    from kafka_connect_claim_check_smt_spark.streaming.replay import apply_cdc_batch, read_back

    root = SCRATCH / f"replay-{tag}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = ClaimCheckConfig(root_dir=str(root / "blobs"), threshold_bytes=THRESHOLD)
    table = LakeTable(
        spark, str(root / "lake"), ["repo", "path"], "commit_seq",
        num_buckets=32, op_col="op",
    )
    ev = synth_change_events(
        spark, REPLAY_EVENTS, REPLAY_KEYS, seed=42, threshold=THRESHOLD
    )
    # materialize the generated log first so replay timing measures the engine,
    # not the generator
    log_dir = str(root / "log")
    ev.write.parquet(log_dir)
    log = spark.read.parquet(log_dir)

    t0 = time.time()
    chunk = REPLAY_EVENTS // REPLAY_EPOCHS
    oversized = 0
    for b in range(REPLAY_EPOCHS):
        batch = log.filter(
            (F.col("commit_seq") >= b * chunk) & (F.col("commit_seq") < (b + 1) * chunk)
        )
        stats = apply_cdc_batch(batch, b, table, cfg, uploaded_at_ms=0)
    n_final = read_back(spark, table, cfg).count()
    seconds = time.time() - t0

    lineage = {e["epoch_id"]: e["metrics"] for e in table._manifest(table.current_version())["epochs"]}
    oversized = sum(m.get("oversized_rows", 0) for m in lineage.values())
    rows_in = sum(m.get("rows_in", 0) for m in lineage.values())
    return {
        "seconds": round(seconds, 2),
        "events": rows_in,
        "events_per_sec": round(rows_in / seconds, 1),
        "final_rows": n_final,
        "offload_ratio": round(oversized / max(rows_in, 1), 4),
    }


def timed_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    headline = [
        "cdc_lww_state",
        "cdc_offload_metadata",
        "cdc_merge_upsert",
        "dedup_exact",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "text_quality",
        "doc_fingerprint",
    ]
    qs = entrymod.queries()
    out = {}
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 2)
    return out


def scaling_runs() -> dict:
    """Same replay job, same input, two parallelism levels (N=8, 4N=32) in
    fresh JVMs. Efficiency = (T_N / T_4N) / 4 (≙ throughput_4N/throughput_N/4)."""
    res = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--replay-only"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        res[f"local[{cpus}]"] = json.loads(line)
    t8 = res["local[8]"]["seconds"]
    t32 = res["local[32]"]["seconds"]
    res["scaling_efficiency"] = round((t8 / t32) / 4, 3)
    return res


def main():
    if "--replay-only" in sys.argv:
        spark = make_spark(CPUS)
        out = run_replay(spark, f"cpu{CPUS}")
        print(json.dumps(out))
        spark.stop()
        return

    spark = make_spark(CPUS)
    replay = run_replay(spark, "main")
    queries = timed_queries(spark)
    result = {
        "metric": "cdc_replay_e2e_seconds",
        "value": replay["seconds"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "replay_events": replay["events"],
        "events_per_sec": replay["events_per_sec"],
        "offload_ratio": replay["offload_ratio"],
        "final_rows": replay["final_rows"],
    }
    spark.stop()
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        result["scaling"] = scaling_runs()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
