"""Hot-key skew A/B: MERGE strategy 'sort' vs 'agg' under an extreme update
storm on one key (the "hot repo" case from the north rule).

The two strategies shuffle different things:

- ``sort``: union(base, batch) hash-partitions EVERY update row by key bucket
  and dedups by sort. A key receiving p% of the stream puts p% of the batch's
  rows (and bytes) into ONE reducer task — the straggler regime.
- ``agg``: intra-batch LWW first, via ``max_by`` over an ordering struct —
  a partial (map-side) aggregation, so each map task forwards at most ONE row
  per key it saw. The hot key crosses the wire ~num_input_partitions times
  instead of ~p×|batch| times; the exchange is bounded by
  |distinct keys per partition|, independent of update skew.

Usage: PYTHONPATH=/root/repo python tools/skew_experiment.py [hot_share]
         [n_events] [cores]
Prints one JSON line per strategy plus the A/B summary, and asserts both
strategies produce byte-identical table state (sha over the sorted output).

Findings go to BENCH/BASELINE.md §"Hot-key skew".
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    hot_share = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable
    from kafka_connect_claim_check_smt_spark.sources.changelog import synth_change_events

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("skew-ab")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.local.dir", "/dev/shm/skew-scratch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # base stream with mild skew, then slam hot_share of events onto ONE key
    ev = synth_change_events(spark, n_events, n_keys=n_events // 8, num_partitions=cores * 4)
    ev = ev.withColumn(
        "repo",
        F.when(F.xxhash64("event_id") % 1000 < int(hot_share * 1000), F.lit("org0/hot-repo"))
        .otherwise(F.col("repo")),
    ).withColumn(
        "path",
        F.when(F.col("repo") == "org0/hot-repo", F.lit("src/hot.py")).otherwise(F.col("path")),
    )

    results = {}
    shas = {}
    for strategy in ("sort", "agg"):
        root = tempfile.mkdtemp(prefix=f"skew-{strategy}-", dir="/dev/shm")
        table = LakeTable(spark, root + "/lake", ["repo", "path"], "commit_seq", num_buckets=cores * 2)
        t0 = time.time()
        table.merge(ev, epoch_id=0, strategy=strategy)
        wall = time.time() - t0
        out = table.read()
        # order-insensitive state fingerprint: xor of per-row hashes
        sha = out.select(
            F.xxhash64("repo", "path", F.col("commit_seq").cast("string"),
                       F.sha2("content", 256)).alias("h")
        ).agg(F.expr("bit_xor(h)").alias("x")).collect()[0][0]
        n = out.count()
        results[strategy] = {"seconds": round(wall, 2), "final_rows": n,
                             "events_per_sec": round(n_events / wall)}
        shas[strategy] = sha
        print(json.dumps({"strategy": strategy, **results[strategy]}))
        shutil.rmtree(root, ignore_errors=True)

    identical = shas["sort"] == shas["agg"]
    print(json.dumps({
        "hot_share": hot_share, "events": n_events, "cores": cores,
        "sort_seconds": results["sort"]["seconds"],
        "agg_seconds": results["agg"]["seconds"],
        "agg_speedup": round(results["sort"]["seconds"] / results["agg"]["seconds"], 2),
        "state_identical": identical,
    }))
    spark.stop()
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
