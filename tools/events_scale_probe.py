"""Events-analytics scale probe: do sessionize / funnel / retention cost
grow ~linearly with event volume, and does the one-exchange plan shape
hold at generated scale?

Synthesizes a deterministic event stream purely Spark-side: N events over
``n_users = N/64`` users (so per-user cardinality stays constant as N
grows — the 100 TB regime is "more users", not "hotter users"), event time
jittered per-id by md5-derived micros, event_type cycling through the
funnel steps plus noise. No files, no Python loops.

Linear data scaling => time ratio ~ size ratio. A blowup in the window
passes (sessionize's lag+cumsum, funnel's k chained mins) or the
distinct-count (retention) would show super-linear growth.

Usage: PYTHONPATH=/root/repo python tools/events_scale_probe.py [N1 N2 CPUS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def synth_events(spark, n: int):
    from pyspark.sql import functions as F

    users = max(n // 64, 1)
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    # user = id % users, per-user sequence index = id DIV users: every user
    # gets ~64 events spaced 37 s apart with a 1200 s jump every 16 events
    # (> the 600 s probe gap → ~4 multi-event sessions per user), plus a
    # deterministic md5 jitter. Step phase-shifts per user so funnels are
    # exercised from every starting offset.
    seq = F.expr(f"id DIV {users}")
    jitter = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
    ts_us = (
        seq * 37_000_000
        + F.expr(f"(id DIV {users}) DIV 16") * 1_200_000_000
        + (jitter.cast("long") % 10_000_000)
    )
    step = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("view", "click", "noise", "view", "purchase", "error")]),
        ((seq + F.col("id") % 6) % 6 + 1).cast("int"),
    )
    return df.select(
        (F.col("id") % users).alias("user_id"),
        F.timestamp_micros(ts_us).alias("ts"),
        step.alias("event_type"),
        F.col("id").alias("event_id"),
    )


def run_once(spark, n: int) -> dict:
    from kafka_connect_claim_check_smt_spark.operators.funnel import funnel_counts
    from kafka_connect_claim_check_smt_spark.operators.retention import (
        cohort_retention,
    )
    from kafka_connect_claim_check_smt_spark.operators.sessions import (
        session_rollup,
    )

    ev = synth_events(spark, n).localCheckpoint()
    out = {"n_events": n}

    # best-of-2 per op: this host's memory-bandwidth noise swings identical
    # runs 2-4x (see BENCH/BASELINE.md); one-sided noise → min() estimates
    def best2(fn):
        t0 = time.time()
        r = fn()
        a = time.time() - t0
        t0 = time.time()
        fn()
        return r, round(min(a, time.time() - t0), 2)

    roll = session_rollup(ev, key="user_id", ts="ts", gap_seconds=600,
                          tiebreak="event_id")
    out["n_sessions"], out["sessionize_s"] = best2(roll.count)

    def _funnel():
        return {r.step_name: r.n_keys for r in funnel_counts(
            ev, key="user_id", ts="ts", step_col="event_type",
            steps=["view", "click", "purchase"], within_seconds=7 * 86400,
        ).collect()}

    fc, out["funnel_s"] = best2(_funnel)
    out["funnel_view_users"] = fc["view"]
    out["funnel_purchase_users"] = fc["purchase"]

    ret = cohort_retention(ev, key="user_id", ts="ts", period_days=1)
    out["n_cohort_cells"], out["retention_s"] = best2(ret.count)
    ev.unpersist()
    return out


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("events-scale-probe")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 40M synthetic events localCheckpointed + sort spill headroom: 16g
        # measured 2-3x slower at N=40M (GC/spill), 24g is flat
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        r1 = run_once(spark, n1)
        r2 = run_once(spark, n2)
        ratio = n2 / n1
        result = {
            "probe": "events_ops_scale",
            "cpus": cpus,
            "runs": [r1, r2],
            "size_ratio": ratio,
            "time_ratio": {
                op: round(r2[f"{op}_s"] / max(r1[f"{op}_s"], 1e-9), 2)
                for op in ("sessionize", "funnel", "retention")
            },
        }
        print(json.dumps(result))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
