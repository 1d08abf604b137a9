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
    # deterministic pseudo-random micro jitter from md5(id); base spacing
    # ~37 s of stream time per event id keeps sessions/funnels non-trivial
    jitter = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
    ts_us = (F.col("id") * 37_000_000 + (jitter.cast("long") % 30_000_000))
    step = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("view", "click", "noise", "view", "purchase", "error")]),
        (F.col("id") % 6 + 1).cast("int"),
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

    t0 = time.time()
    roll = session_rollup(ev, key="user_id", ts="ts", gap_seconds=600,
                          tiebreak="event_id")
    out["n_sessions"] = roll.count()
    out["sessionize_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    fc = {r.step_name: r.n_keys for r in funnel_counts(
        ev, key="user_id", ts="ts", step_col="event_type",
        steps=["view", "click", "purchase"], within_seconds=7 * 86400,
    ).collect()}
    out["funnel_view_users"] = fc["view"]
    out["funnel_purchase_users"] = fc["purchase"]
    out["funnel_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    ret = cohort_retention(ev, key="user_id", ts="ts", period_days=1)
    out["n_cohort_cells"] = ret.count()
    out["retention_s"] = round(time.time() - t0, 2)
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
        .config("spark.driver.memory", "16g")
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
