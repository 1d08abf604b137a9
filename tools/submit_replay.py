"""spark-submit driver for the CDC replay pipeline.

The north-rule deployment shape is ``spark-submit --py-files pkg.zip`` on a
multi-executor cluster; this script is the cluster entrypoint. It contains NO
sys.path manipulation on purpose — the package must arrive via --py-files
(or an installed wheel), exactly as it would on a real cluster:

    cd /root/repo && zip -qr /tmp/ccsmt.zip kafka_connect_claim_check_smt_spark
    spark-submit --master local[8] \\
        --conf spark.sql.shuffle.partitions=32 \\
        --py-files /tmp/ccsmt.zip \\
        tools/submit_replay.py /root/testdata/sf0.001 /tmp/replay-out

On a real cluster only --master / --deploy-mode change; the job itself is
identical (that is the point — tools/run_submit_demo.sh runs it end-to-end,
incl. an epoch replay, and asserts the final state against an in-plan LWW
oracle with per-row content sha256 equality).

Prints ONE json line: {"events": N, "final_rows": N, "offload_ratio": f,
"epochs": [...], "replay_skipped": bool, "content_sha_ok": bool}.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession, Window, functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="replay-")

    # imports resolve from the --py-files zip shipped to every executor
    from kafka_connect_claim_check_smt_spark import ClaimCheckConfig
    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable
    from kafka_connect_claim_check_smt_spark.sources.changelog import testdata_change_events
    from kafka_connect_claim_check_smt_spark.streaming.replay import apply_cdc_batch, read_back

    spark = SparkSession.builder.appName("cdc-replay-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    events = testdata_change_events(spark, sf_dir)
    n_events = events.count()
    # sf0.001 content is 9-70 B (sf0.01: up to ~1 KiB); 32 offloads a real slice
    cfg = ClaimCheckConfig(root_dir=f"{out_dir}/blobs", threshold_bytes=32)
    table = LakeTable(spark, f"{out_dir}/lake", ["repo", "path"], "commit_seq", num_buckets=8)

    # two epochs (first/second half of the log), then a REPLAY of epoch 1 —
    # the checkpointed epoch guard must skip it (exactly-once under retry)
    hi = events.agg(F.max("commit_seq")).collect()[0][0] + 1
    epochs = []
    for eid, batch in (
        (0, events.filter(F.col("commit_seq") < hi // 2)),
        (1, events.filter(F.col("commit_seq") >= hi // 2)),
        (1, events.filter(F.col("commit_seq") >= hi // 2)),  # retry/replay
    ):
        res = apply_cdc_batch(batch, eid, table, cfg)
        epochs.append({"epoch": eid, "skipped": bool(res.get("skipped")), "version": res.get("version")})

    final = table.read()
    n_final = final.count()
    offloaded = final.filter(F.col("claim_check").isNotNull()).count()

    # per-row invariant: hydrated content (verify=True sha-checks every blob
    # inside the UDF) equals the sequential LWW oracle over the raw log
    hydrated = read_back(spark, table, cfg).select(
        "repo", "path", F.sha2("content", 256).alias("sha")
    )
    w = Window.partitionBy("repo", "path").orderBy(F.desc("commit_seq"))
    oracle = (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("repo", "path", F.sha2("content", 256).alias("sha"))
    )
    bad = hydrated.join(oracle, ["repo", "path"], "full").filter(
        hydrated["sha"].isNull() | oracle["sha"].isNull() | (hydrated["sha"] != oracle["sha"])
    ).count()

    print(
        json.dumps(
            {
                "events": n_events,
                "final_rows": n_final,
                "offload_ratio": round(offloaded / max(n_final, 1), 4),
                "epochs": epochs,
                "replay_skipped": bool(epochs[2]["skipped"]),
                "content_sha_ok": bad == 0,
            }
        )
    )
    spark.stop()
    return 0 if (bad == 0 and epochs[2]["skipped"] and offloaded > 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
