"""ChangeFeedConsumer + rollback scale probe: per-delta, never per-table.

Two 100 TB contracts from plans/feed.py and plans/lake.py::rollback:

1. **poll() pays per-delta.** A caught-up consumer's poll after one new
   epoch diffs only the buckets that epoch touched (read_changes prunes both
   snapshot sides via the manifest file lists), so poll wall should stay
   ~flat as the TABLE grows while the delta stays fixed. An accidental
   full-table diff would track the table-size ratio instead.

2. **rollback() is O(1).** The restore commit re-references the target's
   files in a new manifest — no data rewrite — so rollback wall should be
   ~flat in table size (manifest JSON serialization only).

Builds the same merge-ingested table at two sizes (default 100k and 400k
live rows, 8 vs 32 epochs, buckets scaled with the table so per-bucket
bytes stay constant — the rebucket() operating model), applies ONE
identical 25-key delta epoch to each, and times poll+materialize-count and
rollback at both sizes. Prints one JSON line.

Usage: PYTHONPATH=/root/repo python tools/feed_scale_probe.py [N1 N2 CPUS]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

BATCH = 12_500  # rows per epoch; table size = n_epochs * BATCH
DELTA_KEYS = 25  # the fixed delta touches ≤ this many buckets after pruning
ROWS_PER_BUCKET = 12_500  # buckets scale with the table (the rebucket model)


def synth_batch(spark, epoch: int, n: int, keys: int):
    from pyspark.sql import functions as F

    base = epoch * n
    return spark.range(n).select(
        F.format_string("k%09d", (F.col("id") + base) % keys).alias("key"),
        (F.col("id") + base).alias("seq"),
        F.lit("upsert").alias("op"),
        F.sha2(F.format_string("payload-%d", F.col("id") + base), 256).alias(
            "payload"
        ),
    )


def build_and_probe(spark, n_rows: int, root: str) -> dict:
    from kafka_connect_claim_check_smt_spark.plans.feed import ChangeFeedConsumer
    from kafka_connect_claim_check_smt_spark.plans.lake import LakeTable

    if n_rows < BATCH:
        raise SystemExit(f"size {n_rows} < one epoch batch ({BATCH}); use a larger N")

    # per-bucket bytes held constant as the table grows — the documented
    # operating model (rebucket() exists precisely to maintain this), under
    # which a fixed-key delta touches a FIXED byte volume
    t = LakeTable(
        spark, root, ["key"], "seq", op_col="op",
        num_buckets=max(8, n_rows // ROWS_PER_BUCKET),
    )
    n_epochs = n_rows // BATCH
    for e in range(n_epochs):
        t.merge(synth_batch(spark, e, BATCH, keys=n_rows), epoch_id=e)
    c = ChangeFeedConsumer(t, "probe")
    # catch up over the build history (not the measured quantity)
    changes, upto = c.poll()
    changes.count()
    c.commit(upto)

    # measured: ONE fixed delta epoch over DELTA_KEYS keys, then the
    # caught-up poll — read_changes prunes both snapshot sides to the ≤
    # DELTA_KEYS buckets the delta touched
    t.merge(synth_batch(spark, 100_000, DELTA_KEYS, keys=DELTA_KEYS), epoch_id="delta")
    t0 = time.time()
    changes, upto = c.poll()
    n_changes = changes.count()
    poll_s = time.time() - t0
    c.commit(upto)

    v_prev = t.current_version() - 1
    t0 = time.time()
    t.rollback(v_prev)
    rollback_s = time.time() - t0

    st = t.stats()
    return {
        "rows": st["rows"],
        "files": st["files"],
        "epochs": n_epochs,
        "num_buckets": t.num_buckets,
        "poll_s": round(poll_s, 3),
        "poll_changes": n_changes,
        "rollback_s": round(rollback_s, 4),
        # unrounded, for ratio math (a sub-ms rollback rounds to 0.0)
        "_poll_raw": poll_s,
        "_rollback_raw": rollback_s,
    }


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else "8"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, n in (("small", n1), ("large", n2)):
        d = tempfile.mkdtemp(prefix=f"feedprobe-{tag}-")
        try:
            out[tag] = build_and_probe(spark, n, d)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["table_ratio"] = round(out["large"]["rows"] / out["small"]["rows"], 2)
    out["poll_ratio"] = round(
        out["large"].pop("_poll_raw") / out["small"].pop("_poll_raw"), 2
    )
    lr, sr = out["large"].pop("_rollback_raw"), out["small"].pop("_rollback_raw")
    out["rollback_ratio"] = round(lr / sr, 2) if sr > 0 else None
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
