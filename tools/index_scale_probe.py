"""MinHashIndex scale probe: is probe cost O(batch), not O(index)?

The index's 100 TB contract (operators/dedup_index.py) is that probing a
micro-batch against the accumulated index reads only the band-table buckets
the batch's band keys hash to — so probe latency should stay ~flat as the
INDEX grows while the batch stays fixed. This probe builds the index at two
sizes (default 50 k and 200 k docs, same deterministic Spark-side corpus as
tools/dedup_scale_probe.py), then probes the SAME fixed 5 k-doc batch
against each and compares wall times. O(batch) ⇒ probe-time ratio ≈ 1.0;
an accidental full-index scan would track the 4× index ratio instead.

Also times add() per batch at both sizes (expected ~linear in batch, with
the band-bucket merge rewriting only touched buckets).

Usage: PYTHONPATH=/root/repo python tools/index_scale_probe.py [N1 N2 CPUS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.dedup_scale_probe import synth_docs  # noqa: E402

BATCH = 5_000


def build_and_probe(spark, n_index: int, root: str) -> dict:
    from pyspark.sql import functions as F

    from kafka_connect_claim_check_smt_spark.operators.dedup_index import MinHashIndex

    # the probe batch is docs [n_index, n_index+BATCH) — disjoint ids, same
    # corpus family so ~5% are near-dups of indexed predecessors via the
    # i%20 tail-edit rule crossing the boundary is irrelevant; matches come
    # from identical (base seed, word-index) texts at i and i-1
    all_docs = synth_docs(spark, n_index + BATCH).localCheckpoint()
    idx = MinHashIndex(
        spark, root, k=8, num_hashes=32, bands=8, hasher="xxhash64", num_buckets=64
    )
    t0 = time.time()
    idx.add(all_docs.filter(F.col("doc_id") < n_index), epoch_id="bulk")
    add_s = time.time() - t0
    batch = all_docs.filter(F.col("doc_id") >= n_index).localCheckpoint()
    batch.count()
    t0 = time.time()
    n_dups = idx.probe(batch, threshold=0.5).count()
    probe_s = time.time() - t0
    # second probe of the same batch: steady-state number with the manifest
    # and JVM warm — the per-micro-batch cost a streaming deployment pays
    t0 = time.time()
    idx.probe(batch, threshold=0.5).count()
    probe_warm_s = time.time() - t0
    return {
        "index_docs": n_index,
        "add_seconds": round(add_s, 2),
        "probe_seconds": round(probe_s, 2),
        "probe_warm_seconds": round(probe_warm_s, 2),
        "probe_batch": BATCH,
        "dup_pairs": n_dups,
    }


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="idxprobe-")
    try:
        small = build_and_probe(spark, n1, f"{scratch}/small")
        big = build_and_probe(spark, n2, f"{scratch}/big")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    out = {
        "probe": "minhash_index_scale",
        "cpus": cpus,
        "small": small,
        "big": big,
        "index_ratio": round(n2 / n1, 2),
        "probe_time_ratio": round(big["probe_seconds"] / small["probe_seconds"], 2),
        "probe_warm_time_ratio": round(
            big["probe_warm_seconds"] / small["probe_warm_seconds"], 2
        ),
        "add_time_ratio": round(big["add_seconds"] / small["add_seconds"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
