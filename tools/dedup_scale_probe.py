"""Dedup-suite scale probe: does minhash+LSH+clusters cost grow ~linearly
with corpus size once out of the fixed-overhead regime?

sf0.1's documents table (5 k docs) measures planning + JIT, not data — every
headline dedup time there is fixed cost. This probe synthesizes a
deterministic corpus PURELY Spark-side (no driver loop, no external data):

- doc i's text = 64 md5-derived 12-char words seeded by (base, word-index),
  ~830 B/doc
- every 20th doc is a near-dup of its predecessor (same base seed + a small
  tail edit) → a known ~5% near-dup pair density for the verify stage

and times minhash_lsh_pairs + assign_clusters end-to-end at two corpus
sizes (default 50 k and 200 k docs) on the same parallelism. Linear data
scaling ⇒ time ratio ≈ size ratio (4×); sublinear fanout blowup or a
corpus-sized materialization would show super-linear growth.

Usage: PYTHONPATH=/root/repo python tools/dedup_scale_probe.py [N1 N2 CPUS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def synth_docs(spark, n: int):
    """Deterministic ~830 B docs; doc i with i%20==0 near-dups doc i-1."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    base = F.when(
        (F.col("id") % 20 == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: F.substring(
            F.md5(F.concat(base.cast("string"), F.lit(":"), j.cast("string"))), 1, 12
        ),
    )
    tail = F.when(
        (F.col("id") % 20 == 0) & (F.col("id") > 0), F.lit(" tiny tail edit")
    ).otherwise(F.lit(""))
    return df.select(
        F.col("id").alias("doc_id"),
        F.concat(F.array_join(words, " "), tail).alias("text"),
    )


def probe(spark, n: int) -> dict:
    from kafka_connect_claim_check_smt_spark.operators.clusters import assign_clusters
    from kafka_connect_claim_check_smt_spark.operators.minhash import minhash_lsh_pairs

    docs = synth_docs(spark, n).localCheckpoint()  # exclude generation cost
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.7, hasher="md5",
        max_candidates_per_doc=8,
    )
    out = assign_clusters(docs, "doc_id", pairs)
    n_reps = out.filter("is_representative").count()
    dt = time.time() - t0
    return {
        "docs": n,
        "seconds": round(dt, 2),
        "docs_per_sec": round(n / dt, 1),
        "representatives": n_reps,
        "dups_removed": n - n_reps,
    }


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.io.compression.codec", "zstd")
    )
    if Path("/dev/shm").is_dir():
        # shuffle/spill on tmpfs — this sandbox's single disk stalls 50 s+
        # under writeback (same reason bench.py does this); a real cluster
        # spills to NVMe
        builder = builder.config("spark.local.dir", "/dev/shm/dedup-probe")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    warm = probe(spark, max(n1 // 5, 2_000))  # JIT/codegen warmup, untimed tier
    r1, r2 = probe(spark, n1), probe(spark, n2)
    ratio = round(r2["seconds"] / r1["seconds"], 2)
    print(
        json.dumps(
            {
                "metric": "dedup_scale_probe",
                "cpus": cpus,
                "warmup": warm,
                "small": r1,
                "large": r2,
                "size_ratio": round(n2 / n1, 2),
                "time_ratio": ratio,
                "scaling": "linear-ish" if ratio <= (n2 / n1) * 1.3 else "SUPERLINEAR",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
