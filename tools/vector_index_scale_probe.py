"""VectorIndex scale probe: is topk cost governed by the probed-cell
fraction rather than the index size?

Builds the persistent IVF index at two sizes (default 100 k and 400 k
synthetic 64-dim vectors, deterministic Spark-side generation), then answers
the SAME 32-query batch against each with n_probe=2 of n_list=16 cells.
Cells hold ~uniform shares (random directions), so the probed fraction is
n_probe/n_list = 1/8 of the index at either size: topk wall should grow
~linearly with the PROBED BYTES (4× index → ~4× probed bytes at fixed
fraction — this probe shows the pruning constant, the file-count assertion
in tests/test_vector_index.py shows the pruning itself), while add() should
stay ~linear in batch.

The O(batch) contrast with a FIXED probed-byte budget is the second pair:
the same query batch against the 4× index with n_list scaled 4× (64 cells,
same ~6 k vectors per cell) — production sizing grows n_list with the
corpus, holding per-cell bytes constant; topk wall should then stay ~flat.

Usage: PYTHONPATH=/root/repo python tools/vector_index_scale_probe.py \
    [N1 N2 CPUS]
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

DIM = 64
QUERIES = 32


def synth_vecs(spark, n: int):
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    # deterministic pseudo-random direction per (id, dim index): md5-derived
    # uniform in [-1, 1); no driver loop, no numpy on the driver
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), j.cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**6) / 2.0)
            - F.lit(1.0)
        ),
    )
    return df.select(F.col("id").alias("vec_id"), comp.alias("embedding"))


def build_and_query(spark, n_index: int, n_list: int, root: str) -> dict:
    from pyspark.sql import functions as F

    from kafka_connect_claim_check_smt_spark.operators.vector_index import VectorIndex

    vecs = synth_vecs(spark, n_index).localCheckpoint()
    idx = VectorIndex(spark, root, n_list=n_list, num_buckets=32)
    t0 = time.time()
    idx.add(vecs, epoch_id="bulk")
    add_s = time.time() - t0
    q = (
        synth_vecs(spark, QUERIES)
        .select(
            (F.col("vec_id") + 10_000_000).alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    q.count()
    t0 = time.time()
    n_rows = idx.topk(q, k=10, n_probe=2).count()
    topk_s = time.time() - t0
    t0 = time.time()
    idx.topk(q, k=10, n_probe=2).count()
    topk_warm_s = time.time() - t0
    return {
        "index_vecs": n_index,
        "n_list": n_list,
        "add_seconds": round(add_s, 2),
        "topk_seconds": round(topk_s, 2),
        "topk_warm_seconds": round(topk_warm_s, 2),
        "result_rows": n_rows,
    }


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
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
    scratch = tempfile.mkdtemp(prefix="vidxprobe-")
    try:
        small = build_and_query(spark, n1, 16, f"{scratch}/small")
        big = build_and_query(spark, n2, 16, f"{scratch}/big")
        big_scaled = build_and_query(spark, n2, 64, f"{scratch}/big64")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "probe": "vector_index_scale",
                "cpus": cpus,
                "queries": QUERIES,
                "small": small,
                "big_same_nlist": big,
                "big_scaled_nlist": big_scaled,
                "index_ratio": round(n2 / n1, 2),
                "topk_ratio_fixed_fraction": round(
                    big["topk_warm_seconds"] / small["topk_warm_seconds"], 2
                ),
                "topk_ratio_fixed_cell_bytes": round(
                    big_scaled["topk_warm_seconds"] / small["topk_warm_seconds"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
