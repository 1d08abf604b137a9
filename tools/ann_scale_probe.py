"""ANN-suite scale probe: exact / LSH / IVF cosine top-k beyond the 2 k-vector
testdata regime, on a deterministic Spark-side synthetic corpus.

Checks the things only volume reveals: that the exact path's partial top-k
actually bounds the exchange (k×|Q| per partition, not N×|Q|), that the
bucketed variants' fanout stays sub-scan, that nothing in the plan
broadcast-materializes the vector table (the round-3 minhash lesson — array
payloads are invisible to the size estimator), and that janino survives the
unrolled dot trees at real row counts.

Vectors: dim-64 floats in [-1, 1), each component md5-derived from
(vec id, component) — deterministic, no external data, uniform directions.

Usage: PYTHONPATH=/root/repo python tools/ann_scale_probe.py [N1 N2 CPUS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

DIM = 64
N_QUERIES = 32
K = 10


def synth_vectors(spark, n: int):
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    # component = md5-derived 15-hex-digit int scaled to [-1, 1)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit("/"), j.cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("double") / F.lit(float(1 << 59)) - F.lit(1.0)
        ).cast("float"),
    )
    return df.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def probe(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from kafka_connect_claim_check_smt_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        ivf_index,
        lsh_cosine_topk,
    )

    vecs = synth_vectors(spark, n).localCheckpoint()
    q = (
        vecs.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    # the amortized IVF shape: index built once (timed separately), queries
    # hit the prebuilt index — inline assignment costs n_list×dim MACs/vector,
    # which for |Q| ≈ n_list equals brute-force scoring the corpus
    t0 = time.time()
    idx = ivf_index(vecs, n_list=32, dim=DIM).localCheckpoint()
    ivf_build_s = round(time.time() - t0, 2)
    out = {"vectors": n, "ivf_index_build_seconds": ivf_build_s}
    for name, fn in (
        ("exact", lambda: cosine_topk(vecs, q, k=K, dim=DIM)),
        ("lsh", lambda: lsh_cosine_topk(vecs, q, k=K, dim=DIM, n_planes=8, probe_hamming=1)),
        ("ivf_inline", lambda: ivf_cosine_topk(vecs, q, k=K, dim=DIM, n_list=32, n_probe=4)),
        ("ivf_indexed", lambda: ivf_cosine_topk(
            vecs, q, k=K, dim=DIM, n_list=32, n_probe=4, index=idx
        )),
    ):
        t0 = time.time()
        rows = fn().count()
        out[name] = {"seconds": round(time.time() - t0, 2), "rows": rows}
    return out


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
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
        builder = builder.config("spark.local.dir", "/dev/shm/ann-probe")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    warm = probe(spark, max(n1 // 10, 5_000))
    r1, r2 = probe(spark, n1), probe(spark, n2)
    ratios = {
        k: round(r2[k]["seconds"] / max(r1[k]["seconds"], 1e-9), 2)
        for k in ("exact", "lsh", "ivf_inline", "ivf_indexed")
    }
    print(
        json.dumps(
            {
                "metric": "ann_scale_probe",
                "cpus": cpus,
                "dim": DIM,
                "queries": N_QUERIES,
                "k": K,
                "warmup": warm,
                "small": r1,
                "large": r2,
                "size_ratio": round(n2 / n1, 2),
                "time_ratios": ratios,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
