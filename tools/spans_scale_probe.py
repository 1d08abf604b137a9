"""Span-dedup scale probe: does duplicated_spans + cut_spans cost grow
~linearly with corpus size, and does the sampled anchor volume track the
1/sample_mod prediction?

Synthesizes a deterministic corpus purely Spark-side (same generator family
as dedup_scale_probe): ~830 B docs of md5-derived words, with every 10th doc
embedding a SHARED 200-char passage at a doc-dependent offset — so span
detection must be alignment-invariant to find it, and ~10% of docs carry a
cuttable region.

Linear data scaling => time ratio ~ size ratio; a corpus-sized blowup in the
anchor stream, the keeper join, or the interval windowing would show
super-linear growth. Also reports anchors/doc to confirm the content-defined
sampling rate.

Usage: PYTHONPATH=/root/repo python tools/spans_scale_probe.py [N1 N2 CPUS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def synth_docs(spark, n: int):
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    words = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), j.cast("string"))), 1, 12
        ),
    )
    body = F.array_join(words, " ")
    # every 10th doc: splice one SHARED 200-char passage at offset (id%7)*50
    shared = F.substring(F.repeat(F.lit("the shared passage body "), 10), 1, 200)
    off = ((F.col("id") % 7) * 50 + 1).cast("int")
    spliced = F.concat(
        F.substring(body, F.lit(1), off), shared, F.col("__body").substr(off, F.lit(10**9))
    )
    return (
        df.withColumn("__body", body)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, spliced).otherwise(F.col("__body")).alias("text"),
        )
    )


def probe(spark, n: int) -> dict:
    from kafka_connect_claim_check_smt_spark.operators.spans import (
        cut_spans,
        duplicated_spans,
    )
    from pyspark.sql import functions as F

    docs = synth_docs(spark, n).localCheckpoint()  # exclude generation cost
    t0 = time.time()
    hits = duplicated_spans(docs, span_chars=48, sample_mod=8, hasher="md5")
    cleaned = cut_spans(docs, hits, span_chars=48)
    agg = cleaned.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans_cut").alias("islands"),
        F.sum("bytes_removed").alias("bytes_removed"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    n_hits = hits.count()
    return {
        "docs": agg.docs,
        "seconds": wall,
        "hit_anchors": n_hits,
        "islands_cut": int(agg.islands),
        "bytes_removed": int(agg.bytes_removed),
    }


def main():
    from pyspark.sql import SparkSession

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    a, b = probe(spark, n1), probe(spark, n2)
    out = {
        "probe": "spans_scale",
        "small": a,
        "large": b,
        "size_ratio": round(n2 / n1, 2),
        "time_ratio": round(b["seconds"] / max(a["seconds"], 1e-9), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
