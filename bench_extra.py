"""Extra benchmarks (guide §1.4): per-query isolation with the noop sink,
plan capture, and repeat control. This file is NOT the driver contract —
``bench.py`` stays frozen; numbers cited in OPTIMIZATION_r06.md come from
here when bench.py's single cold/warm pair is too coarse.

Usage:
  python bench_extra.py                                # headline list, count()
  python bench_extra.py --queries dedup_minhash_lsh    # subset
  python bench_extra.py --noop                         # noop sink instead of count
  python bench_extra.py --plans plans/r06 --tag before # dump explain("formatted")
  python bench_extra.py --repeats 3                    # cold + N-1 warm draws

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32, master local[N] — parameterised, never hard-coded).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_lww_state", "cdc_offload_metadata", "cdc_merge_upsert",
    "cdc_append_scan", "cdc_zorder_scan", "cdc_change_feed",
    "cdc_incremental_agg", "cdc_asof_dims", "cdc_scd2_history",
    "events_sessionize", "events_funnel", "events_retention", "events_rolling",
    "dedup_exact", "dedup_spans", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_index_probe", "dedup_index_exact", "ann_cosine_topk",
    "ann_ivf_topk", "ann_index_topk", "ann_index_neardup", "text_quality",
    "doc_fingerprint", "sample_stratified", "sample_hash_split",
    "pack_sequences", "text_top_terms",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"claimcheck-bench-extra-{cpus}")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUF", str(max(cpus * 2, 8))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_HEAP", "8g"))
        .config("spark.io.compression.codec", os.environ.get("SPARK_GRAFT_CODEC", "zstd"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--repeats", type=int, default=2, help="total draws per query (first = cold)")
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--plans", default=None, help="directory to write <query>_<tag>.txt plans")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    names = args.queries.split(",") if args.queries else HEADLINE
    spark = make_spark(CPUS)
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        draws = []
        for i in range(max(args.repeats, 1)):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                rows[name] = df.count()
            draws.append(round(time.time() - t0, 2))
        out[name] = draws
        if args.plans:
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}_{args.tag}.txt").write_text(
                formatted_plan(qs[name](spark, SF_DIR))
            )
        print(f"  {name}: {draws}" + (f" rows={rows.get(name)}" if name in rows else ""), file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "noop": args.noop, "draws": out}))
    spark.stop()


if __name__ == "__main__":
    main()
