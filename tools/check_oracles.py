"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin side-by-side, compare row count + order-insensitive
value hash over name-sorted columns.

Strictness (round-3 hardening): DuckDB results are materialized THROUGH ARROW
(`relation.arrow()` -> to_pylist), not `fetchall()`. DuckDB's Python fetchall
converts HUGEINT/DECIMAL(38,0) (what `sum(BIGINT)` returns) to plain `int`,
which `str()` renders identically to BIGINT — that masking certified two
driver-red queries green in rounds 1-2. Arrow preserves the declared type
(decimal128), so a twin whose output column is not BIGINT-clean hashes
differently here, exactly like the driver. Belt-and-braces, any oracle output
column typed HUGEINT/UHUGEINT/DECIMAL is a hard FAIL on its own: our Spark
queries never emit decimals, so such a column is always an uncast sum()/
product() in the twin's final SELECT.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [only...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"create view {t} as select * from '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = list(ddf.columns)
            dtypes = [str(t) for t in ddf.types]
            # Arrow materialization — same normalization family as the driver
            atbl = ddf.arrow()
            drows = [
                tuple(d[c] for c in dcols) for d in atbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        bad_types = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if any(k in t.upper() for k in ("HUGEINT", "DECIMAL"))
        ]
        if bad_types:
            print(
                f"FAIL  {name}: oracle output columns not BIGINT-clean "
                f"(uncast sum()? ) -> {bad_types}"
            )
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(cols) == sorted(dcols)
        sh = value_hash(srows, cols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} "
            f"hash={'=' if ok_hash else '≠'} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"      spark cols: {sorted(cols)}\n      duck  cols: {sorted(dcols)}")
            if ok_count and ok_schema and not ok_hash:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                sset = sorted("|".join(norm_cell(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(norm_cell(r[i]) for i in dorder) for r in drows)
                diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark: {a[:160]}\n      duck : {b[:160]}")
    print("\nfailures:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
