"""Build a scaled-up copy of a testdata SF dir for LOCAL perf probing only.

The driver's round-end bench may run at sf1.0 (10x sf0.1) with data this
sandbox does not have. This tool replicates sf0.1's tables FACTOR times with
id offsets (and a tiny per-copy text suffix on documents so copies are
near- but not byte-identical — preserving the LSH band-collision structure
real generated corpora show at larger SFs). Output is for measuring
operator scaling, never for correctness gates and never read by bench.py
unless explicitly pointed at via SPARK_GRAFT_SF_DIR.

Usage: python tools/make_scaled_sf.py /root/testdata/sf0.1 /dev/shm/sfx10 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=16")
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({factor})) AS c")

    n_docs, = con.execute(f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()
    con.execute(f"""
      COPY (
        SELECT d.doc_id + c * {n_docs} AS doc_id,
               CASE WHEN c = 0 THEN d.text
                    ELSE d.text || ' v' || CAST(c AS VARCHAR) || 'k' ||
                         CAST((d.doc_id * 7 + c) % 97 AS VARCHAR) END AS text,
               d.lang
        FROM '{src}/documents.parquet' d CROSS JOIN copies
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)

    n_ev, = con.execute(f"SELECT count(*) FROM '{src}/events.parquet'").fetchone()
    n_users, = con.execute(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()
    con.execute(f"""
      COPY (
        SELECT e.event_id + c * {n_ev} AS event_id,
               e.user_id + c * {n_users} AS user_id,
               e.event_type, e.ts, e.value, e.props
        FROM '{src}/events.parquet' e CROSS JOIN copies
      ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)

    n_vec, = con.execute(f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()
    con.execute(f"""
      COPY (
        SELECT v.vec_id + c * {n_vec} AS vec_id, v.embedding
        FROM '{src}/embeddings.parquet' v CROSS JOIN copies
      ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)

    n_li, = con.execute(f"SELECT count(*) FROM '{src}/lineitem.parquet'").fetchone()
    con.execute(f"""
      COPY (
        SELECT l.* REPLACE (l.l_orderkey + c * 6000000 AS l_orderkey)
        FROM '{src}/lineitem.parquet' l CROSS JOIN copies
      ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)

    # small dims: straight copies (queries that use them don't scale with them)
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"scaled x{factor}: docs={n_docs * factor} events={n_ev * factor} "
          f"vecs={n_vec * factor} lineitem={n_li * factor}")


if __name__ == "__main__":
    main()
