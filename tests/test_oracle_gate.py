"""Regression tests for the oracle-gate strictness itself.

Rounds 1-2 lesson: DuckDB types `sum(BIGINT)` as HUGEINT (int128) and
propagates it through arithmetic. The driver's Arrow-based result normalizer
renders HUGEINT/DECIMAL differently from int64, so a twin whose final SELECT
carries an uncast sum-derived column hash-mismatches the (BIGINT-typed)
Spark result even when every value is identical — while a `fetchall()`+
`str()` comparison can never see it. These tests pin:

1. every committed oracle twin is BIGINT-clean (no HUGEINT/UHUGEINT/DECIMAL
   output column), and
2. the hardened checker's detection rule actually fires on an uncast sum.

No SparkSession needed — type binding in DuckDB is plan-time only.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from conftest import SF_CORRECT

_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_BAD = ("HUGEINT", "DECIMAL")


def _flag_bad_columns(rel) -> list[str]:
    """The same rule tools/check_oracles.py enforces (keep in sync)."""
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if any(k in str(t).upper() for k in _BAD)
    ]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        p = f"{SF_CORRECT}/{t}.parquet"
        if Path(p).exists():
            c.sql(f"create view {t} as select * from '{p}'")
    return c


def test_detector_fires_on_uncast_sum(con):
    rel = con.sql("SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    assert _flag_bad_columns(rel) == ["s:HUGEINT"]
    rel2 = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    assert _flag_bad_columns(rel2) == []


def test_detector_fires_on_decimal_arithmetic(con):
    # sum() OVER window -> HUGEINT propagates through +/- and // alike
    rel = con.sql(
        "SELECT sum(x) OVER () - x AS d FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    assert _flag_bad_columns(rel), "window-sum arithmetic must be flagged"


def test_all_committed_twins_are_bigint_clean(con):
    """Every oracle_sql() entry must bind with zero HUGEINT/DECIMAL outputs.

    Binding is plan-time in DuckDB, so this lints all 27 twins in
    milliseconds without executing them."""
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        bad = _flag_bad_columns(rel)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle twins with non-BIGINT-clean output columns (cast them: "
        "DuckDB sum() -> HUGEINT diverges from BIGINT under the driver's "
        f"Arrow normalizer): {offenders}"
    )
