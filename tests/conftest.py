from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

# Dummy AWS credentials for the moto-backed live-S3 tests. Set BEFORE the
# session-scoped SparkSession exists so pandas-UDF worker processes (forked
# from the JVM, which inherits this process's env) see them too.
for _k, _v in {
    "AWS_ACCESS_KEY_ID": "testing",
    "AWS_SECRET_ACCESS_KEY": "testing",
    "AWS_SECURITY_TOKEN": "testing",
    "AWS_SESSION_TOKEN": "testing",
    "AWS_DEFAULT_REGION": "us-east-1",
}.items():
    os.environ.setdefault(_k, _v)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("claimcheck-engine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_dir():
    d = tempfile.mkdtemp(prefix="ccstore-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def cdf_materialize(state: dict, changes_df) -> dict:
    """THE reference downstream materializer for CDF tests: apply net change
    rows to a key→(seq, payload) dict. Single home for the _change_type
    application rules — test_feed and the feed property test both use it."""
    for r in changes_df.collect():
        if r._change_type in ("insert", "update_postimage"):
            state[r.key] = (r.seq, r.payload)
        elif r._change_type == "delete":
            state.pop(r.key, None)
    return state


def cdf_snapshot(t) -> dict:
    return {r.key: (r.seq, r.payload) for r in t.read().collect()}
