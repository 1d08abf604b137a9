"""Live-endpoint S3 tests against an in-process moto server.

Round 1 could only cover the S3 backend with a stubbed client (URL
build/parse/validation, ≙ S3StorageTest.java:100-212). moto provides a real
S3-compatible HTTP endpoint, so these tests exercise the actual boto3 wire
path — including from inside Spark pandas-UDF worker processes, which is how
the store runs on a cluster (≙ the reference's S3 integration tests,
RetryS3IntegrationTest.java:59-119, which use LocalStack the same way).
"""

from __future__ import annotations

import socket

import pytest
from pyspark.sql import functions as F

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from kafka_connect_claim_check_smt_spark import ClaimCheckConfig, hydrate, offload
from kafka_connect_claim_check_smt_spark.errors import ClaimCheckRetrieveError
from kafka_connect_claim_check_smt_spark.storage.base import RetryingStore
from kafka_connect_claim_check_smt_spark.storage.factory import make_store
from kafka_connect_claim_check_smt_spark.storage.s3 import S3Store

BUCKET = "cc-live-test"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=_free_port(), verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    url = f"http://{host}:{port}"
    boto3.client("s3", endpoint_url=url).create_bucket(Bucket=BUCKET)
    yield url
    server.stop()


class TestS3StoreLive:
    def test_put_get_roundtrip(self, endpoint):
        st = S3Store(BUCKET, prefix="p//q/", endpoint_url=endpoint)
        url = st.put("k1", b"payload-bytes")
        assert url == f"s3://{BUCKET}/p/q/k1"
        assert st.get(url) == b"payload-bytes"
        st.close()

    def test_overwrite_is_idempotent(self, endpoint):
        # content-addressed keys → task retries re-put the same bytes
        st = S3Store(BUCKET, endpoint_url=endpoint)
        st.put("dup", b"same")
        url = st.put("dup", b"same")
        assert st.get(url) == b"same"
        st.close()

    def test_missing_key_fails_through_retry(self, endpoint):
        cfg = ClaimCheckConfig(
            storage_type="s3", bucket=BUCKET, endpoint_url=endpoint
        )
        st = make_store(cfg)
        assert isinstance(st, RetryingStore)
        with pytest.raises(Exception):  # NoSuchKey surfaces after retries
            st.get(f"s3://{BUCKET}/never-written")
        st.close()

    def test_bucket_mismatch_guard(self, endpoint):
        st = S3Store(BUCKET, endpoint_url=endpoint)
        with pytest.raises(ClaimCheckRetrieveError):
            st.get("s3://some-other-bucket/k")
        st.close()


class TestSparkOffloadHydrateViaS3:
    def test_roundtrip_sha_equal(self, spark, endpoint):
        """Full claim-check path with blob I/O against the live endpoint from
        pandas-UDF workers: offload oversized rows → blobs land in S3 →
        hydrate reads them back, sha256-verified inside the UDF."""
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("doc_id", "text AS content")
        )
        cfg = ClaimCheckConfig(
            storage_type="s3",
            bucket=BUCKET,
            prefix="blobs",
            endpoint_url=endpoint,
            threshold_bytes=128,
        )
        stored = offload(docs, cfg, uploaded_at_ms=0)
        # force reference_url — the ONLY struct field fed by the put-UDF
        # (content becomes a literal placeholder on offloaded rows, and the
        # other struct fields are pure Catalyst, so count()/length(content)
        # both prune the UDF away and no blob writes would happen)
        stored.agg(F.count("claim_check.reference_url")).collect()
        n_off = stored.filter(F.col("claim_check").isNotNull()).count()
        assert n_off > 0  # sf0.001 docs are 47-558 B; 128 must offload some

        # blobs actually landed in the bucket (count via the S3 API)
        client = boto3.client("s3", endpoint_url=endpoint)
        listed = client.list_objects_v2(Bucket=BUCKET, Prefix="blobs/")
        assert listed["KeyCount"] > 0

        restored = hydrate(stored, cfg)
        joined = docs.alias("a").join(restored.alias("b"), "doc_id")
        mismatches = joined.filter(
            F.sha2(F.col("a.content"), 256) != F.sha2(F.col("b.content"), 256)
        ).count()
        assert mismatches == 0
        assert restored.count() == docs.count()
