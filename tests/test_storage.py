"""Storage unit tests — no Spark.

Coverage model ≙ reference storage tests (SURVEY.md §5):
S3StorageTest.java:100-212 (URL build/parse/validation, bucket mismatch),
FileSystemStorageTest.java:40-214 (dir validation, traversal guard),
FileSystemClientTest.java (retry classification),
ClaimCheckStorageFactoryTest.java / config tests (rejection).
"""

from __future__ import annotations

import random

import pytest

from kafka_connect_claim_check_smt_spark.config import ClaimCheckConfig, RetryConfig
from kafka_connect_claim_check_smt_spark.errors import (
    ClaimCheckConfigError,
    ClaimCheckRetrieveError,
    ClaimCheckStoreError,
)
from kafka_connect_claim_check_smt_spark.storage import (
    FileSystemStore,
    FlakyStore,
    RetryingStore,
    content_key,
    make_store,
    retry_with_backoff,
)
from kafka_connect_claim_check_smt_spark.storage.s3 import S3Store


class TestFileSystemStore:
    def test_roundtrip(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        data = b"hello claim check"
        url = st.store(data)
        assert url.startswith("file://")
        assert st.retrieve(url) == data

    def test_deterministic_idempotent_keys(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        data = b"same content"
        assert st.store(data) == st.store(data)  # no UUID-per-attempt dupes

    def test_key_sharding(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        key = content_key(b"x")
        assert f"/{key[:2]}/{key}" in st.url_for(key)

    def test_traversal_guard(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        with pytest.raises(ClaimCheckRetrieveError, match="escapes storage root"):
            st.get(f"file://{tmp_store_dir}/../../etc/passwd")

    def test_wrong_scheme_rejected(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        with pytest.raises(ClaimCheckRetrieveError, match="not a file"):
            st.get("s3://bucket/key")

    def test_missing_blob_rejected(self, tmp_store_dir):
        st = FileSystemStore(tmp_store_dir)
        with pytest.raises(ClaimCheckRetrieveError, match="not a regular file"):
            st.get(st.url_for(content_key(b"never stored")))

    def test_root_must_be_dir(self, tmp_store_dir):
        f = f"{tmp_store_dir}/somefile"
        open(f, "w").close()
        with pytest.raises(ClaimCheckConfigError):
            FileSystemStore(f, create=False)


class _StubS3Client:
    def __init__(self):
        self.objects = {}

    def put_object(self, Bucket, Key, Body):
        self.objects[(Bucket, Key)] = Body

    def get_object(self, Bucket, Key):
        import io

        return {"Body": io.BytesIO(self.objects[(Bucket, Key)])}


class TestS3Store:
    def test_url_shape_and_prefix_normalization(self):
        st = S3Store("bkt", prefix="//a///b/", client=_StubS3Client())
        assert st.url_for("k1") == "s3://bkt/a/b/k1"

    def test_roundtrip(self):
        st = S3Store("bkt", prefix="p", client=_StubS3Client())
        url = st.store(b"payload")
        assert st.retrieve(url) == b"payload"

    def test_bucket_mismatch(self):
        st = S3Store("bkt", client=_StubS3Client())
        with pytest.raises(ClaimCheckRetrieveError, match="does not match"):
            st.get("s3://other/k")

    def test_empty_key(self):
        st = S3Store("bkt", client=_StubS3Client())
        with pytest.raises(ClaimCheckRetrieveError, match="no object key"):
            st.get("s3://bkt/")


class TestRetry:
    def test_retries_then_succeeds(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise IOError("transient")
            return "ok"

        out = retry_with_backoff(
            flaky, RetryConfig(max_retries=3, initial_backoff_ms=1, max_backoff_ms=2),
            op="t", rng=random.Random(42),
        )
        assert out == "ok" and len(calls) == 3

    def test_exhaustion_raises_store_error(self):
        def always():
            raise IOError("down")

        with pytest.raises(ClaimCheckStoreError, match="after 3 attempts"):
            retry_with_backoff(
                always, RetryConfig(max_retries=2, initial_backoff_ms=1, max_backoff_ms=1), op="t"
            )

    def test_non_retriable_fast_fail(self):
        calls = []

        def notfound():
            calls.append(1)
            raise FileNotFoundError("gone")

        with pytest.raises(FileNotFoundError):
            retry_with_backoff(notfound, RetryConfig(initial_backoff_ms=1), op="t")
        assert len(calls) == 1  # no retries on non-retriable

    def test_retrying_store_heals_flaky(self, tmp_store_dir):
        inner = FlakyStore(FileSystemStore(tmp_store_dir), fail_times=2)
        st = RetryingStore(inner, RetryConfig(max_retries=3, initial_backoff_ms=1, max_backoff_ms=2))
        url = st.store(b"flaky data")
        assert st.retrieve(url) == b"flaky data"

    def test_retrying_store_exhausts(self, tmp_store_dir):
        inner = FlakyStore(FileSystemStore(tmp_store_dir), fail_times=10)
        st = RetryingStore(inner, RetryConfig(max_retries=1, initial_backoff_ms=1, max_backoff_ms=1))
        with pytest.raises(ClaimCheckStoreError):
            st.store(b"never")


class TestFactoryAndConfig:
    def test_filesystem(self, tmp_store_dir):
        st = make_store(ClaimCheckConfig(storage_type="filesystem", root_dir=tmp_store_dir))
        assert isinstance(st, RetryingStore)

    def test_unknown_type_rejected(self):
        with pytest.raises(ClaimCheckConfigError):
            ClaimCheckConfig(storage_type="gcs", root_dir="/tmp/x")

    def test_blank_type_rejected(self):
        with pytest.raises(ClaimCheckConfigError):
            ClaimCheckConfig(storage_type="  ", root_dir="/tmp/x")

    def test_threshold_at_least_one(self, tmp_store_dir):
        with pytest.raises(ClaimCheckConfigError):
            ClaimCheckConfig(root_dir=tmp_store_dir, threshold_bytes=0)

    def test_case_insensitive_type(self, tmp_store_dir):
        cfg = ClaimCheckConfig(storage_type="FileSystem", root_dir=tmp_store_dir)
        assert cfg.storage_type == "filesystem"

    def test_retry_validation(self):
        with pytest.raises(ClaimCheckConfigError):
            RetryConfig(max_retries=-1)
        with pytest.raises(ClaimCheckConfigError):
            RetryConfig(initial_backoff_ms=100, max_backoff_ms=10)
