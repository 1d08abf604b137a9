"""S3 blob store (boto3), import-gated.

≙ reference storage/type/S3Storage.java:38-108:
- PutObject/GetObject under ``s3://<bucket>/<prefix>/<key>`` (:49-83)
- retrieve validates scheme + bucket equals configured bucket (:85-108)
- prefix normalization via PathUtils (:63-69) → config.normalize_prefix

The AWS SDK's own retry strategy plays the role the reference delegates to
StandardRetryStrategy (S3ClientFactory.java:52-76); the engine additionally
wraps stores in RetryingStore for uniform semantics across backends.

Tested two ways: stubbed-client unit tests for URL build/parse/validation
(≙ S3StorageTest.java:100-212), and live-endpoint tests against an
in-process moto S3 server — including blob I/O from Spark pandas-UDF worker
processes (tests/test_s3_live.py, ≙ the reference's LocalStack integration
tests, RetryS3IntegrationTest.java:59-119).
"""

from __future__ import annotations

from urllib.parse import urlparse

from ..config import normalize_prefix
from ..errors import ClaimCheckConfigError, ClaimCheckRetrieveError
from .base import BlobStore


class S3Store(BlobStore):
    def __init__(
        self,
        bucket: str,
        prefix: str = "",
        region: str | None = None,
        endpoint_url: str | None = None,
        client=None,
    ):
        if not bucket:
            raise ClaimCheckConfigError("bucket is required")
        self.bucket = bucket
        self.prefix = normalize_prefix(prefix)
        self.region = region
        self.endpoint_url = endpoint_url
        self._client = client  # injectable for tests; lazy otherwise

    @property
    def client(self):
        if self._client is None:
            try:
                import boto3
            except ImportError as exc:  # pragma: no cover
                raise ClaimCheckConfigError("boto3 is required for s3 storage") from exc
            self._client = boto3.client(
                "s3", region_name=self.region, endpoint_url=self.endpoint_url
            )
        return self._client

    def _object_key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def url_for(self, key: str) -> str:
        return f"s3://{self.bucket}/{self._object_key(key)}"

    def put(self, key: str, data: bytes) -> str:
        self.client.put_object(Bucket=self.bucket, Key=self._object_key(key), Body=data)
        return self.url_for(key)

    def get(self, url: str) -> bytes:
        bucket, obj_key = self._parse(url)
        body = self.client.get_object(Bucket=bucket, Key=obj_key)["Body"]
        return body.read()

    def _parse(self, url: str) -> tuple[str, str]:
        parsed = urlparse(url)
        if parsed.scheme != "s3":
            raise ClaimCheckRetrieveError(f"not an s3:// url: {url}")
        bucket = parsed.netloc
        if bucket != self.bucket:
            # bucket-mismatch guard ≙ S3Storage.java:98-105
            raise ClaimCheckRetrieveError(
                f"url bucket {bucket!r} does not match configured bucket {self.bucket!r}"
            )
        obj_key = parsed.path.lstrip("/")
        if not obj_key:
            raise ClaimCheckRetrieveError(f"url has no object key: {url}")
        return bucket, obj_key

    def close(self) -> None:
        c, self._client = self._client, None
        if c is not None and hasattr(c, "close"):
            try:
                c.close()
            except Exception:  # quiet close ≙ AutoCloseableUtils.java:12-25
                pass
