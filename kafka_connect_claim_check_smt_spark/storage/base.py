"""Blob store interface + retry-with-backoff.

≙ reference storage/type/ClaimCheckStorage.java:10-41 (store/retrieve contract)
and storage/client/FileSystemClient.java:55-96 (retry loop: exponential backoff
doubled per attempt, capped, jitter ×(0.75 + rand·0.5), non-retriable fast-fail,
maxAttempts = retry.max + 1).

Deviation from the reference (intentional, scale-driven): blob keys are
**deterministic** — sha256 of the content — instead of random UUIDv4
(S3Storage.java:63-65). Spark retries tasks; a UUID-per-attempt key would
duplicate blobs on every task retry and break exactly-once replay. sha256 keys
make `put` idempotent: same content ⇒ same key ⇒ at-most-one object.

Stores are used **executor-side** inside pandas UDFs. They must be cheap to
construct from a plain config dict (pickled into the UDF closure) and are
lazily initialized per python worker (≙ Connect's configure-once lifecycle,
ClaimCheckSourceTransform.java:44-58).
"""

from __future__ import annotations

import abc
import hashlib
import random
import time
from collections.abc import Callable
from typing import TypeVar

from ..config import RetryConfig
from ..errors import ClaimCheckConfigError, ClaimCheckRetrieveError, ClaimCheckStoreError

T = TypeVar("T")

# Errors that retrying will never fix — fail fast.
# ≙ FileSystemClient.java:80-88 (FileNotFound/NoSuchFile/AccessDenied/read-only fs).
# ClaimCheckRetrieveError covers URL-validation failures (wrong scheme, traversal,
# bucket mismatch, missing blob) — all permanent.
NON_RETRIABLE = (
    FileNotFoundError,
    PermissionError,
    IsADirectoryError,
    NotADirectoryError,
    ClaimCheckRetrieveError,
    ClaimCheckConfigError,
)


def content_key(data: bytes) -> str:
    """Deterministic blob key: sha256 hex of the content."""
    return hashlib.sha256(data).hexdigest()


def retry_with_backoff(
    fn: Callable[[], T],
    retry: RetryConfig,
    *,
    op: str,
    rng: random.Random | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` with exponential backoff + jitter.

    Backoff doubles per attempt, capped at max_backoff_ms, jittered by
    ×(0.75 + rand·0.5) — FileSystemClient.java:64-75. Non-retriable errors
    propagate immediately (FileSystemClient.java:80-88).
    """
    rng = rng or random.Random()
    backoff_ms = retry.initial_backoff_ms
    last: Exception | None = None
    for attempt in range(retry.max_attempts):
        try:
            return fn()
        except NON_RETRIABLE:
            raise
        except Exception as exc:  # noqa: BLE001 — transient classification is allowlist-style
            last = exc
            if attempt + 1 >= retry.max_attempts:
                break
            jitter = 0.75 + rng.random() * 0.5
            sleep(backoff_ms * jitter / 1000.0)
            backoff_ms = min(backoff_ms * 2, retry.max_backoff_ms)
    raise ClaimCheckStoreError(
        f"{op} failed after {retry.max_attempts} attempts: {last}"
    ) from last


class BlobStore(abc.ABC):
    """store(bytes) -> url, retrieve(url) -> bytes.

    ≙ storage/type/ClaimCheckStorage.java:17-40, with deterministic keys.
    """

    # Should per-blob ops fan out over a thread pool? True for network stores
    # (S3: 10-50 ms/op of GIL-released wait — threads hide it); False for
    # local-filesystem stores, where ops are sub-millisecond and 16 threads
    # fighting over the GIL measured 10× SLOWER than a serial loop.
    parallel_io: bool = True

    @abc.abstractmethod
    def url_for(self, key: str) -> str:
        """The reference URL a given key would be stored under."""

    @abc.abstractmethod
    def put(self, key: str, data: bytes) -> str:
        """Idempotently write ``data`` under ``key``; return its URL."""

    @abc.abstractmethod
    def get(self, url: str) -> bytes:
        """Retrieve the blob addressed by ``url``. Validates that the URL
        belongs to this store's namespace before touching I/O."""

    def store(self, data: bytes) -> str:
        """≙ ClaimCheckStorage.store — content-addressed."""
        return self.put(content_key(data), data)

    def retrieve(self, url: str) -> bytes:
        return self.get(url)

    def close(self) -> None:  # ≙ CloseableClaimCheckStorage / AutoCloseableUtils
        pass


class FlakyStore(BlobStore):
    """Test double: fails the first ``fail_times`` calls per (op, key) with a
    transient IOError, then delegates. ≙ the Toxiproxy fault-injection layer in
    integration-test/RetryS3IntegrationTest.java:59-119 (FIXTURES.md F6)."""

    def __init__(self, inner: BlobStore, fail_times: int = 2, fail_op: str = "both"):
        self.inner = inner
        self.fail_times = fail_times
        self.fail_op = fail_op
        self.attempts: dict[tuple[str, str], int] = {}
        self.parallel_io = inner.parallel_io

    def _maybe_fail(self, op: str, key: str) -> None:
        if self.fail_op not in (op, "both"):
            return
        n = self.attempts.get((op, key), 0)
        self.attempts[(op, key)] = n + 1
        if n < self.fail_times:
            raise IOError(f"injected transient failure #{n + 1} for {op} {key}")

    def url_for(self, key: str) -> str:
        return self.inner.url_for(key)

    def put(self, key: str, data: bytes) -> str:
        self._maybe_fail("put", key)
        return self.inner.put(key, data)

    def get(self, url: str) -> bytes:
        self._maybe_fail("get", url)
        return self.inner.get(url)


class RetryingStore(BlobStore):
    """Wraps any store with the reference's retry semantics (R9)."""

    def __init__(self, inner: BlobStore, retry: RetryConfig | None = None):
        self.inner = inner
        self.retry = retry or RetryConfig()
        self.parallel_io = inner.parallel_io  # delegate the fan-out hint

    def url_for(self, key: str) -> str:
        return self.inner.url_for(key)

    def put(self, key: str, data: bytes) -> str:
        return retry_with_backoff(lambda: self.inner.put(key, data), self.retry, op="put")

    def get(self, url: str) -> bytes:
        try:
            return retry_with_backoff(lambda: self.inner.get(url), self.retry, op="get")
        except ClaimCheckStoreError as exc:
            raise ClaimCheckRetrieveError(str(exc)) from exc

    def close(self) -> None:
        self.inner.close()
