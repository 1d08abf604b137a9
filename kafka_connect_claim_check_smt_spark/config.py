"""Engine configuration, validated at construction (fail fast, driver-side).

Mirrors the reference's ConfigDef-validated configs:
- threshold.bytes, default 1 MiB, min 1
  (reference: config/ClaimCheckSourceTransformConfig.java:10,21)
- storage.type in {s3, filesystem}
  (reference: config/ClaimCheckTransformConfig.java:20-32)
- retry max 3 / initial 300 ms / cap 20 s, exponential backoff + jitter
  (reference: config/storage/S3StorageConfig.java:28-39,
   config/storage/FileSystemStorageConfig.java:17-29,
   common/retry/RetryConfig.java:8-38)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import ClaimCheckConfigError

DEFAULT_THRESHOLD_BYTES = 1_048_576  # 1 MiB — ClaimCheckSourceTransformConfig.java:10
DEFAULT_MAX_RETRIES = 3
DEFAULT_INITIAL_BACKOFF_MS = 300
DEFAULT_MAX_BACKOFF_MS = 20_000

STORAGE_TYPES = ("filesystem", "s3")


@dataclass(frozen=True)
class RetryConfig:
    """≙ common/retry/RetryConfig.java:8-38 (validated record)."""

    max_retries: int = DEFAULT_MAX_RETRIES
    initial_backoff_ms: int = DEFAULT_INITIAL_BACKOFF_MS
    max_backoff_ms: int = DEFAULT_MAX_BACKOFF_MS

    def __post_init__(self) -> None:
        if self.max_retries < 0:
            raise ClaimCheckConfigError("retry.max must be >= 0")
        if self.initial_backoff_ms < 0 or self.max_backoff_ms < 0:
            raise ClaimCheckConfigError("backoff millis must be >= 0")
        if self.max_backoff_ms < self.initial_backoff_ms:
            raise ClaimCheckConfigError("max backoff must be >= initial backoff")

    @property
    def max_attempts(self) -> int:
        # maxAttempts = retry.max + 1 — FileSystemClient.java:55-60
        return self.max_retries + 1


@dataclass(frozen=True)
class ClaimCheckConfig:
    """Offload/hydrate configuration.

    threshold semantics are the reference's: strictly-greater-than triggers
    offload, ``size <= threshold`` stays inline
    (ClaimCheckSourceTransform.java:103-122).
    """

    storage_type: str = "filesystem"
    # filesystem backend
    root_dir: str | None = None
    # s3 backend
    bucket: str | None = None
    prefix: str = ""
    region: str | None = None
    endpoint_url: str | None = None

    threshold_bytes: int = DEFAULT_THRESHOLD_BYTES
    retry: RetryConfig = field(default_factory=RetryConfig)

    def __post_init__(self) -> None:
        st = (self.storage_type or "").strip().lower()
        if st not in STORAGE_TYPES:
            # ≙ ClaimCheckStorageFactory.java:33-44 blank/unknown rejection
            raise ClaimCheckConfigError(
                f"storage_type must be one of {STORAGE_TYPES}, got {self.storage_type!r}"
            )
        object.__setattr__(self, "storage_type", st)
        if self.threshold_bytes < 1:
            # Range.atLeast(1) — ClaimCheckSourceTransformConfig.java:21
            raise ClaimCheckConfigError("threshold_bytes must be >= 1")
        if st == "filesystem" and not self.root_dir:
            raise ClaimCheckConfigError("filesystem storage requires root_dir")
        if st == "s3" and not self.bucket:
            raise ClaimCheckConfigError("s3 storage requires bucket")


def normalize_prefix(prefix: str) -> str:
    """Trim, collapse ``/+`` runs, strip leading/trailing slashes.

    ≙ common/utils/PathUtils.java:14-30.
    """
    import re

    p = (prefix or "").strip()
    p = re.sub(r"/+", "/", p)
    return p.strip("/")
