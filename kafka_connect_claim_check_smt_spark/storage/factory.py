"""Store factory — registry keyed by storage type, case-insensitive.

≙ reference storage/ClaimCheckStorageFactory.java:15-44 (registry map, blank/
unknown → ConfigException).

``make_store`` must be callable on executors from a pickled ClaimCheckConfig,
so it takes only plain data. Pandas UDFs call it lazily once per python worker
(≙ configure-once per Connect task).
"""

from __future__ import annotations

from ..config import ClaimCheckConfig
from ..errors import ClaimCheckConfigError
from .base import BlobStore, RetryingStore
from .filesystem import FileSystemStore


def make_store(cfg: ClaimCheckConfig, with_retry: bool = True) -> BlobStore:
    st = (cfg.storage_type or "").strip().lower()
    if st == "filesystem":
        inner: BlobStore = FileSystemStore(cfg.root_dir)
    elif st == "s3":
        from .s3 import S3Store

        inner = S3Store(cfg.bucket, cfg.prefix, cfg.region, cfg.endpoint_url)
    else:
        raise ClaimCheckConfigError(f"unknown storage type: {cfg.storage_type!r}")
    return RetryingStore(inner, cfg.retry) if with_retry else inner
