from .base import BlobStore, FlakyStore, RetryingStore, content_key, retry_with_backoff
from .factory import make_store
from .filesystem import FileSystemStore

__all__ = [
    "BlobStore",
    "FileSystemStore",
    "FlakyStore",
    "RetryingStore",
    "content_key",
    "make_store",
    "retry_with_backoff",
]
