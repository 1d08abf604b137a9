from .feed import ChangeFeedConsumer
from .iceberg import IcebergTable
from .lake import LakeConflictError, LakeTable, iceberg_available, reconcile_schemas

__all__ = [
    "ChangeFeedConsumer",
    "IcebergTable",
    "LakeConflictError",
    "LakeTable",
    "iceberg_available",
    "reconcile_schemas",
]
