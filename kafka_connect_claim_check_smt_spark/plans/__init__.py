from .iceberg import IcebergTable
from .lake import LakeConflictError, LakeTable, iceberg_available, reconcile_schemas

__all__ = [
    "IcebergTable",
    "LakeConflictError",
    "LakeTable",
    "iceberg_available",
    "reconcile_schemas",
]
