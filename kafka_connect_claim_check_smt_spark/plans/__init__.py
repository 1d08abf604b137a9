from .lake import LakeConflictError, LakeTable, reconcile_schemas

__all__ = ["LakeConflictError", "LakeTable", "reconcile_schemas"]
