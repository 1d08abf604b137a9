"""PySpark-native CDC / claim-check incremental-ingest engine.

A from-scratch, Spark-first engine with the data-processing capabilities of
the reference Kafka Connect claim-check SMT (JHPrk/kafka-connect-claim-check-smt):
claim-check offload/hydration over structured change records, re-expressed as
DataFrame transforms + Arrow-vectorized pandas UDFs, extended (per the north
rule) into a full CDC replay pipeline: change-log tail → LWW dedup → offload →
salted repartition → idempotent MERGE into a versioned lake table, with
exactly-once epoch guards, checkpoint resume, lineage metrics, and
training-data-pipeline operators (dedup family, similarity search, text
analytics, multimodal plumbing).
"""

from .config import ClaimCheckConfig, RetryConfig
from .operators.claimcheck import (
    CLAIM_CHECK_COL,
    CLAIM_CHECK_SCHEMA,
    PLACEHOLDER,
    hydrate,
    offload,
    oversize_predicate,
)
from .storage import FileSystemStore, FlakyStore, RetryingStore, make_store

__version__ = "0.1.0"

__all__ = [
    "CLAIM_CHECK_COL",
    "CLAIM_CHECK_SCHEMA",
    "PLACEHOLDER",
    "ClaimCheckConfig",
    "FileSystemStore",
    "FlakyStore",
    "RetryConfig",
    "RetryingStore",
    "hydrate",
    "make_store",
    "offload",
    "oversize_predicate",
]
