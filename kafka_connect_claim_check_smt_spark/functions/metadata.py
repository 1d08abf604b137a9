"""Claim-check metadata encode/decode as Catalyst expressions.

≙ model/ClaimCheckMetadata.java:57-118 (toJson/fromJson) and
ClaimCheckHeader.java:45-63 (String-or-Map dual parse): in Spark the metadata
is a first-class nested column, and the JSON forms exist only at system
boundaries (e.g. writing the change log, or interop with the reference's
header format).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.claimcheck import CLAIM_CHECK_SCHEMA

# the reference's header key — kept for interop naming
HEADER_KEY = "smt-toolkit-claim-check-reference"


def metadata_to_json(cc: Column | str) -> Column:
    """Struct → JSON string with the reference's field names
    (reference_url / original_size_bytes / uploaded_at + sha256)."""
    return F.to_json(cc)


def metadata_from_json(js: Column | str) -> Column:
    """JSON string → claim_check struct (tolerates missing sha256 for interop
    with reference-written headers; numeric widening is handled by the cast)."""
    return F.from_json(js, CLAIM_CHECK_SCHEMA)


def is_offloaded(cc: Column | str = "claim_check") -> Column:
    col = F.col(cc) if isinstance(cc, str) else cc
    return col.isNotNull()
