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


def metadata_from_map(m: Column | str) -> Column:
    """Map-form header → claim_check struct.

    ≙ ClaimCheckMetadata.fromMap (ClaimCheckMetadata.java:130-194): converters
    may hand the header back as a Map instead of a JSON string, with numeric
    fields at whatever width the transport chose (Short/Integer/Long all
    accepted there; here every map value is a string or variant and the cast
    performs the widening). Missing keys → NULL fields (sha256 is optional for
    reference-written headers)."""
    col = F.col(m) if isinstance(m, str) else m
    return F.struct(
        F.element_at(col, "reference_url").cast("string").alias("reference_url"),
        F.element_at(col, "original_size_bytes").cast("long").alias("original_size_bytes"),
        F.element_at(col, "sha256").cast("string").alias("sha256"),
        F.element_at(col, "uploaded_at").cast("long").alias("uploaded_at"),
    )


def metadata_from_any(df, header_col: str) -> Column:
    """String-or-Map dual parse (≙ ClaimCheckHeader.java:45-63): accept the
    header as a JSON-string column or a map column, whichever the upstream
    converter produced. Dispatch is static on the column's type — mirroring
    the reference's instanceof dispatch on the header value — so the chosen
    branch is pure Catalyst with no runtime cost."""
    from pyspark.sql import types as T

    dt = df.schema[header_col].dataType
    if isinstance(dt, T.MapType):
        return metadata_from_map(header_col)
    if isinstance(dt, T.StringType):
        return metadata_from_json(header_col)
    if isinstance(dt, T.StructType):
        # Rebuild BY NAME, never a bare struct cast: Spark casts struct→struct
        # positionally, so a reordered-but-same-named header would silently
        # misassign fields (url into uploaded_at etc.). Missing fields → NULL
        # (sha256 is optional in reference-written headers); width differences
        # are handled by the per-field cast.
        have = {f.name for f in dt.fields}
        col = F.col(header_col)
        return F.struct(
            *[
                (col[f.name] if f.name in have else F.lit(None)).cast(f.dataType).alias(f.name)
                for f in CLAIM_CHECK_SCHEMA.fields
            ]
        )
    raise TypeError(
        f"header column {header_col!r} must be string (JSON), map, or struct; "
        f"got {dt.simpleString()}"
    )


def is_offloaded(cc: Column | str = "claim_check") -> Column:
    col = F.col(cc) if isinstance(cc, str) else cc
    return col.isNotNull()
