"""Record-value (de)serialization + schema-conformant defaults.

Spark-first restatement of:
- R4 serialize: claimcheck/RecordValueSerializer.java:70-162 (schema-guided
  recursive JSON encode; bytes → Base64) → ``F.to_json`` (Spark's JSON writer
  already Base64-encodes BinaryType and recurses through Struct/Array/Map).
- R5 deserialize: RecordValueSerializer.java:179-303 → ``F.from_json`` with the
  *reader-side* schema (schema rides with the DataFrame, never with the blob —
  the reference makes the same call: "schema information is already available",
  RecordValueSerializer.java:30-33).
- R6 placeholder synthesis: RecordValueDefaults.java:33-78 — precedence:
  explicit field default (StructField.metadata["default"]) → NULL if nullable →
  logical-type default (timestamp/date → epoch, decimal → 0) → type zero-value
  (0 / 0.0 / false / "" / empty bytes / [] / {} / recursive struct).

Schemaless mode (RecordValueSerializer.java:80-114): kept as a raw JSON-string
column — reduced fidelity by design, matching the reference's own type decay
(an INT64 comes back as the smallest fitting type,
ClaimCheckSinkTransformTest.java:105-114).
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def serialize_value(df: DataFrame, value_cols: list[str] | None = None) -> Column:
    """R4 — serialize the value columns to one JSON string column (JVM-side)."""
    cols = value_cols or df.columns
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def deserialize_value(json_col: Column | str, schema: T.StructType) -> Column:
    """R5 — parse a JSON string back into a typed struct using the reader-side
    schema. PERMISSIVE by default: missing fields → null (schema evolution)."""
    return F.from_json(json_col, schema)


def _epoch_date() -> datetime.date:
    return datetime.date(1970, 1, 1)


def _epoch_ts() -> datetime.datetime:
    return datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


def default_literal(field: T.StructField) -> Column:
    """Placeholder value for one field, with the reference's precedence
    (RecordValueDefaults.java:43-69)."""
    if field.metadata and "default" in field.metadata:
        return F.lit(field.metadata["default"]).cast(field.dataType)
    if field.nullable:
        return F.lit(None).cast(field.dataType)
    return type_zero(field.dataType)


def type_zero(dt: T.DataType) -> Column:
    """Type zero-values ≙ RecordValueDefaults.java:56-69 + logical defaults :19-24."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.lit(0).cast(dt)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return F.lit(0.0).cast(dt)
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.BinaryType):
        return F.lit(b"")
    if isinstance(dt, T.DecimalType):
        return F.lit(decimal.Decimal(0)).cast(dt)
    if isinstance(dt, T.DateType):
        return F.lit(_epoch_date())
    if isinstance(dt, T.TimestampType):
        return F.lit(_epoch_ts())
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    if isinstance(dt, T.MapType):
        return F.map_from_arrays(F.array(), F.array()).cast(dt)
    if isinstance(dt, T.StructType):
        return F.struct(
            *[default_literal(f).alias(f.name) for f in dt.fields]
        ).cast(dt)
    return F.lit(None).cast(dt)


def placeholder_struct(schema: T.StructType) -> Column:
    """R6 — a full schema-conformant placeholder row as one struct literal."""
    return F.struct(*[default_literal(f).alias(f.name) for f in schema.fields])


def with_placeholders(df: DataFrame, condition: Column, value_cols: list[str]) -> DataFrame:
    """Replace ``value_cols`` with their schema defaults where ``condition``
    holds (the general-schema form of the offload placeholder substitution)."""
    schema = {f.name: f for f in df.schema.fields}
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.when(condition, default_literal(schema[c])).otherwise(F.col(c))
        )
    return out
