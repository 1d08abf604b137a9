"""Serializer / placeholder-synthesis tests over the full typed record
(FIXTURES.md F4 ≙ RecordValueSerializerTest.java:22-381 and
RecordValueDefaultsTest.java:31-300)."""

from __future__ import annotations

import datetime
import decimal

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_claim_check_smt_spark.functions.serde import (
    default_literal,
    deserialize_value,
    placeholder_struct,
    serialize_value,
    type_zero,
    with_placeholders,
)

TYPED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("tiny", T.ByteType(), False),
        T.StructField("small", T.ShortType(), False),
        T.StructField("num", T.IntegerType(), False),
        T.StructField("ratio", T.FloatType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("flag", T.BooleanType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField(
            "nested",
            T.StructType(
                [T.StructField("a", T.IntegerType(), False), T.StructField("b", T.StringType(), False)]
            ),
            False,
        ),
        T.StructField("created", T.TimestampType(), False),
        T.StructField("born", T.DateType(), False),
        T.StructField("amount", T.DecimalType(18, 4), False),
    ]
)

ROW = (
    1,
    "cokelee777",  # the reference's canonical test value, RecordFactory.java
    2,
    3,
    4,
    1.5,
    2.5,
    True,
    b"\x01\x02",
    ["a", "b"],
    {"k": "v"},
    (7, "x"),
    datetime.datetime(2024, 5, 1, 12, 0, 0),
    datetime.date(2024, 5, 1),
    decimal.Decimal("12.3400"),
)


def test_json_roundtrip_all_types(spark):
    """R4/R5: serialize → JSON → deserialize with the reader-side schema;
    every typed field survives (binary via Base64, nested struct/array/map)."""
    df = spark.createDataFrame([ROW], TYPED_SCHEMA)
    js = df.select(serialize_value(df).alias("j"))
    back = js.select(deserialize_value(F.col("j"), TYPED_SCHEMA).alias("v")).select("v.*")
    orig = df.collect()[0].asDict(recursive=True)
    rt = back.collect()[0].asDict(recursive=True)
    # timestamps serialize in session TZ; compare field-wise
    assert rt == orig


def test_roundtrip_missing_field_null(spark):
    """Schema evolution: reader schema with an extra column → null (PERMISSIVE)."""
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    evolved = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("stars", T.IntegerType()),
        ]
    )
    out = df.select(deserialize_value(serialize_value(df), evolved).alias("v")).select("v.*")
    r = out.collect()[0]
    assert (r.id, r.name, r.stars) == (1, "x", None)


def test_type_zero_defaults(spark):
    """R6 type zero-values ≙ RecordValueDefaults.java:56-69,19-24."""
    row = spark.range(1).select(
        *[type_zero(f.dataType).alias(f.name) for f in TYPED_SCHEMA.fields]
    ).collect()[0]
    assert row.id == 0 and row.name == "" and row.flag is False
    assert row.tiny == 0 and row.small == 0 and row.num == 0
    assert row.ratio == 0.0 and row.score == 0.0
    assert bytes(row.blob) == b"" and row.tags == [] and row.attrs == {}
    assert row.nested.a == 0 and row.nested.b == ""
    assert row.created == datetime.datetime(1970, 1, 1, 0, 0)
    assert row.born == datetime.date(1970, 1, 1)
    assert row.amount == decimal.Decimal("0.0000")


def test_default_precedence(spark):
    """Precedence: metadata default > nullable-null > type zero
    (≙ RecordValueDefaults.java:43-69)."""
    f_meta = T.StructField("x", T.IntegerType(), False, metadata={"default": 42})
    f_null = T.StructField("y", T.IntegerType(), True)
    f_zero = T.StructField("z", T.IntegerType(), False)
    row = spark.range(1).select(
        default_literal(f_meta).alias("x"),
        default_literal(f_null).alias("y"),
        default_literal(f_zero).alias("z"),
    ).collect()[0]
    assert (row.x, row.y, row.z) == (42, None, 0)


def test_placeholder_struct_shape(spark):
    row = spark.range(1).select(placeholder_struct(TYPED_SCHEMA).alias("p")).collect()[0].p
    assert row.name == "" and row.nested.a == 0


def test_with_placeholders_condition(spark):
    df = spark.createDataFrame(
        [(1, "keep", 10), (2, "mask", 99)], "id long, name string, v int"
    )
    out = with_placeholders(df, F.col("v") > 50, ["name", "v"])
    rows = {r.id: r for r in out.collect()}
    assert rows[1].name == "keep" and rows[1].v == 10
    assert rows[2].name is None and rows[2].v is None  # nullable → null


def test_schemaless_roundtrip_with_claim_check(spark, tmp_path):
    """Schemaless mode E2E (≙ schemaless serialize path,
    RecordValueSerializer.java:80-114 + ClaimCheckSinkTransformTest.java:105-114):
    value columns → one untyped JSON string → claim-check offload (NULL
    placeholder, ≙ forSchemaless) → hydrate → VARIANT re-materialization at
    reader-requested types."""
    from kafka_connect_claim_check_smt_spark import ClaimCheckConfig, hydrate, offload
    from kafka_connect_claim_check_smt_spark.functions.serde import (
        from_schemaless,
        to_schemaless,
    )

    df = spark.createDataFrame(
        [
            (1, 7, "hello " * 30, 2.5, True),
            (2, 9223372036854775807, "x", 0.1, False),  # INT64 max survives
            (3, None, None, None, None),                # nulls round-trip
        ],
        "id long, n long, s string, d double, b boolean",
    )
    packed = to_schemaless(df, ["n", "s", "d", "b"])
    assert packed.columns == ["id", "value_json"]
    cfg = ClaimCheckConfig(root_dir=str(tmp_path / "blobs"), threshold_bytes=64)
    out = offload(packed, cfg, content_col="value_json", uploaded_at_ms=0, placeholder=None)
    # the schemaless placeholder is NULL, not "" (≙ RecordValueDefaults.java:76-78)
    offl = out.filter(F.col("claim_check").isNotNull()).collect()
    assert offl and all(r.value_json is None for r in offl)
    restored = hydrate(out, cfg, content_col="value_json")
    back = from_schemaless(
        restored, "value_json", {"n": "long", "s": "string", "d": "double", "b": "boolean"}
    )
    got = {r.id: (r.n, r.s, r.d, r.b) for r in back.collect()}
    assert got[1] == (7, "hello " * 30, 2.5, True)
    assert got[2] == (9223372036854775807, "x", 0.1, False)
    assert got[3] == (None, None, None, None)

    # type decay is the READER's choice — the same stored payload
    # re-materializes at whatever type is requested (reference: Jackson
    # smallest-fit; here: explicit extraction type)
    decayed = from_schemaless(restored.filter("id = 1"), "value_json", {"n": "int"})
    assert decayed.collect()[0].n == 7  # INT64-written, INT32-read


def test_metadata_string_map_struct_interop(spark):
    """≙ ClaimCheckHeader.java:45-63 + ClaimCheckMetadata.java:130-194: the
    claim-check header parses from a JSON string, a Map (with numeric
    widening: transports may hand back int-width numbers), or a struct —
    whichever form the upstream converter produced."""
    from kafka_connect_claim_check_smt_spark.functions.metadata import (
        metadata_from_any,
        metadata_to_json,
    )

    js = '{"reference_url":"file:///b/x","original_size_bytes":123,"uploaded_at":456}'
    s_df = spark.createDataFrame([(js,)], "hdr string")
    m_df = spark.createDataFrame(
        [({"reference_url": "file:///b/x", "original_size_bytes": "123", "uploaded_at": "456"},)],
        "hdr map<string,string>",
    )
    expected = ("file:///b/x", 123, None, 456)  # sha256 optional (reference headers lack it)
    for df in (s_df, m_df):
        cc = df.select(metadata_from_any(df, "hdr").alias("cc")).collect()[0].cc
        assert (cc.reference_url, cc.original_size_bytes, cc.sha256, cc.uploaded_at) == expected

    # struct form: numeric widening int→long via cast
    st_df = spark.createDataFrame(
        [(("file:///b/x", 123, None, 456),)],
        "hdr struct<reference_url:string,original_size_bytes:int,sha256:string,uploaded_at:int>",
    )
    cc = st_df.select(metadata_from_any(st_df, "hdr").alias("cc")).collect()[0].cc
    assert cc.original_size_bytes == 123 and cc.uploaded_at == 456

    # struct form with REORDERED fields: must match by NAME (a positional
    # struct cast would silently misassign url into uploaded_at etc.)
    ro_df = spark.createDataFrame(
        [((456, "file:///b/x", 123),)],
        "hdr struct<uploaded_at:int,reference_url:string,original_size_bytes:int>",
    )
    cc = ro_df.select(metadata_from_any(ro_df, "hdr").alias("cc")).collect()[0].cc
    assert (cc.reference_url, cc.original_size_bytes, cc.sha256, cc.uploaded_at) == expected

    # round-trip: struct → JSON → struct
    back = s_df.select(metadata_from_any(s_df, "hdr").alias("cc")).select(
        metadata_to_json("cc").alias("js")
    )
    df2 = back
    cc2 = df2.select(metadata_from_any(df2, "js").alias("cc")).collect()[0].cc
    assert cc2.reference_url == "file:///b/x" and cc2.original_size_bytes == 123

    with pytest.raises(TypeError, match="must be string"):
        bad = spark.createDataFrame([(1,)], "hdr int")
        metadata_from_any(bad, "hdr")
