"""Streaming sources beyond a parquet directory.

The reference lives inside a Kafka pipeline (README.md:79-87): records arrive
continuously and carry the claim-check header as a Kafka record header. This
module gives the engine the equivalent live-source surface:

- ``rate_change_stream`` — an unbounded deterministic change-event stream over
  Structured Streaming's built-in ``rate`` source. The rate source's
  monotonically increasing ``value`` plays the commit_seq role, and every
  other column derives from it through the SAME pure-Catalyst rules as the
  batch generator (sources/changelog.py::change_event_columns), so a rate
  replay exercises real trigger/offset/micro-batch logic while remaining
  bit-deterministic per event id. Use it to soak-test the foreachBatch
  pipeline against a source whose offsets are managed by the engine rather
  than by file listing.

- ``kafka_change_stream`` — the Kafka-shaped adapter (import-gated: the
  ``spark-sql-kafka`` package is not in this sandbox). Wire format matches the
  reference's pipeline: JSON change events in the record value, and the
  claim-check metadata in the record header under
  ``smt-toolkit-claim-check-reference`` (model/ClaimCheckHeader.java:18).

- ``with_claim_check_from_headers`` — source-independent: lift the reference's
  header (Kafka's headers column shape: array<struct<key, value binary>>) into
  the engine's ``claim_check`` struct column. ``headers().lastWithName``
  semantics — the LAST header with the key wins (ClaimCheckSinkTransform.java:61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import ClaimCheckError
from ..functions.metadata import HEADER_KEY, metadata_from_json
from ..operators.claimcheck import CLAIM_CHECK_COL
from .changelog import _rand_col, change_event_columns

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("commit_seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def rate_change_stream(
    spark: SparkSession,
    *,
    rows_per_second: int = 10_000,
    num_partitions: int | None = None,
    n_keys: int = 1_000,
    seed: int = 42,
    threshold: int = 4_096,
    delete_permille: int = 0,
    repos_per_key_space: int | None = None,
) -> DataFrame:
    """Unbounded deterministic change-event stream (readStream.format("rate")).

    ``op`` is stateless — "upsert" or "delete" — because a streaming source
    cannot know first-sight-of-key without state, and the LWW MERGE treats
    insert and update identically anyway (the insert/update distinction in
    CDC logs is upstream bookkeeping, not merge semantics)."""
    n_repos = repos_per_key_space or max(1, n_keys // 50)
    reader = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    if num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    stream = reader.load()  # (timestamp, value)
    i = F.col("value")
    cols = change_event_columns(i, seed=seed, n_keys=n_keys, threshold=threshold, n_repos=n_repos)
    op = F.when(
        _rand_col(i, seed, 5) % 1000 < delete_permille, F.lit("delete")
    ).otherwise(F.lit("upsert"))
    return stream.select(
        i.alias("event_id"),
        i.alias("commit_seq"),
        op.alias("op"),
        cols["ts"].alias("ts"),
        cols["repo"].alias("repo"),
        cols["path"].alias("path"),
        cols["commit"].alias("commit"),
        cols["lang"].alias("lang"),
        cols["content"].alias("content"),
    )


def with_claim_check_from_headers(
    df: DataFrame,
    *,
    headers_col: str = "headers",
    drop_headers: bool = True,
) -> DataFrame:
    """Lift the reference's claim-check header into the ``claim_check`` column.

    Input shape is Kafka's: ``headers array<struct<key: string, value:
    binary>>``. The LAST header with the reference's key wins (≙
    headers().lastWithName, ClaimCheckSinkTransform.java:61); its bytes are
    UTF-8 JSON (≙ ClaimCheckHeader schema STRING, ClaimCheckHeader.java:30-32)
    parsed with numeric-widening tolerance. No header → NULL struct ⇔ inline."""
    hs = F.filter(F.col(headers_col), lambda h: h["key"] == F.lit(HEADER_KEY))
    last = F.element_at(hs, -1)  # lastWithName
    js = F.decode(last["value"], "UTF-8")
    out = df.withColumn(
        CLAIM_CHECK_COL,
        F.when(F.size(hs) > 0, metadata_from_json(js)),
    )
    return out.drop(headers_col) if drop_headers else out


def parse_kafka_records(
    records: DataFrame,
    *,
    value_schema: T.StructType | None = None,
    parse_claim_check_header: bool = True,
) -> DataFrame:
    """Kafka wire shape → typed change events. Source-independent: works on
    the streaming Kafka source AND on any static DataFrame with the same
    columns (``value binary`` UTF-8 JSON + ``headers array<struct<key:
    string, value: binary>>``), which is how the wire contract is E2E-tested
    without the Kafka classpath (tests/test_streaming.py)."""
    schema = value_schema or CHANGE_EVENT_SCHEMA
    parsed = records.select(
        F.from_json(F.decode(F.col("value"), "UTF-8"), schema).alias("__v"),
        F.col("headers"),
    ).select("__v.*", "headers")
    if parse_claim_check_header:
        return with_claim_check_from_headers(parsed)
    return parsed.drop("headers")


def kafka_change_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    value_schema: T.StructType | None = None,
    starting_offsets: str = "earliest",
    parse_claim_check_header: bool = True,
) -> DataFrame:
    """Kafka-shaped change-event stream (import-gated).

    Requires the ``spark-sql-kafka`` package on the classpath (absent in this
    sandbox — the gate raises a configuration error up front instead of a
    DATA_SOURCE_NOT_FOUND deep inside the stream start). Record value = JSON
    change event; record headers may carry the reference's claim-check
    metadata, which is lifted into the ``claim_check`` column so a stream
    written by the reference's source SMT hydrates through this engine
    unchanged."""
    if not kafka_source_available(spark):
        raise ClaimCheckError(
            "kafka source requires the spark-sql-kafka package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<version>)"
        )
    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
        .load()
    )
    return parse_kafka_records(
        stream,
        value_schema=value_schema,
        parse_claim_check_header=parse_claim_check_header,
    )


def kafka_source_available(spark: SparkSession) -> bool:
    """True when the Kafka data source is on the classpath. Class.forName, NOT
    attribute access: py4j resolves a missing class chain to a silent
    JavaPackage object instead of raising."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False
