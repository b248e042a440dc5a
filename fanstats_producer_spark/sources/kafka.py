"""Kafka source arm: the paginated REST crawl (main.py:122-160) made
continuous over a message bus.

The reference's ingest is a daily pull (EventBridge cron → one Fargate
task, main.tf:214-244); the streaming-native equivalent is posts landing
on a Kafka topic and Structured Streaming consuming them.  This module
wires that path so a deployment with a broker gets it for free:

- ``read_kafka_stream`` builds the ``readStream.format("kafka")`` scan
  (requires the spark-sql-kafka connector on the classpath; none is in
  this container, so the builder is exercised only up to ``load()``).
- ``decode_kafka_records`` is the value-decoding transform — a PURE
  DataFrame function over Kafka's fixed wire schema (key/value binary,
  topic, partition, offset, timestamp), so it is unit-testable on a
  batch DataFrame and applies verbatim to the stream; same
  one-codepath-two-modes discipline as streaming/jobs.py.

Scale notes: one Kafka partition maps to one Spark input partition —
topic partitioning IS the parallelism knob; ``maxOffsetsPerTrigger``
bounds micro-batch size (the P4 cap made continuous); offsets live in
the checkpoint, replacing the reference's blind at-least-once append
(main.py:151) with exactly-once sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from fanstats_producer_spark.sources.ndjson import TWEET_SCHEMA


def decode_kafka_records(
    records: DataFrame,
    schema: StructType = TWEET_SCHEMA,
    drop_undecodable: bool = True,
) -> DataFrame:
    """Decode Kafka wire records into typed rows: value bytes → UTF-8
    JSON → ``schema``, carrying (topic, partition, offset, kafka_ts)
    through as lineage columns.  Corrupt payloads decode to a NULL
    struct; ``drop_undecodable`` filters them (dead-letter them to a
    side sink in production instead)."""
    # PERMISSIVE from_json yields an all-null struct (not a NULL struct)
    # for malformed payloads, so corrupt detection needs the explicit
    # _corrupt_record channel.
    # (StructType.add mutates in place — build a copy so the caller's
    # schema object, usually the shared TWEET_SCHEMA, stays untouched)
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = records.select(
        F.from_json(
            F.col("value").cast("string"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("post"),
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
    )
    out = parsed.select(
        "post.*", "topic", "kafka_partition", "kafka_offset", "kafka_ts"
    )
    if drop_undecodable:
        return out.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    # keep the corrupt channel so callers (split_decoded) can route
    # undecodable payloads to a quarantine sink
    return out


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    schema: StructType = TWEET_SCHEMA,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 3000,
) -> DataFrame:
    """Continuous ingest from Kafka: subscribe → decode → typed stream.
    ``max_offsets_per_trigger`` defaults to the reference's per-run cap
    (MAX_RESULTS=3000, main.py:13-19) as a rate limit per micro-batch."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return decode_kafka_records(reader.load(), schema)


def split_decoded(
    records: DataFrame, schema: StructType = TWEET_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Decode with a dead-letter channel: returns (good, dead) where
    `good` is the typed rows and `dead` carries the raw payload plus
    lineage for quarantine.  Both derive from ONE decode pass (same
    from_json expression → Catalyst subexpression elimination; no second
    scan of the source) — route `dead` to a quarantine sink instead of
    dropping, so schema drift upstream is observable rather than silent."""
    decoded = decode_kafka_records(records, schema, drop_undecodable=False)
    good = decoded.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    dead = decoded.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_payload"),
        "topic",
        "kafka_partition",
        "kafka_offset",
        "kafka_ts",
    )
    return good, dead
