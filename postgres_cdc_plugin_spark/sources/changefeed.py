"""Change-feed sources (S1): the capture side of the CDC dataflow.

The reference captures changes with per-row triggers
(cdc_webhook--1.0.sql:355-366). A Spark engine consumes an externally
captured change feed instead: files of change rows (this module), Delta
Change Data Feed, or Kafka+Debezium — all yielding the same canonical
(seq, op, old, new, ts) shape (FIXTURES.md §A2).

`read_stream` is the Structured Streaming entry (file source — each
appended file is a micro-batch of changes); `from_events` derives a batch
change feed from the driver's `events` table for oracle-checkable work.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canonical change-row schema for the demo `employees` table
# (tests/utilities.py:43-50). `old`/`new` are JSON strings (row_to_json
# analog) so the feed schema survives monitored-table drift.
CHANGE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("key", StringType()),  # monitored row's PK (ordering unit)
        StructField("op", StringType()),
        StructField("table_schema", StringType()),
        StructField("table_name", StringType()),
        StructField("old", StringType()),
        StructField("new", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def parse_images(df: DataFrame, row_schema: str) -> DataFrame:
    """Parse the JSON row images into typed structs for column-diff
    evaluation (P2 needs old.col/new.col access). Typed mode: fields
    compare with their real types, but the schema is PINNED — an ALTER
    TABLE on the monitored table drops/nulls new columns until the
    subscription restarts with an updated row_schema."""
    return df.withColumn("old", F.from_json("old", row_schema)).withColumn(
        "new", F.from_json("new", row_schema)
    )


def read_stream(spark: SparkSession, feed_dir: str, **options: str) -> DataFrame:
    """Streaming change feed: one JSON-lines file per capture chunk.
    options pass through to the file source (e.g. maxFilesPerTrigger=1
    to cap micro-batch size / replay a feed chunk-by-chunk)."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(feed_dir)


def read_batch(spark: SparkSession, feed_dir: str) -> DataFrame:
    return spark.read.schema(CHANGE_SCHEMA).json(feed_dir)


def write_chunk(feed_dir: str, rows: list[dict]) -> str:
    """Test/demo producer: append one capture chunk (micro-batch) to the
    feed directory as a JSON-lines file."""
    os.makedirs(feed_dir, exist_ok=True)
    path = os.path.join(feed_dir, f"chunk-{time.time_ns()}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)  # atomic: the file source never sees partial files
    return path


def from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch change feed derived from the driver `events` table
    (FIXTURES.md §B role mapping): event_id -> seq, ts -> change time,
    signup/error -> INSERT/DELETE, rest -> UPDATE; row images carry
    (user_id, value, props)."""
    from ..session import load

    ev = load(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    image = F.to_json(F.struct("user_id", "value", "props"))
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id").cast("string").alias("key"),
        op.alias("op"),
        F.lit("public").alias("table_schema"),
        F.lit("events").alias("table_name"),
        F.when(op != "INSERT", image).alias("old"),
        F.when(op != "DELETE", image).alias("new"),
        F.col("ts").alias("ts"),
    )
