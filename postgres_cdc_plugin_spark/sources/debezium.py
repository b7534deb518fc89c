"""Debezium envelope adapter: external CDC feeds -> canonical change rows.

The reference captures changes itself (row triggers); a Spark engine
more often consumes an existing CDC stream. Debezium is the de-facto
wire format for Postgres CDC over Kafka, and its envelope carries the
same information as the reference's event (SURVEY.md §1.1: Debezium-
style before/after images). This module converts Debezium JSON values
into the engine's canonical CHANGE_SCHEMA so every downstream piece
(capture_pipeline, sinks, queue) works unchanged on a Kafka/Debezium
feed:

    raw = spark.readStream.format("kafka")...load()
    changes = debezium.parse(raw.selectExpr("CAST(value AS STRING)"))

The parser itself is pure column logic, so it is testable (and oracle-
checkable) without Kafka; only the transport line above needs a broker.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the subset of the Debezium envelope the engine consumes; before/after
# stay as raw JSON strings (schema-on-read, like the reference's
# row_to_json payloads — survives monitored-table drift)
_ENVELOPE_FIELDS = (
    "  before: string,"
    "  after: string,"
    "  source: struct<schema: string, table: string, ts_ms: bigint, lsn: bigint>,"
    "  op: string,"
    "  ts_ms: bigint"
)

# Both wire shapes the Debezium JSON converter emits (public Debezium
# reference documentation, "Debezium connector for PostgreSQL" →
# change event keys/values): with the converter default
# schemas.enable=true every message is wrapped
# {"schema": {...}, "payload": {before, after, source, op, ts_ms}};
# with schemas.enable=false the payload fields sit at the top level.
# One from_json with the payload struct alongside the flat fields
# parses either; _env() coalesces field-wise (wrapped wins — a flat
# envelope has no "payload" key, so its struct is NULL). The schema
# block itself is deliberately NOT modeled: from_json ignores unknown
# keys, which is what survives connector upgrades adding fields.
DEBEZIUM_SCHEMA = (
    "struct<"
    + _ENVELOPE_FIELDS
    + ", payload: struct<"
    + _ENVELOPE_FIELDS
    + ">>"
)

_OP_MAP = {"c": "INSERT", "r": "INSERT", "u": "UPDATE", "d": "DELETE"}


def parse(
    values: DataFrame, value_col: str = "value", key_field: str = "id"
) -> DataFrame:
    """Debezium JSON values -> canonical change rows (CHANGE_SCHEMA
    shape: seq, key, op, table_schema, table_name, old, new, ts).

    op mapping: c(reate)/r(ead, snapshot) -> INSERT, u -> UPDATE,
    d -> DELETE. Rows that don't map (tombstones — null value after a
    delete — truncates, unparseable values) are DROPPED, not passed
    through as all-NULL ghost rows that would pollute downstream
    keyed state; use split() when the pipeline must audit malformed
    values instead of dropping them. seq = source.lsn (the Postgres WAL position — the
    total-order the reference gets implicitly from firing in commit
    order). `key_field` names the primary-key column inside the row
    images (default "id"); tables with a different PK must pass theirs
    or per-key ordering and event-id dedup degrade to the keyless
    path. ts = source.ts_ms, the DATABASE change time — the envelope's
    top-level ts_ms is connector processing time, which diverges by
    hours on connector restart/backfill and would wreck event-time
    sessions, watermarks, and ack-latency math; the connector clock is
    kept only as a fallback for envelopes missing source.ts_ms.
    Narrow projection; at scale this chains straight onto the Kafka
    source with no shuffle.
    """
    return split(values, value_col=value_col, key_field=key_field).changes


class ParsedFeed(NamedTuple):
    changes: DataFrame
    quarantine: DataFrame  # raw values that failed to parse (auditable)


def split(
    values: DataFrame, value_col: str = "value", key_field: str = "id"
) -> ParsedFeed:
    """parse(), plus an auditable quarantine relation.

    Three row fates (mirroring corpus.split_quarantine's discipline —
    a CDC path must not lose WAL positions silently):
      * tombstones (NULL value after a delete) — dropped by design;
      * valid envelopes whose op the engine doesn't consume
        (truncate 't', message 'm') — dropped by design;
      * NON-NULL values whose envelope or op comes back NULL from
        from_json (malformed JSON, foreign payloads) — QUARANTINED:
        returned as raw values for replay/inspection, never silently
        vanished.
    Both outputs derive from one projection over the source — Catalyst
    shares the scan when both are consumed in one foreachBatch."""
    env = F.from_json(F.col(value_col), DEBEZIUM_SCHEMA).alias("e")

    # field-wise unwrap: schemas.enable=true frames carry the envelope
    # under "payload" (the JSON converter's default wire shape, pinned
    # by the golden fixtures in tests/fixtures/debezium/); flat frames
    # (schemas.enable=false) carry it at the top level. Wrapped wins —
    # a flat envelope parses payload as NULL, a wrapped one never has
    # top-level before/op/source.
    def _env(field: str):
        return F.coalesce(F.col(f"e.payload.{field}"), F.col(f"e.{field}"))

    op = _env("op")
    expr = None
    for k, v in _OP_MAP.items():
        expr = F.when(op == k, v) if expr is None else expr.when(op == k, v)
    mapped_op = expr.otherwise(F.lit(None))
    path = f"$.{key_field}"
    tagged = values.select(
        F.col(value_col).alias("_raw"),
        env,
    ).select(
        "_raw",
        _env("before").alias("_before"),
        _env("after").alias("_after"),
        _env("source.lsn").alias("_lsn"),
        _env("source.schema").alias("_schema"),
        _env("source.table").alias("_table"),
        _env("source.ts_ms").alias("_src_ts"),
        _env("ts_ms").alias("_conn_ts"),
        op.alias("_rawop"),
        mapped_op.alias("_op"),
    )
    changes = (
        tagged.select(
            F.col("_lsn").alias("seq"),
            # key: the row identity travels in after (or before, on DELETE)
            F.coalesce(
                F.get_json_object("_after", path),
                F.get_json_object("_before", path),
            ).alias("key"),
            F.col("_op").alias("op"),
            F.col("_schema").alias("table_schema"),
            F.col("_table").alias("table_name"),
            F.col("_before").alias("old"),
            F.col("_after").alias("new"),
            F.timestamp_millis(
                F.coalesce(F.col("_src_ts"), F.col("_conn_ts"))
            ).alias("ts"),
        )
        .filter(F.col("op").isNotNull())
    )
    quarantine = tagged.filter(
        F.col("_raw").isNotNull() & F.col("_rawop").isNull()
    ).select(F.col("_raw").alias(value_col))
    return ParsedFeed(changes, quarantine)


# --- transports --------------------------------------------------------
#
# SURVEY §1.4 source list: file changefeed / Delta CDF / Kafka+Debezium.
# Every transport yields the SAME canonical change relation, so the
# capture pipeline and sinks are transport-agnostic; the parity test
# (tests/test_sources.py) proves file-changefeed and Debezium-dump
# inputs produce identical envelopes.


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    key_field: str = "id",
    starting_offsets: str = "earliest",
    **options: str,
) -> DataFrame:
    """Kafka transport: canonical change rows from a Debezium topic.

    Thin option plumbing over the built-in kafka source (requires the
    spark-sql-kafka package on the cluster; not installable in this
    sandbox, hence untested here — the parser and everything downstream
    is exercised through file_stream, which shares this contract)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load().selectExpr("CAST(value AS STRING) AS value")
    return parse(raw, key_field=key_field)


def file_stream(
    spark: SparkSession, dump_dir: str, key_field: str = "id", **options: str
) -> DataFrame:
    """File transport with the identical contract: a directory of text
    files holding one Debezium value per line (the shape of a
    kafka-console-consumer dump) — the mock transport for tests and a
    replay path for archived topics."""
    reader = spark.readStream
    for k, v in options.items():
        reader = reader.option(k, v)
    return parse(reader.text(dump_dir), key_field=key_field)
