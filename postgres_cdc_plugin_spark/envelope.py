"""Change-event envelope: schema + projection builders.

The reference builds a JSONB envelope per row change with
jsonb_build_object (cdc_webhook--1.0.sql:252-280):
  {id, created_at, table {schema, name}, trigger {name, timing},
   event {op, data {old, new}}}
with old/new full row images (row_to_json) — old NULL on INSERT, new NULL
on DELETE (:266-277).

Here the envelope is a nested StructType column built with F.struct; the
row images are JSON strings (F.to_json(struct(*)) is the row_to_json
analog, and keeps the envelope schema stable under monitored-table schema
drift, matching the reference's schema-on-read payloads §1.3).

Event ids are deterministic (md5 over table identity + row key + per-key
change sequence) instead of gen_random_uuid() (cdc_webhook--1.0.sql:254): under
at-least-once replay the receiver can dedup by id — a deliberate,
documented divergence (SURVEY.md §7 hard-point 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import SubscriptionConfig

# Expected input: a change feed with columns
#   seq BIGINT          per-key capture order (FIXTURES.md §A2)
#   key STRING          monitored row's PK — the per-key ordering unit
#   op STRING           INSERT | UPDATE | DELETE
#   table_schema STRING, table_name STRING
#   old STRUCT/any      NULL when op = INSERT
#   new STRUCT/any      NULL when op = DELETE
#   ts TIMESTAMP        change time


def event_id(cfg: SubscriptionConfig) -> Column:
    """Deterministic event id: md5(schema:table:trigger:key:seq).

    `seq` is PER-KEY capture order (see module header), so the row key
    MUST participate in the hash — without it, changes to different
    rows that share a seq collide on id and the receiver's replay dedup
    (receiver.py, keyed on id) silently drops distinct events. NULL
    keys get the sentinel segment 'n' while real keys are prefixed
    'k', so a NULL key can never collide with any string key
    (including the literal "n"); rows with NULL keys degrade to
    requiring globally-unique seq (the capture source guarantees that
    for keyless feeds). Callers without a `key` column must add one
    first (project_envelope does)."""
    key_seg = F.when(
        F.col("key").isNull(), F.lit("n")
    ).otherwise(F.concat(F.lit("k"), F.col("key").cast("string")))
    # seq gets the same sentinel discipline: concat_ws silently SKIPS
    # null segments, so an unguarded null seq would collapse distinct
    # events onto one id (and let key 'x:1' seq 2 collide with key
    # 'x:1:2' seq null). 'n' vs 's<seq>' can never collide.
    seq_seg = F.when(
        F.col("seq").isNull(), F.lit("n")
    ).otherwise(F.concat(F.lit("s"), F.col("seq").cast("string")))
    return F.md5(
        F.concat_ws(
            ":",
            F.lit(cfg.schema_name),
            F.lit(cfg.table_name),
            F.lit(cfg.name),
            key_seg,
            seq_seg,
        )
    )


def envelope_column(cfg: SubscriptionConfig, raw_images: bool = False) -> Column:
    """The nested envelope struct (cdc_webhook--1.0.sql:252-280).

    raw_images=True passes the old/new columns through as-is (they are
    already JSON text — the feed's wire format): re-serializing a
    map<string,string> parse would retype every number/bool to a string
    and flatten nested objects into escaped blobs, which is NOT what
    row_to_json emits."""
    img = (
        (lambda c: F.col(c))
        if raw_images
        else (lambda c: F.to_json(c, {"ignoreNullFields": "false"}))
    )
    return F.struct(
        event_id(cfg).alias("id"),
        F.col("ts").alias("created_at"),
        F.struct(
            F.lit(cfg.schema_name).alias("schema"),
            F.lit(cfg.table_name).alias("name"),
        ).alias("table"),
        F.struct(
            F.lit(cfg.name).alias("name"),
            F.lit(cfg.trigger_timing).alias("timing"),
        ).alias("trigger"),
        F.struct(
            F.col("op").alias("op"),
            F.struct(
                # row_to_json(OLD/NEW): NULL image stays NULL (:266-277);
                # keep explicit nulls — row_to_json serializes NULL columns
                F.when(F.col("op") != "INSERT", img("old")).alias("old"),
                F.when(F.col("op") != "DELETE", img("new")).alias("new"),
            ).alias("data"),
        ).alias("event"),
    )


def project_envelope(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """P3 envelope projection: narrow column ops, no shuffle. Keeps the
    key/seq columns alongside for sink-side per-key ordering. String
    old/new images (the schema-on-read wire format) pass through to the
    envelope verbatim — the row_to_json analog preserves the original
    value types."""
    if "key" not in changes.columns:
        changes = changes.withColumn("key", F.lit(None).cast("string"))
    from pyspark.sql.types import StringType

    raw = isinstance(changes.schema["new"].dataType, StringType)
    env = envelope_column(cfg, raw_images=raw)
    return changes.select(
        F.col("seq"),
        F.col("key"),
        F.col("op"),
        env.alias("envelope"),
        F.to_json(env, {"ignoreNullFields": "false"}).alias("payload"),
    )
