"""Credential store: security='PRIVATE' secret handling (S5/J1/ST10).

The reference upserts (webhook_url, headers) into cdc_webhook.credentials
keyed by (trigger_schema, trigger_table, trigger_name)
(cdc_webhook--1.0.sql:10-22, upsert :188-197) and resolves them at fire
time with an indexed point lookup (:242-248).

Spark form: an append-only parquet table; "upsert" is append +
last-write-wins window over updated_at (the same dedup shape as the
creds_last_wins query); resolution is a broadcast join against the tiny
current view. Secret values never appear in logs or display output
(ST10 — README.md:135-143): `masked()` is the only sanctioned way to
show the table.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from ..config import SubscriptionConfig

_SCHEMA = StructType(
    [
        StructField("trigger_schema", StringType()),
        StructField("trigger_table", StringType()),
        StructField("trigger_name", StringType()),
        StructField("webhook_url", StringType()),
        StructField("headers", MapType(StringType(), StringType())),
        StructField("updated_at", TimestampType()),
        StructField("created_by", StringType()),
    ]
)

_KEY = ["trigger_schema", "trigger_table", "trigger_name"]


class CredentialStore:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def upsert(self, cfg: SubscriptionConfig, created_by: str = "engine") -> None:
        """Append-as-upsert (ON CONFLICT DO UPDATE analog,
        cdc_webhook--1.0.sql:188-197): newest updated_at wins at read."""
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        row = [
            (
                cfg.schema_name,
                cfg.table_name,
                cfg.name,
                cfg.webhook_url,
                dict(cfg.headers),
                now,
                created_by,
            )
        ]
        self.spark.createDataFrame(row, _SCHEMA).write.mode("append").parquet(
            self.path
        )

    def current(self) -> DataFrame:
        """Last-write-wins view over the append log."""
        w = Window.partitionBy(*_KEY).orderBy(F.desc("updated_at"))
        return (
            self.spark.read.schema(_SCHEMA)
            .parquet(self.path)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def resolve(self, cfg: SubscriptionConfig) -> tuple[str, dict[str, str]]:
        """Point lookup for one subscription (the fire-time SELECT,
        cdc_webhook--1.0.sql:242-248). The creds dim is tiny by
        construction — this is a driver-side broadcast-dim read, one per
        micro-batch, not per row (the reference pays it per row)."""
        rows = (
            self.current()
            .filter(
                (F.col("trigger_schema") == cfg.schema_name)
                & (F.col("trigger_table") == cfg.table_name)
                & (F.col("trigger_name") == cfg.name)
            )
            .collect()
        )
        if not rows:
            raise LookupError(
                f"no credentials stored for {cfg.schema_name}.{cfg.table_name}.{cfg.name}"
            )
        r = rows[0]
        return r.webhook_url, dict(r.headers or {})

    def resolve_join(self, events: DataFrame) -> DataFrame:
        """Stream-side resolution as a broadcast equi-join (J1) for plans
        that carry multiple subscriptions in one stream."""
        return events.join(F.broadcast(self.current()), on=_KEY, how="left")

    def view_for(self, principal: str, policy) -> DataFrame:
        """P4 row-level security analog (cdc_webhook--1.0.sql:55-64):
        role members read the full credential rows; everyone else gets
        the masked display form — never secret material."""
        if policy.has_role(principal):
            return self.current()
        return self.masked()

    def masked(self) -> DataFrame:
        """ST10: the only display form — url host kept, secrets masked."""
        return self.current().select(
            *_KEY,
            F.regexp_replace("webhook_url", r"//[^@/]*@", "//***@").alias(
                "webhook_url_masked"
            ),
            F.transform_values(
                F.col("headers"), lambda _, __: F.lit("***")
            ).alias("headers_masked"),
            "updated_at",
        )
