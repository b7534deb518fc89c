"""Delta Change Data Feed transport -> canonical change relation.

SURVEY §1.4 source list: file changefeed / Delta CDF / Kafka+Debezium.
This module closes the Delta CDF leg the same way debezium.kafka_stream
closes the Kafka leg: the format-specific reader is a thin, documented
seam (delta-spark is not installable in this sandbox), while the
row-shape transformation — the actual semantics — is a pure DataFrame
function exercised by the transport-parity contract test
(tests/test_sources.py::test_delta_cdf_transport_matches_changefeed).

Delta CDF shape (public Delta Lake protocol): the table's data columns
plus `_change_type` ('insert' | 'update_preimage' | 'update_postimage'
| 'delete'), `_commit_version`, `_commit_timestamp`. Canonicalization:

  * insert           -> op=INSERT, new=row image, old=NULL
  * delete           -> op=DELETE, old=row image, new=NULL
  * update_postimage -> op=UPDATE, new=row image,
                        old joined from the same commit's
                        update_preimage row on (key, version)
  * seq = _commit_version (the Delta log's total order; monotone per
    key since a key's changes serialize through the log)

At 100 TB the preimage join is an equi-join on (key, version) between
two partitions of the SAME commit batch — co-partitioned by the join
key, never a corpus-wide shuffle of historical data.

Reference analog: hasura/postgres-cdc-plugin ships its changes as
row_to_json pairs per trigger fire (cdc_webhook--1.0.sql); Delta CDF is
the lakehouse equivalent of that change stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CDF_META = ("_change_type", "_commit_version", "_commit_timestamp")


def from_cdf(
    cdf: DataFrame,
    key_field: str = "id",
    table_schema: str = "public",
    table_name: str = "employees",
) -> DataFrame:
    """Pure transformation: a CDF-shaped DataFrame (any origin — the
    delta reader, a test fixture, an archived export) to the canonical
    change relation (changefeed.CHANGE_SCHEMA column set)."""
    missing = [c for c in _CDF_META if c not in cdf.columns]
    if missing:
        raise ValueError(f"not a Delta CDF relation; missing {missing}")
    data_cols = [c for c in cdf.columns if c not in _CDF_META]
    if key_field not in data_cols:
        raise ValueError(f"key_field {key_field!r} not in {data_cols}")
    base = cdf.select(
        F.col(key_field).cast("string").alias("key"),
        F.col("_change_type").alias("ct"),
        F.col("_commit_version").cast("long").alias("seq"),
        F.col("_commit_timestamp").cast("timestamp").alias("ts"),
        F.to_json(F.struct(*data_cols)).alias("img"),
    )
    pre = base.filter(F.col("ct") == "update_preimage").select(
        F.col("key").alias("p_key"),
        F.col("seq").alias("p_seq"),
        F.col("img").alias("old_img"),
    )
    rest = base.filter(F.col("ct") != "update_preimage")
    return (
        rest.join(
            pre,
            (rest.key == pre.p_key) & (rest.seq == pre.p_seq),
            "left",
        )
        .select(
            "seq",
            "key",
            F.when(F.col("ct") == "insert", F.lit("INSERT"))
            .when(F.col("ct") == "delete", F.lit("DELETE"))
            .otherwise(F.lit("UPDATE"))
            .alias("op"),
            F.lit(table_schema).alias("table_schema"),
            F.lit(table_name).alias("table_name"),
            F.when(F.col("ct") == "delete", F.col("img"))
            .otherwise(F.col("old_img"))
            .alias("old"),
            F.when(F.col("ct") == "delete", F.lit(None).cast("string"))
            .otherwise(F.col("img"))
            .alias("new"),
            "ts",
        )
    )


def delta_cdf_stream(
    spark: SparkSession,
    table_path: str,
    key_field: str = "id",
    starting_version: int = 0,
    table_schema: str = "public",
    table_name: str = "employees",
    **options: str,
) -> DataFrame:
    """Delta CDF transport: canonical change rows from a Delta table's
    Change Data Feed.

    Thin option plumbing over the delta streaming source (requires the
    delta-spark package on the cluster; not installable in this
    sandbox, hence untested here — the canonicalization and everything
    downstream is exercised through from_cdf on CDF-shaped input,
    which shares this contract). Note: streaming CDF reads deliver a
    commit's preimage/postimage rows in the same micro-batch, so the
    preimage join in from_cdf stays within the batch."""
    reader = (
        spark.readStream.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return from_cdf(
        reader.load(table_path),
        key_field=key_field,
        table_schema=table_schema,
        table_name=table_name,
    )


def cdf_batch(
    spark: SparkSession,
    table_path: str,
    key_field: str = "id",
    starting_version: int = 0,
    ending_version: int | None = None,
    **kwargs,
) -> DataFrame:
    """Batch variant (backfill/replay): table_changes over a version
    range. Same documented-seam status as delta_cdf_stream."""
    reader = (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
    )
    if ending_version is not None:
        reader = reader.option("endingVersion", str(ending_version))
    return from_cdf(reader.load(table_path), key_field=key_field, **kwargs)
