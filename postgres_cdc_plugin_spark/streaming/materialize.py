"""Latest-state materialization: the compacted current-state table every
CDC consumer derives from the change stream — `cdc_latest_state`
(operators/cdc.py) as a CONTINUOUSLY-MAINTAINED artifact instead of a
batch recompute over the whole log.

Semantics (the consumer side of the reference's envelope stream,
cdc_webhook--1.0.sql:252-280): per key, the change with the highest
`seq` wins (seq is the capture's total order — unique per change, so
the winner is unambiguous); a key whose winning change is a DELETE
vanishes from the table. Applying a batch is idempotent by
construction — the merge is a pure function of (current snapshot ∪
batch), so foreachBatch replay after a crash rewrites the identical
snapshot.

Durability: snapshot swap via `<path>.swap` marker + `<path>.old`
backup, the same crash-recovery protocol as EventQueue.compact — a
materializer killed mid-swap heals on the next read, never serving a
half-written table.

Scale: the demo store rewrites the full snapshot per batch (the corpus
is table-sized). At 100 TB the snapshot is hash-partitioned by key
range and the merge rewrites ONLY partitions containing batch keys
(copy-on-write upsert): batch keys bucket to a small partition subset,
so per-batch cost tracks batch size, not table size — the same layout
argument as the queue's status/date partitioning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

# stored snapshot row: the winning change per surviving key
STATE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
        StructField("op", StringType()),
        StructField("new", StringType()),  # row_to_json analog image
    ]
)


class LatestStateTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    # -- storage ---------------------------------------------------------

    def _recover_crashed_swap(self) -> None:
        """Heal a swap that died in flight. The marker exists exactly
        while the batch's foreachBatch call is still uncommitted, so
        ROLLING BACK to `.old` is always correct in that window: the
        streaming engine will replay the batch against the restored
        snapshot and the pure merge reconverges to the identical next
        state. Once apply_batch returns (marker removed), the batch may
        commit — and no later recovery can touch the swapped-in
        snapshot."""
        import glob

        # stale stage dirs from crashed writes are junk once their batch
        # replays under a fresh write (mode=overwrite) — sweep them here
        for stale in glob.glob(glob.escape(self.path) + ".stage-*"):
            shutil.rmtree(stale, ignore_errors=True)
        old, marker = self.path + ".old", self.path + ".swap"
        has_old, has_marker = os.path.exists(old), os.path.exists(marker)
        if not (has_old or has_marker):
            return
        if has_old and (has_marker or not os.path.exists(self.path)):
            shutil.rmtree(self.path, ignore_errors=True)
            os.rename(old, self.path)
            self.spark.catalog.refreshByPath(self.path)
        shutil.rmtree(old, ignore_errors=True)
        if has_marker:
            os.remove(marker)

    def read(self) -> DataFrame:
        """Current snapshot (empty relation before the first batch)."""
        self._recover_crashed_swap()
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.schema(STATE_SCHEMA).parquet(self.path)

    def _swap_in(self, staged: str) -> None:
        # Marker removal is the COMMIT POINT and must precede the .old
        # cleanup (mirrors queue.py's compact swap): if we crashed mid
        # rmtree(.old) with the marker still present, recovery would
        # roll back to the half-deleted backup and silently lose every
        # key outside the last batch. With the marker gone first, a
        # crash during cleanup leaves a marker-less .old that the
        # recovery tail treats as junk and deletes.
        marker = self.path + ".swap"
        open(marker, "w").close()
        if os.path.exists(self.path):
            os.rename(self.path, self.path + ".old")
        os.rename(staged, self.path)
        os.remove(marker)
        shutil.rmtree(self.path + ".old", ignore_errors=True)
        self.spark.catalog.refreshByPath(self.path)

    # -- merge -----------------------------------------------------------

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Merge one micro-batch of change rows (CHANGE_SCHEMA shape)
        into the snapshot. Pure function of (snapshot ∪ batch) —
        replaying a batch rewrites the identical snapshot."""
        changes = batch.select("key", "seq", "ts", "op", "new")
        merged = self.read().unionByName(changes)
        w = Window.partitionBy("key").orderBy(F.desc("seq"))
        next_state = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .filter(F.col("op") != "DELETE")
        )
        staged = f"{self.path}.stage-{batch_id}"
        next_state.write.mode("overwrite").parquet(staged)
        self._swap_in(staged)

    def sink(self):
        """foreachBatch hook: stream.writeStream.foreachBatch(t.sink())."""

        def _apply(batch: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch, batch_id)

        return _apply


# SCD2 history row: every change as a versioned [valid_from, valid_to)
# interval, matching operators/cdc.cdc_scd2_history's batch semantics
SCD2_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("new", StringType()),
        StructField("version", LongType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
    ]
)


class Scd2HistoryTable(LatestStateTable):
    """SCD2 (slowly-changing-dimension type 2) history maintenance: the
    companion artifact to the latest-state table — EVERY change becomes
    a versioned row with [valid_from, valid_to) validity, valid_to
    closing when the key's next change arrives (NULL while current).

    Same crash-safe swap + replay story as the parent: the merge
    dedups on (key, seq) — a replayed batch's rows are exact
    duplicates of stored ones — then recomputes version numbers and
    validity intervals as pure window functions of the union, so
    re-application rewrites the identical snapshot. At 100 TB the
    history partitions by key range like the parent; closing a
    version's valid_to touches only the key's partition.
    """

    def read(self) -> DataFrame:
        self._recover_crashed_swap()
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], SCD2_SCHEMA)
        return self.spark.read.schema(SCD2_SCHEMA).parquet(self.path)

    def ledger(self, value_path: str = "$.value") -> DataFrame:
        """Every-day point-in-time reconstruction (live row count +
        value sum at end of each day) from the maintained history — the
        operators.cdc.time_travel_ledger kernel VERBATIM, so this
        streaming surface is bit-equal to the batch cdc_time_travel_agg
        given the same change log (pinned in tests/test_streaming.py).
        `value_path` reads the tracked numeric out of the schema-on-read
        row image (row_to_json discipline — works across ALTER TABLE)."""
        from ..operators.cdc import time_travel_ledger

        hist = self.read()
        versions = hist.select(
            "op",
            F.get_json_object("new", value_path)
            .cast("double")
            .alias("value"),
            "valid_from",
            "valid_to",
        )
        rng = hist.agg(
            F.date_trunc("day", F.min("valid_from")).alias("d0"),
            F.date_trunc("day", F.max("valid_from")).alias("d1"),
        )
        return time_travel_ledger(versions, rng)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        changes = batch.select(
            "key", "seq", "op", "new", F.col("ts").alias("valid_from")
        )
        stored = self.read().select("key", "seq", "op", "new", "valid_from")
        merged = stored.unionByName(changes).dropDuplicates(["key", "seq"])
        w = Window.partitionBy("key").orderBy("seq")
        next_state = merged.select(
            "key",
            "seq",
            "op",
            "new",
            F.row_number().over(w).cast("long").alias("version"),
            "valid_from",
            F.lead("valid_from").over(w).alias("valid_to"),
        )
        staged = f"{self.path}.stage-{batch_id}"
        next_state.write.mode("overwrite").parquet(staged)
        self._swap_in(staged)
