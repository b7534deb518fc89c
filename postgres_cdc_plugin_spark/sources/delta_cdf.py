"""Delta Change Data Feed transport -> canonical change relation.

SURVEY §1.4 source list: file changefeed / Delta CDF / Kafka+Debezium.
Since r6 BOTH legs are live end-to-end WITHOUT delta-spark:
read_cdf_log implements the public Delta log protocol directly
(driver-side commit-JSON parse, distributed parquet reads of the
cdc/add/remove files), cdf_batch chains it into from_cdf for
backfill/replay, and CdfTailer tails the log as an at-least-once
micro-batch stream with a durable progress marker — all exercised in
tests/test_sources.py against hand-built on-disk Delta tables.
delta_cdf_stream remains as optional plumbing for clusters that DO
ship delta-spark's native streaming source; the row-shape
transformation — the actual semantics — is the same pure from_cdf
every leg shares.

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

import json
import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CDF_META = ("_change_type", "_commit_version", "_commit_timestamp")

# raise-message prefix shared by read_cdf_log and CdfTailer's
# metadata-only-commit handling (same module, single source of truth)
_NO_DATA_MSG = "no data-changing commits"

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")

# Reader features this minimal client genuinely implements. Anything
# else in a protocol action's readerFeatures (deletionVectors,
# columnMapping, v2Checkpoint, ...) changes how data files must be
# interpreted, so encountering one must fail LOUD, never misread.
_SUPPORTED_READER_FEATURES = {"timestampNtz", "changeDataFeed"}


def _commit_files(table_path: str) -> dict[int, str]:
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"not a Delta table: no _delta_log under {table_path}")
    out: dict[int, str] = {}
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            out[int(m.group(1))] = os.path.join(log_dir, name)
    return out


def read_cdf_log(
    spark: SparkSession,
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """NATIVE Delta CDF reader over the public Delta log protocol — no
    delta-spark dependency (closes the one SURVEY §1.4 source leg that
    was previously a documented seam).

    A Delta table's change feed is fully determined by public on-disk
    structures (delta.io PROTOCOL.md): `_delta_log/<v>.json` holds one
    JSON action per line; a commit's change rows are (a) its `cdc`
    actions' parquet files under `_change_data/` (which carry the
    `_change_type` column), or, when a commit wrote no cdc files,
    (b) its `add` actions with dataChange=true read as inserts /
    (c) its `remove`-only actions read back as deletes (every row of a
    removed file was deleted; the file itself is immutable and still
    on disk — Delta's own CDF reader reconstructs deletes the same
    way). A commit that mixes add+remove with NO cdc files (a merge
    rewriting files) is ambiguous without row tracking and raises —
    loud, never a silent misread. Compaction actions
    (dataChange=false) contribute nothing, exactly per protocol.

    Scope guard: the protocol action gates this client — reader
    features beyond _SUPPORTED_READER_FEATURES (deletion vectors,
    column mapping) change data-file interpretation and raise.

    Scale: ONLY the commit JSONs (small metadata, the same thing every
    Delta client reads on the driver) are parsed driver-side; the
    change DATA stays distributed — one spark.read.parquet over the
    selected files per commit, unioned lazily. Partition values ride
    in from the action's partitionValues map as literal columns.
    """
    commits = _commit_files(table_path)
    versions = sorted(
        v
        for v in commits
        if v >= starting_version
        and (ending_version is None or v <= ending_version)
    )
    if not versions:
        raise ValueError(
            f"no Delta commits in [{starting_version}, {ending_version}] "
            f"under {table_path} (have: {sorted(commits)})"
        )

    parts: list[DataFrame] = []
    for v in versions:
        cdc_files: list[tuple[str, dict]] = []
        adds: list[tuple[str, dict]] = []
        removes: list[tuple[str, dict]] = []
        ts_ms: int | None = None
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    p = action["protocol"]
                    unsupported = (
                        set(p.get("readerFeatures") or [])
                        - _SUPPORTED_READER_FEATURES
                    )
                    if p.get("minReaderVersion", 1) > 1 and unsupported:
                        raise ValueError(
                            "Delta table requires reader features this "
                            f"minimal CDF client does not implement: "
                            f"{sorted(unsupported)}"
                        )
                elif "commitInfo" in action:
                    ts_ms = action["commitInfo"].get("timestamp", ts_ms)
                elif "cdc" in action:
                    cdc_files.append(
                        (action["cdc"]["path"],
                         action["cdc"].get("partitionValues") or {})
                    )
                elif "add" in action and action["add"].get("dataChange"):
                    adds.append(
                        (action["add"]["path"],
                         action["add"].get("partitionValues") or {})
                    )
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    removes.append(
                        (action["remove"]["path"],
                         action["remove"].get("partitionValues") or {})
                    )
        if cdc_files:
            files, change_type = cdc_files, None
        elif adds and not removes:
            files, change_type = adds, "insert"
        elif removes and not adds:
            files, change_type = removes, "delete"
        elif not adds and not removes:
            continue  # metadata-only commit
        else:
            raise ValueError(
                f"commit {v} rewrites files (add+remove) without cdc "
                "actions — its row-level changes cannot be derived "
                "without Delta row tracking; enable CDF on the writer"
            )
        by_part: dict[tuple, list[str]] = {}
        for path, pvals in files:
            abs_path = os.path.join(table_path, urllib.parse.unquote(path))
            by_part.setdefault(tuple(sorted(pvals.items())), []).append(abs_path)
        for pvals, paths in by_part.items():
            df = spark.read.parquet(*paths)
            for k, val in pvals:
                df = df.withColumn(k, F.lit(val))
            if change_type is not None:
                df = df.withColumn("_change_type", F.lit(change_type))
            parts.append(
                df.withColumn("_commit_version", F.lit(v).cast("long"))
                .withColumn(
                    "_commit_timestamp",
                    F.timestamp_millis(F.lit(ts_ms).cast("long"))
                    if ts_ms is not None
                    else F.lit(None).cast("timestamp"),
                )
            )
    if not parts:
        raise ValueError(
            f"{_NO_DATA_MSG} in [{starting_version}, "
            f"{ending_version}] under {table_path}"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    """Batch CDF (backfill/replay): canonical change rows over a commit
    version range — LIVE end-to-end since r6 via the native
    read_cdf_log protocol reader (no delta-spark needed), then the
    shared from_cdf canonicalization. tests/test_sources.py exercises
    it against a hand-built on-disk Delta table (insert commit, cdc
    update commit, delete commit)."""
    return from_cdf(
        read_cdf_log(
            spark,
            table_path,
            starting_version=starting_version,
            ending_version=ending_version,
        ),
        key_field=key_field,
        **kwargs,
    )


class CdfTailer:
    """NATIVE streaming leg of the Delta CDF transport — closes the
    last SURVEY §1.4 seam without delta-spark: a micro-batch poller
    that tails `_delta_log` for commit versions beyond its durable
    progress marker and feeds each newly-available range through the
    SAME read_cdf_log -> from_cdf path the batch leg uses. One
    transport contract covers backfill (cdf_batch) and live tailing.

    Delivery contract mirrors the queue poller (S4,
    src/cdc_webhook_worker.c:36-79 analog): at-least-once. The marker
    (`<checkpoint>/version`, written atomically via tmp+rename)
    advances only AFTER the consumer callback returns, so a crash
    between delivery and the marker write replays that commit range on
    restart; versions are the Delta log's total order, so a replay is
    an exact re-read (consumers follow the engine-wide batch-overwrite
    idempotence discipline). Metadata-only commits advance the marker
    without a delivery.

    Scale: each poll is one driver-side listing of commit JSONs — the
    same metadata walk every Delta client performs; change DATA flows
    distributed through read_cdf_log. The callback receives one
    DataFrame per poll covering all newly-available commits
    (micro-batching by availability, Trigger.AvailableNow-style).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint_dir: str,
        key_field: str = "id",
        table_schema: str = "public",
        table_name: str = "employees",
    ):
        self.spark = spark
        self.table_path = table_path
        self.checkpoint_dir = checkpoint_dir
        self.key_field = key_field
        self.table_schema = table_schema
        self.table_name = table_name
        os.makedirs(checkpoint_dir, exist_ok=True)

    @property
    def _marker_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "version")

    def last_delivered(self) -> int:
        """Highest commit version whose delivery completed; -1 before
        the first."""
        try:
            with open(self._marker_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _advance(self, version: int) -> None:
        tmp = self._marker_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._marker_path)

    def process_available(self, callback) -> int:
        """Deliver every commit version beyond the marker as ONE
        canonical-change DataFrame via `callback(df, end_version)`;
        returns the number of newly-consumed commits (0 = idle poll).
        The marker advances only after the callback returns."""
        last = self.last_delivered()
        commits = _commit_files(self.table_path)
        new = sorted(v for v in commits if v > last)
        if not new:
            return 0
        try:
            batch = cdf_batch(
                self.spark,
                self.table_path,
                key_field=self.key_field,
                starting_version=new[0],
                ending_version=new[-1],
                table_schema=self.table_schema,
                table_name=self.table_name,
            )
        except ValueError as exc:
            if _NO_DATA_MSG not in str(exc):
                raise
            batch = None  # metadata-only commits: nothing to deliver
        if batch is not None:
            callback(batch, new[-1])
        self._advance(new[-1])
        return len(new)

    def run(self, callback, poll_interval: float = 1.0, max_polls: int | None = None) -> int:
        """Poll loop at the S4 worker cadence. `max_polls` bounds the
        loop (backfill/test mode); returns total commits consumed."""
        import time

        consumed = 0
        polls = 0
        while max_polls is None or polls < max_polls:
            consumed += self.process_available(callback)
            polls += 1
            if max_polls is None or polls < max_polls:
                time.sleep(poll_interval)
        return consumed
