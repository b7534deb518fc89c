"""Receiver-side streaming semantics: replay dedup and ack correlation.

The reference's delivery is at-least-once — retries and (in its own
tests) phantom pre-commit deliveries mean a webhook receiver can see the
same change event more than once (tests/test_cancel_on_failure.py:50-61;
SURVEY.md §7 hard-point 5). The batch query `receiver_replay_dedup`
proves the deterministic-envelope-id collapse; this module is the
STREAMING form of the receiver half, plus the delivery-latency audit a
receiver runs to correlate change events with its own acks.

Both operators are pure Structured Streaming built-ins:

- `dedup_replays` — `dropDuplicatesWithinWatermark` keyed by the
  deterministic envelope id: the engine keeps one state-store entry per
  id only until the watermark passes, so state is bounded by the replay
  horizon, not the stream length. At 100 TB/day this is the only
  formulation that survives: an unbounded `dropDuplicates` would
  accumulate every id ever seen.
- `ack_latency_join` — watermarked stream-stream inner join with a
  time-range condition. The range bound is what lets Spark expire join
  state (each side holds rows only within the delay horizon); an
  unconstrained stream-stream join would buffer both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Receiver-side ack record: the envelope id it acknowledges, when the
# receiver processed it, and the receiver's disposition.
ACK_SCHEMA = StructType(
    [
        StructField("ack_event_id", StringType()),
        StructField("ack_ts", TimestampType()),
        StructField("ack_status", StringType()),
    ]
)


def dedup_replays(
    envelopes: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Collapse at-least-once redeliveries to exactly-once effect.

    Requires the deterministic envelope id (envelope.py event_id —
    md5 of schema:table:trigger:key:seq, NOT gen_random_uuid() as the reference uses at
    cdc_webhook--1.0.sql:254: a replayed delivery must carry the SAME
    id or no receiver can ever dedup it). `horizon` must cover the
    maximum replay window (checkpoint recovery + retry budget); state
    per id is dropped once the watermark passes its event time.
    """
    return envelopes.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        [id_col]
    )


def ack_latency_join(
    changes: DataFrame,
    acks: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Delivery-latency audit: change event x receiver ack, joined on the
    envelope id with the ack constrained to land within `max_delay` of
    the event. Emits (event_id, ts, ack_ts, ack_status, latency_seconds).

    Watermarks on BOTH streams plus the time-range join condition bound
    the join state: each side buffers only the delay horizon. One
    shuffle per side on the id — the same partitioning the delivery sink
    already uses for per-key ordering, so Catalyst reuses it when the
    audit is chained onto the delivery pipeline.
    """
    ev = changes.withWatermark(ts_col, watermark)
    ak = acks.withWatermark("ack_ts", watermark)
    cond = (
        (F.col(id_col) == F.col("ack_event_id"))
        & (F.col("ack_ts") >= F.col(ts_col))
        & (F.col("ack_ts") <= F.col(ts_col) + F.expr(f"INTERVAL {max_delay}"))
    )
    latency = F.col("ack_ts").cast("double") - F.col(ts_col).cast("double")
    return ev.join(ak, cond, "inner").select(
        id_col,
        ts_col,
        "ack_ts",
        "ack_status",
        latency.alias("latency_seconds"),
    )
