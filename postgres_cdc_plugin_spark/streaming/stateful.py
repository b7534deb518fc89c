"""Custom stateful streaming operator via applyInPandasWithState.

The queue's status machine (queue.py) is an append-log + last-state
view; this module shows the OTHER canonical implementation strategy for
per-key streaming state (SURVEY.md §2.9 ST6 lists both): arbitrary
state kept by the engine's state store, updated with Arrow-batched
pandas logic.

The operator here is change-burst sessionization: group the change
stream by row key and emit a session row whenever a key's burst of
changes ends (no change for `gap_seconds`). The CDC use: compacting a
hot row's change storm into one audit record, detecting runaway
writers, rate-limiting per-row webhook fan-out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_changes", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", DoubleType()),
        StructField("last", DoubleType()),
        StructField("n", LongType()),
    ]
)


def sessionize_changes(
    changes: DataFrame,
    gap_seconds: float = 1800.0,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Per-key change-burst sessions over a streaming change feed.

    Emits a row per CLOSED session. With `watermark_delay` set (e.g.
    "1 hour"), a session also closes when the EVENT-TIME watermark
    passes its last change + gap — so a key that simply goes quiet
    still emits its final session (EventTimeTimeout flush). With
    watermark_delay=None a session only closes when a LATER change for
    the same key arrives past the gap; a quiescent key's open session
    stays in the state store forever — only use that mode for finite
    replays/tests where every key's stream is known to terminate with
    more data.

    The open session per key lives in the state store and survives
    restarts via the checkpoint. One stateful shuffle on key — the same
    partitioning the delivery sink uses, so Catalyst reuses it when
    chained.
    """

    def _closed_frame(closed: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="s") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="s") for c in closed],
                "n_changes": [c[3] for c in closed],
            }
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if watermark_delay is not None and state.hasTimedOut:
            # watermark passed last+gap with no new changes: flush the
            # open session and drop the key's state
            start, last, n = state.get
            state.remove()
            yield _closed_frame([(key[0], start, last, n)])
            return

        ts: list[float] = []
        for pdf in pdfs:
            # a malformed feed row with ts=null arrives as NaT;
            # NaT.timestamp() raises and would kill the whole query —
            # skip such rows instead
            ts.extend(t.timestamp() for t in pdf["ts"] if pd.notna(t))

        # Interval model: the open state plus each event is an
        # interval [start, last]; an event merges with an interval when
        # it lands within the gap of its span, and touching intervals
        # coalesce. This handles out-of-order arrivals exactly: a late
        # event inside the gap extends a session backwards, while one
        # further in the past forms its OWN burst instead of silently
        # swallowing a multi-hour hole into the open session.
        ivs: list[list] = []  # sorted [start, last, n]
        if state.exists:
            s0, l0, n0 = state.get
            ivs.append([s0, l0, n0])
        for t in sorted(ts):
            for iv in ivs:
                if iv[0] - gap_seconds <= t <= iv[1] + gap_seconds:
                    iv[0] = min(iv[0], t)
                    iv[1] = max(iv[1], t)
                    iv[2] += 1
                    break
            else:
                ivs.append([t, t, 1])
            ivs.sort()
            merged: list[list] = []
            for iv in ivs:
                if merged and iv[0] - gap_seconds <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], iv[1])
                    merged[-1][2] += iv[2]
                else:
                    merged.append(iv)
            ivs = merged

        if not ivs:
            # every row in the batch was malformed: nothing to update,
            # and (crucially) no timeout math over a None last
            return

        # every interval except the latest is closed by the existence
        # of later changes; the latest stays open in the state store
        closed = [(key[0], iv[0], iv[1], iv[2]) for iv in ivs[:-1]]
        start, last, n = ivs[-1]
        state.update((start, last, n))
        if watermark_delay is not None:
            # flush once the watermark passes the gap; must be strictly
            # ahead of the current watermark or Spark rejects it
            flush_at = int((last + gap_seconds) * 1000)
            state.setTimeoutTimestamp(
                max(flush_at, state.getCurrentWatermarkMs() + 1)
            )

        if closed:
            yield _closed_frame(closed)

    src = changes.select("key", "ts")
    timeout = GroupStateTimeout.NoTimeout
    if watermark_delay is not None:
        src = src.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return src.groupBy("key").applyInPandasWithState(
        update,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        timeout,
    )
