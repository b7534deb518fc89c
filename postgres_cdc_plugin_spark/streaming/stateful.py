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
    ArrayType,
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

# parallel interval arrays: ALL still-open bursts for the key, not just
# the newest — in watermark mode an older burst stays open (mergeable
# by late-but-in-horizon events) until the watermark passes its
# last + gap, so the state must be able to hold several
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(DoubleType())),
        StructField("lasts", ArrayType(DoubleType())),
        StructField("ns", ArrayType(LongType())),
    ]
)


def sessionize_changes(
    changes: DataFrame,
    gap_seconds: float = 1800.0,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Per-key change-burst sessions over a streaming change feed.

    Emits a row per CLOSED session. With `watermark_delay` set (e.g.
    "1 hour"), the EVENT-TIME watermark is the ONLY thing that closes a
    session: an interval seals exactly when the watermark passes its
    last change + gap (no admissible event can still merge with it), so
    a late-but-in-horizon change merges into an older burst even when a
    newer burst already exists, and a key that goes quiet still emits
    its final session (EventTimeTimeout flush). With
    watermark_delay=None a session closes when a LATER change for the
    same key arrives past the gap; a quiescent key's open session
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

    wm_mode = watermark_delay is not None

    def _keep_or_close(ivs, state):
        """Watermark mode: close exactly the intervals the watermark
        has sealed (last + gap <= wm — no in-horizon event can still
        merge with them; anything older is dropped upstream by the
        watermark), keep the rest open in state with a timeout at the
        earliest kept flush time."""
        wm = state.getCurrentWatermarkMs() / 1000.0
        # STRICT <: Spark's late-row filter admits an event with
        # ts == watermark, and the merge predicate would assign it to
        # an interval with last + gap == wm — sealing that interval at
        # equality would emit a session such an event must still join
        closed = [iv for iv in ivs if iv[1] + gap_seconds < wm]
        kept = [iv for iv in ivs if iv[1] + gap_seconds >= wm]
        if kept:
            state.update(
                (
                    [iv[0] for iv in kept],
                    [iv[1] for iv in kept],
                    [iv[2] for iv in kept],
                )
            )
            flush_at = int(min(iv[1] + gap_seconds for iv in kept) * 1000)
            # must be strictly ahead of the watermark or Spark rejects it
            state.setTimeoutTimestamp(
                max(flush_at, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        return closed, kept

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if wm_mode and state.hasTimedOut:
            # watermark passed some interval's last+gap with no new
            # changes: flush the sealed intervals, keep the rest
            starts, lasts, ns = state.get
            ivs = sorted([s, l, n] for s, l, n in zip(starts, lasts, ns))
            closed, _kept = _keep_or_close(ivs, state)
            if closed:
                yield _closed_frame(
                    [(key[0], iv[0], iv[1], iv[2]) for iv in closed]
                )
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
            starts, lasts, ns = state.get
            ivs.extend([s, l, n] for s, l, n in zip(starts, lasts, ns))
            ivs.sort()
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
            # and (crucially) no timeout math over an empty state
            return

        if wm_mode:
            # only the watermark closes an interval: an older burst
            # stays OPEN (and mergeable by late-but-in-horizon events)
            # even when a newer burst exists — closing it on the mere
            # existence of a later interval would emit a session a
            # still-admissible event should have merged into
            closed, _kept = _keep_or_close(ivs, state)
        else:
            # no watermark to reason with: every interval except the
            # latest is closed by the existence of later changes (the
            # finite-replay semantic documented above)
            closed = ivs[:-1]
            last_iv = ivs[-1]
            state.update(([last_iv[0]], [last_iv[1]], [last_iv[2]]))

        if closed:
            yield _closed_frame(
                [(key[0], iv[0], iv[1], iv[2]) for iv in closed]
            )

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
