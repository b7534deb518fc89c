"""Scalar-function layer: the reference's scalar surface as reusable
Column builders (SURVEY.md §2.8 mapping table, implemented).

Each function cites the reference usage it re-expresses. All are pure
Column expressions (JVM-side, codegen-friendly) — no UDFs. Functions
return unaliased Columns; callers alias at the query boundary.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType


def event_uuid(*key_cols: Column | str) -> Column:
    """Deterministic per-event id.

    Replaces gen_random_uuid() (cdc_webhook--1.0.sql:139,254). Derived
    from the event's natural key instead of RNG so checkpoint replay
    under at-least-once delivery re-emits the SAME id and receivers can
    dedup (SURVEY.md §7 'What's hard' #5 — an intentional divergence).

    Each segment is md5-hashed BEFORE joining: concat_ws silently skips
    NULL segments (key=NULL, seq=5 would collide with key='5',
    seq=NULL) and raw values containing ':' would blur segment
    boundaries — per-segment digests (hex, never ':') with an 'n'
    sentinel for NULL make the id collision-free per distinct tuple.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    segs = [
        F.coalesce(F.md5(c.cast("string")), F.lit("n")) for c in cols
    ]
    return F.md5(F.concat_ws(":", *segs))


def row_to_json(*cols: str) -> Column:
    """`row_to_json(OLD/NEW)` (cdc_webhook--1.0.sql:268,271-276):
    serialize a full row image to a JSON string. With no args, the whole
    row (`struct(*)` ≡ row_to_json's dynamic schema-on-read behavior —
    whatever columns the table currently has)."""
    return F.to_json(F.struct(*(cols or ("*",))))


def headers_to_map(col: Column | str) -> Column:
    """JSONB headers -> MAP<STRING,STRING> (iterated as key/value pairs
    in src/cdc_webhook.c:73-91)."""
    return F.from_json(col, MapType(StringType(), StringType()))


def is_distinct_from(a: Column | str, b: Column | str) -> Column:
    """`IS DISTINCT FROM` (cdc_webhook--1.0.sql:206): null-safe
    inequality — the column-diff primitive."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return ~a.eqNullSafe(b)


def any_column_changed(columns: Iterable[str], old_prefix: str = "old",
                       new_prefix: str = "new") -> Column:
    """OR-fold of per-column diffs (cdc_webhook--1.0.sql:204-212,
    evaluated :229-235). Empty tracked set => literal False, reproducing
    the reference's suppress-all-UPDATEs rule (README.md:119-122).
    Fields resolve via getField so a tracked column literally named
    'a.b' is never misread as a nested path (the capture._image_field
    discipline)."""
    acc = F.lit(False)
    for c in columns:
        acc = acc | is_distinct_from(
            F.col(new_prefix).getField(c), F.col(old_prefix).getField(c)
        )
    return acc


def backoff_delay(backoff: Column | str, interval: Column | str,
                  attempt: Column | str) -> Column:
    """Retry delay seconds for attempt n (0-based):
    LINEAR => interval; EXPONENTIAL => interval * 2^n, the C
    `1 << attempt` (src/cdc_webhook.c:103-109). 2^n computed as a double
    pow then cast — exact for any feasible attempt count (powers of two
    are exactly representable), and unlike F.shiftleft it accepts a
    Column for n."""
    backoff = F.col(backoff) if isinstance(backoff, str) else backoff
    interval = F.col(interval) if isinstance(interval, str) else interval
    attempt = F.col(attempt) if isinstance(attempt, str) else attempt
    return F.when(backoff == "LINEAR", interval).otherwise(
        interval * F.pow(F.lit(2.0), attempt.cast("double")).cast("long")
    )


def next_attempt_at(ts: Column | str, delay_seconds: Column | str) -> Column:
    """Retry schedule: attempt time + delay. Replaces the reference's
    executor-blocking sleep(delay) (src/cdc_webhook.c:190) with data —
    the poller filters next_attempt <= now (queue readiness, P5)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    delay_seconds = (
        F.col(delay_seconds) if isinstance(delay_seconds, str) else delay_seconds
    )
    # via timestamp_ltz: TIMESTAMP_NTZ inputs cannot cast straight to
    # numeric (exact under the UTC session timezone)
    return F.timestamp_seconds(
        ts.cast("timestamp_ltz").cast("double") + delay_seconds.cast("double")
    )


def http_success(status: Column | str) -> Column:
    """2xx success predicate, `200 <= code < 300`
    (src/cdc_webhook.c:137-140)."""
    status = F.col(status) if isinstance(status, str) else status
    return status.between(200, 299)


def array_is_empty(col: Column | str) -> Column:
    """PG emptiness test `array_length(arr, 1) IS NULL`
    (cdc_webhook--1.0.sql:180-182): PG array_length of an empty array is
    NULL; Spark F.size returns 0 (and -1 for NULL input under legacy
    conf) — normalize both empty and NULL to true, matching how the
    reference treats an absent operations list."""
    col = F.col(col) if isinstance(col, str) else col
    return col.isNull() | (F.size(col) == 0)


def op_subscription_filter(ops: Iterable[str]) -> Column:
    """Operation-subscription predicate (cdc_webhook--1.0.sql:201):
    the trigger's `BEFORE|AFTER INSERT OR UPDATE ...` clause as an isin
    filter on the op column — Catalyst pushes it into the source scan."""
    return F.col("op").isin(*list(ops))
