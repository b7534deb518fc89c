"""CDC dataflow operators, re-expressed as declarative DataFrame plans.

Each function maps a reference behavior (cited file:line into
/root/reference) onto the driver's `events` table, which plays the role of
the captured change stream (FIXTURES.md §B): `event_type` is the op-like
tag, `user_id` the row key, `ts` the change time, `props` the JSONB-ish
map column.

Every query here is a pure (spark, sf_dir) -> DataFrame function with a
matching ANSI-SQL oracle in ORACLE_SQL. Column aliases agree between the
two on purpose — the driver hashes values under sorted column names.

Scale notes: all ops are narrow (filter/project) or single-shuffle
(window/groupBy on a key); the one join broadcasts its dimension side.
Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load

# event_type -> CDC op mapping used throughout: signup is the row's birth,
# error its deletion, everything else an update. (Function, not a module
# constant: Column construction requires an active SparkSession.)
def _op_expr():
    return (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )

_OP_SQL = (
    "CASE WHEN event_type = 'signup' THEN 'INSERT' "
    "WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END"
)


def cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-event envelope projection (P3).

    Mirrors the jsonb_build_object envelope of
    cdc_webhook--1.0.sql:252-280: per-event id, created_at, table identity,
    trigger identity, op, and old/new row images (old NULL on INSERT, new
    NULL on DELETE — :266-277). The event id is *deterministic*
    (md5 of the event key) rather than gen_random_uuid() (:254) so replay
    under at-least-once delivery dedups at the receiver (SURVEY.md §7).

    Flattened to scalar columns (rather than a nested struct) so the DuckDB
    oracle can hash-compare it; envelope.py builds the nested/JSON form for
    the streaming sink.

    OLD image: the event log carries only post-states, so the UPDATE
    before-image is RECONSTRUCTED as the key's previous post-state
    (lag per user_id — the cdc_delta_agg convention); an UPDATE with no
    prior event has an unknown before-image (NULL), and DELETE's OLD is
    the row being deleted (this event's values), matching
    row_to_json(OLD) semantics (:266-277). Round 1 wrongly emitted the
    CURRENT row as OLD, so every update delta read as zero. One shuffle
    on the key (shared with the sink's per-key ordering).
    """
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    op = _op_expr()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_eid = F.lag("event_id").over(w)
    prev_value = F.lag("value").over(w)
    return ev.select(
        F.md5(F.concat_ws(":", F.lit("evt"), F.col("event_id").cast("string"))).alias("id"),
        F.col("ts").alias("created_at"),
        F.lit("public").alias("table_schema"),
        F.lit("events").alias("table_name"),
        F.lit("cdc_events_trigger").alias("trigger_name"),
        F.lit("AFTER").alias("trigger_timing"),
        op.alias("op"),
        F.when(op == "DELETE", F.col("user_id"))
        .when((op == "UPDATE") & prev_eid.isNotNull(), F.col("user_id"))
        .alias("old_user_id"),
        F.when(op == "DELETE", F.col("value"))
        .when((op == "UPDATE") & prev_eid.isNotNull(), prev_value)
        .alias("old_value"),
        F.when(op != "DELETE", F.col("user_id")).alias("new_user_id"),
        F.when(op != "DELETE", F.col("value")).alias("new_value"),
    )


def cdc_envelope_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read change-event envelope (P3, drift-tolerant variant).

    The reference serializes row images with `row_to_json(OLD/NEW)`
    (cdc_webhook--1.0.sql:266-277), which keeps working across ALTER
    TABLE because the payload carries its own field names. This is the
    Spark analog promised in SURVEY.md §1.4: the row image is a
    string->string map rendered to JSON text, so a consumer reads fields
    by name (schema-on-read) and added/dropped columns never break the
    envelope's own schema. Old image NULL on INSERT, new NULL on DELETE.

    to_json/create_map are JVM built-ins inside whole-stage codegen; no
    UDF; one key shuffle for the before-image window (see cdc_envelope).
    The streaming counterpart is capture_pipeline's schema-on-read
    default, which parses raw JSON images to a string map FOR THE DIFF
    GATE ONLY and passes the original JSON text through to the envelope
    verbatim — the same schema-on-read shape under readStream.
    """
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    op = _op_expr()
    row_json = F.to_json(
        F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("value"), F.col("value").cast("string"),
            F.lit("props"), F.col("props"),
        )
    )
    # before-image reconstruction (see cdc_envelope): UPDATE's OLD is
    # the key's previous post-state; DELETE's OLD is this row
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_eid = F.lag("event_id").over(w)
    prev_json = F.to_json(
        F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("value"), F.lag("value").over(w).cast("string"),
            F.lit("props"), F.lag("props").over(w),
        )
    )
    return ev.select(
        F.md5(F.concat_ws(":", F.lit("evt"), F.col("event_id").cast("string"))).alias("id"),
        F.col("ts").alias("created_at"),
        F.lit("public").alias("table_schema"),
        F.lit("events").alias("table_name"),
        op.alias("op"),
        F.when(op == "DELETE", row_json)
        .when((op == "UPDATE") & prev_eid.isNotNull(), prev_json)
        .alias("old_row_json"),
        F.when(op != "DELETE", row_json).alias("new_row_json"),
    )


def cdc_op_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operation-subscription filter (P1).

    The reference restricts capture to the subscribed op set in the trigger
    DDL (cdc_webhook--1.0.sql:201,355-366) so non-subscribed ops never fire.
    Spark form: an isin filter that Catalyst pushes into the parquet scan
    (visible as PushedFilters: In(event_type, ...)).
    """
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("signup", "purchase", "error")).select(
        "event_id",
        "ts",
        "user_id",
        F.col("event_type").alias("op"),
        "value",
    )


def cdc_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe column-change predicate (P2).

    The reference fires an UPDATE event only when a tracked column changed:
    `NEW.col IS DISTINCT FROM OLD.col`, OR-folded
    (cdc_webhook--1.0.sql:204-212, evaluated :229-235). Here the old image
    is the previous event per key (lag over user_id ordered by change
    time), and eqNullSafe is the exact IS NOT DISTINCT FROM analog.
    Single shuffle on user_id; at 100 TB the change log is partitioned by
    key so this window is partition-local.
    """
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        ev.select("event_id", "user_id", "ts", "value", prev.alias("old_value"))
        .filter(~F.col("value").eqNullSafe(F.col("old_value")))
        .select(
            "event_id",
            "user_id",
            "ts",
            "old_value",
            F.col("value").alias("new_value"),
        )
    )


def creds_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credential-lookup equi-join (J1).

    Under security='PRIVATE' each event resolves (webhook_url, headers)
    from the credentials table by key equality
    (cdc_webhook--1.0.sql:242-248; UNIQUE index :21). The dimension is tiny
    -> broadcast hash join, shuffle-free on the stream side. `customer`
    stands in for the credentials dim (FIXTURES.md §B).
    """
    ev = load(spark, sf_dir, "events")
    creds = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("webhook_url"),
        F.col("c_mktsegment").alias("header_class"),
    )
    return (
        ev.join(F.broadcast(creds), ev.user_id == creds.c_custkey, "left")
        .select(
            "event_id",
            "user_id",
            F.col("event_type").alias("op"),
            "webhook_url",
            "header_class",
        )
    )


def creds_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credentials upsert as last-write-wins dedup (S5).

    The reference upserts ON CONFLICT (schema,table,name) DO UPDATE
    (cdc_webhook--1.0.sql:188-197); the batch equivalent is a row_number
    window keeping the newest row per natural key. c_nationkey plays the
    trigger key, c_acctbal the recency column (deterministic tie-break on
    c_custkey).
    """
    creds = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        creds.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_nationkey").alias("trigger_key"),
            "c_custkey",
            "c_name",
            "c_acctbal",
        )
    )


def queue_ready_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue readiness scan + top-k (P5, §2.6).

    The background worker polls `status='PENDING' AND next_attempt <=
    now()` ordered by next_attempt (src/cdc_webhook_worker.c:55-61; indexes
    cdc_webhook--1.0.sql:50-52). Spark: pushed-down filter + global top-k
    (TakeOrderedAndProject — no full sort at scale). event_id tie-break
    keeps the k-set deterministic.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "error")
            & (F.col("ts") <= F.to_timestamp(F.lit("2024-06-01 00:00:00")))
        )
        .select("event_id", F.col("ts").alias("next_attempt"), "value")
        .orderBy("next_attempt", "event_id")
        .limit(100)
    )


def retry_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry backoff schedule (ST5).

    LINEAR: constant retry_interval; EXPONENTIAL: interval * 2^attempt via
    a left shift — exactly src/cdc_webhook.c:103-109. next_attempt =
    attempt time + delay (the data-not-sleep translation of the blocking
    sleep at src/cdc_webhook.c:190). Pure narrow projection.
    """
    ev = load(spark, sf_dir, "events")
    interval = F.lit(2)
    attempt = (F.col("event_id") % 5).cast("int")
    backoff = F.when(
        F.col("event_type").isin("click", "view"), F.lit("LINEAR")
    ).otherwise(F.lit("EXPONENTIAL"))
    delay = F.when(backoff == "LINEAR", interval).otherwise(
        interval * F.expr("shiftleft(1, CAST(event_id % 5 AS INT))")
    )
    return ev.select(
        "event_id",
        attempt.alias("attempt"),
        backoff.alias("retry_backoff"),
        delay.cast("bigint").alias("delay_seconds"),
        (
            F.floor(F.col("ts").cast("timestamp_ltz").cast("double")).cast("bigint")
            + delay.cast("bigint")
        ).alias(
            "next_attempt_epoch"
        ),
    )


def attempt_history_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key attempt-history accumulation (A2).

    event_log keeps attempt_count + attempts_time/status/response arrays
    per event (cdc_webhook--1.0.sql:36-39). Batch analog: collect_list per
    key (sorted for determinism, joined to a string so the oracle hash is
    representation-stable). Map-side partial aggregation applies to the
    count/sum; the list agg shuffles only the error subset.
    """
    ev = load(spark, sf_dir, "events")
    ids_sorted = F.array_sort(F.collect_list("event_id"))
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attempts"),
            F.array_join(
                F.transform(ids_sorted, lambda x: x.cast("string")), ","
            ).alias("attempt_ids"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def queue_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue state machine, driver-checkable (ST6/A2 — the streaming
    layer's first oracle-checked query).

    Applies streaming.queue.queue_state_fold — the SAME derivation
    EventQueue.state() runs over its live logs — to a deterministic
    attempt-log fixture built relationally from the events table:
    event_id%6 attempts per event at one-minute spacing, attempt a
    succeeding iff (event_id + a) % 7 == 0, retry budget event_id%4 + 1,
    LINEAR backoff for click/view else EXPONENTIAL (the retry_schedule
    convention). The fold computes terminal PENDING/DELIVERED/FAILED
    status (status CHECK, cdc_webhook--1.0.sql:35), the sorted attempt
    array (attempts_* arrays, :36-39) and next_attempt (backoff
    src/cdc_webhook.c:103-109); the DuckDB oracle recomputes all three
    from the same fixture in plain SQL. Projection is hash-stable:
    epochs as bigint, history array joined to a string.

    Scale: one lateral sequence explode (narrow), one (event_id,
    attempt) dedup/agg shuffle, one key join — the fold's own shape;
    nothing collects.
    """
    state = _queue_state(spark, sf_dir)
    return state.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "retry_backoff",
        "attempt_count",
        "status",
        F.coalesce(
            F.array_join(
                F.transform(
                    "attempts",
                    lambda s: F.concat_ws(
                        ":",
                        s.attempt.cast("string"),
                        s.http_status.cast("string"),
                    ),
                ),
                ",",
            ),
            F.lit(""),
        ).alias("attempt_log"),
        F.floor(F.col("next_attempt").cast("timestamp_ltz").cast("double"))
        .cast("bigint")
        .alias("next_attempt_epoch"),
    )


def _queue_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded queue state relation — the queue family's shared
    kernel. Persisted: queue_state_machine and queue_latency_profile
    consume the IDENTICAL plan (parquet-rooted, so it canonicalizes),
    and the state is one row per event — the cache manager hands the
    second consumer the built relation instead of a second
    explode/fold."""
    from ..streaming.queue import queue_state_fold

    # r14 examined, left alone: a spread_scan starvation guard here
    # measured SLOWER (2.55 -> 3.1 s min at sf0.1, twice) — the
    # fixture's attempt explode pipelines into the dedup shuffle's map
    # side, so the guard's extra exchange buys no parallelism the
    # shuffle didn't already provide. OPTIMIZATION_r14.md has the A/B.
    ev = load(spark, sf_dir, "events")
    return queue_state_fold(*_queue_fixture(ev)).persist()


def _queue_fixture(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The deterministic queue fixture shared by queue_state_machine and
    queue_latency_profile (one construction, zero drift): event_id%6
    attempts per event at one-minute spacing, attempt a succeeding iff
    (event_id + a) % 7 == 0, retry budget event_id%4 + 1, LINEAR
    backoff for click/view else EXPONENTIAL (the retry_schedule
    convention)."""
    n_att = (F.col("event_id") % 6).cast("int")
    qevents = ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.lit("public").alias("trigger_schema"),
        F.lit("events").alias("trigger_table"),
        F.lit("cdc_events_trigger").alias("trigger_name"),
        F.lit("http://127.0.0.1:0/hook").alias("webhook_url"),
        F.col("props").alias("payload"),
        F.lit(30).alias("timeout"),
        (F.col("event_id") % 4).cast("int").alias("retry_number"),
        F.lit(2).alias("retry_interval"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("LINEAR"))
        .otherwise(F.lit("EXPONENTIAL"))
        .alias("retry_backoff"),
        F.col("ts").alias("enqueued_at"),
    )
    ok = (F.col("eid") + F.col("attempt")) % 7 == 0
    qattempts = (
        ev.select(
            F.col("event_id").alias("eid"),
            F.floor(F.col("ts").cast("timestamp_ltz").cast("double")).alias(
                "t0"
            ),
            F.explode(
                F.when(n_att >= 1, F.sequence(F.lit(1), n_att)).otherwise(
                    F.array()
                )
            ).alias("attempt"),
        )
        .select(
            F.col("eid").cast("string").alias("event_id"),
            F.col("attempt"),
            F.when(ok, F.lit(200)).otherwise(F.lit(500)).alias("http_status"),
            ok.alias("ok"),
            F.when(~ok, F.lit("HTTP 500")).alias("error"),
            (F.col("t0") + 60 * F.col("attempt"))
            .cast("double")
            .alias("attempted_at"),
            F.concat(
                F.lit('{"attempt":'), F.col("attempt").cast("string"), F.lit("}")
            ).alias("response"),
        )
    )
    return qevents, qattempts


def queue_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-latency SLO profile over the queue state (ST5/ST6
    observability — the readout an operator of the reference's async
    mode watches): per (retry_backoff, status) — event count, exact
    mean attempts consumed, and p50/p90 time-to-first-success seconds
    for delivered events (enqueue to the FIRST 2xx attempt, the
    user-facing delivery latency). Derives from the SAME
    queue_state_fold + _queue_fixture as queue_state_machine, so the
    SLO numbers can never drift from the state machine they profile;
    Spark `percentile` / DuckDB `quantile_cont` share the exact
    continuous-interpolation definition (lineitem_percentiles pair).

    Scale: the fold's own shape plus one (backoff, status) rollup with
    map-side partials; groups are O(#backoffs x #statuses), so exact
    percentile is the right audit choice at this grain —
    approx_percentile remains the documented per-key 100 TB path
    (lineitem_approx_percentiles)."""
    state = _queue_state(spark, sf_dir)
    enq = F.floor(F.col("enqueued_at").cast("timestamp_ltz").cast("double"))
    first_ok = F.element_at(
        F.filter("attempts", lambda s: s.http_status == 200), 1
    )
    latency = F.when(
        F.col("status") == "DELIVERED", first_ok.attempted_at - enq
    )
    return (
        state.select(
            "retry_backoff",
            "status",
            "attempt_count",
            latency.alias("latency_s"),
        )
        .groupBy("retry_backoff", "status")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum("attempt_count") / F.count(F.lit(1)).cast("double")
            ).alias("avg_attempts"),
            F.expr("percentile(latency_s, 0.5)").alias("latency_p50"),
            F.expr("percentile(latency_s, 0.9)").alias("latency_p90"),
        )
    )


def status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status/op distribution (A3).

    The queue state machine (cdc_webhook--1.0.sql:35) and the reference
    tests' COUNT(*) assertions (tests/test_cancel_on_failure.py:46-48).
    Classic partial-agg groupBy: map-side combine makes the shuffle carry
    one row per (partition, status).
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def fanout_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-subscriber fan-out (ST11).

    N triggers on one table, each with its own op set, each event routed to
    every matching trigger (tests/test_multiple_triggers.py:9-61). Spark
    form: per-subscription filters unioned — one scan per subscription arm
    that Catalyst collapses into a shared-scan union.
    """
    ev = load(spark, sf_dir, "events")
    all_ops = ev.select(
        F.lit("audit_all").alias("trigger_name"), "event_id", F.col("event_type").alias("op")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase_only").alias("trigger_name"),
        "event_id",
        F.col("event_type").alias("op"),
    )
    return all_ops.unionByName(purchases)


def headers_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONB headers iteration (§2.8).

    The C sink walks the headers JSONB key/value pairs to build HTTP
    headers (src/cdc_webhook.c:73-91). Data-op analog: parse the JSON map
    and explode entries. from_json -> MapType keeps it JVM-side (no Python
    UDF).
    """
    ev = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return ev.select("event_id", F.explode(m).alias("header_key", "header_value"))


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log compaction: the latest surviving row per key — the
    materialized view every CDC consumer builds from the webhook stream
    (the batch form of applying the reference's events in order,
    cdc_webhook--1.0.sql:252-280 consumers). Last change per key wins;
    keys whose last change is a DELETE vanish. One shuffle on the key;
    at 100 TB the change log is partitioned by key range so compaction
    is partition-local merge, the same shape as an upsert-table rewrite.
    """
    ev = load(spark, sf_dir, "events")
    op = _op_expr()
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "ts", "event_id", "value", op.alias("op"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select(
            "user_id",
            F.col("ts").alias("as_of"),
            F.col("op").alias("last_op"),
            F.col("value").alias("current_value"),
        )
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: each change becomes a versioned row with
    [valid_from, valid_to) — valid_to = next change's ts per key (NULL
    while current). The warehouse-side product of a CDC feed. Single
    window shuffle on the key, shared by lead() and the version number.
    """
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    op = _op_expr()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("user_id", "ts", "event_id", "value", op.alias("op")).select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("op"),
        F.col("value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


def cdc_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction from the change log — the
    time-travel question every CDC/changefeed consumer eventually asks
    ("how many live rows, and what did value sum to, AS OF day d?") —
    for every day in the log's range at once.

    NOT an interval join of probes x versions (probes x versions pair
    blow-up): each live SCD2 version becomes two DELTAS (+1/+value at
    valid_from's day, -1/-value at valid_to's day; DELETE versions are
    tombstones — the delete is already encoded as the prior version's
    valid_to, so they contribute nothing), the deltas aggregate to DAY
    grain (map-side combinable, calendar-bounded output), and one
    cumulative window over the zero-filled day grid reconstructs the
    end-of-day live count and value sum for every probe in a single
    pass. A version opened and closed the same day nets to zero at day
    grain — exactly its end-of-day visibility.

    Reuses cdc_scd2_history verbatim, so the reconstruction can never
    drift from the versioned dimension it summarizes.

    Scale: the corpus-sized work is the SCD2 window (one key shuffle,
    inherited) plus one day-grain aggregation; the grid fill and the
    ordered cumsum run at calendar grain (bounded by the date range,
    not the corpus — same posture as events_cusum_changepoint).
    Determinism: counts are integers; the day-grain value sum is
    rounded through the decimal hop (partial-sum order), then the
    cumulative sum runs over identical rounded doubles in identical
    day order on both engines.
    """
    versions = cdc_scd2_history(spark, sf_dir).select(
        "op", "value", "valid_from", "valid_to"
    )
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    rng = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    return time_travel_ledger(versions, rng)


def time_travel_ledger(versions: DataFrame, rng: DataFrame) -> DataFrame:
    """The delta-fold reconstruction kernel behind cdc_time_travel_agg,
    shared verbatim by the STREAMING surface
    (streaming/materialize.Scd2HistoryTable.ledger — bit-equality
    pinned in tests/test_streaming.py): versions = (op, value,
    valid_from, valid_to), rng = a 1-row (d0, d1) day-truncated range.
    """
    v = versions.filter(F.col("op") != "DELETE")
    # BOTH deltas of a version come out of one explode over one row —
    # the union-of-two-selects spelling reads `v` twice, and Spark
    # inlines it, so the whole SCD2 window would run twice (measured
    # 2x at sf0.1). A still-open version's close delta has a NULL day
    # and is filtered.
    deltas = (
        v.select(
            F.explode(
                F.array(
                    F.struct(
                        F.date_trunc("day", "valid_from").alias("day"),
                        F.lit(1).alias("dn"),
                        F.col("value").alias("dv"),
                    ),
                    F.struct(
                        F.date_trunc("day", "valid_to").alias("day"),
                        F.lit(-1).alias("dn"),
                        (-F.col("value")).alias("dv"),
                    ),
                )
            ).alias("d")
        )
        .select("d.*")
        .filter(F.col("day").isNotNull())
    )
    daily = (
        deltas.groupBy("day")
        .agg(
            F.sum(F.when(F.col("dn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_created"),
            F.sum(F.when(F.col("dn") == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_closed"),
            F.sum("dn").alias("net_n"),
            F.round(F.sum("dv"), 6)
            .cast("decimal(38,6)")
            .cast("double")
            .alias("net_v"),
        )
    )
    grid = rng.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = grid.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_created", F.lit(0)).cast("bigint").alias("n_created"),
        F.coalesce("n_closed", F.lit(0)).cast("bigint").alias("n_closed"),
        F.coalesce("net_n", F.lit(0)).alias("net_n"),
        F.coalesce("net_v", F.lit(0.0)).alias("net_v"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return filled.select(
        "day",
        "n_created",
        "n_closed",
        F.sum("net_n").over(w).cast("bigint").alias("n_active"),
        F.round(F.sum("net_v").over(w), 2)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_value"),
    )


def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the props payload (§2.8 JSONB surface):
    get_json_object is the schema-on-read point lookup a consumer uses
    on envelope payloads without parsing the full document. Narrow
    projection; the JSON parse stays JVM-side."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
        F.length("props").cast("bigint").alias("props_len"),
    )


def creds_display_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (§2.8): upper/substring/concat_ws/lpad —
    the display normalization a bookkeeping UI applies to credential
    rows (with secrets already masked, ST10). Pure narrow projection."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("segment_uc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(
            "/", F.lit("public"), F.col("c_mktsegment"), F.col("c_custkey").cast("string")
        ).alias("display_key"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_id"),
    )


def receiver_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receiver-side replay dedup — the other half of the deterministic
    event id story (SURVEY.md §7 #5): under at-least-once delivery a
    checkpoint replay re-sends envelopes, and the receiver collapses
    them by id. Simulated by unioning the stream with itself (a full
    replay); dedup keeps exactly one row per deterministic id, restoring
    the original cardinality. row_number over the id — one shuffle; at
    scale the receiver table is partitioned by id prefix so the dedup is
    partition-local.
    """
    ev = load(spark, sf_dir, "events")
    env = ev.select(
        F.md5(F.concat_ws(":", F.lit("evt"), F.col("event_id").cast("string"))).alias("id"),
        "user_id",
        "value",
        F.col("ts").alias("created_at"),
    )
    replayed = env.unionByName(env)  # at-least-once: everything arrives twice
    w = Window.partitionBy("id").orderBy("created_at")
    return (
        replayed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "user_id", "value", "created_at")
    )


def cdc_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-view maintenance from the change log.

    The third canonical CDC consumer materialization (after latest-state
    compaction and SCD2 history): maintain `SELECT key, count(*),
    sum(value)` WITHOUT rescanning the base table by folding each
    change's delta — INSERT contributes (+1, +new), DELETE (-1, -old),
    UPDATE (0, new-old). Old images reconstruct as the previous event
    per key (lag window — same convention as cdc_column_diff). A
    consumer adds these deltas to its materialized aggregates per
    micro-batch; net_rows also tells whether the key currently exists.

    One shuffle total at any scale: the lag window partitions by
    user_id and the groupBy reuses that exact partitioning.
    """
    ev = load(spark, sf_dir, "events").filter(
        # untimed events cannot be ordered or bucketed: explicit on
        # BOTH engines (r11 NULL policy — tests/test_events_null_parity)
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    op = _op_expr()
    d = ev.select(
        "user_id",
        op.alias("op"),
        "value",
        F.lag("value").over(w).alias("old_value"),
    )
    d_rows = (
        F.when(F.col("op") == "INSERT", 1)
        .when(F.col("op") == "DELETE", -1)
        .otherwise(0)
    )
    d_sum = (
        F.when(F.col("op") == "INSERT", F.col("value"))
        .when(F.col("op") == "DELETE", -F.coalesce("old_value", F.lit(0.0)))
        .otherwise(F.col("value") - F.coalesce("old_value", F.lit(0.0)))
    )
    return d.groupBy("user_id").agg(
        F.sum(d_rows).cast("long").alias("net_rows"),
        # rounded: double sum order varies with partitioning
        F.round(F.sum(d_sum), 2).alias("net_value"),
    )


QUERIES = {
    "cdc_delta_agg": cdc_delta_agg,
    "receiver_replay_dedup": receiver_replay_dedup,
    "props_json_extract": props_json_extract,
    "creds_display_format": creds_display_format,
    "cdc_latest_state": cdc_latest_state,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_time_travel_agg": cdc_time_travel_agg,
    "cdc_envelope": cdc_envelope,
    "cdc_envelope_json": cdc_envelope_json,
    "cdc_op_filter": cdc_op_filter,
    "cdc_column_diff": cdc_column_diff,
    "creds_lookup_join": creds_lookup_join,
    "creds_last_wins": creds_last_wins,
    "queue_ready_topk": queue_ready_topk,
    "retry_schedule": retry_schedule,
    "attempt_history_agg": attempt_history_agg,
    "queue_state_machine": queue_state_machine,
    "queue_latency_profile": queue_latency_profile,
    "status_counts": status_counts,
    "fanout_union": fanout_union,
    "headers_explode": headers_explode,
}

# The deterministic queue fixture + attempt rollup as shared CTEs — the
# SQL mirror of _queue_fixture + queue_state_fold's attempt aggregation,
# consumed by the queue_state_machine AND queue_latency_profile oracles
# so the two can never drift.
_QUEUE_FIXTURE_SQL = """base AS (
            SELECT event_id,
                   CAST(event_id % 4 AS INT) AS retry_number,
                   2 AS retry_interval,
                   CASE WHEN event_type IN ('click', 'view') THEN 'LINEAR'
                        ELSE 'EXPONENTIAL' END AS retry_backoff,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS enq_epoch,
                   CAST(event_id % 6 AS INT) AS n_att
            FROM events
        ),
        att AS (
            SELECT b.event_id, a.attempt,
                   ((b.event_id + a.attempt) % 7) = 0 AS ok,
                   CASE WHEN ((b.event_id + a.attempt) % 7) = 0
                        THEN 200 ELSE 500 END AS http_status,
                   CAST(b.enq_epoch + 60 * a.attempt AS DOUBLE)
                       AS attempted_at
            FROM base b,
                 LATERAL unnest(generate_series(1, b.n_att)) AS a(attempt)
        ),
        agg AS (
            SELECT event_id,
                   CAST(count(*) AS INT) AS attempt_count,
                   max(CASE WHEN ok THEN 1 ELSE 0 END) AS any_ok,
                   min(CASE WHEN ok THEN attempted_at END) AS first_ok_at,
                   string_agg(attempt || ':' || http_status, ','
                              ORDER BY attempt) AS attempt_log
            FROM att
            GROUP BY event_id
        )"""

ORACLE_SQL = {
    "queue_latency_profile": f"""
        WITH {_QUEUE_FIXTURE_SQL},
        state AS (
            SELECT b.retry_backoff,
                   CASE WHEN COALESCE(g.any_ok, 0) = 1 THEN 'DELIVERED'
                        WHEN COALESCE(g.attempt_count, 0)
                             >= b.retry_number + 1 THEN 'FAILED'
                        ELSE 'PENDING' END AS status,
                   COALESCE(g.attempt_count, 0) AS attempt_count,
                   CASE WHEN COALESCE(g.any_ok, 0) = 1
                        THEN g.first_ok_at - b.enq_epoch END AS latency_s
            FROM base b LEFT JOIN agg g USING (event_id)
        )
        SELECT retry_backoff, status,
               count(*) AS n_events,
               CAST(sum(attempt_count) AS BIGINT)
                   / CAST(count(*) AS DOUBLE) AS avg_attempts,
               quantile_cont(latency_s, 0.5) AS latency_p50,
               quantile_cont(latency_s, 0.9) AS latency_p90
        FROM state
        GROUP BY retry_backoff, status
    """,
    "cdc_delta_agg": f"""
        WITH d AS (
            SELECT user_id, {_OP_SQL} AS op, value,
                   lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS old_value
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN op = 'INSERT' THEN 1
                             WHEN op = 'DELETE' THEN -1 ELSE 0 END) AS BIGINT)
                   AS net_rows,
               round(sum(CASE WHEN op = 'INSERT' THEN value
                              WHEN op = 'DELETE' THEN -coalesce(old_value, 0.0)
                              ELSE value - coalesce(old_value, 0.0) END), 2)
                   AS net_value
        FROM d
        GROUP BY user_id
    """,
    "receiver_replay_dedup": """
        SELECT id, user_id, value, created_at
        FROM (
            SELECT id, user_id, value, created_at,
                   row_number() OVER (PARTITION BY id ORDER BY created_at) AS rn
            FROM (
                SELECT md5('evt:' || CAST(event_id AS VARCHAR)) AS id,
                       user_id, value, ts AS created_at
                FROM events
                UNION ALL
                SELECT md5('evt:' || CAST(event_id AS VARCHAR)) AS id,
                       user_id, value, ts AS created_at
                FROM events
            )
        )
        WHERE rn = 1
    """,
    "props_json_extract": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
               CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               CAST(length(props) AS BIGINT) AS props_len
        FROM events
    """,
    "creds_display_format": """
        SELECT c_custkey,
               upper(c_mktsegment) AS segment_uc,
               substring(c_name, 1, 8) AS name_prefix,
               concat_ws('/', 'public', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS display_key,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_id
        FROM customer
    """,
    "cdc_latest_state": f"""
        SELECT user_id, ts AS as_of, op AS last_op, value AS current_value
        FROM (
            SELECT user_id, ts, value, {_OP_SQL} AS op,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1 AND op <> 'DELETE'
    """,
    "cdc_time_travel_agg": f"""
        WITH v AS (
            SELECT user_id, value, ts AS valid_from,
                   lead(ts) OVER w AS valid_to, {_OP_SQL} AS op
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        live AS (SELECT * FROM v WHERE op <> 'DELETE'),
        deltas AS (
            SELECT date_trunc('day', valid_from) AS day,
                   1 AS dn, value AS dv
            FROM live
            UNION ALL
            SELECT date_trunc('day', valid_to), -1, -value
            FROM live WHERE valid_to IS NOT NULL
        ),
        daily AS (
            SELECT day,
                   CAST(sum(CASE WHEN dn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_created,
                   CAST(sum(CASE WHEN dn = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_closed,
                   sum(dn) AS net_n,
                   CAST(CAST(round(sum(dv), 6) AS DECIMAL(38,6))
                        AS DOUBLE) AS net_v
            FROM deltas GROUP BY day
        ),
        grid AS (
            SELECT g.day
            FROM (SELECT date_trunc('day', min(ts)) AS d0,
                         date_trunc('day', max(ts)) AS d1
                  FROM (SELECT * FROM events WHERE ts IS NOT NULL) events) r,
                 unnest(generate_series(r.d0, r.d1, INTERVAL 1 DAY))
                     AS g(day)
        ),
        filled AS (
            SELECT g.day,
                   COALESCE(d.n_created, 0) AS n_created,
                   COALESCE(d.n_closed, 0) AS n_closed,
                   COALESCE(d.net_n, 0) AS net_n,
                   COALESCE(d.net_v, 0.0) AS net_v
            FROM grid g LEFT JOIN daily d ON g.day = d.day
        )
        SELECT day,
               CAST(n_created AS BIGINT) AS n_created,
               CAST(n_closed AS BIGINT) AS n_closed,
               CAST(sum(net_n) OVER cw AS BIGINT) AS n_active,
               CAST(CAST(round(sum(net_v) OVER cw, 2) AS DECIMAL(38,2))
                    AS DOUBLE) AS total_value
        FROM filled
        WINDOW cw AS (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "cdc_scd2_history": f"""
        SELECT user_id,
               row_number() OVER w AS version,
               {_OP_SQL} AS op,
               value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to
        FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "cdc_envelope": f"""
        WITH base AS (
            -- branch on the DERIVED op (never NULL), not raw event_type:
            -- a NULL event_type is an UPDATE via the CASE ELSE on both
            -- engines, and `NULL <> 'error'` would wrongly null the row
            -- images under three-valued logic (r11 NULL-parity sweep)
            SELECT event_id, ts, user_id, value, {_OP_SQL} AS op,
                   lag(event_id) OVER w AS prev_eid,
                   lag(value) OVER w AS prev_value
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT md5('evt:' || CAST(event_id AS VARCHAR)) AS id,
               ts AS created_at,
               'public' AS table_schema,
               'events' AS table_name,
               'cdc_events_trigger' AS trigger_name,
               'AFTER' AS trigger_timing,
               op,
               CASE WHEN op = 'DELETE' THEN user_id
                    WHEN op = 'UPDATE'
                         AND prev_eid IS NOT NULL THEN user_id
               END AS old_user_id,
               CASE WHEN op = 'DELETE' THEN value
                    WHEN op = 'UPDATE'
                         AND prev_eid IS NOT NULL THEN prev_value
               END AS old_value,
               CASE WHEN op <> 'DELETE' THEN user_id END AS new_user_id,
               CASE WHEN op <> 'DELETE' THEN value END AS new_value
        FROM base
    """,
    "cdc_envelope_json": f"""
        WITH base AS (
            -- derived-op branching: see cdc_envelope (r11 NULL policy)
            SELECT event_id, ts, user_id, value, props, {_OP_SQL} AS op,
                   lag(event_id) OVER w AS prev_eid,
                   lag(value) OVER w AS prev_value,
                   lag(props) OVER w AS prev_props
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT md5('evt:' || CAST(event_id AS VARCHAR)) AS id,
               ts AS created_at,
               'public' AS table_schema,
               'events' AS table_name,
               op,
               CASE WHEN op = 'DELETE' THEN
                   CAST(to_json(MAP {{'user_id': CAST(user_id AS VARCHAR),
                                      'value': CAST(value AS VARCHAR),
                                      'props': props}}) AS VARCHAR)
                    WHEN op = 'UPDATE'
                         AND prev_eid IS NOT NULL THEN
                   CAST(to_json(MAP {{'user_id': CAST(user_id AS VARCHAR),
                                      'value': CAST(prev_value AS VARCHAR),
                                      'props': prev_props}}) AS VARCHAR)
               END AS old_row_json,
               CASE WHEN op <> 'DELETE' THEN
                   CAST(to_json(MAP {{'user_id': CAST(user_id AS VARCHAR),
                                      'value': CAST(value AS VARCHAR),
                                      'props': props}}) AS VARCHAR)
               END AS new_row_json
        FROM base
    """,
    "cdc_op_filter": """
        SELECT event_id, ts, user_id, event_type AS op, value
        FROM events
        WHERE event_type IN ('signup', 'purchase', 'error')
    """,
    "cdc_column_diff": """
        SELECT event_id, user_id, ts, old_value, value AS new_value
        FROM (
            SELECT event_id, user_id, ts, value,
                   lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS old_value
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) events
        )
        WHERE value IS DISTINCT FROM old_value
    """,
    "creds_lookup_join": """
        SELECT e.event_id, e.user_id, e.event_type AS op,
               c.c_name AS webhook_url, c.c_mktsegment AS header_class
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    "creds_last_wins": """
        SELECT c_nationkey AS trigger_key, c_custkey, c_name, c_acctbal
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
            ) AS rn
            FROM customer
        )
        WHERE rn = 1
    """,
    "queue_ready_topk": """
        SELECT event_id, ts AS next_attempt, value
        FROM events
        WHERE event_type = 'error' AND ts <= TIMESTAMP '2024-06-01 00:00:00'
        ORDER BY ts, event_id
        LIMIT 100
    """,
    "retry_schedule": """
        SELECT event_id,
               CAST(event_id % 5 AS INT) AS attempt,
               CASE WHEN event_type IN ('click', 'view') THEN 'LINEAR'
                    ELSE 'EXPONENTIAL' END AS retry_backoff,
               CAST(CASE WHEN event_type IN ('click', 'view') THEN 2
                    ELSE 2 * (1 << CAST(event_id % 5 AS INT)) END AS BIGINT) AS delay_seconds,
               CAST(floor(epoch(ts)) AS BIGINT)
                 + CAST(CASE WHEN event_type IN ('click', 'view') THEN 2
                        ELSE 2 * (1 << CAST(event_id % 5 AS INT)) END AS BIGINT)
                 AS next_attempt_epoch
        FROM events
    """,
    "attempt_history_agg": """
        SELECT user_id,
               count(*) AS n_attempts,
               string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS attempt_ids,
               round(sum(value), 2) AS total_value
        FROM events
        WHERE event_type = 'error'
        GROUP BY user_id
    """,
    "queue_state_machine": f"""
        WITH {_QUEUE_FIXTURE_SQL}
        SELECT b.event_id,
               b.retry_backoff,
               COALESCE(g.attempt_count, 0) AS attempt_count,
               CASE WHEN COALESCE(g.any_ok, 0) = 1 THEN 'DELIVERED'
                    WHEN COALESCE(g.attempt_count, 0) >= b.retry_number + 1
                         THEN 'FAILED'
                    ELSE 'PENDING' END AS status,
               COALESCE(g.attempt_log, '') AS attempt_log,
               CASE WHEN COALESCE(g.attempt_count, 0) = 0 THEN b.enq_epoch
                    ELSE b.enq_epoch + 60 * g.attempt_count
                         + CASE WHEN b.retry_backoff = 'LINEAR'
                                THEN b.retry_interval
                                ELSE b.retry_interval * CAST(
                                    POWER(2, g.attempt_count - 1) AS BIGINT)
                           END
               END AS next_attempt_epoch
        FROM base b LEFT JOIN agg g USING (event_id)
    """,
    "status_counts": """
        SELECT event_type AS status, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events
        GROUP BY event_type
    """,
    "fanout_union": """
        SELECT 'audit_all' AS trigger_name, event_id, event_type AS op FROM events
        UNION ALL
        SELECT 'purchase_only' AS trigger_name, event_id, event_type AS op
        FROM events WHERE event_type = 'purchase'
    """,
    "headers_explode": """
        SELECT event_id, k AS header_key,
               json_extract_string(props, '$.' || k) AS header_value
        FROM (
            SELECT event_id, props, unnest(json_keys(props)) AS k
            FROM events
        )
    """,
}

# Shared persisted kernels for explicit family_build:* bench rows (see
# operators/dedup.py FAMILY_BUILDS for the convention).
FAMILY_CONSUMERS = {
    "queue_state": ("queue_state_machine", "queue_latency_profile"),
}

FAMILY_BUILDS = {
    # folded queue-state relation: consumed by queue_state_machine and
    # queue_latency_profile
    "queue_state": lambda spark, sf_dir: [_queue_state(spark, sf_dir)],
}
