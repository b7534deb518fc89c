"""HTTP webhook delivery sink (S2/ST1/ST3/ST7).

The reference's C sink (src/cdc_webhook.c:121-237) posts one payload per
row with libcurl, re-initializing curl per call (:175,220) and sleeping
the backend between retries (:190). This sink:

  * runs in foreachBatch on executors — delivery parallelism = batch
    partitions;
  * pools one HTTP connection per (partition, host) — stdlib
    http.client, keep-alive across rows (amortizing what the reference
    pays per row);
  * delivers per key strictly in `seq` order within a partition
    (sortWithinPartitions after hash-partitioning on key — SURVEY.md §7
    hard-point 3);
  * never sleeps: retries within a batch are immediate, bounded by the
    attempt budget retry_number+1 (src/cdc_webhook.c:178); *scheduled*
    backoff lives in the async queue (queue.py), where it is data
    (next_attempt), not blocking time. Documented divergence from the
    reference's in-transaction sleeps (README.md:303 admits the stall).
  * failure policy (ST3): cancel_on_failure=True raises after the budget
    is exhausted, failing the micro-batch (the closest analog of
    aborting the writing transaction, src/cdc_webhook.c:223-227);
    False records the failure to a dead-letter list and continues
    (WARNING path, :229-233).

HTTP success = status in [200, 300) (src/cdc_webhook.c:137-140).
"""

from __future__ import annotations

import http.client
import time
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SubscriptionConfig


@dataclass
class Attempt:
    event_id: str
    attempt: int
    status: int  # HTTP status, or -1 on connection error
    ok: bool
    error: str | None
    at: float


def _is_success(status: int) -> bool:
    return 200 <= status < 300


def post_once(
    url: str, payload: str, headers: dict[str, str], timeout: int,
    conn: http.client.HTTPConnection | None = None,
) -> tuple[int, str | None, http.client.HTTPConnection | None]:
    """One HTTP attempt (attempt_webhook_call, src/cdc_webhook.c:121-145).
    Returns (status, error, live_connection) — the connection is reused
    by the caller when the server kept it alive."""
    parsed = urllib.parse.urlparse(url)
    try:
        if conn is None:
            conn = http.client.HTTPConnection(
                parsed.hostname, parsed.port or 80, timeout=timeout
            )
        body = payload.encode("utf-8")
        hdrs = {"Content-Type": "application/json", **headers}
        conn.request("POST", parsed.path or "/", body=body, headers=hdrs)
        resp = conn.getresponse()
        resp.read()  # drain so the connection is reusable
        return resp.status, None, conn
    except Exception as exc:  # connection refused / timeout / reset
        try:
            if conn is not None:
                conn.close()
        except Exception:
            pass
        return -1, str(exc), None


def deliver_rows(
    rows,
    url: str,
    headers: dict[str, str],
    cfg: SubscriptionConfig,
) -> list[Attempt]:
    """Deliver an iterator of (event_id, payload) rows serially over one
    pooled connection; per-row attempt budget = retry_number + 1."""
    attempts: list[Attempt] = []
    conn: http.client.HTTPConnection | None = None
    for event_id, payload in rows:
        for attempt in range(cfg.attempt_budget):
            status, error, conn = post_once(
                url, payload, headers, cfg.timeout, conn
            )
            ok = _is_success(status)
            attempts.append(
                Attempt(event_id, attempt, status, ok, error, time.time())
            )
            if ok:
                break
    return attempts


class WebhookSink:
    """foreachBatch sink for a capture_pipeline stream.

    Usage:
        sink = WebhookSink(cfg, url, headers)
        stream.writeStream.foreachBatch(sink).start()

    Collects per-batch attempt history in `self.attempts` (driver side —
    for tests/observability; the data path never collects payloads unless
    delivery fails in lenient mode, where failures land in
    `self.dead_letters`).
    """

    def __init__(
        self,
        cfg: SubscriptionConfig,
        url: str | None = None,
        headers: dict[str, str] | None = None,
    ) -> None:
        self.cfg = cfg
        self.url = url if url is not None else cfg.webhook_url
        self.headers = dict(headers) if headers is not None else dict(cfg.headers)
        self.attempts: list[Attempt] = []
        self.dead_letters: list[tuple[str, str]] = []

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        cfg, url, headers = self.cfg, self.url, self.headers
        # per-key ordering (SURVEY.md §7 hard-point 3): ordering unit = the monitored row's key (falling back to the
        # event id for keyless feeds): hash-partition so all changes of a
        # row land in one partition, then deliver in seq order within it
        ordered = (
            batch.select(
                F.col("envelope.id").alias("event_id"),
                F.coalesce(F.col("key"), F.col("envelope.id")).alias("row_key"),
                "payload",
                "seq",
            )
            .repartition(F.col("row_key"))
            .sortWithinPartitions("row_key", "seq")
        )

        def _deliver_partition(it):
            rows = [(r.event_id, r.payload) for r in it]
            yield deliver_rows(rows, url, headers, cfg)

        partition_results = ordered.rdd.mapPartitions(_deliver_partition).collect()
        batch_attempts = [a for part in partition_results for a in part]
        self.attempts.extend(batch_attempts)

        failed = {
            a.event_id
            for a in batch_attempts
            if a.attempt == cfg.attempt_budget - 1 and not a.ok
        }
        if failed:
            if cfg.cancel_on_failure:
                # ST3 strict: fail the micro-batch -> stream halts,
                # checkpoint replays (transaction-abort analog)
                raise RuntimeError(
                    f"webhook delivery failed for {len(failed)} event(s) "
                    f"after {cfg.attempt_budget} attempts: {sorted(failed)[:3]}..."
                )
            self.dead_letters.extend(
                (a.event_id, f"status={a.status} err={a.error}")
                for a in batch_attempts
                if a.event_id in failed and a.attempt == cfg.attempt_budget - 1
            )
