"""Engine facade: subscription registration and pipeline wiring (U2/U3).

`create_event_trigger` in the reference validates config, stores
credentials, generates a trigger function, and creates the trigger DDL
(cdc_webhook--1.0.sql:116-368). Here:

  register(cfg)                validate + store creds (PRIVATE mode)
  start(cfg, changes)          attach a subscription to a streaming
                               change feed -> running StreamingQuery
                               (SYNC -> webhook sink; ASYNC -> queue sink)
  start_worker(cfg)            the ASYNC delivery poller

Multiple subscriptions over one feed = multiple independent streaming
queries sharing the source (ST11 fan-out); each applies its own op
filter, so non-subscribed ops never reach its sink — same effect as the
reference baking the op list into trigger DDL.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .config import SubscriptionConfig
from .streaming.capture import capture_pipeline
from .streaming.credstore import CredentialStore
from .streaming.deliver import WebhookSink
from .streaming.queue import EventQueue


class CdcEngine:
    def __init__(self, spark: SparkSession, workdir: str) -> None:
        self.spark = spark
        self.workdir = workdir
        self.creds = CredentialStore(spark, os.path.join(workdir, "credentials"))
        self.queue = EventQueue(spark, os.path.join(workdir, "queue"))
        self._subscriptions: dict[str, SubscriptionConfig] = {}
        self._sinks: dict[str, WebhookSink] = {}

    @staticmethod
    def _key(cfg: SubscriptionConfig) -> str:
        """Subscription identity used for query names, checkpoint and
        attempt-log paths, and the registry dicts. The display form
        joins with '.', so identifiers CONTAINING dots would collide
        (('a','b.c','d') vs ('a.b','c','d')). Dot-free identifiers (the
        overwhelmingly common case) keep the plain dotted key — so
        existing checkpoints/attempt logs stay valid across upgrades —
        and only ambiguous triples get a '~'-marked 8-hex digest of the
        NUL-joined parts appended. '~' also forces the digest form, so
        a plain key can never equal a digest-marked one."""
        parts = (cfg.schema_name, cfg.table_name, cfg.name)
        plain = ".".join(parts)
        if not any("." in p or "~" in p for p in parts):
            return plain
        digest = hashlib.md5("\x00".join(parts).encode()).hexdigest()[:8]
        return f"{plain}~{digest}"

    def register(self, cfg: SubscriptionConfig) -> SubscriptionConfig:
        """Validation happened in the dataclass; PRIVATE mode stores the
        secret material in the credential store and the inline config is
        the only place it ever appears (the reference nulls the literals,
        cdc_webhook--1.0.sql:185-198)."""
        if cfg.security == "PRIVATE":
            self.creds.upsert(cfg)
        self._subscriptions[self._key(cfg)] = cfg
        return cfg

    def _resolve(self, cfg: SubscriptionConfig) -> tuple[str, dict[str, str]]:
        if cfg.security == "PRIVATE":
            return self.creds.resolve(cfg)
        return cfg.webhook_url, dict(cfg.headers)

    def pipeline(self, cfg: SubscriptionConfig, changes: DataFrame) -> DataFrame:
        return capture_pipeline(changes, cfg)

    def start(
        self,
        cfg: SubscriptionConfig,
        changes: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Attach the subscription to a streaming change feed."""
        key = self._key(cfg)
        if cfg.mode == "ASYNC":
            # no credential resolution here: the enqueue sink needs
            # none, and the poller re-resolves per tick anyway — a
            # PRIVATE+ASYNC subscription must not fail to START just
            # because its credentials land later
            sink = self.queue.enqueue_sink(cfg)
        else:
            url, headers = self._resolve(cfg)
            ws = WebhookSink(
                cfg, url, headers,
                attempts_path=os.path.join(self.workdir, "attempts", key),
            )
            self._sinks[key] = ws
            sink = ws
        writer = (
            capture_pipeline(changes, cfg)
            .writeStream.queryName(key)
            .foreachBatch(sink)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.workdir, "checkpoints", key),
            )
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def start_worker(self, cfg: SubscriptionConfig, cadence_seconds: int = 1) -> StreamingQuery:
        """ASYNC delivery worker. Credentials re-resolve EVERY tick (the
        reference worker's SIGHUP config reload,
        src/cdc_webhook_worker.c:69-74): rotating a PRIVATE
        subscription's URL or headers in the credential store takes
        effect on the next poll cycle with no worker restart. PUBLIC
        subscriptions deliver to each event's stored webhook_url (url
        override None)."""

        def _resolve_tick():
            if cfg.security == "PRIVATE":
                return self.creds.resolve(cfg)
            return None, dict(cfg.headers)

        return self.queue.start_poller(
            cfg, cadence_seconds=cadence_seconds, resolver=_resolve_tick
        )

    def drain_delta(self, cfg: SubscriptionConfig, tailer) -> int:
        """SURVEY §1.4 Delta leg wired end-to-end: drain the CDF
        tailer's newly-available commits through this subscription's
        capture pipeline into its sink (SYNC webhook or ASYNC queue) —
        the reference's trigger-to-webhook path with a lakehouse table
        as the monitored source, no delta-spark. At-least-once by the
        tailer's marker contract; the sink's batch id is the range's
        end version, so a replayed range overwrites (queue) or
        re-attempts (webhook) instead of silently duplicating state.
        Returns the number of commits consumed (0 = idle poll)."""
        key = self._key(cfg)
        if cfg.mode == "ASYNC":
            sink = self.queue.enqueue_sink(cfg)
        else:
            sink = self._sinks.get(key)
            if sink is None:
                url, headers = self._resolve(cfg)
                sink = WebhookSink(
                    cfg, url, headers,
                    attempts_path=os.path.join(self.workdir, "attempts", key),
                )
                self._sinks[key] = sink

        def _deliver(changes: DataFrame, end_version: int) -> None:
            sink(capture_pipeline(changes, cfg), end_version)

        return tailer.process_available(_deliver)

    def sink_of(self, cfg: SubscriptionConfig) -> WebhookSink:
        return self._sinks[self._key(cfg)]
