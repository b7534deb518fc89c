"""Streaming crawl-URL ledger: the host-dedup-bookkeeping counterpart
of streaming/engagement.py's active-users ledger.

The batch docs_url_host_stats aggregates the whole corpus at once; a
crawler discovers documents continuously. UrlHostLedger keeps the
doc-grain canonical-URL relation live — each micro-batch's documents
run through the SAME operators.dedup._url_parts canonicalization kernel
and land as (doc_id, host, canon_url) rows in a `batch=<id>` directory
(overwritten on replay: exactly-once output from at-least-once
foreachBatch, the house discipline) — and the read-back dedups
cross-batch doc redelivery on doc_id and runs
operators.dedup.host_stats_from_urls VERBATIM, so the streaming surface
is bit-equal to the batch query given the same document set (pinned in
tests/test_streaming.py).

Scale shape per batch: the canonicalization is the zero-shuffle per-row
rewrite; the stored relation is doc grain with three short columns —
the read-back's distinct and host aggregation cost what the batch query
costs, on an always-current corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DOC_STREAM_SCHEMA = "doc_id bigint, source string"


class UrlHostLedger:
    """Maintains the doc-grain canonical-URL relation under `out_dir`
    from a streaming document feed; `host_stats()` reports per-host
    crawl volume / distinct canonical URLs / duplicate rate through the
    batch kernel."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    # -- read-back surfaces -------------------------------------------
    def url_docs(self, spark) -> DataFrame | None:
        from .ledger import committed_batch_dirs

        parts = committed_batch_dirs(self.out_dir)
        if not parts:
            return None
        spark.catalog.refreshByPath(self.out_dir)
        raw = spark.read.option("basePath", self.out_dir).parquet(*parts)
        # a document redelivered across micro-batches appears in both
        # batch dirs — the ledger's grain is the DISTINCT document
        return raw.select("doc_id", "host", "canon_url").distinct()

    def host_stats(self, spark) -> DataFrame | None:
        """Per-host dedup bookkeeping over the maintained relation —
        the operators.dedup.host_stats_from_urls kernel verbatim."""
        from ..operators.dedup import host_stats_from_urls

        u = self.url_docs(spark)
        if u is None:
            return None
        return host_stats_from_urls(u)

    # -- the per-batch step -------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import _url_parts

        rows = _url_parts(batch).select("doc_id", "host", "canon_url")
        rows.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch={batch_id}")
        )

    def attach(
        self,
        doc_stream: DataFrame,
        checkpoint: str,
        available_now: bool = False,
    ):
        """Run the ledger over a streaming document feed; returns the
        StreamingQuery. `available_now=True` drains the current source
        contents and terminates (backfill/test mode)."""
        writer = (
            doc_stream.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
