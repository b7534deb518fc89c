"""Streaming training-corpus ingestion: the LLM-data-pipeline operators
composed under Structured Streaming.

A batch corpus build (operators/dedup.py, operators/text.py) assumes
the whole corpus is on disk; a crawl delivers documents continuously.
This module runs the same first-pass hygiene ONLINE over a document
stream:

  1. fingerprint       md5(lower(trim(text))) — the exact-dedup key
                       (same normalization as docs_exact_dedup)
  2. streaming dedup   dropDuplicatesWithinWatermark on the fingerprint:
                       a re-crawled duplicate arriving within the
                       horizon is dropped; state is bounded by the
                       horizon, never the corpus (the same state-bounding
                       pattern as receiver replay dedup)
  3. quality gate      length floor + lexical-diversity floor — the
                       docs_quality_score formula as a streaming filter

All narrow column ops plus one dedup state lookup — a crawl shard adds
no shuffle beyond the dedup's hash exchange on the fingerprint. At
100 TB/day the horizon, not the corpus size, sizes the state store.
Near-dup (MinHash) streaming dedup would chain here as a
foreachBatch join against a persisted signature index — kept batch-side
in this engine (operators/dedup.py) because LSH banding needs the
band tables, not per-key state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = "doc_id bigint, text string, lang string, ts timestamp"


def fingerprint_col(text: Column) -> Column:
    """Exact-dedup fingerprint; identical to docs_exact_dedup's."""
    return F.md5(F.lower(F.trim(text)))


def quality_ok(
    text: Column, min_chars: int = 20, min_uniq_ratio: float = 0.3
) -> Column:
    """The docs_quality_score components as a boolean gate."""
    n_chars = F.length(text)
    n_tokens = n_chars - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    n_distinct = F.size(F.array_distinct(F.split(text, " ")))
    uniq_ratio = n_distinct / n_tokens.cast("double")
    return (n_chars >= min_chars) & (uniq_ratio >= min_uniq_ratio)


def ingest_stream(
    docs: DataFrame,
    horizon: str = "1 hour",
    min_chars: int = 20,
    min_uniq_ratio: float = 0.3,
) -> DataFrame:
    """Online corpus hygiene over a streaming document feed.

    Returns the accepted stream: quality-gated, fingerprinted,
    watermark-bounded exact-deduped. The stateless quality gate runs
    BEFORE the stateful dedup so rejected documents never hash,
    shuffle, or occupy a state-store entry for the horizon — on a
    spam-heavy crawl shard that shrinks dedup state and shuffle volume
    by the reject rate, with identical output (a junk doc's duplicates
    are equally junk). Rows carry the fingerprint so a downstream
    batch compactor can merge shards without re-hashing.
    """
    return (
        docs.filter(quality_ok(F.col("text"), min_chars, min_uniq_ratio))
        .withColumn("fingerprint", fingerprint_col(F.col("text")))
        .withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("doc_id", "text", "lang", "ts", "fingerprint")
    )
