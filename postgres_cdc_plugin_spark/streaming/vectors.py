"""Streaming vector-index maintenance: the embedding-modality
counterpart of streaming/corpus.py's SimHashNearDupIndex.

A batch IVF build (operators/similarity.py embed_ivf_assign) assigns
the whole corpus at once; a production embedding pipeline receives
vectors continuously (new documents embedded as they are ingested).
EmbedIvfIndex keeps the cell-partitioned index layout LIVE: each
micro-batch is assigned against a FROZEN centroid codebook (IVF
codebooks are trained once and versioned — re-training moves every
assignment, so a codebook change is a new index build, not an update)
and written into `batch=<id>` directories partitioned by cell.

Scale shape per batch: the k-row codebook broadcasts; the argmin is
the embed_pq_codes partial min-struct aggregation (map-side combine,
one ~batch-sized shuffle); the write IS the partition-by-cell layout
that makes probes partition pruning (tests/test_plans.py
test_ivf_cell_layout_prunes_partitions). Replayed micro-batches
overwrite their own `batch=<id>` directory — exactly-once output from
at-least-once foreachBatch, the SimHashNearDupIndex discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VEC_STREAM_SCHEMA = "vec_id bigint, embedding array<float>, label int, ts timestamp"


class EmbedIvfIndex:
    """Maintains a cell-partitioned vector index under `out_dir` from a
    streaming embedding feed, assigning with the frozen `centroids`
    relation ((cell, cv) — the _centroid_vecs shape, round-6 means so
    assignments are engine-deterministic and match the batch
    embed_ivf_assign bit-for-bit given the same codebook)."""

    def __init__(self, out_dir: str, centroids: DataFrame):
        self.out_dir = out_dir
        self.centroids = centroids
        os.makedirs(out_dir, exist_ok=True)

    # -- read-back surfaces -------------------------------------------
    def index(self, spark) -> DataFrame | None:
        """The whole index: (vec_id, label, sq_dist, embedding, cell,
        batch)."""
        from .ledger import committed_batch_dirs

        parts = committed_batch_dirs(self.out_dir)
        if not parts:
            return None
        spark.catalog.refreshByPath(self.out_dir)
        return spark.read.option("basePath", self.out_dir).parquet(*parts)

    def probe(self, spark, cells: list[int]) -> DataFrame | None:
        """Vectors of the probed cells only. The cell predicate lands in
        PartitionFilters (cell is a directory key inside every batch
        dir), so unprobed cells' files are never planned."""
        idx = self.index(spark)
        if idx is None:
            return None
        return idx.filter(F.col("cell").isin([int(c) for c in cells]))

    # -- the per-batch step -------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import _sq_dist

        emb = batch.select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
            "embedding",
        )
        assigned = (
            emb.crossJoin(F.broadcast(self.centroids))
            .select(
                "vec_id",
                "label",
                "embedding",
                "cell",
                F.round(_sq_dist("v", "cv"), 6).alias("sq_dist"),
            )
            .groupBy("vec_id", "label", "embedding")
            .agg(F.min(F.struct("sq_dist", "cell")).alias("b"))
            .select(
                "vec_id",
                "label",
                F.col("b.sq_dist").alias("sq_dist"),
                "embedding",
                F.col("b.cell").cast("int").alias("cell"),
            )
        )
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(self.out_dir, f"batch={batch_id}")
        )

    def attach(
        self,
        vec_stream: DataFrame,
        checkpoint: str,
        available_now: bool = False,
    ):
        """Run the index maintainer over a streaming embedding feed;
        returns the StreamingQuery. `available_now=True` drains the
        current source contents and terminates (backfill/test mode)."""
        writer = (
            vec_stream.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
