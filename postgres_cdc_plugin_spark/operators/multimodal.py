"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata,
processed by Arrow-batched pandas functions over mapInPandas. The decode
step is STUBBED (image/audio libraries are not in this container):
`decode_payload` raises NotImplementedError and the pipeline substitutes a
deterministic fake extractor — the Spark-side plumbing (schema, batch
shape, partitioning) is real and tested.

The driver testdata has no binary column, so payloads are derived from
`documents.text` (utf-8 encode) — identically in the DuckDB oracle for the
metadata query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import load

_MODALITIES = ("image", "audio", "video")


def decode_payload(payload: bytes, modality: str):  # pragma: no cover - stub
    """STUB: real decoders (PIL/libav/opencv) are not available in this
    environment. At deployment this dispatches to the modality's decoder;
    here it always raises and callers fall back to the deterministic fake
    feature extractor below."""
    raise NotImplementedError(
        f"no {modality} decoder available in this environment; "
        "install pillow/av/opencv and replace this stub"
    )


def _fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for decode->feature-extract: cheap byte
    statistics, stable across runs/partitions. Always exactly `dim`
    elements (zero-padded/truncated) — ragged feature vectors would
    misalign any fixed-width downstream consumer."""
    n = len(payload)
    if n == 0:
        return [0.0] * dim
    base = [
        float(n),
        float(sum(payload) % 256),
        float(payload[0]),
        float(payload[-1]),
    ]
    return (base + [0.0] * dim)[:dim]


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + modality metadata to each doc."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % len(_MODALITIES)).cast("int") + 1,
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out.
    Tries the real decoder once per batch, falls back to fake features."""
    for pdf in batches:
        feats = []
        # NULL payload (text=NULL source row) must not crash the worker
        # — bytes(None) raises. Missing media stays NULL end-to-end
        # (n_bytes/checksum/features all NULL), matching what the
        # JVM-only metadata query reports for the same rows.
        payloads = [None if p is None else bytes(p) for p in pdf["payload"]]
        for data, modality in zip(payloads, pdf["modality"]):
            if data is None:
                feats.append(None)
                continue
            try:
                decoded = decode_payload(data, modality)
                feats.append([float(x) for x in decoded])
            except NotImplementedError:
                feats.append(_fake_features(data))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": [None if p is None else len(p) for p in payloads],
                "checksum": [
                    None if p is None else sum(p) % 256 for p in payloads
                ],
                "features": feats,
            }
        )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (oracle-checked).

    Byte length + modality routing — pure JVM column ops on the binary
    column, no Python in the plan.
    """
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).select(
        "doc_id",
        "modality",
        F.length("payload").cast("bigint").alias("n_bytes"),
    )


def multimodal_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over mapInPandas — array-form API.

    Arrow-batched binary transfer into pandas, per-batch feature
    extraction, typed struct back out. At scale this is the shape of any
    image-resize / audio-frame-sample pass: narrow, no shuffle,
    parallelism = input partitions. Returns `features array<float>` for
    downstream vector consumers (e.g. the similarity operators).
    """
    docs = load(spark, sf_dir, "documents")
    # single-file source -> one input split; repartition so the Python
    # feature extraction parallelizes across cores
    return with_payload(docs).repartition("doc_id").mapInPandas(
        _extract_batches, _FEATURE_SCHEMA
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared rows-only query: scalar feature columns.

    The driver's rows-only canonicalizer sorts a pandas frame, and
    list-typed cells are unhashable (CORRECTNESS_r02 err on this query),
    so the declared surface explodes the fixed-width feature vector to
    f0..f3 doubles. The array form stays available via
    multimodal_feature_vectors for programmatic use.
    """
    feat = multimodal_feature_vectors(spark, sf_dir)
    return feat.select(
        "doc_id",
        "modality",
        "n_bytes",
        "checksum",
        *[
            F.element_at("features", i + 1).cast("double").alias(f"f{i}")
            for i in range(4)
        ],
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

_FRAME_SIZE = 64  # bytes per fake frame
_FRAME_STRIDE = 4  # sample every 4th frame


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for frame sampling: one row per sampled frame.

    The decode step is stubbed (decode_payload raises) — the sampler
    falls back to fixed-size byte windows as deterministic fake frames.
    The Spark-side shape is the real thing: a 1->N Arrow-batched
    expansion whose output rows carry (doc, frame_idx) so a downstream
    per-frame featurizer can run partition-parallel.
    """
    for pdf in batches:
        doc_ids, modalities, idxs, sizes, sums = [], [], [], [], []
        for doc_id, payload, modality in zip(
            pdf["doc_id"], pdf["payload"], pdf["modality"]
        ):
            if payload is None:
                # missing media: no frames (mirrors the NULL metadata
                # the JVM path reports; 1->N expansion of nothing is
                # zero rows, not a fake empty frame)
                continue
            data = bytes(payload)
            try:  # real decoder unavailable in this environment
                decode_payload(data, modality)
            except NotImplementedError:
                pass
            n_frames = max(1, (len(data) + _FRAME_SIZE - 1) // _FRAME_SIZE)
            for fi in range(0, n_frames, _FRAME_STRIDE):
                chunk = data[fi * _FRAME_SIZE : (fi + 1) * _FRAME_SIZE]
                doc_ids.append(doc_id)
                modalities.append(modality)
                idxs.append(fi)
                sizes.append(len(chunk))
                sums.append(sum(chunk) % 256)
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "modality": modalities,
                "frame_idx": idxs,
                "frame_bytes": sizes,
                "frame_checksum": sums,
            }
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling / resize plumbing over opaque media payloads
    (rows-only check: the fake decoder's output is not SQL-expressible).

    The video-frame-sample / image-resize shape of a training-data
    pipeline: every-Nth-frame extraction as an Arrow-batched 1->N row
    expansion. Narrow (no shuffle); parallelism = input partitions; at
    100 TB the binary column never leaves the executor and only the
    small per-frame feature rows flow on."""
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).repartition("doc_id").mapInPandas(
        _sample_frames, _FRAME_SCHEMA
    )


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact payload dedup across the multimodal corpus: md5 over the
    BINARY column keys duplicate media blobs regardless of filename or
    metadata — the first dedup pass of any image/audio crawl (identical
    bytes, keep lowest doc_id). Hash + window on the fingerprint: one
    shuffle, linear at any scale; near-dup (perceptual-hash) variants
    would slot in exactly like MinHash/SimHash do for text.

    Oracle hashes the text the payload derives from (same utf-8 bytes;
    DuckDB md5 is VARCHAR-only)."""
    from pyspark.sql.window import Window

    pay = with_payload(load(spark, sf_dir, "documents"))
    w = Window.partitionBy("payload_md5").orderBy("doc_id")
    return (
        pay.select(
            "doc_id",
            "modality",
            F.md5("payload").alias("payload_md5"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_dedup": multimodal_dedup,
}

ORACLE_SQL = {
    "multimodal_meta": """
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    "multimodal_dedup": """
        SELECT doc_id, modality, payload_md5, n_bytes
        FROM (
            SELECT doc_id,
                   CASE CAST(doc_id % 3 AS INT)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                   md5(text) AS payload_md5,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn = 1
    """,
}
