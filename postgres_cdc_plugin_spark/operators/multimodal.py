"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata,
processed by Arrow-batched pandas functions over mapInPandas.

Decoding is REAL for three container formats parseable with
stdlib+numpy: WAV (RIFF/fmt/data chunk walk -> int16 PCM samples),
binary PPM (P6 header -> HxWx3 uint8 pixel array), and YUV4MPEG2 y4m
video (header + raw C444 planes -> uint8[n, 3, h, w] frames, real
since r4). The NotImplementedError branch remains only for future
modalities with no decoder. The driver testdata has no
binary column, so payloads are synthesized deterministically from
`documents.text`: raw utf-8 bytes for the metadata/fingerprint queries
(mirrored by the DuckDB oracles) and genuine WAV/PPM containers
wrapping those bytes for the decode-path queries.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import load, spread

_MODALITIES = ("image", "audio", "video")
_WAV_RATE = 8000


def synth_wav_payload(data: bytes) -> bytes:
    """Deterministic 16-bit mono PCM WAV wrapping `data`: each source
    byte becomes one centered sample ((b-128)<<8). Test scaffolding for
    a corpus with no real media column — but a REAL RIFF container that
    any WAV reader parses."""
    samples = (
        (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def synth_ppm_payload(data: bytes) -> bytes:
    """Deterministic binary PPM (P6) wrapping `data` as RGB bytes in a
    near-square raster (zero-padded to W*H*3)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n_pix = max(1, (arr.size + 2) // 3)
    w = int(np.ceil(np.sqrt(n_pix)))
    h = int(np.ceil(n_pix / w))
    padded = np.zeros(w * h * 3, dtype=np.uint8)
    padded[: arr.size] = arr
    return b"P6\n%d %d\n255\n" % (w, h) + padded.tobytes()


_VID_W = 8  # synth y4m frame width
_VID_H = 8  # synth y4m frame height
_VID_FRAME_UNITS = 3 * _VID_W * _VID_H  # C444: full-size Y, Cb, Cr planes


def synth_y4m_payload(data: bytes) -> bytes:
    """Deterministic YUV4MPEG2 (y4m) container wrapping `data` as raw
    C444 plane bytes across as many 8x8 frames as needed (zero-padded;
    empty data still produces one all-zero frame). y4m is a public,
    header-plus-raw-frames container (mjpegtools) parseable with pure
    stdlib — same synthesis discipline as the WAV/PPM paths."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n_frames = max(1, -(-arr.size // _VID_FRAME_UNITS))
    padded = np.zeros(n_frames * _VID_FRAME_UNITS, dtype=np.uint8)
    padded[: arr.size] = arr
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (_VID_W, _VID_H)]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(
            padded[f * _VID_FRAME_UNITS : (f + 1) * _VID_FRAME_UNITS].tobytes()
        )
    return b"".join(out)


def decode_payload(payload: bytes, modality: str):
    """Decode a media container into a numpy array.

    audio -> (samples int16[n], rate); image -> pixels uint8[h, w, 3];
    video -> frames uint8[n_frames, 3, h, w] from a YUV4MPEG2 (y4m)
    C444 stream. Raises ValueError on a malformed container and
    NotImplementedError for modalities with no decoder (none today —
    the former video seam closed in r4 via the y4m parser below; the
    branch remains for future modalities)."""
    if modality == "audio":
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                n = w.getnframes()
                width = w.getsampwidth()
                rate = w.getframerate()
                frames = w.readframes(n)
        except (wave.Error, EOFError, struct.error) as exc:
            raise ValueError(f"malformed WAV payload: {exc}") from exc
        if width != 2:
            raise ValueError(f"unsupported WAV sample width {width}")
        return np.frombuffer(frames, dtype="<i2"), rate
    if modality == "image":
        if not payload.startswith(b"P6"):
            raise ValueError("not a binary PPM (P6) payload")
        # header: magic, width, height, maxval, single whitespace, raster
        parts = payload.split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PPM header")
        try:
            w, h = (int(x) for x in parts[1].split())
            maxval = int(parts[2])
        except ValueError as exc:
            raise ValueError(f"malformed PPM header: {exc}") from exc
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        raster = np.frombuffer(parts[3], dtype=np.uint8)
        if raster.size < w * h * 3:
            raise ValueError("PPM raster shorter than header promises")
        return raster[: w * h * 3].reshape(h, w, 3)
    if modality == "video":
        nl = payload.find(b"\n")
        if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
            raise ValueError("not a YUV4MPEG2 (y4m) payload")
        w = h = None
        colorspace = "C420jpeg"  # the y4m spec default
        for tok in payload[:nl].split(b" ")[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C":
                colorspace = tok[1:].decode("ascii", "replace")
        if w is None or h is None or w <= 0 or h <= 0:
            raise ValueError("y4m header missing W/H")
        if colorspace != "444":
            raise ValueError(f"unsupported y4m colorspace C{colorspace}")
        frame_bytes = 3 * w * h
        frames = []
        pos = nl + 1
        while pos < len(payload):
            if not payload.startswith(b"FRAME", pos):
                raise ValueError("y4m stream desynced: FRAME marker missing")
            fnl = payload.find(b"\n", pos)
            if fnl < 0:
                raise ValueError("truncated y4m FRAME header")
            start = fnl + 1
            plane = np.frombuffer(payload, dtype=np.uint8,
                                  count=frame_bytes, offset=start) \
                if start + frame_bytes <= len(payload) else None
            if plane is None:
                raise ValueError("y4m frame shorter than header promises")
            frames.append(plane.reshape(3, h, w))
            pos = start + frame_bytes
        if not frames:
            raise ValueError("y4m stream contains no frames")
        return np.stack(frames)
    raise NotImplementedError(
        f"no {modality} decoder available in this environment; "
        "install pillow/av/opencv to extend this seam"
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
                feats.append([float(x) for x in np.ravel(decoded[0])[:4]])
            except (NotImplementedError, ValueError):
                # raw (container-less) payloads and undecodable
                # modalities fall back to deterministic byte stats
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
    return with_payload(docs).transform(spread, "doc_id").mapInPandas(
        _extract_batches, _FEATURE_SCHEMA
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: scalar feature columns, fully oracle-checked.

    The driver's canonicalizer sorts a pandas frame and list-typed
    cells are unhashable (CORRECTNESS_r02 err on this query), so the
    declared surface explodes the fixed-width feature vector to f0..f3
    doubles — which also makes the byte-statistic fallback features
    SQL-expressible, upgrading this from a rows-only check to full
    DuckDB parity. The array form stays available via
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

    Video payloads decode through the REAL y4m parser (r4) and sample
    every _FRAME_STRIDE-th decoded frame — frame_bytes is the true
    C444 frame size and the checksum sums decoded plane bytes. Image/
    audio have no temporal axis; they keep the fixed-size byte-window
    fallback as deterministic pseudo-frames. The Spark-side shape is
    the real thing either way: a 1->N Arrow-batched expansion whose
    output rows carry (doc, frame_idx) so a downstream per-frame
    featurizer can run partition-parallel.
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
            if modality == "video":
                frames = decode_payload(synth_y4m_payload(data), modality)
                for fi in range(0, frames.shape[0], _FRAME_STRIDE):
                    doc_ids.append(doc_id)
                    modalities.append(modality)
                    idxs.append(fi)
                    sizes.append(int(frames[fi].size))
                    sums.append(int(frames[fi].sum()) % 256)
                continue
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
    (oracle-checked: fixed byte windows + byte checksums are
    SQL-expressible over the ASCII corpus).

    The video-frame-sample / image-resize shape of a training-data
    pipeline: every-Nth-frame extraction as an Arrow-batched 1->N row
    expansion. Narrow (no shuffle); parallelism = input partitions; at
    100 TB the binary column never leaves the executor and only the
    small per-frame feature rows flow on."""
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).transform(spread, "doc_id").mapInPandas(
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


_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("container", StringType()),
        StructField("n_units", LongType()),
        StructField("mean_level", DoubleType()),
        StructField("rms_level", DoubleType()),
        StructField("peak_level", DoubleType()),
    ]
)


def _decoded_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: synthesize the modality's real container
    around the payload bytes, decode it back through decode_payload,
    and emit level statistics over the DECODED samples/pixels. Video
    has no decoder (NotImplementedError seam) -> NULL stats row."""
    for pdf in batches:
        out = {k: [] for k in _DECODED_SCHEMA.fieldNames()}
        for doc_id, payload, modality in zip(
            pdf["doc_id"], pdf["payload"], pdf["modality"]
        ):
            out["doc_id"].append(doc_id)
            out["modality"].append(modality)
            if payload is None:
                for k in ("container", "n_units", "mean_level",
                          "rms_level", "peak_level"):
                    out[k].append(None)
                continue
            data = bytes(payload)
            try:
                if modality == "audio":
                    samples, _rate = decode_payload(
                        synth_wav_payload(data), modality
                    )
                    vals = samples.astype(np.float64)
                    container = "wav"
                elif modality == "image":
                    pixels = decode_payload(synth_ppm_payload(data), modality)
                    vals = pixels.astype(np.float64).ravel()
                    container = "ppm"
                elif modality == "video":
                    frames = decode_payload(synth_y4m_payload(data), modality)
                    vals = frames.astype(np.float64).ravel()
                    container = "y4m"
                else:
                    # future-modality seam: decoded output is scored
                    # generically so extending decode_payload cannot
                    # crash this query
                    decoded = decode_payload(data, modality)
                    vals = np.asarray(
                        decoded[0] if isinstance(decoded, tuple) else decoded,
                        dtype=np.float64,
                    ).ravel()
                    container = modality
            except NotImplementedError:
                for k in ("container", "n_units", "mean_level",
                          "rms_level", "peak_level"):
                    out[k].append(None)
                continue
            out["container"].append(container)
            out["n_units"].append(int(vals.size))
            if vals.size == 0:
                # empty payload decodes to zero samples: stats are
                # undefined, not 0.0 (np reductions would raise/NaN)
                out["mean_level"].append(None)
                out["rms_level"].append(None)
                out["peak_level"].append(None)
            else:
                out["mean_level"].append(float(vals.mean()))
                out["rms_level"].append(float(np.sqrt((vals * vals).mean())))
                out["peak_level"].append(float(np.abs(vals).max()))
        yield pd.DataFrame(out)


def multimodal_decoded_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-content statistics through REAL container decoders,
    fully oracle-checked: the synth containers are deterministic byte
    transforms of the text, so DuckDB reproduces the decoded sample/
    pixel statistics exactly (integer sums stay under 2^53 — every
    mean/rms/peak is bit-identical float64).

    The shape of an audio-loudness / image-brightness pass in a media
    pipeline: Arrow-batched mapInPandas, narrow, no shuffle; only the
    small per-doc stat rows flow downstream. audio -> WAV PCM samples,
    image -> PPM pixels, video -> y4m C444 plane bytes (real stats
    since r4 — the former NULL-row decoder seam is closed)."""
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).transform(spread, "doc_id").mapInPandas(
        _decoded_stats_batches, _DECODED_SCHEMA
    )


# --- resize / resample -------------------------------------------------

_RESIZE_DIM = 4  # images resize to 4x4 RGB (48 values)
_RESAMPLE_N = 64  # audio resamples to 64 samples
_VID_OUT_FRAMES = 2  # video thumbnail strip: 2 frames x 4x4 luma

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("container", StringType()),
        StructField("n_in_units", LongType()),
        StructField("n_out_units", LongType()),
        StructField("resized_checksum", LongType()),
        StructField("resized_mean", DoubleType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: REAL decode then nearest-neighbor resample —
    images to _RESIZE_DIM x _RESIZE_DIM RGB via floor index mapping
    src = (dst * src_size) // dst_size, audio to _RESAMPLE_N samples by
    the same rule. Integer checksums keep the audit exact."""
    for pdf in batches:
        out = {k: [] for k in _RESIZE_SCHEMA.fieldNames()}
        for doc_id, payload, modality in zip(
            pdf["doc_id"], pdf["payload"], pdf["modality"]
        ):
            out["doc_id"].append(doc_id)
            out["modality"].append(modality)
            if payload is None:
                # missing media is NOT an empty clip: NULL end-to-end
                # (the meta/features convention, r12 NULL-payload sweep)
                # — a zero row would claim a decoded zero-length asset
                out["container"].append(None)
                out["n_in_units"].append(None)
                out["n_out_units"].append(None)
                out["resized_checksum"].append(None)
                out["resized_mean"].append(None)
                continue
            data = bytes(payload)
            try:
                if modality == "audio":
                    samples, _rate = decode_payload(
                        synth_wav_payload(data), modality
                    )
                    n = int(samples.size)
                    if n == 0:
                        vals = None
                    else:
                        idx = (
                            np.arange(_RESAMPLE_N, dtype=np.int64) * n
                        ) // _RESAMPLE_N
                        vals = samples[idx].astype(np.int64)
                    container, n_out = "wav", _RESAMPLE_N
                elif modality == "image":
                    pixels = decode_payload(synth_ppm_payload(data), modality)
                    h, w = pixels.shape[0], pixels.shape[1]
                    rs = (np.arange(_RESIZE_DIM, dtype=np.int64) * h) // _RESIZE_DIM
                    cs = (np.arange(_RESIZE_DIM, dtype=np.int64) * w) // _RESIZE_DIM
                    vals = pixels[np.ix_(rs, cs)].astype(np.int64).ravel()
                    n = h * w * 3
                    container, n_out = "ppm", _RESIZE_DIM * _RESIZE_DIM * 3
                elif modality == "video":
                    frames = decode_payload(synth_y4m_payload(data), modality)
                    nf = frames.shape[0]
                    ts = (
                        np.arange(_VID_OUT_FRAMES, dtype=np.int64) * nf
                    ) // _VID_OUT_FRAMES
                    rs = (
                        np.arange(_RESIZE_DIM, dtype=np.int64) * _VID_H
                    ) // _RESIZE_DIM
                    cs = (
                        np.arange(_RESIZE_DIM, dtype=np.int64) * _VID_W
                    ) // _RESIZE_DIM
                    # temporal floor-sample, then spatial floor-sample
                    # of the luma (Y) plane — the thumbnail-strip step
                    # of a video pipeline
                    vals = (
                        frames[ts][:, 0][:, rs][:, :, cs]
                        .astype(np.int64)
                        .ravel()
                    )
                    n = nf * _VID_FRAME_UNITS
                    container, n_out = (
                        "y4m",
                        _VID_OUT_FRAMES * _RESIZE_DIM * _RESIZE_DIM,
                    )
                else:
                    decode_payload(data, modality)  # raises: future seam
                    raise AssertionError("unreachable")
            except NotImplementedError:
                for k in ("container", "n_in_units", "n_out_units",
                          "resized_checksum", "resized_mean"):
                    out[k].append(None)
                continue
            out["container"].append(container)
            out["n_in_units"].append(n)
            out["n_out_units"].append(n_out)
            if vals is None:
                out["resized_checksum"].append(None)
                out["resized_mean"].append(None)
            else:
                checksum = int(vals.sum())
                out["resized_checksum"].append(checksum)
                out["resized_mean"].append(checksum / n_out)
        yield pd.DataFrame(out)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize / resample through the REAL decoders, fully oracle-checked:
    images decode from PPM and nearest-neighbor downsample to 4x4 RGB
    (the thumbnail step of an image pipeline), audio decodes from WAV
    and decimates to 64 samples, both via the floor mapping
    src = (dst*src_size)//dst_size; video rows carry NULLs through the
    decoder seam. The synth containers are deterministic byte
    transforms of the text, so DuckDB reproduces every selected
    sample/pixel — integer checksums make the audit exact. Arrow-batched
    mapInPandas, narrow, no shuffle; only small per-doc rows flow on."""
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).transform(spread, "doc_id").mapInPandas(
        _resize_batches, _RESIZE_SCHEMA
    )


# --- audio silence segmentation (VAD shape) -----------------------------

_VAD_WINDOW = 50  # samples per energy window
_VAD_THRESHOLD = 5000  # mean |sample| below this = silence

_SILENCE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_windows", LongType()),
        StructField("n_silent", LongType()),
        StructField("lead_trim", LongType()),
        StructField("trail_trim", LongType()),
        StructField("kept_windows", LongType()),
    ]
)


def _silence_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode the WAV container, score fixed-width
    windows by mean |sample| (the tail window keeps its true size), and
    derive the silence/trim profile. All integers except the window
    mean, whose int/int float64 division the oracle reproduces
    bit-identically."""
    for pdf in batches:
        out = {k: [] for k in _SILENCE_SCHEMA.fieldNames()}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # missing media is NOT a zero-length clip: NULL
                # end-to-end (the meta/features convention, r12
                # NULL-payload sweep) — zeros would claim a decoded
                # silent asset
                out["doc_id"].append(doc_id)
                for k in _SILENCE_SCHEMA.fieldNames():
                    if k != "doc_id":
                        out[k].append(None)
                continue
            data = bytes(payload)
            samples, _rate = decode_payload(synth_wav_payload(data), "audio")
            a = np.abs(samples.astype(np.int64))
            n = int(a.size)
            nw = (n + _VAD_WINDOW - 1) // _VAD_WINDOW
            silent = []
            for w in range(nw):
                seg = a[w * _VAD_WINDOW : (w + 1) * _VAD_WINDOW]
                silent.append(bool(seg.sum() / seg.size < _VAD_THRESHOLD))
            loud = [w for w, s in enumerate(silent) if not s]
            first = loud[0] if loud else nw
            last = loud[-1] if loud else -1
            out["doc_id"].append(doc_id)
            out["n_samples"].append(n)
            out["n_windows"].append(nw)
            out["n_silent"].append(sum(silent))
            out["lead_trim"].append(first)
            out["trail_trim"].append(nw - 1 - last)
            out["kept_windows"].append(max(0, last - first + 1))
        yield pd.DataFrame(out)


def multimodal_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence segmentation through the REAL WAV decoder — the
    VAD / silence-trim shape of an audio-corpus pipeline: decode int16
    PCM, score _VAD_WINDOW-sample windows by mean |amplitude|, report
    the silent-window count and the leading/trailing trim a cut at the
    first/last loud window would apply. Fully oracle-checked: the
    synth container is a deterministic byte transform of the text, so
    DuckDB reproduces every window mean exactly (int sums, one int/int
    float64 division per window).

    Scale: Arrow-batched mapInPandas over the audio modality only
    (filter pushes to the scan) — narrow, payload bytes never leave
    the executor, one small stat row per doc flows downstream."""
    docs = load(spark, sf_dir, "documents")
    audio = with_payload(docs).filter(F.col("modality") == "audio")
    return audio.transform(spread, "doc_id").mapInPandas(
        _silence_batches, _SILENCE_SCHEMA
    )


# --- perceptual-hash near-dup ------------------------------------------

_PHASH_BITS = 64


def phash64_blocks(data: bytes) -> tuple[int, int, int, int]:
    """Perceptual difference-hash over payload bytes as four 16-bit
    blocks: the payload is binned into _PHASH_BITS+1 equal windows, and
    bit i = (mean(window i) < mean(window i+1)) — robust to small local
    edits (a changed byte moves one window mean slightly) while
    identical payloads hash identically. The block form feeds the
    SimHash block-LSH kernel (dedup.simhash_block_pairs) unchanged."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return (0, 0, 0, 0)
    win = np.arange(arr.size, dtype=np.int64) * (_PHASH_BITS + 1) // arr.size
    sums = np.bincount(win, weights=arr, minlength=_PHASH_BITS + 1)
    cnts = np.bincount(win, minlength=_PHASH_BITS + 1)
    means = sums / np.maximum(cnts, 1)
    bits = means[:-1] < means[1:]
    blocks = []
    for k in range(4):
        val = 0
        for bit in bits[k * 16 : (k + 1) * 16]:
            val = (val << 1) | int(bit)
        blocks.append(val)
    return tuple(blocks)


_PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("blk1", LongType()),
        StructField("blk2", LongType()),
        StructField("blk3", LongType()),
        StructField("blk4", LongType()),
    ]
)


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in _PHASH_SCHEMA.fieldNames()}
        for doc_id, payload, modality in zip(
            pdf["doc_id"], pdf["payload"], pdf["modality"]
        ):
            if payload is None:
                continue  # no media, no signature (mirrors frame sampling)
            b1, b2, b3, b4 = phash64_blocks(bytes(payload))
            rows["doc_id"].append(doc_id)
            rows["modality"].append(modality)
            rows["blk1"].append(b1)
            rows["blk2"].append(b2)
            rows["blk3"].append(b3)
            rows["blk4"].append(b4)
        yield pd.DataFrame(rows)


def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perceptual-hash signature relation (internal API +
    building block for multimodal_neardup)."""
    docs = load(spark, sf_dir, "documents")
    return with_payload(docs).transform(spread, "doc_id").mapInPandas(
        _phash_batches, _PHASH_SCHEMA
    )


def multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup dedup over media payloads (oracle-checked:
    the windowed-mean hash is exact integer/IEEE math on both engines).

    pHash signatures (Python Arrow batch, narrow) feed the SAME block-
    LSH kernel as text SimHash (dedup.simhash_block_pairs): band join
    on 16-bit blocks, inline hamming verify, keep-lowest-doc_id drop —
    content-based like multimodal_dedup's md5 pass, but tolerant of
    small byte-level edits. Scale shape: signatures are 4 ints/blob; the
    LSH join shuffles only (band, key, doc_id); the raw payload never
    leaves its input partition."""
    from .dedup import simhash_block_pairs

    docs = load(spark, sf_dir, "documents")
    sigs = multimodal_phash(spark, sf_dir).persist()
    losers = (
        simhash_block_pairs(sigs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = sigs.join(losers, "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        "modality",
        F.concat(
            *[F.format_string("%04x", F.col(f"blk{k}")) for k in range(1, 5)]
        ).alias("phash"),
    )


_SCENE_CUT_MIN_SAD = 12_000  # sum-of-absolute-differences cut threshold
_SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("sad", LongType()),
        StructField("is_cut", BooleanType()),
    ]
)


def _scene_cut_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: consecutive-frame SAD through the REAL y4m
    decoder. uint8 planes are widened to int32 BEFORE the subtraction —
    uint8 arithmetic wraps mod 256 and would silently corrupt the SAD."""
    for pdf in batches:
        doc_ids, idxs, sads, cuts = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                continue
            frames = decode_payload(
                synth_y4m_payload(bytes(payload)), "video"
            ).astype(np.int32)
            for fi in range(1, frames.shape[0]):
                sad = int(np.abs(frames[fi] - frames[fi - 1]).sum())
                doc_ids.append(doc_id)
                idxs.append(fi)
                sads.append(sad)
                cuts.append(sad >= _SCENE_CUT_MIN_SAD)
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_idx": idxs,
                "sad": sads,
                "is_cut": cuts,
            }
        )


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-cut) detection over the video corpus: the
    sum of absolute differences between each pair of CONSECUTIVE
    decoded C444 frames, flagged as a cut when it crosses the
    threshold — the temporal segmentation step a video training
    pipeline runs before clip sampling (frame-difference shot detection
    is the classical baseline, public literature).

    Decodes through the REAL y4m parser (header + raw planes), same
    path as multimodal_frame_sample/decoded_stats. Arrow-batched
    mapInPandas, narrow: the binary payload never leaves the executor;
    only (doc, frame, sad, flag) rows flow on — at 100 TB this is one
    scan at full parallelism, no shuffle anywhere. Single-frame videos
    emit no rows (no consecutive pair exists).

    Oracle: the synth payload wraps the doc's utf-8 bytes zero-padded
    into 192-byte frames, so DuckDB reproduces the SAD symbolically —
    byte at position p vs p-192 via one lag window over the position
    explode (the silence-trim technique on the temporal axis).
    """
    docs = load(spark, sf_dir, "documents")
    vids = with_payload(docs).filter(F.col("modality") == "video")
    return vids.transform(spread, "doc_id").mapInPandas(
        _scene_cut_rows, _SCENE_SCHEMA
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_dedup": multimodal_dedup,
    "multimodal_decoded_stats": multimodal_decoded_stats,
    "multimodal_neardup": multimodal_neardup,
    "multimodal_resize": multimodal_resize,
    "multimodal_silence_trim": multimodal_silence_trim,
}

# Byte-level SQL mirrors: the corpora are ASCII (asserted by the other
# char-based oracles), so char positions = byte positions and
# unicode(char) = the byte value — the oracle reproduces the worker's
# fallback byte statistics exactly. Empty-text edges mirror the
# worker's zero conventions via COALESCE/CASE.
_MODALITY_SQL = """CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"""
_BYTESUM_SQL = """COALESCE(CAST(list_sum(list_transform(
                    range(1, length({src}) + 1),
                    i -> unicode(substr({src}, CAST(i AS INT), 1)))) AS BIGINT),
                  0)"""

_BYTE_LIST = """list_transform(range(1, length(text) + 1),
                    i -> unicode(substr(text, CAST(i AS INT), 1)))"""

# pHash oracle: the windowed-mean difference hash is exact integer math
# (window sums < 2^53; means are single IEEE divisions of identical
# operands on both engines), so the whole near-dup pipeline — signature,
# block-LSH pairs, hamming verify, keep-lowest anti-join — mirrors in
# SQL. Block k folds its 16 bits MSB-first, matching phash64_blocks.
_PHASH_BLOCK_SQL = ", ".join(
    "SUM(CASE WHEN p >= {lo} AND p < {hi} THEN bit * (1 << ({hi} - 1 - p)) "
    "ELSE 0 END) AS blk{k}".format(lo=(k - 1) * 16, hi=k * 16, k=k)
    for k in range(1, 5)
)
_PHASH_BLOCKS_SQL = f"""
        SELECT doc_id, {_PHASH_BLOCK_SQL}
        FROM (
            SELECT a.doc_id, a.w AS p,
                   CASE WHEN a.m < b.m THEN 1 ELSE 0 END AS bit
            FROM (
                SELECT g.doc_id, g.w,
                       COALESCE(s / CAST(greatest(c, 1) AS DOUBLE), 0.0) AS m
                FROM (
                    SELECT d.doc_id, t.w
                    FROM (SELECT DISTINCT doc_id FROM documents
                          WHERE text IS NOT NULL AND length(text) > 0) d,
                         unnest(range(0, {_PHASH_BITS + 1})) AS t(w)
                ) g
                LEFT JOIN (
                    SELECT doc_id, (bi * {_PHASH_BITS + 1}) // n AS w,
                           sum(b) AS s, count(*) AS c
                    FROM (
                        SELECT doc_id, length(text) AS n, i - 1 AS bi,
                               unicode(substr(text, CAST(i AS INT), 1)) AS b
                        FROM documents,
                             unnest(range(1, length(text) + 1)) AS t(i)
                        WHERE text IS NOT NULL AND length(text) > 0
                    )
                    GROUP BY doc_id, (bi * {_PHASH_BITS + 1}) // n
                ) wins ON wins.doc_id = g.doc_id AND wins.w = g.w
            ) a
            JOIN (
                SELECT g2.doc_id, g2.w,
                       COALESCE(s / CAST(greatest(c, 1) AS DOUBLE), 0.0) AS m
                FROM (
                    SELECT d.doc_id, t.w
                    FROM (SELECT DISTINCT doc_id FROM documents
                          WHERE text IS NOT NULL AND length(text) > 0) d,
                         unnest(range(0, {_PHASH_BITS + 1})) AS t(w)
                ) g2
                LEFT JOIN (
                    SELECT doc_id, (bi * {_PHASH_BITS + 1}) // n AS w,
                           sum(b) AS s, count(*) AS c
                    FROM (
                        SELECT doc_id, length(text) AS n, i - 1 AS bi,
                               unicode(substr(text, CAST(i AS INT), 1)) AS b
                        FROM documents,
                             unnest(range(1, length(text) + 1)) AS t(i)
                        WHERE text IS NOT NULL AND length(text) > 0
                    )
                    GROUP BY doc_id, (bi * {_PHASH_BITS + 1}) // n
                ) wins2 ON wins2.doc_id = g2.doc_id AND wins2.w = g2.w
            ) b ON a.doc_id = b.doc_id AND b.w = a.w + 1
            WHERE a.w < {_PHASH_BITS}
        )
        GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0, 0, 0, 0 FROM documents
        WHERE text IS NOT NULL AND length(text) = 0
"""
_PHASH_HAMMING_SQL = " + ".join(
    f"bit_count(CAST(xor(a.blk{k}, b.blk{k}) AS BIGINT))" for k in range(1, 5)
)
_PHASH_ANY_BLOCK_SQL = " OR ".join(
    f"a.blk{k} = b.blk{k}" for k in range(1, 5)
)

ORACLE_SQL = {
    "multimodal_scene_cuts": f"""
        WITH video AS (
            SELECT doc_id, text FROM documents
            WHERE CAST(doc_id % 3 AS INT) = 2
        ),
        nf AS (
            SELECT doc_id, text,
                   greatest(1, CAST(ceil(length(text) / {_VID_FRAME_UNITS}.0)
                                    AS INT)) AS n_frames
            FROM video
        ),
        b AS (
            SELECT doc_id, t.p AS p,
                   CASE WHEN t.p < length(text)
                        THEN unicode(substr(text, CAST(t.p + 1 AS INT), 1))
                        ELSE 0 END AS byte
            FROM nf, unnest(range(0, n_frames * {_VID_FRAME_UNITS})) AS t(p)
        ),
        d AS (
            SELECT doc_id, p // {_VID_FRAME_UNITS} AS f,
                   abs(byte - lag(byte, {_VID_FRAME_UNITS})
                       OVER (PARTITION BY doc_id ORDER BY p)) AS ad
            FROM b
        )
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(sum(ad) AS BIGINT) AS sad,
               CAST(sum(ad) AS BIGINT) >= {_SCENE_CUT_MIN_SAD} AS is_cut
        FROM d WHERE f >= 1
        GROUP BY doc_id, f
    """,
    "multimodal_silence_trim": f"""
        WITH audio AS (
            SELECT doc_id, text FROM documents
            WHERE CAST(doc_id % 3 AS INT) = 1
        ),
        s AS (
            SELECT doc_id, (i - 1) // {_VAD_WINDOW} AS w,
                   abs(unicode(substr(text, CAST(i AS INT), 1)) - 128) * 256
                       AS a
            FROM audio, unnest(range(1, length(text) + 1)) AS t(i)
        ),
        wins AS (
            SELECT doc_id, w,
                   CASE WHEN sum(a) / CAST(count(*) AS DOUBLE)
                             < {_VAD_THRESHOLD}
                        THEN 1 ELSE 0 END AS silent
            FROM s GROUP BY doc_id, w
        ),
        agg AS (
            SELECT doc_id,
                   count(*) AS n_windows,
                   CAST(sum(silent) AS BIGINT) AS n_silent,
                   COALESCE(min(CASE WHEN silent = 0 THEN w END), count(*))
                       AS first_loud,
                   COALESCE(max(CASE WHEN silent = 0 THEN w END), -1)
                       AS last_loud
            FROM wins GROUP BY doc_id
        )
        SELECT a.doc_id,
               CAST(length(a.text) AS BIGINT) AS n_samples,
               -- missing media is NOT a zero-length clip: NULL
               -- end-to-end (the meta/features convention, r12
               -- NULL-payload sweep); the COALESCE zeros are the
               -- EMPTY-clip case only
               CASE WHEN a.text IS NULL THEN NULL
                    ELSE CAST(COALESCE(g.n_windows, 0) AS BIGINT)
               END AS n_windows,
               CASE WHEN a.text IS NULL THEN NULL
                    ELSE CAST(COALESCE(g.n_silent, 0) AS BIGINT)
               END AS n_silent,
               CASE WHEN a.text IS NULL THEN NULL
                    ELSE CAST(COALESCE(g.first_loud, 0) AS BIGINT)
               END AS lead_trim,
               CASE WHEN a.text IS NULL THEN NULL
                    ELSE CAST(COALESCE(g.n_windows - 1 - g.last_loud, 0)
                              AS BIGINT)
               END AS trail_trim,
               CASE WHEN a.text IS NULL THEN NULL
                    ELSE CAST(COALESCE(
                             greatest(0, g.last_loud - g.first_loud + 1), 0)
                             AS BIGINT)
               END AS kept_windows
        FROM audio a LEFT JOIN agg g USING (doc_id)
    """,
    "multimodal_resize": f"""
        WITH base AS (
            SELECT doc_id, {_MODALITY_SQL} AS modality, text,
                   length(text) AS n
            FROM documents
        ),
        img AS (
            SELECT doc_id, text, n,
                   CAST(ceil(sqrt(greatest((n + 2) // 3, 1))) AS BIGINT) AS w
            FROM base WHERE modality = 'image' AND text IS NOT NULL
        ),
        img2 AS (
            SELECT doc_id, text, n, w,
                   CAST(ceil(CAST(greatest((n + 2) // 3, 1) AS DOUBLE) / w)
                        AS BIGINT) AS h
            FROM img
        ),
        img_vals AS (
            SELECT doc_id, h * w * 3 AS n_in,
                   ((((t.i // {_RESIZE_DIM * 3}) * h) // {_RESIZE_DIM}) * w
                    + (((t.i // 3) % {_RESIZE_DIM}) * w) // {_RESIZE_DIM}) * 3
                   + (t.i % 3) AS flat,
                   text, n
            FROM img2, unnest(range(0, {_RESIZE_DIM * _RESIZE_DIM * 3})) AS t(i)
        ),
        img_rows AS (
            SELECT doc_id, 'image' AS modality, 'ppm' AS container,
                   CAST(max(n_in) AS BIGINT) AS n_in_units,
                   CAST({_RESIZE_DIM * _RESIZE_DIM * 3} AS BIGINT)
                       AS n_out_units,
                   CAST(sum(CASE WHEN flat < n
                            THEN unicode(substr(text, CAST(flat + 1 AS INT), 1))
                            ELSE 0 END) AS BIGINT) AS resized_checksum,
                   CAST(sum(CASE WHEN flat < n
                            THEN unicode(substr(text, CAST(flat + 1 AS INT), 1))
                            ELSE 0 END) AS BIGINT)
                       / {float(_RESIZE_DIM * _RESIZE_DIM * 3)} AS resized_mean
            FROM img_vals GROUP BY doc_id
        ),
        aud AS (SELECT doc_id, text, n FROM base
                WHERE modality = 'audio' AND text IS NOT NULL),
        aud_vals AS (
            SELECT doc_id, n,
                   (unicode(substr(text,
                        CAST((t.i * n) // {_RESAMPLE_N} + 1 AS INT), 1))
                    - 128) * 256 AS v
            FROM aud, unnest(range(0, {_RESAMPLE_N})) AS t(i)
            WHERE n > 0
        ),
        aud_rows AS (
            SELECT doc_id, 'audio' AS modality, 'wav' AS container,
                   CAST(max(n) AS BIGINT) AS n_in_units,
                   CAST({_RESAMPLE_N} AS BIGINT) AS n_out_units,
                   CAST(sum(v) AS BIGINT) AS resized_checksum,
                   CAST(sum(v) AS BIGINT) / {float(_RESAMPLE_N)}
                       AS resized_mean
            FROM aud_vals GROUP BY doc_id
        ),
        aud_empty AS (
            SELECT doc_id, 'audio' AS modality, 'wav' AS container,
                   CAST(0 AS BIGINT) AS n_in_units,
                   CAST({_RESAMPLE_N} AS BIGINT) AS n_out_units,
                   CAST(NULL AS BIGINT) AS resized_checksum,
                   CAST(NULL AS DOUBLE) AS resized_mean
            FROM aud WHERE n = 0
        ),
        vid AS (
            SELECT doc_id, text, n,
                   greatest(CAST(ceil(n / {_VID_FRAME_UNITS}.0) AS BIGINT), 1)
                       AS nf
            FROM base WHERE modality = 'video' AND text IS NOT NULL
        ),
        vid_vals AS (
            -- temporal floor-sample to {_VID_OUT_FRAMES} frames, then
            -- 2x spatial decimation of the 8x8 luma plane (frame f's Y
            -- plane is bytes [f*{_VID_FRAME_UNITS}, f*{_VID_FRAME_UNITS}+{_VID_W * _VID_H}))
            SELECT doc_id, nf * {_VID_FRAME_UNITS} AS n_in,
                   ((t.i * nf) // {_VID_OUT_FRAMES}) * {_VID_FRAME_UNITS}
                   + ((r.j * {_VID_H}) // {_RESIZE_DIM}) * {_VID_W}
                   + (c.m * {_VID_W}) // {_RESIZE_DIM} AS flat,
                   text, n
            FROM vid,
                 unnest(range(0, {_VID_OUT_FRAMES})) AS t(i),
                 unnest(range(0, {_RESIZE_DIM})) AS r(j),
                 unnest(range(0, {_RESIZE_DIM})) AS c(m)
        ),
        vid_rows AS (
            SELECT doc_id, 'video' AS modality, 'y4m' AS container,
                   CAST(max(n_in) AS BIGINT) AS n_in_units,
                   CAST({_VID_OUT_FRAMES * _RESIZE_DIM * _RESIZE_DIM} AS BIGINT)
                       AS n_out_units,
                   CAST(sum(CASE WHEN flat < n
                            THEN unicode(substr(text, CAST(flat + 1 AS INT), 1))
                            ELSE 0 END) AS BIGINT) AS resized_checksum,
                   CAST(sum(CASE WHEN flat < n
                            THEN unicode(substr(text, CAST(flat + 1 AS INT), 1))
                            ELSE 0 END) AS BIGINT)
                       / {float(_VID_OUT_FRAMES * _RESIZE_DIM * _RESIZE_DIM)}
                       AS resized_mean
            FROM vid_vals GROUP BY doc_id
        ),
        null_rows AS (
            -- missing media is NOT an empty clip: NULL end-to-end
            -- (the meta/features convention, r12 NULL-payload sweep)
            SELECT doc_id, modality, CAST(NULL AS VARCHAR) AS container,
                   CAST(NULL AS BIGINT) AS n_in_units,
                   CAST(NULL AS BIGINT) AS n_out_units,
                   CAST(NULL AS BIGINT) AS resized_checksum,
                   CAST(NULL AS DOUBLE) AS resized_mean
            FROM base WHERE text IS NULL
        )
        SELECT * FROM img_rows
        UNION ALL SELECT * FROM aud_rows
        UNION ALL SELECT * FROM aud_empty
        UNION ALL SELECT * FROM vid_rows
        UNION ALL SELECT * FROM null_rows
    """,
    "multimodal_neardup": f"""
        WITH blocks AS ({_PHASH_BLOCKS_SQL}),
        losers AS (
            SELECT DISTINCT b.doc_id
            FROM blocks a JOIN blocks b
              ON a.doc_id < b.doc_id AND ({_PHASH_ANY_BLOCK_SQL})
            WHERE {_PHASH_HAMMING_SQL} <= 3
        )
        SELECT k.doc_id,
               {_MODALITY_SQL} AS modality,
               printf('%04x%04x%04x%04x',
                      CAST(k.blk1 AS INT), CAST(k.blk2 AS INT),
                      CAST(k.blk3 AS INT), CAST(k.blk4 AS INT)) AS phash
        FROM blocks k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    "multimodal_decoded_stats": f"""
        WITH base AS (
            SELECT doc_id,
                   {_MODALITY_SQL} AS modality,
                   text,
                   octet_length(encode(text)) AS n,
                   COALESCE(CAST(list_sum({_BYTE_LIST}) AS BIGINT), 0) AS s,
                   COALESCE(list_sum(list_transform({_BYTE_LIST},
                       b -> CAST(b AS DOUBLE) * b)), 0.0) AS sq,
                   COALESCE(list_max({_BYTE_LIST}), 0) AS mx,
                   COALESCE(list_max(list_transform({_BYTE_LIST},
                       b -> abs(b - 128))), 0) AS mxc
            FROM documents
            WHERE text IS NOT NULL
        ),
        img AS (
            SELECT *,
                   greatest(CAST(ceil(n / 3.0) AS BIGINT), 1) AS npix
            FROM base WHERE modality = 'image'
        ),
        img2 AS (
            SELECT *, CAST(ceil(sqrt(npix)) AS BIGINT) AS w FROM img
        ),
        img3 AS (
            SELECT *,
                   w * CAST(ceil(npix / CAST(w AS DOUBLE)) AS BIGINT) * 3
                       AS units
            FROM img2
        )
        SELECT doc_id, modality, 'wav' AS container,
               CAST(n AS BIGINT) AS n_units,
               CASE WHEN n = 0 THEN NULL
                    ELSE ((s - 128.0 * n) * 256.0) / n END AS mean_level,
               CASE WHEN n = 0 THEN NULL
                    ELSE sqrt((sq - 256.0 * s + 16384.0 * n) * 65536.0 / n)
               END AS rms_level,
               CASE WHEN n = 0 THEN NULL
                    ELSE 256.0 * mxc END AS peak_level
        FROM base WHERE modality = 'audio'
        UNION ALL
        SELECT doc_id, modality, 'ppm', CAST(units AS BIGINT),
               s / CAST(units AS DOUBLE),
               sqrt(sq / units),
               CAST(mx AS DOUBLE)
        FROM img3
        UNION ALL
        SELECT doc_id, modality, 'y4m',
               CAST(greatest(CAST(ceil(n / {_VID_FRAME_UNITS}.0) AS BIGINT), 1)
                    * {_VID_FRAME_UNITS} AS BIGINT) AS n_units,
               s / CAST(greatest(CAST(ceil(n / {_VID_FRAME_UNITS}.0) AS BIGINT), 1)
                    * {_VID_FRAME_UNITS} AS DOUBLE),
               sqrt(sq / (greatest(CAST(ceil(n / {_VID_FRAME_UNITS}.0) AS BIGINT), 1)
                    * {_VID_FRAME_UNITS})),
               CAST(mx AS DOUBLE)
        FROM base WHERE modality = 'video'
        UNION ALL
        SELECT doc_id, {_MODALITY_SQL}, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE text IS NULL
    """,
    "multimodal_features": f"""
        SELECT doc_id,
               {_MODALITY_SQL} AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST({_BYTESUM_SQL.format(src="text")} % 256 AS BIGINT)
                   AS checksum,
               CAST(octet_length(encode(text)) AS DOUBLE) AS f0,
               CAST({_BYTESUM_SQL.format(src="text")} % 256 AS DOUBLE) AS f1,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(unicode(substr(text, 1, 1)) AS DOUBLE)
               END AS f2,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(unicode(substr(text, length(text), 1)) AS DOUBLE)
               END AS f3
        FROM documents
        WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id, {_MODALITY_SQL}, NULL, NULL, NULL, NULL, NULL, NULL
        FROM documents WHERE text IS NULL
    """,
    "multimodal_frame_sample": f"""
        WITH base AS (
            SELECT doc_id, {_MODALITY_SQL} AS modality, text
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, modality,
               CAST(fi AS BIGINT) AS frame_idx,
               CAST(length(chunk) AS BIGINT) AS frame_bytes,
               CAST({_BYTESUM_SQL.format(src="chunk")} % 256 AS BIGINT)
                   AS frame_checksum
        FROM (
            SELECT doc_id, modality, text, fi,
                   substr(text, CAST(fi * {_FRAME_SIZE} + 1 AS INT),
                          {_FRAME_SIZE}) AS chunk
            FROM base,
                 unnest(range(0,
                     greatest(CAST(ceil(length(text) / {_FRAME_SIZE}.0)
                                   AS BIGINT), 1),
                     {_FRAME_STRIDE})) AS t(fi)
            WHERE modality <> 'video'
        )
        UNION ALL
        -- video: REAL decoded y4m frames — always {_VID_FRAME_UNITS}
        -- plane bytes per frame; the checksum over zero-padded planes
        -- equals the sum over the raw byte window
        SELECT doc_id, modality,
               CAST(fi AS BIGINT) AS frame_idx,
               CAST({_VID_FRAME_UNITS} AS BIGINT) AS frame_bytes,
               CAST({_BYTESUM_SQL.format(src="chunk")} % 256 AS BIGINT)
                   AS frame_checksum
        FROM (
            SELECT doc_id, modality, text, fi,
                   substr(text, CAST(fi * {_VID_FRAME_UNITS} + 1 AS INT),
                          {_VID_FRAME_UNITS}) AS chunk
            FROM base,
                 unnest(range(0,
                     greatest(CAST(ceil(length(text) / {_VID_FRAME_UNITS}.0)
                                   AS BIGINT), 1),
                     {_FRAME_STRIDE})) AS t(fi)
            WHERE modality = 'video'
        )
    """,
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

# Shared persisted kernels for explicit family_build:* bench rows (see
# operators/dedup.py FAMILY_BUILDS for the convention).
FAMILY_CONSUMERS = {
    "phash_sigs": ("multimodal_neardup",),
}

FAMILY_BUILDS = {
    # perceptual-hash signature relation: multimodal_phash's output,
    # persisted and reused by multimodal_neardup's block-LSH pass
    "phash_sigs": lambda spark, sf_dir: [
        multimodal_phash(spark, sf_dir).persist()
    ],
}
