"""Value-level checks for the rows-only multimodal queries: the fake
decoder is deterministic byte statistics, so every emitted number is
predictable from the source text — verify the Arrow plumbing end to end
against Python-computed expectations."""

from __future__ import annotations

from postgres_cdc_plugin_spark.operators import multimodal as M
from postgres_cdc_plugin_spark.session import load

_MOD = {0: "image", 1: "audio", 2: "video"}


def _texts(spark, sf_dir):
    return {
        r.doc_id: r.text.encode("utf-8")
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


def test_feature_vectors_match_byte_statistics(spark, sf_dir):
    texts = _texts(spark, sf_dir)
    rows = {
        r.doc_id: r
        for r in M.multimodal_feature_vectors(spark, sf_dir).collect()
    }
    assert set(rows) == set(texts)
    for doc_id, data in texts.items():
        r = rows[doc_id]
        assert r.modality == _MOD[doc_id % 3]
        assert r.n_bytes == len(data)
        assert r.checksum == sum(data) % 256
        assert r.features == [
            float(len(data)),
            float(sum(data) % 256),
            float(data[0]),
            float(data[-1]),
        ]


def test_declared_features_query_is_scalar_only(spark, sf_dir):
    """The driver's rows-only canonicalizer sorts a pandas frame — any
    array/map column crashes it (CORRECTNESS_r02). The declared query
    must therefore stay scalar-typed, with values matching the array
    form element-wise."""
    df = M.multimodal_features(spark, sf_dir)
    for field in df.schema.fields:
        assert not field.dataType.typeName() in ("array", "map", "struct"), (
            f"{field.name} is {field.dataType}: not driver-canonicalizable"
        )
    rows = {r.doc_id: r for r in df.collect()}
    texts = _texts(spark, sf_dir)
    for doc_id, data in texts.items():
        r = rows[doc_id]
        assert [r.f0, r.f1, r.f2, r.f3] == [
            float(len(data)),
            float(sum(data) % 256),
            float(data[0]),
            float(data[-1]),
        ]


def test_wav_synth_decode_roundtrip():
    """decode_payload parses a real RIFF container: samples round-trip
    the deterministic (b-128)<<8 mapping exactly."""
    import numpy as np

    data = bytes(range(256))
    samples, rate = M.decode_payload(M.synth_wav_payload(data), "audio")
    assert rate == M._WAV_RATE
    expected = (np.arange(256, dtype=np.int16) - 128) * 256
    assert samples.tolist() == expected.tolist()


def test_ppm_synth_decode_roundtrip():
    data = b"abcdefghijkl"  # 12 bytes -> 4 pixels -> 2x2 raster
    pixels = M.decode_payload(M.synth_ppm_payload(data), "image")
    assert pixels.shape == (2, 2, 3)
    assert pixels.ravel().tobytes() == data


def test_y4m_synth_decode_roundtrip():
    import numpy as np

    # 200 bytes -> 2 frames of 192 C444 plane bytes (zero-padded)
    data = bytes(range(200))
    frames = M.decode_payload(M.synth_y4m_payload(data), "video")
    assert frames.shape == (2, 3, M._VID_H, M._VID_W)
    flat = frames.reshape(-1)
    assert flat[:200].tobytes() == data
    assert not flat[200:].any()
    # empty payload still yields one all-zero frame
    empty = M.decode_payload(M.synth_y4m_payload(b""), "video")
    assert empty.shape == (1, 3, M._VID_H, M._VID_W)
    assert not empty.any()
    assert isinstance(frames, np.ndarray)


def test_decode_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        M.decode_payload(b"this is not a wav", "audio")
    with pytest.raises(ValueError):
        M.decode_payload(b"P5\n2 2\n255\nxxxx", "image")  # P5 != P6
    with pytest.raises(ValueError):
        M.decode_payload(b"anything", "video")  # no YUV4MPEG2 magic
    with pytest.raises(ValueError):  # frame shorter than promised
        M.decode_payload(b"YUV4MPEG2 W8 H8 C444\nFRAME\nxx", "video")
    with pytest.raises(ValueError):  # unsupported colorspace
        M.decode_payload(b"YUV4MPEG2 W8 H8 C420\nFRAME\n" + b"\0" * 96, "video")
    with pytest.raises(NotImplementedError):  # future-modality seam
        M.decode_payload(b"anything", "hologram")


def test_decoded_stats_match_python(spark, sf_dir):
    """The Spark decode pipeline equals a driver-side python rerun of
    the same synth+decode+stats math for ALL three modalities (video
    decodes for real since r4)."""
    import numpy as np

    texts = _texts(spark, sf_dir)
    rows = {r.doc_id: r for r in M.multimodal_decoded_stats(spark, sf_dir).collect()}
    assert set(rows) == set(texts)
    for doc_id, data in texts.items():
        r = rows[doc_id]
        mod = _MOD[doc_id % 3]
        assert r.modality == mod
        if mod == "audio":
            vals, _ = M.decode_payload(M.synth_wav_payload(data), "audio")
            vals = vals.astype(np.float64)
            assert r.container == "wav"
        elif mod == "video":
            vals = M.decode_payload(
                M.synth_y4m_payload(data), "video"
            ).astype(np.float64).ravel()
            assert r.container == "y4m"
        else:
            vals = M.decode_payload(
                M.synth_ppm_payload(data), "image"
            ).astype(np.float64).ravel()
            assert r.container == "ppm"
        assert r.n_units == vals.size
        assert abs(r.mean_level - vals.mean()) < 1e-4
        assert abs(r.rms_level - np.sqrt((vals * vals).mean())) < 1e-3
        assert abs(r.peak_level - np.abs(vals).max()) < 1e-4


def test_decoded_stats_empty_payload_yields_null_stats(spark):
    """A zero-byte payload (text='') decodes to zero samples — the
    worker must emit NULL stats for audio, not crash on an empty numpy
    reduction (code-review fix)."""
    import pandas as pd

    batches = list(
        M._decoded_stats_batches(
            iter(
                [
                    pd.DataFrame(
                        {
                            "doc_id": [1, 2, 3],
                            "modality": ["audio", "image", "video"],
                            "payload": [b"", b"", b""],
                        }
                    )
                ]
            )
        )
    )
    rows = {r.doc_id: r for _, r in pd.concat(batches).iterrows()}
    assert rows[1].container == "wav" and rows[1].n_units == 0
    assert pd.isna(rows[1].mean_level) and pd.isna(rows[1].peak_level)
    # the image branch pads b'' to one zero pixel (3 zero bytes)
    assert rows[2].container == "ppm" and rows[2].n_units == 3
    assert rows[2].mean_level == 0.0
    # the video branch pads b'' to one all-zero 8x8 C444 frame
    assert rows[3].container == "y4m"
    assert rows[3].n_units == M._VID_FRAME_UNITS
    assert rows[3].mean_level == 0.0 and rows[3].peak_level == 0.0


def test_phash_properties():
    """Deterministic, block-bounded, identical payloads collide, and a
    single-byte edit stays within a small hamming distance."""
    data = ("the quick brown fox " * 40).encode()
    b = M.phash64_blocks(data)
    assert b == M.phash64_blocks(bytes(data))
    assert all(0 <= x < (1 << 16) for x in b)
    edited = bytearray(data)
    edited[100] ^= 0x04
    e = M.phash64_blocks(bytes(edited))
    hamming = sum(bin(x ^ y).count("1") for x, y in zip(b, e))
    assert hamming <= 3, hamming
    assert M.phash64_blocks(b"") == (0, 0, 0, 0)


def test_multimodal_neardup_drops_phash_collisions(spark, sf_dir):
    """Survivors = docs minus keep-lowest losers of verified pHash
    pairs; every emitted phash is the hex form of the doc's blocks."""
    sigs = {r.doc_id: r for r in M.multimodal_phash(spark, sf_dir).collect()}
    out = {r.doc_id: r for r in M.multimodal_neardup(spark, sf_dir).collect()}
    assert set(out) <= set(sigs)
    texts = _texts(spark, sf_dir)
    # python-side reference: block-LSH candidates + hamming<=3 verify
    import itertools

    losers = set()
    by_block: dict[tuple, list] = {}
    for d, r in sigs.items():
        for k in range(1, 5):
            by_block.setdefault((k, r[f"blk{k}"]), []).append(d)
    cands = set()
    for ds in by_block.values():
        for a, b in itertools.combinations(sorted(ds), 2):
            cands.add((a, b))
    for a, b in cands:
        h = sum(
            bin(sigs[a][f"blk{k}"] ^ sigs[b][f"blk{k}"]).count("1")
            for k in range(1, 5)
        )
        if h <= 3:
            losers.add(b)
    assert set(out) == set(sigs) - losers
    for d, r in out.items():
        expect = "".join(f"{sigs[d][f'blk{k}']:04x}" for k in range(1, 5))
        assert r.phash == expect
    assert set(out) <= set(texts)


def test_frame_sample_covers_every_nth_frame(spark, sf_dir):
    texts = _texts(spark, sf_dir)
    by_doc: dict[int, list] = {}
    for r in M.multimodal_frame_sample(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    stride = M._FRAME_STRIDE
    for doc_id, data in texts.items():
        frames = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        # video samples REAL y4m frames (192 padded plane bytes each);
        # image/audio keep the byte-window pseudo-frames
        fs = M._VID_FRAME_UNITS if _MOD[doc_id % 3] == "video" else M._FRAME_SIZE
        n_frames = max(1, (len(data) + fs - 1) // fs)
        expected_idxs = list(range(0, n_frames, stride))
        assert [f.frame_idx for f in frames] == expected_idxs
        for f in frames:
            chunk = data[f.frame_idx * fs : (f.frame_idx + 1) * fs]
            if _MOD[doc_id % 3] == "video":
                assert f.frame_bytes == M._VID_FRAME_UNITS
            else:
                assert f.frame_bytes == len(chunk)
            assert f.frame_checksum == sum(chunk) % 256
