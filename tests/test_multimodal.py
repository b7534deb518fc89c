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


def test_frame_sample_covers_every_nth_frame(spark, sf_dir):
    texts = _texts(spark, sf_dir)
    by_doc: dict[int, list] = {}
    for r in M.multimodal_frame_sample(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    fs, stride = M._FRAME_SIZE, M._FRAME_STRIDE
    for doc_id, data in texts.items():
        frames = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        n_frames = max(1, (len(data) + fs - 1) // fs)
        expected_idxs = list(range(0, n_frames, stride))
        assert [f.frame_idx for f in frames] == expected_idxs
        for f in frames:
            chunk = data[f.frame_idx * fs : (f.frame_idx + 1) * fs]
            assert f.frame_bytes == len(chunk)
            assert f.frame_checksum == sum(chunk) % 256
