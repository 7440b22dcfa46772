"""Multimodal stages whose byte-level arithmetic the SQL oracle can't
reproduce (DuckDB string ops are codepoint-based): thumbnail striding
and audio feature windows, pinned against a Python reference."""

from __future__ import annotations

import numpy as np

from edu_online_spark.operators.multimodal import (
    AUDIO_FEAT_DIM,
    RESIZE_H,
    RESIZE_W,
    audio_feature_vectors,
    resize_images,
    synth_assets,
)


def _assets(spark):
    docs = spark.createDataFrame(
        [
            (0, "an image payload with some words", "en", "src1"),
            (1, "audio-ish bytes here for the feature stage", "en", "src1"),
            (3, "x", "en", "src2"),  # image with a 1-byte payload (cycle path)
            (4, "second audio payload", "en", "src2"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    return synth_assets(docs)


def _expected_thumb(payload: bytes) -> bytes:
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    size = RESIZE_W * RESIZE_H
    idx = (np.arange(size) * max(len(buf) // size, 1)) % len(buf)
    return buf[idx].tobytes()


def test_resize_thumbnails_deterministic(spark):
    out = {r["asset_id"]: r for r in resize_images(_assets(spark)).collect()}
    assert set(out) == {0, 3}  # doc_id % 3 == 0 → image
    for doc_id, text in [(0, "an image payload with some words"), (3, "x")]:
        r = out[doc_id]
        assert (r["width"], r["height"]) == (RESIZE_W, RESIZE_H)
        assert bytes(r["thumb"]) == _expected_thumb(text.encode())
        assert r["thumb_len"] == RESIZE_W * RESIZE_H


def test_audio_features_are_span_means(spark):
    out = {r["asset_id"]: r for r in audio_feature_vectors(_assets(spark)).collect()}
    assert set(out) == {1, 4}  # doc_id % 3 == 1 → audio
    for doc_id, text in [(1, "audio-ish bytes here for the feature stage"),
                         (4, "second audio payload")]:
        buf = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64)
        expected = [float(s.mean()) for s in np.array_split(buf, AUDIO_FEAT_DIM)]
        got = out[doc_id]
        assert got["n_bytes"] == len(buf)
        assert list(got["features"]) == expected
