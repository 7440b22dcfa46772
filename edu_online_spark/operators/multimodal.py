"""Multimodal column handling (extension surface).

Pattern for 100 TB media pipelines: media lives as opaque `binary`
columns (or object-store URIs) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over `mapInPandas`, so each task holds only its batch of
payloads and the pipeline shape (schema in → schema out) is explicit.

No media libraries ship in this container, so the actual pixel/sample
decode is STUBBED — `decode_stub_batch` derives deterministic fake
metadata from the payload bytes (and `decode_real` raises
NotImplementedError where Pillow/ffmpeg would plug in). Everything
around the stub — binary column synthesis, schema, batching,
partitioning, the mapInPandas contract — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load_table

# Output schema of the decode stage — what a real image/audio decoder
# would emit (dims, duration, frame count) plus lineage columns.
DECODED_META = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def synth_assets(documents: DataFrame) -> DataFrame:
    """Synthesize a media-asset table: document text bytes stand in for
    encoded payloads. Shape matches schemas.MEDIA_ASSETS."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("byte_len"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta"),
    )


def decode_real(payload: bytes, media_type: str):
    """Where Pillow / soundfile / pyav would decode the payload.

    Kept as an explicit extension point: the container ships no media
    libraries, so calling this raises."""
    raise NotImplementedError(
        "media decode requires Pillow/ffmpeg — not available in this "
        "environment; decode_stub_batch provides the deterministic stand-in"
    )


def decode_stub_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode stage (STUB decode, real plumbing).

    Deterministic fake dimensions derived from payload size — replace
    the three arithmetic lines with decode_real() when media libs exist.
    Operates on whole Arrow batches; never materializes more than one
    batch per task.
    """
    for pdf in batches:
        n = pdf["payload"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": n,
                "width": (n % 640).astype("int32"),
                "height": ((n * 7) % 480).astype("int32"),
                "n_frames": ((n % 30) + 1).astype("int32"),
            }
        )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Run the decode stage over the asset table.

    `repartition` by asset_id first on real data so payload bytes spread
    evenly across tasks (skipped here: testdata payloads are tiny)."""
    return assets.mapInPandas(decode_stub_batch, DECODED_META)


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas 1→N stage: emit one row per sampled frame (every 5th
    of n_frames). With a real decoder each row would carry the frame
    bytes; the stub carries the frame index + deterministic pseudo-size.
    The expansion happens inside the Arrow batch — no driver fan-out —
    and is fully vectorized: np.repeat builds the per-asset row fan-out
    and a cumulative-offset trick produces each asset's 0,5,10,…
    frame-index sequence without a Python-level loop over rows.
    """
    import numpy as np

    for pdf in batches:
        n = pdf["payload"].map(len).to_numpy(dtype="int64")
        n_frames = (n % 30) + 1
        k = (n_frames + 4) // 5  # sampled frames per asset (step 5)
        asset_ids = np.repeat(pdf["asset_id"].to_numpy(dtype="int64"), k)
        lens = np.repeat(n, k)
        # global arange minus each asset's starting offset → per-asset
        # 0..k_i-1 counters, scaled by the stride
        starts = np.repeat(np.cumsum(k) - k, k)
        frame_idx = ((np.arange(k.sum()) - starts) * 5).astype("int32")
        frame_bytes = (lens * (frame_idx + 1)) % 10_000
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(asset_ids, dtype="int64"),
                "frame_idx": pd.Series(frame_idx, dtype="int32"),
                "frame_bytes": pd.Series(frame_bytes, dtype="int64"),
            }
        )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(assets: DataFrame) -> DataFrame:
    """Frame sampling over video assets only — the filter prunes before
    the Python stage so non-video payloads never cross the Arrow boundary."""
    videos = assets.filter(F.col("media_type") == "video")
    return videos.mapInPandas(frame_sample_batch, FRAME_SAMPLE_SCHEMA)


RESIZE_W, RESIZE_H = 64, 48

RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_len", LongType()),
    ]
)


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas resize stage (STUB resample, real plumbing).

    A real implementation decodes pixels and resamples to RESIZE_W ×
    RESIZE_H; the stand-in produces a deterministic fixed-size
    pseudo-thumbnail by striding the payload bytes to exactly W·H bytes
    (cycling when the payload is shorter) — same output schema, same
    batch discipline, binary-in → binary-out proven through Arrow both
    directions.
    """
    import numpy as np

    size = RESIZE_W * RESIZE_H
    for pdf in batches:
        thumbs = []
        for payload in pdf["payload"]:
            buf = np.frombuffer(payload, dtype=np.uint8)
            if len(buf) == 0:
                buf = np.zeros(1, dtype=np.uint8)
            idx = (np.arange(size) * max(len(buf) // size, 1)) % len(buf)
            thumbs.append(buf[idx].tobytes())
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": pd.Series([RESIZE_W] * len(pdf), dtype="int32"),
                "height": pd.Series([RESIZE_H] * len(pdf), dtype="int32"),
                "thumb": thumbs,
                "thumb_len": pd.Series([size] * len(pdf), dtype="int64"),
            }
        )


def resize_images(assets: DataFrame) -> DataFrame:
    """Thumbnail stage over image assets only (filter prunes before the
    Arrow boundary, like sample_frames)."""
    images = assets.filter(F.col("media_type") == "image")
    return images.mapInPandas(resize_batch, RESIZED_SCHEMA)


AUDIO_FEAT_DIM = 8

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("n_bytes", IntegerType()),
    ]
)


def audio_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature-extraction stage (STUB features, real
    plumbing): per asset, window the payload bytes into AUDIO_FEAT_DIM
    equal spans and emit the mean byte value per span (plus the raw
    payload byte count as `n_bytes`) — a deterministic
    stand-in with the exact shape of an MFCC/embedding extractor
    (binary → fixed-length float vector), vectorized per batch.
    """
    import numpy as np

    for pdf in batches:
        feats, n_bytes = [], []
        for payload in pdf["payload"]:
            buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            if len(buf) == 0:
                buf = np.zeros(1)
            spans = np.array_split(buf, AUDIO_FEAT_DIM)
            feats.append([float(s.mean()) if len(s) else 0.0 for s in spans])
            n_bytes.append(len(buf))
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "features": feats,
                "n_bytes": pd.Series(n_bytes, dtype="int32"),
            }
        )


def audio_feature_vectors(assets: DataFrame) -> DataFrame:
    """Feature extraction over audio assets only."""
    audio = assets.filter(F.col("media_type") == "audio")
    return audio.mapInPandas(audio_features_batch, AUDIO_FEATURES_SCHEMA)


def media_summary(decoded: DataFrame) -> DataFrame:
    """Post-decode roll-up: asset volume and dimensions per media type."""
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("byte_len").alias("total_bytes"),
        F.avg(F.col("width").cast("double")).alias("avg_width"),
        F.max("n_frames").alias("max_frames"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_decoded_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_assets(synth_assets(load_table(spark, sf_dir, "documents")))


def q_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_summary(
        decode_assets(synth_assets(load_table(spark, sf_dir, "documents")))
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synth_assets(load_table(spark, sf_dir, "documents")))


def q_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # registry projection drops the binary thumb: metadata is oracle-
    # checkable cross-engine, the byte content is pinned by
    # tests/test_multimodal.py (DuckDB can't index blob bytes to
    # reproduce the striding arithmetic)
    return resize_images(synth_assets(load_table(spark, sf_dir, "documents"))).select(
        "asset_id", "width", "height", "thumb_len"
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_feature_vectors(synth_assets(load_table(spark, sf_dir, "documents")))


def payload_dedup(assets: DataFrame) -> DataFrame:
    """Exact dedup over the BINARY payload column — content-hash
    grouping, the multimodal sibling of dedup.exact_dedup: identical
    media bytes collapse to one survivor regardless of asset id or
    metadata. sha2 reduces each payload to a 32-byte key BEFORE the
    shuffle (the bytes themselves never shuffle)."""
    return (
        assets.groupBy(F.sha2("payload", 256).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("asset_id").alias("survivor_id"),
        )
    )


def q_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return payload_dedup(synth_assets(load_table(spark, sf_dir, "documents")))


QUERIES = {
    "multimodal_decoded_meta": q_decoded_meta,
    "multimodal_media_summary": q_media_summary,
    "multimodal_frame_sample": q_frame_sample,
    "multimodal_resized": q_resized,
    # rows-only: features are means over UTF-8 BYTE spans; DuckDB string
    # ops are codepoint-based, so the arithmetic isn't reproducible in
    # SQL — pinned by tests/test_multimodal.py instead
    "multimodal_audio_features": q_audio_features,
    "multimodal_payload_dedup": q_payload_dedup,
}

# The stub decode is pure arithmetic on byte length, so the oracle can
# reproduce it: strlen() in DuckDB is byte length.
_DECODED_SQL = """
    SELECT doc_id AS asset_id,
           ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(strlen(text) % 640 AS INTEGER) AS width,
           CAST((strlen(text) * 7) % 480 AS INTEGER) AS height,
           CAST((strlen(text) % 30) + 1 AS INTEGER) AS n_frames
    FROM documents
"""

ORACLE = {
    # payload bytes are the document's UTF-8 text bytes by construction,
    # and DuckDB's sha256(VARCHAR) hashes UTF-8 — both engines hash the
    # same byte string to the same lowercase hex
    "multimodal_payload_dedup": """
        SELECT sha256(text) AS content_hash,
               count(*) AS n_copies,
               min(doc_id) AS survivor_id
        FROM documents
        GROUP BY 1
    """,
    "multimodal_decoded_meta": _DECODED_SQL,
    # images are doc_id % 3 == 0 (list index 1); thumbnail metadata is
    # constant by construction
    "multimodal_resized": f"""
        SELECT doc_id AS asset_id,
               CAST({RESIZE_W} AS INTEGER) AS width,
               CAST({RESIZE_H} AS INTEGER) AS height,
               CAST({RESIZE_W * RESIZE_H} AS BIGINT) AS thumb_len
        FROM documents WHERE doc_id % 3 = 0
    """,
    # videos are doc_id % 3 == 2 (list index 3); every 5th frame of
    # (strlen % 30) + 1 frames, stub frame size (strlen·(fi+1)) % 10000
    "multimodal_frame_sample": """
        SELECT asset_id, CAST(fi AS INTEGER) AS frame_idx,
               CAST((ln * (fi + 1)) % 10000 AS BIGINT) AS frame_bytes
        FROM (
            SELECT doc_id AS asset_id, strlen(text) AS ln,
                   unnest(range(0, (strlen(text) % 30) + 1, 5)) AS fi
            FROM documents WHERE doc_id % 3 = 2
        )
    """,
    "multimodal_media_summary": f"""
        WITH decoded AS ({_DECODED_SQL})
        SELECT media_type, count(*) AS n_assets,
               CAST(sum(byte_len) AS BIGINT) AS total_bytes,
               avg(width::DOUBLE) AS avg_width,
               CAST(max(n_frames) AS INTEGER) AS max_frames
        FROM decoded GROUP BY media_type
    """,
}
