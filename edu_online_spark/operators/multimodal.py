"""Multimodal column handling (extension surface).

Pattern for 100 TB media pipelines: media lives as opaque `binary`
columns (or object-store URIs) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over `mapInPandas`, so each task holds only its batch of
payloads and the pipeline shape (schema in → schema out) is explicit.

The payloads are REAL container formats built and parsed with stdlib
`struct` — no media libraries needed:

- images are valid 24-bpp BMP files (14-byte file header + 40-byte
  BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes);
- audio is valid 16-bit mono PCM WAV (RIFF/fmt/data chunk walk);
- video is a toy-but-parsed container (`VID0` magic, frame count,
  length-prefixed BMP frames) standing in for MP4, whose real parse
  needs ffmpeg.

So the decode stage genuinely reads dimensions, sample rates, and
frame tables out of the bytes; resize genuinely resamples pixels
(nearest-neighbor over the decoded BGR grid); audio features are
genuinely span means over decoded int16 samples. Payload parameters
are deterministic functions of doc_id, which is what lets the DuckDB
oracles verify the write→parse round-trip arithmetically without
parsing bytes themselves. Codec formats beyond these (JPEG, FLAC,
MP4…) would slot into the same `_parse_*` seam via Pillow/ffmpeg;
unknown or corrupt payloads decode to NULL metadata (quarantine, not
job failure — at 100 TB a poison payload must never kill the stage).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load_table

# ---------------------------------------------------------------------------
# Payload builders (deterministic, doc_id-parameterized, real formats)
# ---------------------------------------------------------------------------

IMG_W_MOD, IMG_H_MOD = 64, 48  # image dims: (id % 64)+1 × ((id*7) % 48)+1
WAV_RATE_BASE, WAV_RATE_STEP, WAV_RATE_MOD = 8000, 1000, 8
WAV_N_MOD, WAV_N_BASE = 500, 100
VID_FRAMES_MOD = 30
FRAME_STEP = 5  # sample_frames keeps every 5th frame


def _bmp_row_size(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def _bmp_bytes(doc_id: int, frame_idx: int = 0) -> bytes:
    """A valid 24-bpp BMP whose dims and pixels derive from doc_id (and
    frame index, for video frames)."""
    w = (doc_id + frame_idx) % IMG_W_MOD + 1
    h = (doc_id * 7 + frame_idx * 3) % IMG_H_MOD + 1
    img_size = _bmp_row_size(w) * h
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    pix = (
        (doc_id * 13 + frame_idx * 11 + np.arange(img_size, dtype=np.int64) * 7) % 256
    ).astype(np.uint8)
    return file_hdr + info_hdr + pix.tobytes()


def _wav_samples(doc_id: int) -> np.ndarray:
    n = doc_id % WAV_N_MOD + WAV_N_BASE
    return (
        ((doc_id * 31 + np.arange(n, dtype=np.int64) * 17) % 65536) - 32768
    ).astype("<i2")


def _wav_bytes(doc_id: int) -> bytes:
    rate = WAV_RATE_BASE + (doc_id % WAV_RATE_MOD) * WAV_RATE_STEP
    data = _wav_samples(doc_id).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        rate,
        rate * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def _vid_bytes(doc_id: int) -> bytes:
    n_frames = doc_id % VID_FRAMES_MOD + 1
    parts = [struct.pack("<4sI", b"VID0", n_frames)]
    for fi in range(n_frames):
        frame = _bmp_bytes(doc_id, fi)
        parts.append(struct.pack("<I", len(frame)) + frame)
    return b"".join(parts)


def synth_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas payload writer: doc rows → (asset_id, media_type,
    payload, byte_len, meta) with REAL BMP/WAV/VID0 bytes."""
    builders = {"image": _bmp_bytes, "audio": _wav_bytes, "video": _vid_bytes}
    types = ["image", "audio", "video"]
    for pdf in batches:
        ids = pdf["doc_id"].astype("int64")
        mtypes = [types[i % 3] for i in ids]
        payloads = [builders[mt](int(i)) for i, mt in zip(ids, mtypes)]
        yield pd.DataFrame(
            {
                "asset_id": ids,
                "media_type": mtypes,
                "payload": payloads,
                "byte_len": pd.Series([len(p) for p in payloads], dtype="int64"),
                "meta": [
                    '{"lang":"%s","source":"%s"}' % (lg, sc)
                    for lg, sc in zip(pdf["lang"], pdf["source"])
                ],
            }
        )


MEDIA_ASSETS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("meta", StringType()),
    ]
)


def synth_media_assets(documents: DataFrame) -> DataFrame:
    """Synthesize the media-asset table with real container payloads.

    One Arrow-batched pass; at scale this stage is the ingest decoder's
    stand-in (payloads would arrive from object storage instead)."""
    return documents.select("doc_id", "lang", "source").mapInPandas(
        synth_media_batch, MEDIA_ASSETS_SCHEMA
    )


def synth_assets(documents: DataFrame) -> DataFrame:
    """Text-bytes payload variant (documents' UTF-8 bytes as payload) —
    kept for binary-dedup checks where the oracle must be able to hash
    the same bytes (DuckDB sha256 works on the VARCHAR's UTF-8)."""
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


# ---------------------------------------------------------------------------
# Decoders (stdlib struct parsing of the actual bytes)
# ---------------------------------------------------------------------------

def _parse_bmp(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from a BMP header, or None if not a BMP."""
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    w = struct.unpack_from("<i", buf, 18)[0]
    h = struct.unpack_from("<i", buf, 22)[0]
    if w <= 0 or h == 0:
        return None
    return w, abs(h)  # negative height = top-down storage


def _parse_wav(buf: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_samples) from a RIFF/WAVE chunk walk, or None."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    rate = data_len = bits = None
    off = 12
    while off + 8 <= len(buf):
        cid, sz = struct.unpack_from("<4sI", buf, off)
        if cid == b"fmt " and sz >= 16:
            _, _, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, off + 8)
        elif cid == b"data":
            data_len = sz
        off += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data_len is None or not bits:
        return None
    return rate, data_len // (bits // 8)


def _parse_vid(buf: bytes) -> tuple[int, list[tuple[int, int]]] | None:
    """(n_frames, [(frame_offset, frame_len), ...]) from the VID0 toy
    container, or None."""
    if len(buf) < 8 or buf[:4] != b"VID0":
        return None
    n_frames = struct.unpack_from("<I", buf, 4)[0]
    frames, off = [], 8
    for _ in range(n_frames):
        if off + 4 > len(buf):
            return None
        flen = struct.unpack_from("<I", buf, off)[0]
        if off + 4 + flen > len(buf):
            return None
        frames.append((off + 4, flen))
        off += 4 + flen
    return n_frames, frames


# Output schema of the decode stage — real header-derived metadata plus
# lineage columns. NULLs where a field doesn't apply to the media type
# (or the payload failed to parse).
DECODED_META = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", DoubleType()),
    ]
)


def decode_meta_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode stage: parse each payload's actual header.

    image → (width, height) from the BMP info header, n_frames = 1;
    audio → sample_rate + n_samples from the WAV chunk walk,
            duration from the two;
    video → frame count from the VID0 table, dims from frame 0's BMP.
    Unparseable payloads yield NULL metadata (quarantine posture)."""
    for pdf in batches:
        rows = {k: [] for k in ("width", "height", "n_frames", "sample_rate",
                                "duration_ms")}
        for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
            w = h = nf = rate = dur = None
            buf = bytes(payload)
            if mtype == "image":
                parsed = _parse_bmp(buf)
                if parsed:
                    (w, h), nf = parsed, 1
            elif mtype == "audio":
                parsed = _parse_wav(buf)
                if parsed:
                    rate, nf = parsed
                    dur = nf * 1000.0 / rate
            elif mtype == "video":
                parsed = _parse_vid(buf)
                if parsed:
                    nf, frames = parsed
                    if frames:
                        first = _parse_bmp(buf[frames[0][0]:frames[0][0] + frames[0][1]])
                        if first:
                            w, h = first
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_frames"].append(nf)
            rows["sample_rate"].append(rate)
            rows["duration_ms"].append(dur)
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series(rows["width"], dtype="Int32"),
                "height": pd.Series(rows["height"], dtype="Int32"),
                "n_frames": pd.Series(rows["n_frames"], dtype="Int32"),
                "sample_rate": pd.Series(rows["sample_rate"], dtype="Int32"),
                "duration_ms": pd.Series(rows["duration_ms"], dtype="float64"),
            }
        )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Run the decode stage over the asset table.

    Only (asset_id, media_type, payload) cross the Arrow boundary —
    metadata columns the decoder doesn't read (meta JSON, the stored
    byte_len) would otherwise be serialized into every batch and
    straight back out (measured ~20% of stage wall at sf0.1).

    `repartition` by asset_id first on real data so payload bytes spread
    evenly across tasks (skipped here: testdata payloads are tiny)."""
    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        decode_meta_batch, DECODED_META
    )


# ---------------------------------------------------------------------------
# Frame sampling (video): parse the container's frame table
# ---------------------------------------------------------------------------

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas 1→N stage: every FRAME_STEP-th frame from the VID0
    frame table, with each frame's REAL stored byte length. The fan-out
    happens inside the Arrow batch — no driver involvement."""
    for pdf in batches:
        ids, fidx, fbytes = [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            parsed = _parse_vid(bytes(payload))
            if not parsed:
                continue
            _, frames = parsed
            for fi in range(0, len(frames), FRAME_STEP):
                ids.append(asset_id)
                fidx.append(fi)
                fbytes.append(frames[fi][1])
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int32"),
                "frame_bytes": pd.Series(fbytes, dtype="int64"),
            }
        )


def sample_frames(assets: DataFrame) -> DataFrame:
    """Frame sampling over video assets only — the filter prunes before
    the Python stage so non-video payloads never cross the Arrow boundary."""
    videos = assets.filter(F.col("media_type") == "video").select(
        "asset_id", "payload"
    )
    return videos.mapInPandas(frame_sample_batch, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (image): real pixel decode + nearest-neighbor resample
# ---------------------------------------------------------------------------

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


def _decode_bmp_pixels(buf: bytes) -> np.ndarray | None:
    """BMP bytes → (h, w, 3) uint8 RGB array (top-down row order)."""
    parsed = _parse_bmp(buf)
    if not parsed:
        return None
    w, h = parsed
    row = _bmp_row_size(w)
    data_off = struct.unpack_from("<I", buf, 10)[0]
    if len(buf) < data_off + row * h:
        return None
    raw = np.frombuffer(buf, dtype=np.uint8, count=row * h, offset=data_off)
    bgr = raw.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]  # bottom-up → top-down, BGR → RGB


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas resize stage: decode the BMP pixel grid and resample
    to RESIZE_W × RESIZE_H RGB24 by nearest neighbor — an actual image
    operation on actual pixels, vectorized with numpy fancy indexing."""
    ys = np.arange(RESIZE_H)
    xs = np.arange(RESIZE_W)
    for pdf in batches:
        ids, thumbs = [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            img = _decode_bmp_pixels(bytes(payload))
            if img is None:
                continue
            h, w = img.shape[:2]
            thumb = img[(ys * h) // RESIZE_H][:, (xs * w) // RESIZE_W]
            ids.append(asset_id)
            thumbs.append(thumb.tobytes())
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series([RESIZE_W] * len(ids), dtype="int32"),
                "height": pd.Series([RESIZE_H] * len(ids), dtype="int32"),
                "thumb": thumbs,
                "thumb_len": pd.Series(
                    [RESIZE_W * RESIZE_H * 3] * len(ids), dtype="int64"
                ),
            }
        )


def resize_images(assets: DataFrame) -> DataFrame:
    """Thumbnail stage over image assets only (filter prunes before the
    Arrow boundary, like sample_frames)."""
    images = assets.filter(F.col("media_type") == "image")
    return images.mapInPandas(resize_batch, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash: aHash over the decoded pixel grid
# ---------------------------------------------------------------------------

AHASH_GRID = 8

AHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ahash", StringType()),
        StructField("bits_set", IntegerType()),
    ]
)


def ahash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas perceptual-hash stage: average hash (aHash) over the
    REAL decoded pixels — 8×8 nearest-neighbor downsample, integer
    grayscale, mean threshold, one bit per cell in row-major order.
    Pure integer arithmetic end to end, which is what lets the DuckDB
    oracle reproduce every bit from the payload generator's formulas:
    a mis-parsed stride, a channel swap (sum is channel-order
    independent — deliberately), or an off-by-one in the bottom-up row
    flip all flip bits and fail the hash match. Emitted as a 64-char
    bit string: portable, and engine-signedness-proof where a 64-bit
    integer with bit 63 set is not."""
    ks = np.arange(AHASH_GRID)
    for pdf in batches:
        ids, ws, hs, hashes, nbits = [], [], [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            img = _decode_bmp_pixels(bytes(payload))
            if img is None:
                continue
            h, w = img.shape[:2]
            sample = img[(ks * h) // AHASH_GRID][:, (ks * w) // AHASH_GRID]
            gray = sample.astype(np.int64).sum(axis=2) // 3
            mean = int(gray.sum()) // (AHASH_GRID * AHASH_GRID)
            bits = (gray > mean).astype(np.uint8).reshape(-1)
            ids.append(asset_id)
            ws.append(w)
            hs.append(h)
            hashes.append("".join("1" if b else "0" for b in bits))
            nbits.append(int(bits.sum()))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "ahash": hashes,
                "bits_set": pd.Series(nbits, dtype="int32"),
            }
        )


def image_ahash(assets: DataFrame) -> DataFrame:
    """Perceptual-hash stage over image assets (filter prunes before
    the Arrow boundary, like resize/sample_frames). Downstream
    near-dup blocking groups on hash prefixes exactly like SimHash's
    pigeonhole chunks — the hash is the content key, the bytes never
    shuffle."""
    images = assets.filter(F.col("media_type") == "image")
    return images.mapInPandas(ahash_batch, AHASH_SCHEMA)


WHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("whash", StringType()),
        StructField("bits_set", IntegerType()),
        StructField("dc", LongType()),
    ]
)


def whash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas SPECTRAL perceptual hash: 2-D Walsh–Hadamard
    transform of the same 8×8 integer grayscale grid aHash samples,
    one sign bit per coefficient (row-major over (u, v)). The
    classical pHash takes a DCT and thresholds low-frequency
    coefficients; the Hadamard basis is its INTEGER-EXACT sibling
    (entries ±1, H[i,j] = (−1)^popcount(i AND j)), so every
    coefficient is an exact int64 and the DuckDB mirror reproduces
    each bit from the payload generator's formula — no cosines, no
    floats, no tolerance. Sign bits of the sequency spectrum capture
    coarse structure (which half/quadrant is brighter, checkerboard
    energy) that survives brightness scaling better than aHash's
    mean threshold; the DC coefficient (total gray mass — bit 0 is
    always set for non-black images) is emitted separately as a
    tie-break/verify column."""
    ks = np.arange(AHASH_GRID)
    ij = ks[:, None] & ks[None, :]
    H = 1 - 2 * (np.unpackbits(ij.astype(np.uint8)[..., None], axis=-1)
                 .sum(axis=-1) & 1).astype(np.int64)
    for pdf in batches:
        ids, ws, hs, hashes, nbits, dcs = [], [], [], [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            img = _decode_bmp_pixels(bytes(payload))
            if img is None:
                continue
            h, w = img.shape[:2]
            sample = img[(ks * h) // AHASH_GRID][:, (ks * w) // AHASH_GRID]
            gray = sample.astype(np.int64).sum(axis=2) // 3
            coef = H @ gray @ H
            bits = (coef.reshape(-1) > 0).astype(np.uint8)
            ids.append(asset_id)
            ws.append(w)
            hs.append(h)
            hashes.append("".join("1" if b else "0" for b in bits))
            nbits.append(int(bits.sum()))
            dcs.append(int(coef[0, 0]))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "whash": hashes,
                "bits_set": pd.Series(nbits, dtype="int32"),
                "dc": pd.Series(dcs, dtype="int64"),
            }
        )


def image_whash(assets: DataFrame) -> DataFrame:
    """Walsh–Hadamard spectral hash over image assets — the second,
    structurally different perceptual key next to aHash (spatial mean
    threshold vs sequency-domain signs): two independent 64-bit views
    of the same pixels make banded near-dup blocking far more
    selective, the same reason MinHash and SimHash coexist on text.

    Queued for round 14 (`multimodal_image_whash`, ORACLE_R14)."""
    images = assets.filter(F.col("media_type") == "image")
    return images.mapInPandas(whash_batch, WHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Audio fingerprint: span-threshold bits over decoded PCM
# ---------------------------------------------------------------------------

AFP_BITS = 64

AFP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("afp", StringType()),
        StructField("bits_set", IntegerType()),
    ]
)


def audio_fingerprint_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas audio fingerprint: 64 span-energy bits over the
    decoded int16 PCM — span j's bit is set iff its mean exceeds the
    track mean. Threshold compares run as INTEGER cross-products
    (span_sum·n_total > total_sum·span_n), never divisions, so every
    bit is exact and the oracle reproduces the fingerprint from the
    sample generator's formula."""
    for pdf in batches:
        ids, ns, fps, nbits = [], [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = bytes(payload)
            parsed = _parse_wav(buf)
            if not parsed:
                continue
            _, n = parsed
            samples = np.frombuffer(buf, dtype="<i2", count=n, offset=44).astype(
                np.int64
            )
            span = (np.arange(n) * AFP_BITS) // n
            s_sum = np.bincount(span, weights=samples, minlength=AFP_BITS).astype(
                np.int64
            )
            s_n = np.bincount(span, minlength=AFP_BITS).astype(np.int64)
            total = int(samples.sum())
            bits = (s_sum * n) > (total * np.maximum(s_n, 1))
            bits &= s_n > 0  # empty spans (n < 64) stay 0
            ids.append(asset_id)
            ns.append(n)
            fps.append("".join("1" if b else "0" for b in bits))
            nbits.append(int(bits.sum()))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="int32"),
                "afp": fps,
                "bits_set": pd.Series(nbits, dtype="int32"),
            }
        )


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """Fingerprint stage over audio assets (filter prunes before the
    Arrow boundary)."""
    return assets.filter(F.col("media_type") == "audio").mapInPandas(
        audio_fingerprint_batch, AFP_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video scene cuts: per-frame signature deltas
# ---------------------------------------------------------------------------

SCENE_CUT_THRESHOLD = 8  # mean-brightness delta (integer, exact compare)

SCENECUT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("row_sum", LongType()),
        StructField("row_n", IntegerType()),
        StructField("is_cut", BooleanType()),
    ]
)


def scenecut_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas scene-cut detection: decode each frame, take the
    first display row's byte sum/count as the frame signature, and flag
    a cut when consecutive means differ by > SCENE_CUT_THRESHOLD —
    compared as the integer cross-product |s_f·n_p − s_p·n_f| >
    T·n_f·n_p (frames differ in width, so the means have different
    denominators; cross-multiplying keeps the compare exact)."""
    for pdf in batches:
        out = {"asset_id": [], "frame_idx": [], "row_sum": [], "row_n": [], "is_cut": []}
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = bytes(payload)
            parsed = _parse_vid(buf)
            if not parsed:
                continue
            _, frames = parsed
            prev = None
            for fi, (off, ln) in enumerate(frames):
                img = _decode_bmp_pixels(buf[off : off + ln])
                if img is None:
                    continue
                s = int(img[0].astype(np.int64).sum())
                nn = int(img.shape[1] * 3)
                cut = (
                    False
                    if prev is None
                    else abs(s * prev[1] - prev[0] * nn)
                    > SCENE_CUT_THRESHOLD * nn * prev[1]
                )
                out["asset_id"].append(asset_id)
                out["frame_idx"].append(fi)
                out["row_sum"].append(s)
                out["row_n"].append(nn)
                out["is_cut"].append(bool(cut))
                prev = (s, nn)
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(out["asset_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "row_sum": pd.Series(out["row_sum"], dtype="int64"),
                "row_n": pd.Series(out["row_n"], dtype="int32"),
                "is_cut": pd.Series(out["is_cut"], dtype="bool"),
            }
        )


def video_scene_cuts(assets: DataFrame) -> DataFrame:
    """Scene-cut stage over video assets (filter prunes before the
    Arrow boundary; 1→N frame fan-out like sample_frames)."""
    return assets.filter(F.col("media_type") == "video").mapInPandas(
        scenecut_batch, SCENECUT_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio features: real sample decode + span statistics
# ---------------------------------------------------------------------------

AUDIO_FEAT_DIM = 8

AUDIO_FEATURES_SCHEMA = StructType(
    [StructField("asset_id", LongType()),
     StructField("sample_rate", IntegerType()),
     StructField("n_samples", IntegerType())]
    + [StructField(f"f{i}", DoubleType()) for i in range(AUDIO_FEAT_DIM)]
)


def audio_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature-extraction stage: decode the WAV's int16 PCM
    samples and emit the mean per span, spans assigned by
    `span(i) = i * DIM // n` — the fixed-length summary vector shape an
    MFCC/embedding extractor produces, with bincount doing the span
    sums in one vectorized pass."""
    for pdf in batches:
        out = {k: [] for k in ["asset_id", "sample_rate", "n_samples"]
               + [f"f{i}" for i in range(AUDIO_FEAT_DIM)]}
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = bytes(payload)
            parsed = _parse_wav(buf)
            if not parsed:
                continue
            rate, n = parsed
            samples = np.frombuffer(buf, dtype="<i2", count=n, offset=44).astype(
                np.float64
            )
            span = (np.arange(n) * AUDIO_FEAT_DIM) // n
            sums = np.bincount(span, weights=samples, minlength=AUDIO_FEAT_DIM)
            counts = np.bincount(span, minlength=AUDIO_FEAT_DIM)
            means = sums / np.maximum(counts, 1)
            out["asset_id"].append(asset_id)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            for i in range(AUDIO_FEAT_DIM):
                out[f"f{i}"].append(means[i])
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(out["asset_id"], dtype="int64"),
                "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                **{
                    f"f{i}": pd.Series(out[f"f{i}"], dtype="float64")
                    for i in range(AUDIO_FEAT_DIM)
                },
            }
        )


def audio_feature_vectors(assets: DataFrame) -> DataFrame:
    """Feature extraction over audio assets only."""
    audio = assets.filter(F.col("media_type") == "audio")
    return audio.mapInPandas(audio_features_batch, AUDIO_FEATURES_SCHEMA)


def media_summary(decoded: DataFrame) -> DataFrame:
    """Post-decode roll-up: asset volume and dimensions per media type.
    avg(width) skips NULLs (audio has no width) in both engines."""
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("byte_len").alias("total_bytes"),
        F.avg(F.col("width").cast("double")).alias("avg_width"),
        F.max("n_frames").alias("max_frames"),
    )


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


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

# Bump when any payload builder changes — stale cached assets would
# otherwise hash-mismatch against the rebuilt oracles.
_MEDIA_FORMAT_VERSION = 1


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-asset table for a testdata dir, synthesized ONCE and
    cached as parquet.

    The registry's multimodal queries all start from the same synthetic
    asset table; rebuilding it per query charged every decode benchmark
    ~1.7 s of Python payload synthesis that a real deployment never
    pays (payloads live in the lake — decode reads them, it doesn't
    mint them). Caching is also the honest benchmark shape: the decode
    stage's cost is scan parquet → Arrow → parse, full stop.
    Deterministic content (payloads are pure functions of doc_id), so
    cache hits cannot change results; writers stage + atomically rename
    so a concurrent first call sees either nothing or the full table.
    """
    import hashlib
    import os
    import shutil

    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|v{_MEDIA_FORMAT_VERSION}".encode()
    ).hexdigest()[:12]
    path = f"/tmp/edu_online_spark_media_cache/{key}"
    if not os.path.exists(path):
        staging = f"{path}.__staging__.{os.getpid()}"
        synth_media_assets(load_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).parquet(staging)
        try:
            os.rename(staging, path)
        except OSError:  # concurrent writer won the rename race
            shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(path)


def q_decoded_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_assets(_media(spark, sf_dir))


def q_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_summary(decode_assets(_media(spark, sf_dir)))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_media(spark, sf_dir))


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_ahash(_media(spark, sf_dir))


def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_fingerprint(_media(spark, sf_dir))


def q_video_scenecuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_scene_cuts(_media(spark, sf_dir))


def q_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # registry projection drops the binary thumb: metadata is oracle-
    # checkable cross-engine, the byte content is pinned by
    # tests/test_multimodal.py against an independent pixel reference
    return resize_images(_media(spark, sf_dir)).select(
        "asset_id", "width", "height", "thumb_len"
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_feature_vectors(_media(spark, sf_dir))


def q_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return payload_dedup(synth_assets(load_table(spark, sf_dir, "documents")))


AHASH_HAMMING_MAX = 3  # 4 pigeonhole chunks of 16 bits each


def image_ahash_neardup(
    assets: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Perceptual image near-dup detection: pairs of images whose
    64-bit aHash differs in ≤ max_hamming bits — the visual-content
    counterpart of payload_dedup (which only catches byte-identical
    copies; a re-encode, resize, or watermark defeats it, but barely
    moves the aHash).

    Two scale decisions, both measured (SCALE.md §4):
    1. DEDUP BEFORE BANDING. Perceptual hashes cluster hard — real
       corpora are full of byte-different copies of the same picture,
       and the sf1 rehearsal corpus has 16,667 images over only 251
       distinct hashes. Banding members directly would put every copy
       of a popular image in the same bucket (3.5M candidate pairs at
       sf1); banding the DISTINCT-hash relation instead yields 234.
       Identical-hash pairs are emitted directly from the group
       self-join (hamming 0 by definition — no scoring), near pairs
       are found between hash REPRESENTATIVES and expanded to members.
    2. The pigeonhole guarantee is SimHash's (dedup.simhash_pairs):
       4 chunks × 16 bits — any pair within hamming ≤ 3 agrees on ≥1
       whole chunk, so candidates come from an equi-join on
       (chunk_idx, chunk_value); exact hamming is two xor+bit_count
       integer ops on the packed 32-bit halves, not a 64-step string
       fold. The image BYTES never shuffle; the corpus never
       self-crosses.

    Output is the audit-friendly pair form (asset_a, asset_b,
    hamming); its size is the true near-dup mass (identical-copy
    groups expand to C(n,2) rows). A production collapse step would
    keep the (ahash → representative) group form instead — same
    relations, one fewer expansion join.
    """
    return bitstring_neardup_pairs(
        image_ahash(assets).select("asset_id", "ahash"), "ahash", max_hamming
    )


def audio_fp_neardup(
    assets: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Perceptual AUDIO near-dup: pairs of tracks whose 64-bit
    span-energy fingerprint differs in ≤ max_hamming bits — re-encoded
    or re-leveled copies of the same recording keep nearly the same
    energy envelope, so they collide here while byte-dedup misses
    them. Same engine as the image path (bitstring_neardup_pairs)."""
    return bitstring_neardup_pairs(
        audio_fingerprint(assets).select("asset_id", "afp"), "afp", max_hamming
    )


# Hard cap on the PAIR MASS the perceptual near-dup family may
# materialize. The plan cost of these ops is linear (hash-grain
# banding, bytes never shuffle) but the OUTPUT is quadratic in
# duplicate-cluster size — the sf10 planted-dup rehearsal measured
# 103M qualifying pairs (SCALE.md §4-r14d), and a template-heavy real
# corpus (thumbnails, logos, re-posts) would materialize petabytes of
# pair rows from exabytes of media. Past the cap the pair FORM is the
# wrong deliverable, so the guard refuses and names the cluster-grain
# alternative (linear in assets). The probe is exact and cheap: the
# identical-group mass comes from the hash histogram, the near mass
# from the (already hash-grain, collision-bounded) candidate-pair
# relation — both computed BEFORE any member-expansion join runs.
NEARDUP_PAIR_MASS_MAX = 10_000_000


def bitstring_neardup_pairs(
    sig: DataFrame,
    bits_col: str,
    max_hamming: int = AHASH_HAMMING_MAX,
    max_pairs: int | None = NEARDUP_PAIR_MASS_MAX,
) -> DataFrame:
    """Near-dup pairs over any 64-char perceptual bit-string column
    (aHash, audio fingerprint, …): dedup-before-banding + 4×16-bit
    pigeonhole + xor/bit_count hamming, exactly the scale shape the
    image docstring above derives. Input: (asset_id, <bits_col>);
    output: (asset_a, asset_b, hamming ≤ max_hamming).

    GUARDED at `max_pairs` output rows (the _guard_all_pairs
    contract, VERDICT r14 #3): the exact pair mass is probed from the
    hash histogram + hash-grain candidate pairs before any expansion
    join; past the cap it refuses and names bitstring_neardup_clusters
    (the multimodal_ahash_clusters shape — per-asset group labels,
    linear output). max_pairs=None skips the probe entirely (ADVICE
    r15 #4) for callers that have already bounded their input — the
    probe is a ~0.5 s fixed blocking job per guarded call, worth
    skipping only when the caller owns the bound; the default stays
    guarded."""
    # membership relation — read by the identical-pair join and both
    # expansion joins; materialize the signature pass once
    sig = sig.select("asset_id", F.col(bits_col).alias("hv")).localCheckpoint(
        eager=True
    )
    # identical-hash pairs: hamming 0, no banding, no scoring
    within = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.hv") == F.col("b.hv"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.lit(0).alias("hamming"),
        )
    )
    hash_pairs = _hash_candidate_pairs(sig, max_hamming)
    # --- pair-mass guard: probe the EXACT output size before any
    # member-expansion join. Identical-hash groups of n emit C(n,2)
    # rows; each (ha, hb) candidate expands to cnt_a · cnt_b rows.
    # Everything here is hash-grain (histogram + candidate pairs) —
    # decimal accumulation so a billion-copy group can't overflow the
    # probe itself. max_pairs=None: the caller owns the bound and the
    # probe (a fixed blocking job) is skipped (ADVICE r15 #4).
    if max_pairs is not None:
        counts = sig.groupBy("hv").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt")
        ).localCheckpoint(eager=True)
        dec2 = F.lit(2).cast("decimal(38,0)")
        within_mass = counts.select(
            (F.col("cnt") * (F.col("cnt") - F.lit(1)) / dec2)
            .cast("decimal(38,6)")
            .alias("m")
        )
        near_mass = (
            hash_pairs.join(
                counts.select(
                    F.col("hv").alias("ha"), F.col("cnt").alias("ca")
                ),
                "ha",
            )
            .join(
                counts.select(
                    F.col("hv").alias("hb"), F.col("cnt").alias("cb")
                ),
                "hb",
            )
            .select(
                (F.col("ca") * F.col("cb")).cast("decimal(38,6)").alias("m")
            )
        )
        # both masses in ONE action (one job, not two — the probe is a
        # fixed cost on every guarded call, so it stays as small as
        # the plan allows)
        pair_mass = int(
            within_mass.unionByName(near_mass)
            .agg(
                F.coalesce(
                    F.sum("m"), F.lit(0).cast("decimal(38,6)")
                ).alias("m")
            )
            .first()["m"]
        )
        if pair_mass > max_pairs:
            raise ValueError(
                f"bitstring_neardup_pairs over {bits_col!r} would "
                f"materialize {pair_mass} pair rows (cap {max_pairs}): "
                "pair output is quadratic in duplicate-cluster size, "
                "so past the cap the pair list is the wrong "
                "deliverable. Use bitstring_neardup_clusters (the "
                "multimodal_ahash_clusters shape) — per-asset group "
                "labels, output linear in assets — or "
                "pre-filter/sample the corpus below the cap."
            )
    near = (
        hash_pairs.join(
            sig.select(F.col("hv").alias("ha"), F.col("asset_id").alias("id_a")),
            "ha",
        )
        .join(
            sig.select(F.col("hv").alias("hb"), F.col("asset_id").alias("id_b")),
            "hb",
        )
        .select(
            F.least("id_a", "id_b").alias("asset_a"),
            F.greatest("id_a", "id_b").alias("asset_b"),
            "hamming",
        )
    )
    return within.unionByName(near)


def _hash_candidate_pairs(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(ha, hb, hamming) over the DISTINCT-hash relation of `sig`
    (asset_id, hv): 4×16-bit pigeonhole banding + xor/bit_count
    hamming, 0 < hamming ≤ max_hamming, ha < hb canonical. Hash-grain
    and collision-bounded — the shared engine of the pair form, the
    cluster form, and the pair-mass probe. Checkpointed eagerly (it
    is consumed 2-3 times by every caller)."""
    chunks = max_hamming + 1
    if 64 % chunks:
        raise ValueError("max_hamming+1 must divide 64")
    width = 64 // chunks
    # distinct-hash relation with packed 32-bit halves for cheap xor
    reps = sig.select("hv").distinct().select(
        "hv",
        F.conv(F.substring("hv", 1, 32), 2, 10).cast("long").alias("w1"),
        F.conv(F.substring("hv", 33, 32), 2, 10).cast("long").alias("w2"),
    )
    chunked = reps.select(
        "hv",
        "w1",
        "w2",
        F.posexplode(
            F.array(
                *[
                    F.substring("hv", i * width + 1, width)
                    for i in range(chunks)
                ]
            )
        ).alias("chunk", "cv"),
    )
    hamming = (
        F.bit_count(F.col("a.w1").bitwiseXOR(F.col("b.w1")))
        + F.bit_count(F.col("a.w2").bitwiseXOR(F.col("b.w2")))
    )
    return (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.hv") < F.col("b.hv")),
        )
        .select(
            F.col("a.hv").alias("ha"),
            F.col("b.hv").alias("hb"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter((F.col("hamming") > 0) & (F.col("hamming") <= max_hamming))
        .localCheckpoint(eager=True)  # hash-grain, collision-bounded
    )


def bitstring_neardup_clusters(
    sig: DataFrame, bits_col: str, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Cluster-grain perceptual near-dup — the scale path the pair
    form's mass guard names. Output (asset_id, cluster_rep): every
    asset in a visual-duplicate group labeled with the group's minimum
    asset_id, LINEAR in assets no matter how large the duplicate
    clusters are, because the quadratic pair relation is never built:
    connected components run at HASH grain (distinct hashes connected
    by hamming ≤ max_hamming edges — dedup.near_dup_clusters' pointer
    jumping over a collision-bounded graph), identical-hash groups
    collapse through their shared hash value, and the one asset-grain
    step is a group-min + an equi-join.

    Membership matches the pair form exactly: an asset appears iff it
    would appear in some pair — its hash sits in a near-edge component
    OR at least two assets share its hash."""
    sig = sig.select("asset_id", F.col(bits_col).alias("hv")).localCheckpoint(
        eager=True
    )
    hash_pairs = _hash_candidate_pairs(sig, max_hamming)
    from .dedup import near_dup_clusters

    comp = near_dup_clusters(
        hash_pairs.select(
            F.col("ha").alias("doc_a"), F.col("hb").alias("doc_b")
        )
    ).select(F.col("doc_id").alias("hv"), F.col("cluster_rep").alias("rep_hv"))
    counts = sig.groupBy("hv").agg(F.count(F.lit(1)).alias("cnt"))
    # qualifying hashes: in a near-edge component, or carrying an
    # identical-copy group — labeled by component rep (fallback: self)
    labeled = (
        counts.join(comp, "hv", "left")
        .filter(F.col("rep_hv").isNotNull() | (F.col("cnt") >= 2))
        .select("hv", F.coalesce("rep_hv", "hv").alias("label"))
    )
    members = sig.join(labeled, "hv").select("asset_id", "label")
    reps = members.groupBy("label").agg(
        F.min("asset_id").alias("cluster_rep")
    )
    return members.join(reps, "label").select("asset_id", "cluster_rep")


def video_cut_fingerprint(assets: DataFrame) -> DataFrame:
    """64-bit video fingerprint from the scene-cut PATTERN: bit j is
    set iff any cut lands in the j-th 1/64 slice of the video's frame
    range. Cut positions survive re-encoding and resolution changes
    (they are content structure, not pixel values), which makes this
    the video analogue of aHash — cheap, deterministic, and length-
    normalized so videos of different frame counts remain comparable.
    Built entirely from the certified scene-cut relation: one
    frame-count join + a (asset, slice) max + a 64-slot assembly fold,
    all codegen."""
    cuts = video_scene_cuts(assets).select("asset_id", "frame_idx", "is_cut")
    nf = cuts.groupBy("asset_id").agg(F.count("*").alias("nf"))
    sliced = cuts.join(nf, "asset_id").select(
        "asset_id",
        F.expr("(frame_idx * 64) div nf").alias("slice"),
        F.col("is_cut").cast("int").alias("b"),
    )
    slot = sliced.groupBy("asset_id", "slice").agg(F.max("b").alias("b"))
    assembled = slot.groupBy("asset_id").agg(
        F.map_from_entries(F.collect_list(F.struct("slice", "b"))).alias("mp")
    )
    vfp = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.coalesce(F.element_at("mp", i), F.lit(0)).cast(
                "string"
            ),
        ),
    )
    return assembled.select(
        "asset_id",
        vfp.alias("vfp"),
    ).withColumn(
        "bits_set",
        F.length(F.regexp_replace("vfp", "0", "")).cast("int"),
    )


def video_fp_neardup(
    assets: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Perceptual VIDEO near-dup: pairs whose cut-position fingerprints
    differ in <= max_hamming slices — re-encoded or re-scaled copies of
    the same edit keep their cut structure, so they collide here while
    byte- and frame-level dedup miss them. Same engine as the image
    path (bitstring_neardup_pairs): dedup-before-banding, 4x16
    pigeonhole, xor+bit_count hamming.

    Cut-FREE videos are excluded (bits_set > 0): a zero fingerprint
    is absence of evidence, not similarity — and at scale the
    all-zero group would otherwise pair quadratically (the sf0.1
    corpus alone has 220 cut-free videos = 24k meaningless pairs)."""
    return bitstring_neardup_pairs(
        video_cut_fingerprint(assets)
        .filter(F.col("bits_set") > 0)
        .select("asset_id", "vfp"),
        "vfp",
        max_hamming,
    )


def q_video_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return video_fp_neardup(_media(spark, sf_dir))


def q_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_ahash_neardup(_media(spark, sf_dir))


QUERIES = {
    "multimodal_decoded_meta": q_decoded_meta,
    "multimodal_media_summary": q_media_summary,
    "multimodal_frame_sample": q_frame_sample,
    "multimodal_resized": q_resized,
    "multimodal_audio_features": q_audio_features,
    "multimodal_payload_dedup": q_payload_dedup,
    "multimodal_image_ahash": q_image_ahash,
    "multimodal_audio_fingerprint": q_audio_fingerprint,
    "multimodal_video_scenecuts": q_video_scenecuts,
    "multimodal_ahash_neardup": q_ahash_neardup,
    "multimodal_video_fp_neardup": q_video_fp_neardup,
}

# The payload parameters are deterministic in doc_id, so the oracle
# verifies the whole write→parse round trip arithmetically: if the BMP
# writer mis-packed a field or the parser read the wrong offset, the
# Spark side would diverge from these formulas and the hash would fail.
_DECODED_SQL = f"""
    WITH base AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
               (doc_id % {IMG_W_MOD}) + 1 AS iw,
               ((doc_id * 7) % {IMG_H_MOD}) + 1 AS ih,
               (doc_id % {WAV_N_MOD}) + {WAV_N_BASE} AS n_samp,
               {WAV_RATE_BASE} + (doc_id % {WAV_RATE_MOD}) * {WAV_RATE_STEP} AS rate,
               (doc_id % {VID_FRAMES_MOD}) + 1 AS nf
        FROM documents
    ),
    vid AS (
        SELECT doc_id,
               8 + sum(4 + 54
                       + ((3 * (((doc_id + fi) % {IMG_W_MOD}) + 1) + 3) // 4 * 4)
                         * (((doc_id * 7 + fi * 3) % {IMG_H_MOD}) + 1)) AS vlen
        FROM (SELECT doc_id, unnest(range(0, nf)) AS fi
              FROM base WHERE media_type = 'video')
        GROUP BY doc_id
    )
    SELECT b.doc_id AS asset_id, b.media_type,
           CAST(CASE b.media_type
                WHEN 'image' THEN 54 + ((3 * iw + 3) // 4 * 4) * ih
                WHEN 'audio' THEN 44 + 2 * n_samp
                ELSE v.vlen END AS BIGINT) AS byte_len,
           CAST(CASE WHEN b.media_type = 'audio' THEN NULL ELSE iw END
                AS INTEGER) AS width,
           CAST(CASE WHEN b.media_type = 'audio' THEN NULL ELSE ih END
                AS INTEGER) AS height,
           CAST(CASE b.media_type WHEN 'image' THEN 1
                                  WHEN 'audio' THEN n_samp
                                  ELSE nf END AS INTEGER) AS n_frames,
           CAST(CASE WHEN b.media_type = 'audio' THEN rate END
                AS INTEGER) AS sample_rate,
           CASE WHEN b.media_type = 'audio' THEN n_samp * 1000.0 / rate
                END AS duration_ms
    FROM base b LEFT JOIN vid v USING (doc_id)
"""

ORACLE = {
    # Every aHash bit reproduced from the payload generator's integer
    # formulas: pixel P(i) = (id·13 + i·7) mod 256 at the sampled
    # (bottom-up, stride-padded) buffer offsets, integer grayscale,
    # floor-mean threshold. A stride/flip/offset bug on the Spark
    # decode side flips bits and fails this hash.
    "multimodal_image_ahash": f"""
        WITH imgs AS (
            SELECT doc_id AS asset_id,
                   (doc_id % {IMG_W_MOD}) + 1 AS w,
                   ((doc_id * 7) % {IMG_H_MOD}) + 1 AS h,
                   ((3 * ((doc_id % {IMG_W_MOD}) + 1) + 3) // 4) * 4 AS row_sz
            FROM documents WHERE doc_id % 3 = 0
        ),
        g AS (
            SELECT asset_id, w, h, k,
                   (h - 1 - (((k // {AHASH_GRID}) * h) // {AHASH_GRID}))
                       * row_sz
                   + 3 * (((k % {AHASH_GRID}) * w) // {AHASH_GRID}) AS base
            FROM imgs, (SELECT unnest(range(0, {AHASH_GRID * AHASH_GRID}))
                        AS k) ks
        ),
        gray AS (
            SELECT asset_id, w, h, k,
                   (((asset_id * 13 + base * 7) % 256)
                    + ((asset_id * 13 + (base + 1) * 7) % 256)
                    + ((asset_id * 13 + (base + 2) * 7) % 256)) // 3 AS gv
            FROM g
        ),
        m AS (
            SELECT asset_id,
                   sum(gv) // {AHASH_GRID * AHASH_GRID} AS mean
            FROM gray GROUP BY 1
        )
        SELECT gray.asset_id,
               CAST(min(w) AS INTEGER) AS width,
               CAST(min(h) AS INTEGER) AS height,
               string_agg(CASE WHEN gv > mean THEN '1' ELSE '0' END,
                          '' ORDER BY k) AS ahash,
               CAST(sum(CASE WHEN gv > mean THEN 1 ELSE 0 END) AS INTEGER)
                   AS bits_set
        FROM gray JOIN m USING (asset_id)
        GROUP BY gray.asset_id
    """,
    # Span-energy bits from the PCM generator's formula; thresholds as
    # integer cross-products exactly as the Spark stage computes them.
    "multimodal_audio_fingerprint": f"""
        WITH auds AS (
            SELECT doc_id AS asset_id,
                   (doc_id % {WAV_N_MOD}) + {WAV_N_BASE} AS n
            FROM documents WHERE doc_id % 3 = 1
        ),
        samp AS (
            SELECT asset_id, n, (j * {AFP_BITS}) // n AS span,
                   ((asset_id * 31 + j * 17) % 65536) - 32768 AS v
            FROM (SELECT asset_id, n, unnest(range(0, n)) AS j FROM auds)
        ),
        sp AS (
            SELECT asset_id, min(n) AS n, span,
                   CAST(sum(v) AS BIGINT) AS s_sum, count(*) AS s_n
            FROM samp GROUP BY asset_id, span
        ),
        tot AS (
            SELECT asset_id, CAST(sum(v) AS BIGINT) AS total
            FROM samp GROUP BY 1
        )
        SELECT sp.asset_id,
               CAST(min(sp.n) AS INTEGER) AS n_samples,
               string_agg(CASE WHEN s_sum * sp.n > total * s_n
                               THEN '1' ELSE '0' END, '' ORDER BY span)
                   AS afp,
               CAST(sum(CASE WHEN s_sum * sp.n > total * s_n
                             THEN 1 ELSE 0 END) AS INTEGER) AS bits_set
        FROM sp JOIN tot USING (asset_id)
        GROUP BY sp.asset_id
    """,
    # Frame signatures from the per-frame pixel formulas at the stored
    # bottom-up offsets; the cut compare is the same integer
    # cross-product (means have different denominators across frames).
    "multimodal_video_scenecuts": f"""
        WITH vids AS (
            SELECT doc_id AS asset_id, (doc_id % {VID_FRAMES_MOD}) + 1 AS nf
            FROM documents WHERE doc_id % 3 = 2
        ),
        fr AS (SELECT asset_id, unnest(range(0, nf)) AS fi FROM vids),
        dims AS (
            SELECT asset_id, fi,
                   ((asset_id + fi) % {IMG_W_MOD}) + 1 AS w,
                   ((asset_id * 7 + fi * 3) % {IMG_H_MOD}) + 1 AS h
            FROM fr
        ),
        px AS (
            SELECT asset_id, fi, 3 * w AS row_n,
                   list_sum([(asset_id * 13 + fi * 11
                              + ((((3 * w + 3) // 4) * 4) * (h - 1) + x) * 7)
                             % 256
                             for x in range(0, 3 * w)]) AS row_sum
            FROM dims
        ),
        lagd AS (
            SELECT asset_id, fi, row_sum, row_n,
                   lag(row_sum) OVER w AS ps, lag(row_n) OVER w AS pn
            FROM px
            WINDOW w AS (PARTITION BY asset_id ORDER BY fi)
        )
        SELECT asset_id, CAST(fi AS INTEGER) AS frame_idx,
               CAST(row_sum AS BIGINT) AS row_sum,
               CAST(row_n AS INTEGER) AS row_n,
               CASE WHEN ps IS NULL THEN FALSE
                    ELSE abs(row_sum * pn - ps * row_n)
                         > {SCENE_CUT_THRESHOLD} * row_n * pn END AS is_cut
        FROM lagd
    """,
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
    # constant by construction (RGB24 at fixed dims)
    "multimodal_resized": f"""
        SELECT doc_id AS asset_id,
               CAST({RESIZE_W} AS INTEGER) AS width,
               CAST({RESIZE_H} AS INTEGER) AS height,
               CAST({RESIZE_W * RESIZE_H * 3} AS BIGINT) AS thumb_len
        FROM documents WHERE doc_id % 3 = 0
    """,
    # videos are doc_id % 3 == 2 (list index 3); every FRAME_STEP-th of
    # (doc_id % 30) + 1 frames, each frame's byte length = its BMP size
    "multimodal_frame_sample": f"""
        SELECT doc_id AS asset_id, CAST(fi AS INTEGER) AS frame_idx,
               CAST(54 + ((3 * (((doc_id + fi) % {IMG_W_MOD}) + 1) + 3) // 4 * 4)
                         * (((doc_id * 7 + fi * 3) % {IMG_H_MOD}) + 1)
                    AS BIGINT) AS frame_bytes
        FROM (
            SELECT doc_id,
                   unnest(range(0, (doc_id % {VID_FRAMES_MOD}) + 1, {FRAME_STEP}))
                       AS fi
            FROM documents WHERE doc_id % 3 = 2
        )
    """,
    # audio span means: same sample formula, same span assignment
    # span(i) = i*DIM//n; integer sums are exact in double on both
    # engines, so the single sum/count rounding matches bit-for-bit
    "multimodal_audio_features": f"""
        WITH a AS (
            SELECT doc_id,
                   {WAV_RATE_BASE} + (doc_id % {WAV_RATE_MOD}) * {WAV_RATE_STEP}
                       AS rate,
                   (doc_id % {WAV_N_MOD}) + {WAV_N_BASE} AS n
            FROM documents WHERE doc_id % 3 = 1
        ),
        v AS (
            SELECT doc_id, rate, n, (i * {AUDIO_FEAT_DIM}) // n AS span,
                   CAST(((doc_id * 31 + i * 17) % 65536) - 32768 AS DOUBLE) AS val
            FROM (SELECT doc_id, rate, n, unnest(range(0, n)) AS i FROM a)
        )
        SELECT doc_id AS asset_id,
               CAST(rate AS INTEGER) AS sample_rate,
               CAST(n AS INTEGER) AS n_samples,
               {', '.join(f'sum(CASE WHEN span = {i} THEN val END) / count(CASE WHEN span = {i} THEN 1 END) AS f{i}' for i in range(AUDIO_FEAT_DIM))}
        FROM v GROUP BY doc_id, rate, n
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

# Perceptual near-dup oracle: the certified aHash relation (above) fed
# through the same 4x16-bit pigeonhole chunk join (lossless for
# hamming <= 3), exact hamming as a char-fold. The Spark side's
# dedup-before-banding is an optimization, not a semantics change, so
# the oracle uses the direct banded form over the full relation.
ORACLE["multimodal_ahash_neardup"] = f"""
    WITH ah AS ({ORACLE["multimodal_image_ahash"]}),
    ch AS (
        SELECT asset_id, ahash, i AS chunk,
               substring(ahash, i * 16 + 1, 16) AS cv
        FROM ah CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ks
    ),
    cand AS (
        SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
               a.ahash AS ha, b.ahash AS hb
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.cv = b.cv
         AND a.asset_id < b.asset_id
    ),
    scored AS (
        SELECT asset_a, asset_b,
               CAST(list_sum([CASE WHEN ha[i] = hb[i] THEN 0 ELSE 1 END
                              for i in range(1, 65)]) AS INTEGER)
                   AS hamming
        FROM cand
    )
    SELECT asset_a, asset_b, hamming FROM scored
    WHERE hamming <= {AHASH_HAMMING_MAX}
"""


def q_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual duplicate clusters: every image in a visual-duplicate
    group mapped to the group's minimum asset_id — the
    keep-one-per-image deliverable an image-corpus curation run ships.
    Round 15: rewired from components-over-materialized-pairs to the
    HASH-GRAIN engine (bitstring_neardup_clusters) — identical output
    (same components, same min reps; the oracle is unchanged), but the
    quadratic pair relation is never built, which is what makes this
    op the named scale alternative the pair form's mass guard points
    at (VERDICT r14 #3)."""
    return bitstring_neardup_clusters(
        image_ahash(_media(spark, sf_dir)).select("asset_id", "ahash"),
        "ahash",
    )


QUERIES["multimodal_ahash_clusters"] = q_ahash_clusters

# Recursive closure over the banded near-dup oracle — same pattern as
# dedup_near_dup_clusters' oracle, on the perceptual edge set.
ORACLE["multimodal_ahash_clusters"] = f"""
    WITH RECURSIVE np AS ({ORACLE["multimodal_ahash_neardup"]}),
    edges AS (
        SELECT asset_a AS src, asset_b AS dst FROM np
        UNION SELECT asset_b, asset_a FROM np
    ),
    reach(src, dst) AS (
        SELECT src, src FROM edges
        UNION SELECT src, dst FROM edges
        UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS asset_id, min(dst) AS cluster_rep
    FROM reach GROUP BY src
"""

# Video twin: the cut-position fingerprint assembled in SQL from the
# certified scene-cut relation, then the same banded closure.
ORACLE["multimodal_video_fp_neardup"] = f"""
    WITH sc AS ({ORACLE["multimodal_video_scenecuts"]}),
    nf AS (SELECT asset_id, count(*) AS n FROM sc GROUP BY 1),
    sl AS (
        SELECT s.asset_id, (s.frame_idx * 64) // f.n AS slice,
               max(CASE WHEN s.is_cut THEN 1 ELSE 0 END) AS b
        FROM sc s JOIN nf f ON s.asset_id = f.asset_id
        GROUP BY 1, 2
    ),
    ah AS (
        SELECT a.asset_id,
               string_agg(CAST(coalesce(s.b, 0) AS VARCHAR), ''
                          ORDER BY ks.i) AS hv
        FROM (SELECT DISTINCT asset_id FROM sc) a
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ks
        LEFT JOIN sl s ON s.asset_id = a.asset_id AND s.slice = ks.i
        GROUP BY a.asset_id
    ),
    nz AS (SELECT * FROM ah WHERE hv <> repeat('0', 64)),
    ch AS (
        SELECT asset_id, hv, i AS chunk,
               substring(hv, i * 16 + 1, 16) AS cv
        FROM nz CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ks
    ),
    cand AS (
        SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
               a.hv AS ha, b.hv AS hb
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.cv = b.cv
         AND a.asset_id < b.asset_id
    ),
    scored AS (
        SELECT asset_a, asset_b,
               CAST(list_sum([CASE WHEN ha[i] = hb[i] THEN 0 ELSE 1 END
                              for i in range(1, 65)]) AS INTEGER)
                   AS hamming
        FROM cand
    )
    SELECT asset_a, asset_b, hamming FROM scored
    WHERE hamming <= {AHASH_HAMMING_MAX}
"""


def q_image_whash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runner for the queued spectral-hash query (round-14 window)."""
    return image_whash(_media(spark, sf_dir))


# Round-14 promotion queue. The mirror re-derives the SAME 8×8 gray
# grid as the certified aHash oracle (identical imgs/g/gray CTEs),
# then computes each Walsh–Hadamard coefficient as the ±1-signed sum
# with the sign from bit_count parity — integer end to end, so every
# one of the 64 sign bits (and the DC mass) must match exactly.
ORACLE_R14 = {
    "multimodal_image_whash": f"""
        WITH imgs AS (
            SELECT doc_id AS asset_id,
                   (doc_id % {IMG_W_MOD}) + 1 AS w,
                   ((doc_id * 7) % {IMG_H_MOD}) + 1 AS h,
                   ((3 * ((doc_id % {IMG_W_MOD}) + 1) + 3) // 4) * 4 AS row_sz
            FROM documents WHERE doc_id % 3 = 0
        ),
        g AS (
            SELECT asset_id, w, h, k,
                   (h - 1 - (((k // {AHASH_GRID}) * h) // {AHASH_GRID}))
                       * row_sz
                   + 3 * (((k % {AHASH_GRID}) * w) // {AHASH_GRID}) AS base
            FROM imgs, (SELECT unnest(range(0, {AHASH_GRID * AHASH_GRID}))
                        AS k) ks
        ),
        gray AS (
            SELECT asset_id, w, h, k,
                   (((asset_id * 13 + base * 7) % 256)
                    + ((asset_id * 13 + (base + 1) * 7) % 256)
                    + ((asset_id * 13 + (base + 2) * 7) % 256)) // 3 AS gv
            FROM g
        ),
        uv AS (
            SELECT u, v
            FROM (SELECT unnest(range(0, {AHASH_GRID})) AS u),
                 (SELECT unnest(range(0, {AHASH_GRID})) AS v)
        ),
        coef AS (
            SELECT gray.asset_id, uv.u, uv.v,
                   SUM((1 - 2 * ((bit_count(uv.u & (gray.k // {AHASH_GRID}))
                                  + bit_count(uv.v & (gray.k % {AHASH_GRID})))
                                 % 2)) * gray.gv) AS c
            FROM gray, uv
            GROUP BY 1, 2, 3
        ),
        dims AS (
            SELECT asset_id, min(w) AS width, min(h) AS height
            FROM gray GROUP BY 1
        )
        SELECT c.asset_id,
               CAST(d.width AS INTEGER) AS width,
               CAST(d.height AS INTEGER) AS height,
               string_agg(CASE WHEN c.c > 0 THEN '1' ELSE '0' END, ''
                          ORDER BY c.u * {AHASH_GRID} + c.v) AS whash,
               CAST(SUM(CASE WHEN c.c > 0 THEN 1 ELSE 0 END) AS INTEGER)
                   AS bits_set,
               CAST(MAX(CASE WHEN c.u = 0 AND c.v = 0 THEN c.c END)
                    AS BIGINT) AS dc
        FROM coef c JOIN dims d USING (asset_id)
        GROUP BY c.asset_id, d.width, d.height
    """,
}


def image_whash_neardup(
    assets: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Spectral near-dup pairs: images whose Walsh–Hadamard sign
    spectrum differs in ≤ max_hamming of 64 bits — same pigeonhole
    blocking engine as the aHash path (bitstring_neardup_pairs), run
    over the frequency-domain key instead of the spatial one.

    Queued for round 14 (`multimodal_whash_neardup`, ORACLE_R14)."""
    return bitstring_neardup_pairs(
        image_whash(assets).select("asset_id", "whash"), "whash", max_hamming
    )


DUAL_HASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("hva", StringType()),
        StructField("hvw", StringType()),
    ]
)


def dual_hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas DUAL perceptual hash: aHash (spatial mean
    threshold) and wHash (Walsh–Hadamard sign spectrum) from ONE
    decode + ONE 8×8 gray downsample per image — bit-for-bit the same
    values ahash_batch and whash_batch emit separately (pinned by
    test_dual_hash_matches_single_passes), at half the decode cost.
    The consensus path is the only consumer that needs both keys, so
    it is the one place the fused pass pays off."""
    ks = np.arange(AHASH_GRID)
    ij = ks[:, None] & ks[None, :]
    H = 1 - 2 * (np.unpackbits(ij.astype(np.uint8)[..., None], axis=-1)
                 .sum(axis=-1) & 1).astype(np.int64)
    for pdf in batches:
        ids, has, hws = [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            img = _decode_bmp_pixels(bytes(payload))
            if img is None:
                continue
            h, w = img.shape[:2]
            sample = img[(ks * h) // AHASH_GRID][:, (ks * w) // AHASH_GRID]
            gray = sample.astype(np.int64).sum(axis=2) // 3
            mean = int(gray.sum()) // (AHASH_GRID * AHASH_GRID)
            abits = (gray > mean).astype(np.uint8).reshape(-1)
            coef = H @ gray @ H
            wbits = (coef.reshape(-1) > 0).astype(np.uint8)
            ids.append(asset_id)
            has.append("".join("1" if b else "0" for b in abits))
            hws.append("".join("1" if b else "0" for b in wbits))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "hva": has,
                "hvw": hws,
            }
        )


def image_dual_hash(assets: DataFrame) -> DataFrame:
    """(asset_id, hva, hvw) — both 64-bit perceptual keys from one
    Arrow-batched decode pass over the image assets."""
    images = assets.filter(F.col("media_type") == "image")
    return images.mapInPandas(dual_hash_batch, DUAL_HASH_SCHEMA)


def _consensus_hash_relations(
    sig2: DataFrame, max_hamming: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared hash-grain machinery of the consensus pair and cluster
    forms (VERDICT r15 #3 — the probe fusion): from a two-signature
    relation (asset_id, hva, hvw) build

      sig2 — the input, eagerly checkpointed (read by the same-key
             self-join and both expansion joins);
      ck   — (hva, hvw, cnt): the DISTINCT combined-key histogram,
             decimal counts so the mass probe can't overflow;
      cand — combined-key candidate pairs qualifying on BOTH axes
             BEFORE any asset expansion: (hva_x, hvw_x, cnt_x, hva_y,
             hvw_y, cnt_y, hamming_spatial, hamming_spectral),
             canonical on the concatenated key, checkpointed.

    cand is built by walking each combined key to its per-axis
    hash-grain neighbors — the near-edges from _hash_candidate_pairs
    plus the identity edge — and existence-checking the (hva, hvw)
    target against ck, so the intermediate is bounded by
    Σ (deg_a + 1)·(deg_w + 1) over combined keys: a product of
    collision-bounded pigeonhole degrees, never an asset cross
    product, and never the UNION of the per-family pair masses the
    pre-fusion path materialized. Same-combined-key groups (hamming
    (0, 0)) are deliberately NOT in cand — their C(cnt, 2) mass reads
    straight off ck and their expansion is the one self-join on
    sig2."""
    sig2 = sig2.select("asset_id", "hva", "hvw").localCheckpoint(eager=True)
    ck = (
        sig2.groupBy("hva", "hvw")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ea = _hash_candidate_pairs(
        sig2.select("asset_id", F.col("hva").alias("hv")), max_hamming
    )
    ew = _hash_candidate_pairs(
        sig2.select("asset_id", F.col("hvw").alias("hv")), max_hamming
    )

    def _sym(edges: DataFrame, keys: DataFrame, a: str, b: str, h: str):
        # near-edges in both orientations + the identity edge over the
        # axis's distinct hashes — the "within threshold OR identical"
        # neighborhood one combined key walks along this axis
        ident = (
            keys.distinct()
            .select(F.col(keys.columns[0]).alias(a))
            .select(a, F.col(a).alias(b), F.lit(0).alias(h))
        )
        return (
            edges.select(
                F.col("ha").alias(a),
                F.col("hb").alias(b),
                F.col("hamming").alias(h),
            )
            .unionByName(
                edges.select(
                    F.col("hb").alias(a),
                    F.col("ha").alias(b),
                    F.col("hamming").alias(h),
                )
            )
            .unionByName(ident)
        )

    a_sym = _sym(ea, ck.select("hva"), "ax", "ay", "hs")
    w_sym = _sym(ew, ck.select("hvw"), "wx", "wy", "hp")
    x = ck.select(
        F.col("hva").alias("hva_x"),
        F.col("hvw").alias("hvw_x"),
        F.col("cnt").alias("cnt_x"),
    )
    y = ck.select(
        F.col("hva").alias("hva_y"),
        F.col("hvw").alias("hvw_y"),
        F.col("cnt").alias("cnt_y"),
    )
    # join ORDER is the scale contract: x fans out to its per-axis
    # neighborhoods first (degree-product-bounded), THEN the target
    # combined key is existence-checked against ck — writing x ⋈ a_sym
    # ⋈ y ⋈ w_sym instead would materialize every ahash-qualified
    # combined pair before the spectral filter, quadratic on a
    # same-ahash corpus
    cand = (
        x.join(a_sym, F.col("hva_x") == F.col("ax"))
        .join(w_sym, F.col("hvw_x") == F.col("wx"))
        .join(
            y,
            (F.col("ay") == F.col("hva_y")) & (F.col("wy") == F.col("hvw_y")),
        )
        .filter(F.concat("hva_x", "hvw_x") < F.concat("hva_y", "hvw_y"))
        .select(
            "hva_x",
            "hvw_x",
            "cnt_x",
            "hva_y",
            "hvw_y",
            "cnt_y",
            F.col("hs").alias("hamming_spatial"),
            F.col("hp").alias("hamming_spectral"),
        )
        .localCheckpoint(eager=True)
    )
    return sig2, ck, cand


def bitstring_consensus_pairs(
    sig2: DataFrame,
    max_hamming: int = AHASH_HAMMING_MAX,
    max_pairs: int | None = NEARDUP_PAIR_MASS_MAX,
) -> DataFrame:
    """Consensus near-dup pairs over any TWO 64-char bit-string keys
    (asset_id, hva, hvw): pairs within max_hamming on BOTH axes, with
    both distances carried for audit. This is the fused engine
    (VERDICT r15 #3): the pre-fusion path ran two fully-guarded
    bitstring_neardup_pairs calls and joined their expanded outputs,
    paying two pair-mass probes and materializing two per-family pair
    relations when only their intersection is emitted. Here the
    intersection happens at HASH grain (_consensus_hash_relations),
    ONE probe prices the exact consensus mass, and ONE expansion join
    runs — so a template-heavy corpus whose per-family mass exceeds
    the cap but whose consensus mass doesn't is now ADMITTED, a
    correctness-of-refusal improvement on top of halving the fixed
    probe cost.

    GUARDED at `max_pairs` output rows (the _guard_all_pairs
    contract); max_pairs=None skips the probe for callers that have
    already bounded their input (ADVICE r15 #4)."""
    sig2, ck, cand = _consensus_hash_relations(sig2, max_hamming)
    if max_pairs is not None:
        dec2 = F.lit(2).cast("decimal(38,0)")
        same_mass = ck.select(
            (F.col("cnt") * (F.col("cnt") - F.lit(1)) / dec2)
            .cast("decimal(38,6)")
            .alias("m")
        )
        cand_mass = cand.select(
            (F.col("cnt_x") * F.col("cnt_y"))
            .cast("decimal(38,6)")
            .alias("m")
        )
        pair_mass = int(
            same_mass.unionByName(cand_mass)
            .agg(
                F.coalesce(
                    F.sum("m"), F.lit(0).cast("decimal(38,6)")
                ).alias("m")
            )
            .first()["m"]
        )
        if pair_mass > max_pairs:
            raise ValueError(
                f"bitstring_consensus_pairs would materialize "
                f"{pair_mass} pair rows (cap {max_pairs}): pair output "
                "is quadratic in duplicate-cluster size, so past the "
                "cap the pair list is the wrong deliverable. Use "
                "bitstring_consensus_clusters (consensus-grain group "
                "labels, output linear in assets; the registered "
                "multimodal_ahash_clusters entry is the certified "
                "single-family form of the same engine) — or "
                "pre-filter/sample the corpus below the cap."
            )
    same = (
        sig2.alias("a")
        .join(
            sig2.alias("b"),
            (F.col("a.hva") == F.col("b.hva"))
            & (F.col("a.hvw") == F.col("b.hvw"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.lit(0).alias("hamming_spatial"),
            F.lit(0).alias("hamming_spectral"),
        )
    )
    near = (
        cand.join(
            sig2.select(
                F.col("hva").alias("hva_x"),
                F.col("hvw").alias("hvw_x"),
                F.col("asset_id").alias("id_x"),
            ),
            ["hva_x", "hvw_x"],
        )
        .join(
            sig2.select(
                F.col("hva").alias("hva_y"),
                F.col("hvw").alias("hvw_y"),
                F.col("asset_id").alias("id_y"),
            ),
            ["hva_y", "hvw_y"],
        )
        .select(
            F.least("id_x", "id_y").alias("asset_a"),
            F.greatest("id_x", "id_y").alias("asset_b"),
            "hamming_spatial",
            "hamming_spectral",
        )
    )
    return same.unionByName(near)


def bitstring_consensus_clusters(
    sig2: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Cluster-grain CONSENSUS near-dup — the linear-output scale path
    the fused pair form's mass guard names: connected components over
    the combined-key consensus candidate graph (hash grain — the cand
    relation _consensus_hash_relations already intersected), identical
    combined-key groups collapsing through their shared key, then one
    asset-grain group-min + equi-join. Output (asset_id, cluster_rep),
    linear in assets no matter how large the duplicate clusters are.

    Membership matches the pair form exactly: an asset appears iff it
    would appear in some consensus pair — its combined key sits in a
    consensus near-edge component OR at least two assets share its
    combined key (pinned equal to components-over-pairs in
    tests/test_multimodal.py)."""
    from .dedup import near_dup_clusters

    sig2, ck, cand = _consensus_hash_relations(sig2, max_hamming)
    comp = near_dup_clusters(
        cand.select(
            F.concat("hva_x", "hvw_x").alias("doc_a"),
            F.concat("hva_y", "hvw_y").alias("doc_b"),
        )
    ).select(
        F.col("doc_id").alias("key"), F.col("cluster_rep").alias("rep_key")
    )
    labeled = (
        ck.select("hva", "hvw", "cnt", F.concat("hva", "hvw").alias("key"))
        .join(comp, "key", "left")
        .filter(F.col("rep_key").isNotNull() | (F.col("cnt") >= 2))
        .select("hva", "hvw", F.coalesce("rep_key", "key").alias("label"))
    )
    members = sig2.join(labeled, ["hva", "hvw"]).select("asset_id", "label")
    reps = members.groupBy("label").agg(
        F.min("asset_id").alias("cluster_rep")
    )
    return members.join(reps, "label").select("asset_id", "cluster_rep")


def image_consensus_neardup(
    assets: DataFrame,
    max_hamming: int = AHASH_HAMMING_MAX,
    max_pairs: int | None = NEARDUP_PAIR_MASS_MAX,
) -> DataFrame:
    """CONSENSUS perceptual near-dup: pairs flagged by BOTH the
    spatial (aHash) and spectral (wHash) keys — the precision move two
    independent 64-bit views buy (a pair that survives two unrelated
    projections of the pixels is far likelier a true visual duplicate
    than one that collides on a single mean-threshold hash; same
    logic as requiring MinHash candidates to verify on exact
    Jaccard). Output carries both hamming distances for audit.

    Scale shape (VERDICT r15 #3 rewiring — same rows, same oracle):
    ONE fused decode pass emitting both keys (image_dual_hash), the
    ahash ∩ whash intersection taken at the hash-pair level inside
    bitstring_consensus_pairs, ONE exact pair-mass probe on the
    intersected mass, ONE member-expansion join. The pre-fusion shape
    (two guarded per-family pair relations meeting in an equi-join)
    paid two decodes, two probes and two expansions for the same
    output, and refused template-heavy corpora whose per-family mass
    exceeds the cap even when the consensus mass — the only thing
    emitted — is tiny.

    Queued for round 14 (`multimodal_consensus_neardup`, ORACLE_R14);
    fused round 16."""
    return bitstring_consensus_pairs(
        image_dual_hash(assets), max_hamming, max_pairs
    )


def image_consensus_clusters(
    assets: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Asset-level wrapper of bitstring_consensus_clusters — the
    linear-output alternative image_consensus_neardup's mass guard
    names, at image grain."""
    return bitstring_consensus_clusters(image_dual_hash(assets), max_hamming)


def q_whash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_whash_neardup(_media(spark, sf_dir))


def q_consensus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_consensus_neardup(_media(spark, sf_dir))


# Same CTE-chaining discipline as the certified ahash_neardup mirror:
# the whash oracle feeds the pigeonhole + char-fold hamming form, and
# the consensus mirror joins the two pair relations on the canonical
# pair key.
ORACLE_R14["multimodal_whash_neardup"] = f"""
    WITH wh AS ({ORACLE_R14["multimodal_image_whash"]}),
    ch AS (
        SELECT asset_id, whash, i AS chunk,
               substring(whash, i * 16 + 1, 16) AS cv
        FROM wh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ks
    ),
    cand AS (
        SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
               a.whash AS ha, b.whash AS hb
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.cv = b.cv
         AND a.asset_id < b.asset_id
    ),
    scored AS (
        SELECT asset_a, asset_b,
               CAST(list_sum([CASE WHEN ha[i] = hb[i] THEN 0 ELSE 1 END
                              for i in range(1, 65)]) AS INTEGER)
                   AS hamming
        FROM cand
    )
    SELECT asset_a, asset_b, hamming FROM scored
    WHERE hamming <= {AHASH_HAMMING_MAX}
"""

ORACLE_R14["multimodal_consensus_neardup"] = f"""
    WITH sp AS ({ORACLE["multimodal_ahash_neardup"]}),
    sq AS ({ORACLE_R14["multimodal_whash_neardup"]})
    SELECT sp.asset_a, sp.asset_b,
           sp.hamming AS hamming_spatial,
           sq.hamming AS hamming_spectral
    FROM sp JOIN sq USING (asset_a, asset_b)
"""

# Round 14: promoted on schedule (library + integer-exact mirrors held
# through rounds 12-13, rehearsed at sf0.01 both rounds; the window
# slot is this round's registry edit).
ORACLE.update(ORACLE_R14)
QUERIES.update({
    "multimodal_image_whash": q_image_whash,
    "multimodal_whash_neardup": q_whash_neardup,
    "multimodal_consensus_neardup": q_consensus_neardup,
})
