"""Multimodal byte-level checks the SQL oracle can't see: the oracle
verifies header arithmetic (dims, sizes, span means) cross-engine, but
not the pixel/sample CONTENT — so thumbnails and decoded frames are
pinned here against independent Python references, plus the
corrupt-payload quarantine path."""

from __future__ import annotations

import struct

import numpy as np

from edu_online_spark.operators.multimodal import (
    AUDIO_FEAT_DIM,
    RESIZE_H,
    RESIZE_W,
    _bmp_bytes,
    _bmp_row_size,
    _decode_bmp_pixels,
    _parse_bmp,
    _parse_vid,
    _parse_wav,
    _wav_bytes,
    _wav_samples,
    audio_feature_vectors,
    decode_assets,
    resize_images,
    sample_frames,
    synth_media_assets,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc {i}", "en", "src1") for i in ids],
        ["doc_id", "text", "lang", "source"],
    )


# ---------------------------------------------------------------------------
# Pure builders/parsers: write → parse round trip without Spark
# ---------------------------------------------------------------------------

def test_bmp_round_trip():
    for doc_id in (0, 3, 63, 127, 480):
        buf = _bmp_bytes(doc_id)
        w, h = _parse_bmp(buf)
        assert w == doc_id % 64 + 1
        assert h == (doc_id * 7) % 48 + 1
        assert len(buf) == 54 + _bmp_row_size(w) * h
        # file-size field in the header agrees with reality
        assert struct.unpack_from("<I", buf, 2)[0] == len(buf)


def test_wav_round_trip():
    for doc_id in (1, 4, 103, 499):
        buf = _wav_bytes(doc_id)
        rate, n = _parse_wav(buf)
        assert rate == 8000 + (doc_id % 8) * 1000
        assert n == doc_id % 500 + 100
        assert len(buf) == 44 + 2 * n
        # samples decode back to the generator formula
        got = np.frombuffer(buf, dtype="<i2", offset=44)
        assert np.array_equal(got, _wav_samples(doc_id))


def test_vid_container_round_trip():
    from edu_online_spark.operators.multimodal import _vid_bytes

    doc_id = 17  # 17 % 3 == 2 → video; 18 frames
    buf = _vid_bytes(doc_id)
    n_frames, frames = _parse_vid(buf)
    assert n_frames == doc_id % 30 + 1 == len(frames)
    # every stored frame is itself a valid BMP with the expected dims
    for fi, (off, flen) in enumerate(frames):
        w, h = _parse_bmp(buf[off : off + flen])
        assert w == (doc_id + fi) % 64 + 1
        assert h == (doc_id * 7 + fi * 3) % 48 + 1


def test_parsers_reject_garbage():
    assert _parse_bmp(b"not a bmp at all........................................") is None
    assert _parse_wav(b"RIFFxxxxNOPE") is None
    assert _parse_vid(b"VID0") is None  # truncated
    assert _parse_vid(b"VID0" + struct.pack("<I", 3) + b"\x00") is None


def test_bmp_pixel_decode_reference():
    """Decoded pixel grid equals the generator formula, row-flipped and
    BGR→RGB swapped."""
    doc_id = 6  # image: w=7, h=42
    buf = _bmp_bytes(doc_id)
    img = _decode_bmp_pixels(buf)
    w, h = doc_id % 64 + 1, (doc_id * 7) % 48 + 1
    assert img.shape == (h, w, 3)
    row = _bmp_row_size(w)
    raw = ((doc_id * 13 + np.arange(row * h, dtype=np.int64) * 7) % 256).astype(
        np.uint8
    )
    expected = raw.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]
    assert np.array_equal(img, expected)


# ---------------------------------------------------------------------------
# Spark stages on planted doc_ids
# ---------------------------------------------------------------------------

def test_decode_assets_parses_real_headers(spark):
    out = {
        r["asset_id"]: r
        for r in decode_assets(synth_media_assets(_docs(spark, [0, 1, 2]))).collect()
    }
    img, aud, vid = out[0], out[1], out[2]
    assert (img["media_type"], img["width"], img["height"], img["n_frames"]) == (
        "image", 1, 1, 1
    )
    assert img["sample_rate"] is None and img["duration_ms"] is None
    assert (aud["media_type"], aud["sample_rate"], aud["n_frames"]) == (
        "audio", 9000, 101
    )
    assert aud["duration_ms"] == 101 * 1000.0 / 9000
    assert (vid["media_type"], vid["n_frames"], vid["width"], vid["height"]) == (
        "video", 3, 3, 15
    )


def test_resize_is_nearest_neighbor_of_decoded_pixels(spark):
    doc_id = 9  # image: w=10, h=16
    out = resize_images(synth_media_assets(_docs(spark, [doc_id]))).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["thumb_len"]) == (
        RESIZE_W, RESIZE_H, RESIZE_W * RESIZE_H * 3
    )
    img = _decode_bmp_pixels(_bmp_bytes(doc_id))
    h, w = img.shape[:2]
    expected = img[(np.arange(RESIZE_H) * h) // RESIZE_H][
        :, (np.arange(RESIZE_W) * w) // RESIZE_W
    ]
    assert bytes(r["thumb"]) == expected.tobytes()


def test_audio_features_are_span_means_of_decoded_samples(spark):
    doc_id = 4  # audio: rate 12000, n 104
    out = audio_feature_vectors(synth_media_assets(_docs(spark, [doc_id]))).collect()
    assert len(out) == 1
    r = out[0]
    samples = _wav_samples(doc_id).astype(np.float64)
    n = len(samples)
    assert (r["sample_rate"], r["n_samples"]) == (12000, n)
    span = (np.arange(n) * AUDIO_FEAT_DIM) // n
    for i in range(AUDIO_FEAT_DIM):
        assert r[f"f{i}"] == samples[span == i].mean()


def test_frame_sample_reads_stored_lengths(spark):
    doc_id = 11  # video: 12 frames → samples frames 0, 5, 10
    rows = sorted(
        sample_frames(synth_media_assets(_docs(spark, [doc_id]))).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 5, 10]
    for r in rows:
        assert r["frame_bytes"] == len(_bmp_bytes(doc_id, r["frame_idx"]))


def test_corrupt_payloads_quarantine_to_null_metadata(spark):
    """A poison payload must yield NULL metadata, not a task failure."""
    from pyspark.sql import functions as F

    assets = synth_media_assets(_docs(spark, [0, 1, 2])).withColumn(
        "payload",
        F.when(F.col("asset_id") == 1, F.lit(b"garbage bytes")).otherwise(
            F.col("payload")
        ),
    )
    out = {r["asset_id"]: r for r in decode_assets(assets).collect()}
    assert out[1]["width"] is None and out[1]["n_frames"] is None
    assert out[1]["byte_len"] == len(b"garbage bytes")
    assert out[0]["width"] is not None and out[2]["n_frames"] is not None


def test_image_ahash_semantics_on_planted_image(spark):
    """A half-dark / half-bright image must hash to exactly the bright
    half's bits — checked by building a real BMP by hand and running
    the full decode→downsample→threshold path."""
    import struct

    import numpy as np

    from edu_online_spark.operators.multimodal import image_ahash

    w = h = 16
    row = (3 * w + 3) // 4 * 4
    # bottom-up storage: first h/2 rows in the buffer are the BOTTOM
    # half of the image -> make them bright (200), top half dark (10)
    rows = []
    for r in range(h):
        val = 200 if r < h // 2 else 10
        rows.append(bytes([val] * (3 * w)) + b"\x00" * (row - 3 * w))
    pix = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    assets = spark.createDataFrame(
        [(1, "image", bytearray(hdr + info + pix))],
        "asset_id long, media_type string, payload binary",
    )
    out = image_ahash(assets).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (16, 16)
    # top-down hash order: dark rows first (0s), bright rows last (1s)
    assert r["ahash"] == "0" * 32 + "1" * 32
    assert r["bits_set"] == 32


def _flat_bmp(val: int, w: int = 8, h: int = 4) -> bytes:
    import struct

    row = (3 * w + 3) // 4 * 4
    pix = b"".join(
        bytes([val] * (3 * w)) + b"\x00" * (row - 3 * w) for _ in range(h)
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + info + pix


def test_video_scene_cuts_fire_on_brightness_jump(spark):
    """dark→dark is no cut; dark→bright is — on a hand-built VID0 so
    the decision rides the real container walk and frame decode."""
    import struct

    from edu_online_spark.operators.multimodal import video_scene_cuts

    frames = [_flat_bmp(10), _flat_bmp(10), _flat_bmp(200)]
    payload = struct.pack("<4sI", b"VID0", len(frames)) + b"".join(
        struct.pack("<I", len(f)) + f for f in frames
    )
    assets = spark.createDataFrame(
        [(1, "video", bytearray(payload))],
        "asset_id long, media_type string, payload binary",
    )
    out = {r["frame_idx"]: r for r in video_scene_cuts(assets).collect()}
    assert [out[i]["is_cut"] for i in range(3)] == [False, False, True]
    assert out[0]["row_sum"] == 10 * 24 and out[2]["row_sum"] == 200 * 24


def test_audio_fingerprint_marks_loud_spans(spark):
    """A silent track with one loud span sets exactly that span's bits —
    through the real WAV build/parse path."""
    import struct

    import numpy as np

    from edu_online_spark.operators.multimodal import audio_fingerprint

    n = 640  # 10 samples per span
    samples = np.zeros(n, dtype="<i2")
    samples[320:330] = 1000  # span 32 loud
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, 8000, 16000, 2, 16, b"data", len(data),
    )
    assets = spark.createDataFrame(
        [(1, "audio", bytearray(hdr + data))],
        "asset_id long, media_type string, payload binary",
    )
    r = audio_fingerprint(assets).first()
    assert r["n_samples"] == n
    assert r["bits_set"] == 1
    assert r["afp"].index("1") == 32


def test_ahash_neardup_finds_perturbed_copy_within_budget(spark):
    """An identical copy (hamming 0) and a slightly-perturbed copy must
    both pair with the original; a structurally different image must
    not. The pigeonhole join must agree with the exact hamming."""
    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        image_ahash,
        image_ahash_neardup,
    )

    base = _bmp_bytes(33)
    # perturb a handful of pixel bytes far apart — a few ahash cells
    # flip at most, staying within the hamming-3 budget
    pert = bytearray(base)
    for off in range(54, min(len(pert), 54 + 40), 13):
        pert[off] = 255 - pert[off]
    rows = [
        (1, "image", bytearray(base)),
        (2, "image", bytearray(base)),      # exact copy
        (3, "image", bytes(pert)),          # near copy
        (4, "image", bytearray(_bmp_bytes(999))),  # different image
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in image_ahash_neardup(assets).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in p for p in pairs)
    # cross-check one pair against the exact hashes
    hs = {r["asset_id"]: r["ahash"] for r in image_ahash(assets).collect()}
    exact = sum(x != y for x, y in zip(hs[1], hs[3]))
    assert pairs[(1, 3)] == exact


def test_ahash_neardup_partitioning_invariant(spark):
    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        image_ahash_neardup,
    )

    rows = [
        (i, "image", bytearray(_bmp_bytes(i % 7)))  # forced collisions
        for i in range(21)
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    a = sorted(map(tuple, image_ahash_neardup(assets).collect()))
    b = sorted(
        map(tuple, image_ahash_neardup(assets.repartition(8)).collect())
    )
    assert a == b and len(a) >= 21  # every same-residue pair collides


def test_ahash_clusters_collapse_copy_groups(spark):
    """Copies of the same image (and near-copies) must land in one
    cluster under the minimum asset_id."""
    from edu_online_spark.operators.dedup import near_dup_clusters
    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        image_ahash_neardup,
    )
    from pyspark.sql import functions as F

    rows = (
        [(i, "image", bytearray(_bmp_bytes(5))) for i in (1, 4, 9)]
        + [(i, "image", bytearray(_bmp_bytes(77))) for i in (2, 6)]
        + [(3, "image", bytearray(_bmp_bytes(123)))]  # singleton
    )
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    pairs = image_ahash_neardup(assets).select(
        F.col("asset_a").alias("doc_a"), F.col("asset_b").alias("doc_b")
    )
    labels = {
        r["doc_id"]: r["cluster_rep"] for r in near_dup_clusters(pairs).collect()
    }
    assert labels[1] == labels[4] == labels[9] == 1
    assert labels[2] == labels[6] == 2
    assert 3 not in labels  # singleton never enters the edge set


def _planted_sig(spark):
    """40 copies of one hash + 3 copies of a hamming-1 neighbor: pair
    mass = C(40,2) + C(3,2) + 40·3 = 780 + 3 + 120 = 903."""
    h0 = "0" * 64
    h1 = "0" * 63 + "1"
    rows = [(i, h0) for i in range(40)] + [(100 + i, h1) for i in range(3)]
    return spark.createDataFrame(rows, "asset_id long, sig string")


def test_neardup_pair_mass_guard_refuses_planted_dup_mass(spark):
    """VERDICT r14 #3: the pair form's output is quadratic in
    duplicate-cluster size (103M qualifying pairs at sf10 on
    planted-dup media), so it must probe the exact pair mass BEFORE
    any expansion join, refuse past the cap, and name the
    cluster-grain scale path."""
    import pytest

    from edu_online_spark.operators.multimodal import (
        bitstring_neardup_pairs,
    )

    sig = _planted_sig(spark)
    with pytest.raises(ValueError, match="bitstring_neardup_clusters"):
        bitstring_neardup_pairs(sig, "sig", max_pairs=100)
    # the probe is exact: a cap of 903 admits the corpus...
    assert bitstring_neardup_pairs(sig, "sig", max_pairs=903).count() == 903
    # ...and 902 refuses it
    with pytest.raises(ValueError, match="903 pair rows"):
        bitstring_neardup_pairs(sig, "sig", max_pairs=902)


def test_bitstring_clusters_bounded_past_pair_guard(spark):
    """The named alternative must WORK where the pair form refuses:
    same planted corpus, per-asset group labels, output linear in
    assets (43 rows, one component under the min asset_id)."""
    from edu_online_spark.operators.multimodal import (
        bitstring_neardup_clusters,
    )

    labels = {
        r["asset_id"]: r["cluster_rep"]
        for r in bitstring_neardup_clusters(_planted_sig(spark), "sig").collect()
    }
    assert len(labels) == 43
    assert set(labels.values()) == {0}


def test_bitstring_clusters_match_pair_components(spark):
    """The hash-grain cluster engine must reproduce EXACTLY what
    components-over-materialized-pairs produced (the certified
    multimodal_ahash_clusters semantics before the round-15 rewiring):
    same membership, same min-asset reps, singletons excluded."""
    from edu_online_spark.operators.dedup import near_dup_clusters
    from edu_online_spark.operators.multimodal import (
        bitstring_neardup_clusters,
        bitstring_neardup_pairs,
    )
    from pyspark.sql import functions as F

    h0, h1 = "0" * 64, "0" * 63 + "1"
    h2 = "1" * 32 + "0" * 32  # far from h0/h1
    h3 = "1" * 64  # far from everything: its lone asset is a singleton
    rows = (
        [(9, h0), (4, h0), (7, h1)]  # copies + a near neighbor
        + [(2, h2), (6, h2)]  # an identical-copy pair, no near edge
        + [(3, h3)]  # singleton: unique hash, no edge
    )
    sig = spark.createDataFrame(rows, "asset_id long, sig string")
    old = near_dup_clusters(
        bitstring_neardup_pairs(sig, "sig").select(
            F.col("asset_a").alias("doc_a"), F.col("asset_b").alias("doc_b")
        )
    )
    old_labels = {r["doc_id"]: r["cluster_rep"] for r in old.collect()}
    new_labels = {
        r["asset_id"]: r["cluster_rep"]
        for r in bitstring_neardup_clusters(sig, "sig").collect()
    }
    assert new_labels == old_labels
    assert new_labels == {9: 4, 4: 4, 7: 4, 2: 2, 6: 2}


def test_audio_neardup_finds_identical_tracks(spark):
    """Byte-identical tracks pair at hamming 0; a re-leveled copy
    (same envelope shape, half the gain) stays within the budget; a
    reversed-envelope track does not pair. Envelopes are crafted
    because the synthetic corpus' LCG audio is envelope-uniform (see
    audio_fp_neardup docstring)."""
    import struct

    import numpy as np

    from edu_online_spark.operators.multimodal import audio_fp_neardup

    def wav(samples):
        data = samples.astype("<i2").tobytes()
        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
            b"fmt ", 16, 1, 1, 8000, 16000, 2, 16, b"data", len(data),
        )
        return bytearray(hdr + data)

    n = 640
    ramp_up = np.linspace(-10000, 10000, n)
    rows = [
        (1, "audio", wav(ramp_up)),
        (2, "audio", wav(ramp_up)),            # exact copy
        (3, "audio", wav(ramp_up * 0.5)),      # re-leveled: same envelope
        (4, "audio", wav(ramp_up[::-1])),      # reversed: opposite bits
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in audio_fp_neardup(assets).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert pairs.get((1, 3)) == 0  # threshold bits are gain-invariant
    assert not any(4 in p for p in pairs)


def test_video_fp_neardup_copy_and_structure(spark):
    """Byte-identical videos pair at hamming 0; whether two different
    videos pair must agree exactly with the hamming of their computed
    cut fingerprints (self-consistency of fingerprint + banding)."""
    from edu_online_spark.operators.multimodal import (
        _vid_bytes,
        video_cut_fingerprint,
        video_fp_neardup,
    )

    rows = [
        (1, "video", bytearray(_vid_bytes(23))),
        (2, "video", bytearray(_vid_bytes(23))),   # exact copy
        (3, "video", bytearray(_vid_bytes(17))),
        (4, "video", bytearray(_vid_bytes(26))),
        (5, "video", bytearray(_vid_bytes(30))),   # 1 frame: no cuts
        (6, "video", bytearray(_vid_bytes(60))),   # 1 frame: no cuts
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    fps = {r["asset_id"]: r["vfp"] for r in video_cut_fingerprint(assets).collect()}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in fps.values())
    assert fps[1] == fps[2]
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in video_fp_neardup(assets).collect()
    }
    assert pairs[(1, 2)] == 0
    for a, b in [(1, 3), (1, 4), (3, 4)]:
        d = sum(x != y for x, y in zip(fps[a], fps[b]))
        if d <= 3:
            assert pairs.get((a, b)) == d
        else:
            assert (a, b) not in pairs
    # cut-free videos carry no evidence: excluded even from each other
    assert not any(5 in p or 6 in p for p in pairs)


def _far64(i):
    """64-bit string whose four 16-bit chunks are the distinct values
    1000+4i..1000+4i+3 — no chunk ever collides with another _far64
    value, with the all-zero hash, or with its hamming-1 neighbor, so
    pigeonhole banding yields NO candidate edge touching it."""
    return "".join(format(1000 + 4 * i + j, "016b") for j in range(4))


def _consensus_fixture(spark):
    """Two-signature corpus exercising every consensus case:
    identical-both (1,2), near-spatial/same-spectral (3), same-
    spatial/near-spectral (4), near-both (3 vs 4), spatial-only
    qualifier (5, far spectral), spectral-only qualifier (6, far
    spatial), and a both-far singleton (7)."""
    a0, a1 = "0" * 64, "0" * 63 + "1"
    w0, w1 = "0" * 64, "0" * 63 + "1"
    rows = [
        (1, a0, w0),
        (2, a0, w0),
        (3, a1, w0),
        (4, a0, w1),
        (5, a0, _far64(0)),
        (6, _far64(1), w0),
        (7, _far64(2), _far64(3)),
    ]
    return spark.createDataFrame(rows, "asset_id long, hva string, hvw string")


def test_consensus_pairs_match_prefusion_join(spark):
    """VERDICT r15 #3: the fused engine (hash-grain intersection, one
    probe, one expansion) must emit EXACTLY what the pre-fusion shape
    emitted — the equi-join of the two independently-expanded
    per-family pair relations — including both hamming distances."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.multimodal import (
        bitstring_consensus_pairs,
        bitstring_neardup_pairs,
    )

    sig2 = _consensus_fixture(spark)
    fused = {
        (r["asset_a"], r["asset_b"]): (
            r["hamming_spatial"],
            r["hamming_spectral"],
        )
        for r in bitstring_consensus_pairs(sig2).collect()
    }
    ah = bitstring_neardup_pairs(
        sig2.select("asset_id", "hva"), "hva", max_pairs=None
    ).withColumnRenamed("hamming", "hs")
    wh = bitstring_neardup_pairs(
        sig2.select("asset_id", "hvw"), "hvw", max_pairs=None
    ).withColumnRenamed("hamming", "hp")
    prefusion = {
        (r["asset_a"], r["asset_b"]): (r["hs"], r["hp"])
        for r in ah.join(wh, ["asset_a", "asset_b"]).collect()
    }
    assert fused == prefusion
    assert fused == {
        (1, 2): (0, 0),
        (1, 3): (1, 0),
        (2, 3): (1, 0),
        (1, 4): (0, 1),
        (2, 4): (0, 1),
        (3, 4): (1, 1),
    }


def test_consensus_admits_what_per_family_refuses(spark):
    """The correctness-of-refusal half of the fusion: a template-heavy
    corpus whose PER-FAMILY pair mass exceeds the cap but whose
    consensus mass doesn't must be REFUSED by each single-key guard
    yet ADMITTED at consensus grain — the intersected mass is what the
    consensus op actually emits, so that is what its probe prices."""
    import pytest

    from edu_online_spark.operators.multimodal import (
        bitstring_consensus_pairs,
        bitstring_neardup_pairs,
    )

    a0, w0, wz = "0" * 64, "1" * 64, "0" * 32 + "1" * 32
    rows = (
        # 30 spatial template copies; 3 of them also spectral copies
        [(i, a0, w0 if i < 3 else _far64(10 + i)) for i in range(30)]
        # 30 spectral template copies, spatially all-distinct
        + [(100 + i, _far64(50 + i), wz) for i in range(30)]
    )
    sig2 = spark.createDataFrame(rows, "asset_id long, hva string, hvw string")
    # per-family masses: spatial C(30,2)=435, spectral C(30,2)+C(3,2)=438
    with pytest.raises(ValueError, match="435 pair rows"):
        bitstring_neardup_pairs(
            sig2.select("asset_id", "hva"), "hva", max_pairs=100
        )
    with pytest.raises(ValueError, match="438 pair rows"):
        bitstring_neardup_pairs(
            sig2.select("asset_id", "hvw"), "hvw", max_pairs=100
        )
    # consensus mass is the 3-copy intersection: C(3,2)=3 — admitted
    # at the same cap that refused both families, and the probe is
    # exact at the boundary
    got = bitstring_consensus_pairs(sig2, max_pairs=100).collect()
    assert {(r["asset_a"], r["asset_b"]) for r in got} == {
        (0, 1), (0, 2), (1, 2),
    }
    assert all(
        (r["hamming_spatial"], r["hamming_spectral"]) == (0, 0) for r in got
    )
    assert bitstring_consensus_pairs(sig2, max_pairs=3).count() == 3
    with pytest.raises(ValueError, match="3 pair rows"):
        bitstring_consensus_pairs(sig2, max_pairs=2)


def test_consensus_clusters_match_pair_components(spark):
    """The linear-output alternative the consensus guard names must
    reproduce components-over-consensus-pairs exactly: same
    membership, min-asset reps, one-axis qualifiers and singletons
    excluded."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.dedup import near_dup_clusters
    from edu_online_spark.operators.multimodal import (
        bitstring_consensus_clusters,
        bitstring_consensus_pairs,
    )

    sig2 = _consensus_fixture(spark)
    over_pairs = {
        r["doc_id"]: r["cluster_rep"]
        for r in near_dup_clusters(
            bitstring_consensus_pairs(sig2).select(
                F.col("asset_a").alias("doc_a"),
                F.col("asset_b").alias("doc_b"),
            )
        ).collect()
    }
    clustered = {
        r["asset_id"]: r["cluster_rep"]
        for r in bitstring_consensus_clusters(sig2).collect()
    }
    assert clustered == over_pairs
    assert clustered == {1: 1, 2: 1, 3: 1, 4: 1}


def test_neardup_pair_guard_opt_out_skips_probe(spark):
    """ADVICE r15 #4: max_pairs=None runs the pair form unguarded for
    callers that already own the bound — same rows as the guarded
    call, no refusal even where the default cap would not apply."""
    from edu_online_spark.operators.multimodal import (
        bitstring_neardup_pairs,
    )

    sig = _planted_sig(spark)
    assert bitstring_neardup_pairs(sig, "sig", max_pairs=None).count() == 903


def test_dual_hash_matches_single_passes(spark):
    """The fused one-decode dual-hash stage must emit bit-for-bit the
    same keys the two single-hash passes compute separately."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        image_ahash,
        image_dual_hash,
        image_whash,
    )

    rows = [
        (i, "image", bytearray(_bmp_bytes(seed)))
        for i, seed in enumerate([5, 5, 77, 123, 7, 2048])
    ] + [(99, "audio", bytearray(b"\x00" * 16))]  # non-image: pruned
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    dual = {
        r["asset_id"]: (r["hva"], r["hvw"])
        for r in image_dual_hash(assets).collect()
    }
    single = {
        r["asset_id"]: (r["ahash"], r["whash"])
        for r in image_ahash(assets)
        .select("asset_id", "ahash")
        .join(
            image_whash(assets).select("asset_id", "whash"), "asset_id"
        )
        .collect()
    }
    assert dual == single and len(dual) == 6
