"""Multimodal plumbing: binary payload columns, Arrow-batched feature
extraction, strict-stub behavior (north star; codecs absent here)."""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.sources import multimodal as mm


def test_feature_extraction_plumbing(spark):
    media = mm.synthetic_media(spark, n=24)
    feats = mm.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 24
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_media_summary_counts(spark):
    media = mm.synthetic_media(spark, n=24)
    summary = {r["kind"]: r["n_items"] for r in mm.media_summary(mm.extract_features(media)).collect()}
    assert summary == {"image": 8, "audio": 8, "video": 8}


@pytest.mark.skipif(mm.HAS_PIL, reason="codec installed; strict path decodes")
def test_strict_stub_raises_without_codec(spark):
    media = mm.synthetic_media(spark, n=4)
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_binary_file_reader(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"blob_{i}.bin").write_bytes(bytes([i]) * 100)
    df = mm.read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = df.select("length").collect()
    assert [r["length"] for r in rows] == [100, 100, 100]


def test_resize_raw_grayscale_exact(spark):
    import numpy as np

    # 4x4 gradient plane, downsample to 2x2 — nearest-neighbor picks
    # rows/cols 0 and 2
    plane = np.arange(16, dtype=np.uint8).reshape(4, 4)
    df = spark.createDataFrame(
        [(0, "image", bytearray(plane.tobytes()), 4, 4, 16),
         (1, "audio", bytearray(b"\x01\x02"), None, None, 2)],
        mm.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in mm.resize_images(df, width=2, height=2).collect()}
    got = np.frombuffer(bytes(out[0]["payload"]), dtype=np.uint8).reshape(2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    assert (out[0]["width"], out[0]["height"], out[0]["n_bytes"]) == (2, 2, 4)
    # non-image passes through untouched
    assert bytes(out[1]["payload"]) == b"\x01\x02"


def test_resize_encoded_needs_codec(spark):
    # unrecognized encoded format (no codec signature matches — GIF
    # decodes natively now, so the fake must not look like one);
    # strict raises
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"NOTACODEC01"), 16, 16, 11)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|codec|format"):
        mm.resize_images(df, width=2, height=2, strict=True).collect()
    # plumbing mode passes through
    rows = mm.resize_images(df, width=2, height=2).collect()
    assert bytes(rows[0]["payload"]) == b"NOTACODEC01"
    # a TRUNCATED gif (signature matches, decode fails) raises strict
    # and passes through in plumbing mode like any recognized codec
    dfg = spark.createDataFrame(
        [(2, "image", bytearray(b"GIF89a fake"), 16, 16, 11)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        mm.resize_images(dfg, width=2, height=2, strict=True).collect()
    rows = mm.resize_images(dfg, width=2, height=2).collect()
    assert bytes(rows[0]["payload"]) == b"GIF89a fake"
    # a TRUNCATED jpeg (signature matches, decode fails) also raises
    # strict and passes through in plumbing mode
    df2 = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xff"), 16, 16, 3)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        mm.resize_images(df2, width=2, height=2, strict=True).collect()
    rows = mm.resize_images(df2, width=2, height=2).collect()
    assert bytes(rows[0]["payload"]) == b"\xff\xd8\xff"


def test_sample_frames_explodes_videos(spark):
    # video: five 2x2 frames, frame f filled with byte value f
    frames = b"".join(bytes([f] * 4) for f in range(5))
    df = spark.createDataFrame(
        [(7, "video", bytearray(frames), 2, 2, len(frames)),
         (8, "image", bytearray(b"\x00" * 4), 2, 2, 4)],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.sample_frames(df, every_n=2).collect()
    assert [(r["media_id"], r["frame_index"]) for r in sorted(rows, key=lambda r: r["frame_index"])] == [
        (7, 0), (7, 2), (7, 4)
    ]
    for r in rows:
        assert bytes(r["payload"]) == bytes([r["frame_index"]] * 4)


def test_sample_frames_container_strict(spark):
    # payload not a multiple of the frame size → container format
    df = spark.createDataFrame(
        [(9, "video", bytearray(b"\x00\x00\x00"), 2, 2, 3)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.sample_frames(df, strict=True).collect()
    assert mm.sample_frames(df).count() == 0


def test_extract_features_raw_plane_stats(spark):
    # raw grayscale plane (n_bytes == w*h): extract_features computes
    # REAL pixel statistics under strict=True — the same supported set
    # (and metadata precedence) as resize_images (ADVICE r07)
    plane = bytes(range(8)) * 2  # 4x4, values 0..7 twice
    df = spark.createDataFrame(
        [(1, "image", bytearray(plane), 4, 4, len(plane))],
        mm.MEDIA_SCHEMA,
    )
    feat = mm.extract_features(df, dim=8, strict=True).collect()[0]["feature"]
    assert feat[0] == 4.0 and feat[1] == 4.0 and feat[2] == 1.0
    assert feat[3] == pytest.approx(3.5 / 255.0)  # mean of 0..7
    assert feat[5] == 0.0 and feat[6] == pytest.approx(7.0 / 255.0)


def test_extract_features_without_dimension_columns(spark):
    # a narrower frame (no width/height) keeps the pre-raw-plane
    # contract: digest stub in plumbing mode, no executor KeyError
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\x01\x02\x03"), 3)],
        "media_id long, kind string, payload binary, n_bytes long",
    )
    feat = mm.extract_features(df, dim=4).collect()[0]["feature"]
    assert len(feat) == 4
