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


def _audio_media(spark, payloads):
    import pandas as pd

    rows = [
        (i, "audio", bytearray(p), None, None, len(p))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, n_bytes long",
    )


def test_resample_audio_linear_kernel_and_formats(spark):
    """Down- and up-sampling match an np.interp reference per format,
    channels survive, and a payload already at the target rate passes
    through byte-identical."""
    import numpy as np

    from physicsnemo_curator_spark.sources import aiff, flac, wav
    from physicsnemo_curator_spark.sources import multimodal as mm

    t = np.arange(400)
    sig = 0.4 * np.sin(2 * np.pi * t / 50)
    stereo = np.stack([sig, -sig], axis=1)
    payloads = [
        wav.encode_wav(sig, 8000, bits=16),          # 0: resampled
        flac.encode_flac(sig, 8000),                 # 1: resampled
        aiff.encode_aiff(stereo, 8000),              # 2: stereo
        wav.encode_wav(sig, 4000, bits=16),          # 3: already at target
    ]
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.resample_audio(
            _audio_media(spark, payloads), 4000, strict=True
        ).collect()
    }
    assert out[3] == payloads[3]  # passthrough byte-identical
    # expected kernel: n_out = n*target//src, endpoint-clamped lerp
    n_out = 400 * 4000 // 8000
    pos = np.arange(n_out) * 2.0
    i0 = pos.astype(int)
    i1 = np.minimum(i0 + 1, 399)
    exp = sig[i0] * (1 - (pos - i0)) + sig[i1] * (pos - i0)
    expq = np.round(np.clip(exp, -1, 1) * 32767) / 32768
    got_wav, meta = wav.decode_wav(out[0])
    assert meta["sample_rate"] == 4000 and meta["n_frames"] == n_out
    np.testing.assert_allclose(got_wav, expq, atol=0)
    got_flac, fmeta = flac.decode_flac(out[1])
    assert fmeta["sample_rate"] == 4000
    np.testing.assert_allclose(got_flac.reshape(-1), expq, atol=0)
    got_st, smeta = aiff.decode_aiff(out[2])
    assert smeta["channels"] == 2 and got_st.shape == (n_out, 2)
    np.testing.assert_allclose(got_st[:, 0], expq, atol=1e-9)
    np.testing.assert_allclose(got_st[:, 1], -expq, atol=1e-9)
    # upsample: doubles the frame count, keeps the rate metadata
    up = mm.resample_audio(
        _audio_media(spark, [payloads[0]]), 16000, strict=True
    ).collect()[0]
    usig, umeta = wav.decode_wav(bytes(up["payload"]))
    assert umeta["sample_rate"] == 16000 and umeta["n_frames"] == 800


def test_resample_audio_strict_contract(spark):
    """Non-decodable audio raises under strict, passes through under
    plumbing mode; non-audio rows always pass through."""
    import pytest as _pytest

    from physicsnemo_curator_spark.sources import multimodal as mm

    bogus = b"\xff\xfb\x90\x00" + b"\x00" * 64  # MP3-ish header
    df = _audio_media(spark, [bogus])
    kept = mm.resample_audio(df, 4000).collect()[0]
    assert bytes(kept["payload"]) == bogus
    with _pytest.raises(Exception):
        mm.resample_audio(df, 4000, strict=True).collect()
    # non-audio rows pass through even under strict
    img = df.replace("audio", "image", subset=["kind"])
    assert bytes(
        mm.resample_audio(img, 4000, strict=True).collect()[0]["payload"]
    ) == bogus


def test_resample_audio_degenerate_inputs(spark):
    """Sub-sample payloads (n*target//src == 0) honor the documented
    contracts: the kernel mirrors input rank and the length formula
    (empty output), and the runner passes the row through rather than
    crashing FLAC's empty-signal encoder; strict raises loudly
    (ADVICE r10)."""
    import numpy as np
    import pytest as _pytest

    from physicsnemo_curator_spark.sources import flac, wav
    from physicsnemo_curator_spark.sources import multimodal as mm

    # one 8 kHz sample downsampled to 4 kHz: n_out = 1*4000//8000 = 0
    tiny_wav = wav.encode_wav(np.array([0.25]), 8000, bits=16)
    tiny_flac = flac.encode_flac(np.array([0.25]), 8000)
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.resample_audio(
            _audio_media(spark, [tiny_wav, tiny_flac]), 4000
        ).collect()
    }
    assert out[0] == tiny_wav and out[1] == tiny_flac  # pass-through
    with _pytest.raises(Exception, match="shorter than one"):
        mm.resample_audio(
            _audio_media(spark, [tiny_flac]), 4000, strict=True
        ).collect()
    # n < 2 but n_out >= 1: first sample repeated, rank preserved
    up = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.resample_audio(
            _audio_media(spark, [tiny_wav]), 16000
        ).collect()
    }
    s, meta = wav.decode_wav(up[0])
    assert meta["sample_rate"] == 16000 and s.ndim == 1 and len(s) == 2
    assert np.allclose(s, s[0])
