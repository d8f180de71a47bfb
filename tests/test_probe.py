"""Header-only media probe + EXIF: every format family probes its
geometry/duration WITHOUT decoding, EXIF embeds/extracts through the
TIFF IFD machinery, orientation transforms are exact, and the Spark
operator handles mixed/corrupt tables under both policies."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import (
    aiff,
    avi,
    bmp,
    exif,
    flac,
    gif,
    jpeg,
    mkv,
    mp4,
    multimodal as mm,
    png,
    probe,
    tiff,
    wav,
)

_RNG = np.random.default_rng(29)


def _payloads():
    img = _RNG.integers(0, 256, (8, 12), dtype=np.uint8)
    sig = np.sin(np.arange(4000) / 9.0) * 0.5
    frames = [img] * 3
    return {
        "png": (png.encode_png(img), dict(kind="image", width=12, height=8)),
        "jpeg": (
            exif.embed_exif(
                jpeg.encode_jpeg(img, quality=90), {"orientation": 6}
            ),
            dict(kind="image", width=12, height=8, orientation=6),
        ),
        "bmp": (bmp.encode_bmp(img), dict(kind="image", width=12, height=8)),
        "tiff": (
            tiff.encode_tiff_multi([img, img]),
            dict(kind="image", n_frames=2),
        ),
        "gif": (
            gif.encode_gif(frames, delay_cs=4),
            dict(kind="video", n_frames=3, duration_s=0.12),
        ),
        "wav": (
            wav.encode_wav(sig, 8000),
            dict(kind="audio", sample_rate=8000, n_frames=4000,
                 duration_s=0.5),
        ),
        "flac": (
            flac.encode_flac(sig, 8000),
            dict(kind="audio", sample_rate=8000, n_frames=4000),
        ),
        "ogg-flac": (
            flac.encode_ogg_flac(sig, 8000),
            dict(kind="audio", sample_rate=8000, n_frames=4000),
        ),
        "aiff": (
            aiff.encode_aiff(sig, 8000),
            dict(kind="audio", sample_rate=8000, n_frames=4000),
        ),
        "avi": (
            avi.encode_avi(frames, fps=10, codec="mjpeg"),
            dict(kind="video", width=12, height=8, n_frames=3,
                 duration_s=0.3),
        ),
        "mp4": (
            mp4.encode_mp4(frames, fps=10, codec="raw"),
            dict(kind="video", width=12, height=8, n_frames=3),
        ),
        "mkv": (
            mkv.encode_mkv(frames, fps=10),
            dict(kind="video", width=12, height=8, n_frames=3),
        ),
    }


def test_probe_every_format_without_decode():
    for fmt, (payload, expect) in _payloads().items():
        p = probe.probe_media(payload)
        assert p["format"] == fmt, (fmt, p)
        for k, v in expect.items():
            assert p[k] == v, (fmt, k, p)
    u = probe.probe_media(b"NOTAMEDIAFORMAT" * 4)
    assert u["format"] == "unknown" and u["kind"] is None


def test_probe_never_entropy_decodes():
    """Corrupting the entropy payload of a JPEG/AVI must not change
    the probe result — only headers are read."""
    img = _RNG.integers(0, 256, (8, 12), dtype=np.uint8)
    d = bytearray(jpeg.encode_jpeg(img, quality=90))
    d[-10] ^= 0xFF  # inside entropy data
    p = probe.probe_media(bytes(d))
    assert (p["width"], p["height"]) == (12, 8)
    a = bytearray(avi.encode_avi([img] * 3, fps=10, codec="mjpeg"))
    parsed = avi.parse_avi(bytes(a))
    _c, start, size = parsed["frames"][1]
    a[start + size - 3] ^= 0xFF
    assert probe.probe_media(bytes(a))["n_frames"] == 3


def test_exif_roundtrip_and_replacement():
    img = _RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    j = jpeg.encode_jpeg(img, quality=90)
    tags = {
        "orientation": 6, "make": "Cam", "model": "X-1",
        "datetime": "2026:08:15 12:00:00",
        "datetime_original": "2026:08:15 11:59:58",
        "pixel_width": 8, "pixel_height": 8,
    }
    j2 = exif.embed_exif(j, tags)
    assert exif.extract_exif(j2) == tags
    # embed replaces, decode still works, plain file has no exif
    assert exif.extract_exif(exif.embed_exif(j2, {"orientation": 3})) == {
        "orientation": 3
    }
    out, _ = jpeg.decode_jpeg(j2)
    np.testing.assert_array_equal(out, jpeg.decode_jpeg(j)[0])
    assert exif.extract_exif(j) == {}


def test_orientation_transforms():
    a = np.arange(12).reshape(3, 4)
    # each transform applied to its inverse partner restores identity
    assert exif.normalize_orientation(a, 1) is a
    np.testing.assert_array_equal(
        exif.normalize_orientation(exif.normalize_orientation(a, 2), 2), a
    )
    np.testing.assert_array_equal(
        exif.normalize_orientation(exif.normalize_orientation(a, 6), 8), a
    )
    r = exif.normalize_orientation(a, 6)  # rotate CW
    assert r.shape == (4, 3) and r[0, 0] == a[-1, 0]
    rgb = _RNG.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    assert exif.normalize_orientation(rgb, 5).shape == (4, 3, 3)
    with pytest.raises(ValueError, match="orientation"):
        exif.normalize_orientation(a, 9)


def test_with_media_probe_mixed_table(spark):
    payloads = _payloads()
    rows = [
        (i, "image", bytearray(v[0]), None, None, len(v[0]))
        for i, v in enumerate(payloads.values())
    ]
    rows.append((99, "image", bytearray(b"JUNK" * 8), None, None, 32))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in probe.with_media_probe(df).collect()}
    assert len(got) == len(rows)
    fmts = [got[i].format for i in range(len(payloads))]
    assert fmts == list(payloads.keys())
    assert got[99].format == "unknown"
    # corrupt-but-recognized payload: error under plumbing, raise strict
    bad = bytearray(png.encode_png(_RNG.integers(0, 256, (4, 4), dtype=np.uint8)))
    bad = bad[:12]  # truncated IHDR
    df2 = spark.createDataFrame(
        [(0, "image", bytes(bad), None, None, len(bad))], mm.MEDIA_SCHEMA
    )
    assert probe.with_media_probe(df2).collect()[0].format == "error"
    with pytest.raises(Exception):
        probe.with_media_probe(df2, strict=True).collect()


# ---------------------------------------------------------------------------
# code-review regressions


def test_probe_jpeg_survives_corrupt_exif():
    """A corrupt EXIF blob degrades to geometry-only — never an
    error row for an image whose picture headers are valid."""
    import struct

    img = _RNG.integers(0, 256, (8, 12), dtype=np.uint8)
    j = bytearray(
        exif.embed_exif(jpeg.encode_jpeg(img, quality=90), {"orientation": 6})
    )
    at = bytes(j).index(b"Exif\x00\x00") + 6
    struct.pack_into("<I", j, at + 4, 0xFFFFFF)  # absurd IFD0 offset
    p = probe.probe_media(bytes(j))
    assert p["format"] == "jpeg"
    assert (p["width"], p["height"]) == (12, 8)
    assert p["orientation"] is None


def test_probe_exact_durations_non_integer_fps():
    """NTSC-style material (30000/1001) must probe the exact
    n*delta/timescale duration, not n / round(fps)."""
    import struct

    img = _RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    d = bytearray(mp4.encode_mp4([img] * 30, fps=30, codec="raw"))
    # rewrite mdhd timescale 30 -> 30000 and stts delta 1 -> 1001
    at = bytes(d).index(b"mdhd")
    struct.pack_into(">I", d, at + 16, 30000)
    at = bytes(d).index(b"stts")
    struct.pack_into(">I", d, at + 16, 1001)
    p = probe.probe_media(bytes(d))
    assert abs(p["duration_s"] - 30 * 1001 / 30000) < 1e-12
    # AVI: rate/scale 30000/1001
    a = bytearray(avi.encode_avi([img] * 30, fps=30, codec="raw"))
    at = bytes(a).index(b"strh")
    struct.pack_into("<II", a, at + 28, 1001, 30000)  # scale, rate
    p = probe.probe_media(bytes(a))
    assert abs(p["duration_s"] - 30 * 1001 / 30000) < 1e-12


def test_probe_adpcm_without_fact_chunk():
    """External ADPCM writers may omit fact; the block math recovers
    the frame count from the headers alone."""
    import struct

    sig = np.sin(np.arange(505 * 3) / 9.0) * 0.5
    d = bytearray(wav.encode_wav(sig, 8000, bits=4))
    # excise the fact chunk (12 bytes: 'fact' + size + frames)
    at = bytes(d).index(b"fact")
    del d[at : at + 12]
    struct.pack_into("<I", d, 4, len(d) - 8)  # fix RIFF size
    p = probe.probe_media(bytes(d))
    assert p["format"] == "wav"
    assert p["n_frames"] == 505 * 3
    assert abs(p["duration_s"] - 505 * 3 / 8000) < 1e-12


def test_embed_exif_replaces_stale_segment_after_app0():
    """A stale EXIF APP1 sitting after a JFIF APP0 is removed."""
    import struct

    img = _RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    j = jpeg.encode_jpeg(img, quality=90)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    stale = exif.build_exif({"orientation": 6})
    app1 = b"\xff\xe1" + struct.pack(">H", len(stale) + 2) + stale
    foreign = j[:2] + app0 + app1 + j[2:]
    out = exif.embed_exif(foreign, {"orientation": 1})
    assert out.count(b"Exif\x00\x00") == 1
    assert exif.extract_exif(out) == {"orientation": 1}
    assert b"JFIF" in out  # the APP0 survives
    px, _ = jpeg.decode_jpeg(out)
    np.testing.assert_array_equal(px, jpeg.decode_jpeg(j)[0])


def test_probe_aiff_zero_frames_is_null():
    d = aiff.encode_aiff(np.zeros(0), 8000)
    p = probe.probe_media(d)
    assert p["n_frames"] is None and p["duration_s"] is None


def test_probe_bmp_channel_map():
    import struct

    h, w = 2, 2
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 0, h * w * 4, 0, 0, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + h * w * 4, 0, 0, 54)
    d = hdr + info + b"\x00" * (h * w * 4)
    assert probe.probe_media(d)["channels"] == 4
