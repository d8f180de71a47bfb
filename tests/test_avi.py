"""RIFF/AVI container codec: exact DIB round-trips, MJPEG frame
parity with the in-repo JPEG codec, container-structure pins (avih /
strh / strf / idx1), sampling that skips entropy decode, honest
raises for the unsupported surface, and the Spark frame-sampler
integration (AVI payloads exploding through mapInPandas)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import avi, jpeg
from physicsnemo_curator_spark.sources import multimodal as mm


def _frames(n=5, h=13, w=17, rgb=True, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_raw_dib_roundtrip_exact():
    frames = _frames()
    data = avi.encode_avi(frames, fps=24, codec="raw")
    out, meta = avi.decode_avi(data)
    assert meta["width"] == 17 and meta["height"] == 13
    assert meta["fps"] == 24 and meta["codec"] == "raw"
    assert len(out) == 5
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_raw_dib_gray_promotes_to_rgb():
    g = _frames(3, 8, 6, rgb=False)
    out, _ = avi.decode_avi(avi.encode_avi(g, fps=10, codec="raw"))
    for a, b in zip(g, out):
        np.testing.assert_array_equal(np.stack([a] * 3, axis=2), b)


def test_mjpeg_frames_match_standalone_jpeg_decode():
    """Each 00dc chunk must decode EXACTLY like the same frame pushed
    through encode_jpeg/decode_jpeg standalone — the container adds
    framing, not pixels."""
    frames = _frames(4, 16, 24)
    data = avi.encode_avi(frames, fps=30, codec="mjpeg", quality=80)
    out, meta = avi.decode_avi(data)
    assert meta["codec"] == "mjpeg" and len(out) == 4
    for a, b in zip(frames, out):
        ref, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=80))
        np.testing.assert_array_equal(ref, b)


def test_container_structure_pins():
    """Marker-level spec pins: RIFF/AVI fourccs, avih frame count and
    geometry, strh vids/MJPG with rate/scale = fps, 40-byte strf with
    MJPG biCompression, one idx1 entry per frame with offsets
    relative to the movi fourcc."""
    frames = _frames(3, 8, 8)
    data = avi.encode_avi(frames, fps=25, codec="mjpeg")
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert riff_size == len(data) - 8

    i = data.index(b"avih")
    usec, _, _, flags, total = struct.unpack_from("<IIIII", data, i + 8)
    assert usec == 40000 and total == 3 and flags & 0x10
    w, h = struct.unpack_from("<II", data, i + 8 + 32)
    assert (w, h) == (8, 8)

    i = data.index(b"strh")
    assert data[i + 8 : i + 12] == b"vids"
    assert data[i + 12 : i + 16] == b"MJPG"
    scale, rate = struct.unpack_from("<II", data, i + 28)
    assert rate // scale == 25

    i = data.index(b"strf")
    (bi_size,) = struct.unpack_from("<I", data, i + 8)
    assert bi_size == 40 and data[i + 8 + 16 : i + 8 + 20] == b"MJPG"

    i = data.index(b"idx1")
    (isz,) = struct.unpack_from("<I", data, i + 4)
    assert isz == 3 * 16
    movi_fourcc = data.index(b"movi")
    for k in range(3):
        ckid = data[i + 8 + 16 * k : i + 12 + 16 * k]
        flags, off, size = struct.unpack_from("<III", data, i + 12 + 16 * k)
        assert ckid == b"00dc" and flags == 0x10
        # offset points at the chunk fourcc, relative to 'movi'
        assert data[movi_fourcc + off : movi_fourcc + off + 4] == b"00dc"
        (csz,) = struct.unpack_from("<I", data, movi_fourcc + off + 4)
        assert csz == size


def test_iter_frames_samples_without_decoding_skipped():
    frames = _frames(7, 8, 8)
    data = bytearray(avi.encode_avi(frames, fps=30, codec="mjpeg"))
    # corrupt frame 1's entropy data (not sampled at every_n=2); the
    # sampler must not touch it
    parsed = avi.parse_avi(bytes(data))
    _, start, size = parsed["frames"][1]
    data[start + size - 3] ^= 0xFF
    idxs = [i for i, _ in avi.iter_avi_frames(bytes(data), every_n=2)]
    assert idxs == [0, 2, 4, 6]


def test_unsupported_raises_loudly():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi.decode_avi(b"\x00" * 16)
    with pytest.raises(ValueError, match="empty"):
        avi.encode_avi([], codec="raw")
    data = bytearray(avi.encode_avi(_frames(2, 8, 8), codec="mjpeg"))
    i = data.index(b"strf")
    data[i + 8 + 16 : i + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        avi.decode_avi(bytes(data))


def test_sample_frames_decodes_avi_payloads(spark):
    """AVI container payloads explode through the Spark frame sampler:
    geometry from the container headers (media row width/height NULL),
    payload = decoded RGB plane, every_n honored per container."""
    frames = [
        np.full((6, 4, 3), 40 * (i + 1), dtype=np.uint8) for i in range(5)
    ]
    data = avi.encode_avi(frames, fps=12, codec="raw")
    df = spark.createDataFrame(
        [
            (11, "video", bytearray(data), None, None, len(data)),
            (12, "image", bytearray(b"\x00" * 24), 6, 4, 24),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = sorted(
        mm.sample_frames(df, every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [(r["media_id"], r["frame_index"]) for r in rows] == [
        (11, 0), (11, 2), (11, 4)
    ]
    for r in rows:
        assert (r["width"], r["height"]) == (4, 6)
        px = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        assert px.shape == (6 * 4 * 3,)
        assert set(px.tolist()) == {40 * (r["frame_index"] + 1)}


def test_sample_frames_mixed_avi_and_raw_planes(spark):
    """One batch carrying BOTH conventions: an MJPEG AVI and a raw
    plane concatenation — each routes to its own decode path."""
    g = np.full((8, 8), 200, dtype=np.uint8)
    container = avi.encode_avi([g, g, g], fps=30, codec="mjpeg")
    planes = b"".join(bytes([f] * 64) for f in range(4))
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(container), None, None, len(container)),
            (2, "video", bytearray(planes), 8, 8, len(planes)),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.sample_frames(df, every_n=3).collect()
    got = sorted((r["media_id"], r["frame_index"]) for r in rows)
    assert got == [(1, 0), (2, 0), (2, 3)]


def test_sample_frames_skips_undecodable_avi_unless_strict(spark):
    """A RIFF/AVI payload with an unsupported compression (e.g.
    Xvid) must follow the strict/plumbing policy: skipped under
    strict=False, loud under strict=True — not a task-killing
    unhandled exception."""
    g = np.full((8, 8), 50, dtype=np.uint8)
    data = bytearray(avi.encode_avi([g, g], fps=10, codec="mjpeg"))
    i = data.index(b"strf")
    data[i + 8 + 16 : i + 8 + 20] = b"XVID"
    df = spark.createDataFrame(
        [(3, "video", bytearray(bytes(data)), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    assert mm.sample_frames(df).count() == 0
    with pytest.raises(Exception, match="XVID"):
        mm.sample_frames(df, strict=True).collect()


def test_multi_stream_avi_frames_come_from_elected_stream_only():
    """An AVI carrying an audio stream ('01wb' chunks) besides the
    video stream: only the video stream's chunks become frames."""
    g = np.full((6, 4), 200, dtype=np.uint8)
    data = bytearray(avi.encode_avi([g, g, g], fps=10, codec="raw"))
    # splice a fake audio chunk into the movi list
    i = data.index(b"movi")
    audio = b"01wb" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    spliced = bytes(data[: i + 4]) + audio + bytes(data[i + 4 :])
    # fix the movi LIST size and the RIFF size
    spliced = bytearray(spliced)
    li = spliced.index(b"movi") - 8  # LIST header start
    (lsz,) = struct.unpack_from("<I", spliced, li + 4)
    struct.pack_into("<I", spliced, li + 4, lsz + len(audio))
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    parsed = avi.parse_avi(bytes(spliced))
    assert len(parsed["frames"]) == 3
    out, meta = avi.decode_avi(bytes(spliced))
    assert len(out) == 3
    for f in out:
        assert set(f.reshape(-1).tolist()) == {200}


def test_extract_features_real_video_stats(spark):
    """AVI payloads get REAL features under strict=True: container
    geometry, fps, frame count, and first-frame pixel stats."""
    frames = [np.full((6, 4), 100, dtype=np.uint8) for _ in range(5)]
    data = avi.encode_avi(frames, fps=12, codec="raw")
    df = spark.createDataFrame(
        [(1, "video", bytearray(data), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    feat = mm.extract_features(df, dim=8, strict=True).collect()[0]
    assert feat.feature[:4] == [4.0, 6.0, 12.0, 5.0]
    assert abs(feat.feature[4] - 100 / 255) < 1e-9
    assert feat.feature[5] == 0.0  # constant frame


def test_interleaved_audio_video_avi():
    """Two-stream AVI (vids + auds): video decode takes only the
    elected stream's chunks, extract_avi_audio reassembles the 01wb
    chunks in order and decodes them through the WAV tag dispatch —
    16-bit PCM round-trips within decode normalization."""
    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 256, (6, 4, 3), dtype=np.uint8) for _ in range(4)
    ]
    audio = 0.5 * np.sin(np.arange(4000) / 9.0)
    data = avi.encode_avi_with_audio(
        frames, audio, 8000, fps=10, codec="raw"
    )
    out, meta = avi.decode_avi(data)
    assert len(out) == 4 and meta["codec"] == "raw"
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)
    sig, ameta = avi.extract_avi_audio(data)
    assert ameta["sample_rate"] == 8000 and ameta["n_frames"] == 4000
    exp = np.round(np.clip(audio, -1, 1) * 32767) / 32768
    assert np.abs(sig - exp).max() < 1e-12
    # stereo + mjpeg variant
    st = np.stack([audio[:2000], -audio[:2000]], axis=1)
    d2 = avi.encode_avi_with_audio(frames, st, 44100, codec="mjpeg")
    s2, m2 = avi.extract_avi_audio(d2)
    assert m2["channels"] == 2 and s2.shape == (2000, 2)
    with pytest.raises(ValueError, match="no audio"):
        avi.extract_avi_audio(avi.encode_avi(frames, codec="raw"))
