"""ISO BMFF (MP4/MOV) container codec: exact raw-RGB round-trips,
MJPEG frame parity with the in-repo JPEG codec, box/sample-table
structure pins (ftyp / mvhd / stsd / stts / stsz / stco), general
stsc resolution, sampling that skips entropy decode, honest raises
for the unsupported surface (avc1 / mp4a), audio-track extraction,
and the Spark frame-sampler integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import jpeg, mp4
from physicsnemo_curator_spark.sources import multimodal as mm


def _frames(n=5, h=13, w=17, rgb=True, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_raw_rgb_roundtrip_exact():
    frames = _frames()
    data = mp4.encode_mp4(frames, fps=24, codec="raw")
    out, meta = mp4.decode_mp4(data)
    assert meta["width"] == 17 and meta["height"] == 13
    assert meta["fps"] == 24 and meta["codec"] == "raw"
    assert len(out) == 5
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_gray_promotes_to_rgb():
    g = _frames(3, 8, 6, rgb=False)
    out, _ = mp4.decode_mp4(mp4.encode_mp4(g, fps=10, codec="raw"))
    for a, b in zip(g, out):
        np.testing.assert_array_equal(np.stack([a] * 3, axis=2), b)


def test_mjpeg_frames_match_standalone_jpeg_decode():
    """Each 'jpeg' sample must decode EXACTLY like the same frame
    pushed through encode_jpeg/decode_jpeg standalone — the container
    adds framing, not pixels."""
    frames = _frames(4, 16, 24)
    data = mp4.encode_mp4(frames, fps=30, codec="mjpeg", quality=80)
    out, meta = mp4.decode_mp4(data)
    assert meta["codec"] == "mjpeg" and len(out) == 4
    for a, b in zip(frames, out):
        ref, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=80))
        np.testing.assert_array_equal(ref, b)


def test_box_structure_pins():
    """Byte-level 14496-12 pins: ftyp first, big-endian sizes, mdhd
    timescale = fps, stts one run of n samples, per-sample stsz whose
    sum is the mdat body, stco pointing at the first sample's SOI."""
    frames = _frames(3, 8, 8)
    data = mp4.encode_mp4(frames, fps=25, codec="mjpeg")
    (sz,) = struct.unpack_from(">I", data, 0)
    assert data[4:8] == b"ftyp" and data[8:12] == b"isom"

    i = data.index(b"mdat") - 4
    (mdat_sz,) = struct.unpack_from(">I", data, i)
    body = i + 8

    j = data.index(b"mdhd")
    timescale, duration = struct.unpack_from(">II", data, j + 4 + 4 + 8)
    assert timescale == 25 and duration == 3

    j = data.index(b"stts")
    n_entries, count, delta = struct.unpack_from(">III", data, j + 8)
    assert (n_entries, count, delta) == (1, 3, 1)

    j = data.index(b"stsz")
    sample_size, n = struct.unpack_from(">II", data, j + 8)
    assert sample_size == 0 and n == 3
    sizes = struct.unpack_from(">3I", data, j + 16)
    assert sum(sizes) == mdat_sz - 8

    j = data.index(b"stco")
    n_off, off = struct.unpack_from(">II", data, j + 8)
    assert n_off == 1 and off == body
    assert data[off : off + 2] == b"\xff\xd8"  # SOI of sample 0


def test_resolve_samples_general_stsc():
    """Multi-entry stsc: chunks 1-2 carry 2 samples each, chunk 3
    carries 1 — the flattener must honor the run boundaries."""
    st = {
        "sizes": [10, 11, 12, 13, 14],
        "chunk_offsets": [100, 200, 300],
        "stsc": [(1, 2, 1), (3, 1, 1)],
    }
    assert mp4._resolve_samples(st) == [
        (100, 10), (110, 11), (200, 12), (212, 13), (300, 14)
    ]


def test_iter_frames_samples_without_decoding_skipped():
    frames = _frames(7, 8, 8)
    data = bytearray(mp4.encode_mp4(frames, fps=30, codec="mjpeg"))
    parsed = mp4.parse_mp4(bytes(data))
    start, size = parsed["frames"][1]
    data[start + size - 3] ^= 0xFF
    idxs = [i for i, _ in mp4.iter_mp4_frames(bytes(data), every_n=2)]
    assert idxs == [0, 2, 4, 6]


def test_largesize_boxes_walk():
    """A size==1 largesize mdat must still resolve sample offsets
    (offsets are absolute, so re-wrapping shifts nothing before
    moov)."""
    data = mp4.encode_mp4(_frames(2, 8, 8), codec="raw")
    boxes = list(mp4._walk_boxes(data, 0, len(data)))
    assert [b[0] for b in boxes] == [b"ftyp", b"mdat", b"moov"]
    # synthesize a largesize wrapper around an empty free box
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    out = list(mp4._walk_boxes(free, 0, len(free)))
    assert out == [(b"free", 16, 16)]


def test_unsupported_raises_loudly():
    with pytest.raises(ValueError, match="ISO BMFF"):
        mp4.decode_mp4(b"\x00" * 16)
    with pytest.raises(ValueError, match="empty"):
        mp4.encode_mp4([], codec="raw")
    data = bytearray(mp4.encode_mp4(_frames(2, 8, 8), codec="mjpeg"))
    i = data.index(b"stsd")
    # the sample-entry fourcc sits 8 bytes into the stsd payload
    entry = bytes(data).index(b"jpeg", i)
    data[entry : entry + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4.decode_mp4(bytes(data))


def test_audio_track_roundtrip_all_codecs():
    frames = _frames(3, 8, 8)
    audio = 0.5 * np.sin(np.arange(4000) / 9.0)
    exp16 = np.round(np.clip(audio, -1, 1) * 32767) / 32768
    for ac in ("sowt", "twos"):
        d = mp4.encode_mp4_with_audio(
            frames, audio, 8000, fps=10, codec="raw", audio_codec=ac
        )
        sig, meta = mp4.extract_mp4_audio(d)
        assert meta["sample_rate"] == 8000 and meta["n_frames"] == 4000
        assert meta["bits"] == 16
        assert np.abs(sig - exp16).max() < 1e-12
        # the video track must survive the second trak untouched
        out, vmeta = mp4.decode_mp4(d)
        assert len(out) == 3 and vmeta["codec"] == "raw"
        np.testing.assert_array_equal(out[0], frames[0])
    for ac in ("ulaw", "alaw"):
        d = mp4.encode_mp4_with_audio(
            frames, audio, 8000, codec="raw", audio_codec=ac
        )
        sig, meta = mp4.extract_mp4_audio(d)
        assert meta["bits"] == 8
        assert np.abs(sig - audio).max() < 0.02  # G.711 quantization
    # stereo
    st = np.stack([audio[:2000], -audio[:2000]], axis=1)
    d2 = mp4.encode_mp4_with_audio(frames, st, 44100, codec="mjpeg")
    s2, m2 = mp4.extract_mp4_audio(d2)
    assert m2["channels"] == 2 and s2.shape == (2000, 2)
    with pytest.raises(ValueError, match="no audio"):
        mp4.extract_mp4_audio(mp4.encode_mp4(frames, codec="raw"))


def test_mp4a_audio_entry_is_codec_gated():
    frames = _frames(2, 8, 8)
    d = bytearray(
        mp4.encode_mp4_with_audio(
            frames, np.zeros(100), 8000, codec="raw", audio_codec="sowt"
        )
    )
    entry = bytes(d).index(b"sowt")
    d[entry : entry + 4] = b"mp4a"
    with pytest.raises(NotImplementedError, match="mp4a"):
        mp4.extract_mp4_audio(bytes(d))


def test_sample_frames_decodes_mp4_payloads(spark):
    """ISO BMFF payloads explode through the Spark frame sampler via
    the container-family dispatch — same policy as AVI."""
    frames = [
        np.full((6, 4, 3), 40 * (i + 1), dtype=np.uint8) for i in range(5)
    ]
    data = mp4.encode_mp4(frames, fps=12, codec="raw")
    df = spark.createDataFrame(
        [(21, "video", bytearray(data), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    rows = sorted(
        mm.sample_frames(df, every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [(r["media_id"], r["frame_index"]) for r in rows] == [
        (21, 0), (21, 2), (21, 4)
    ]
    for r in rows:
        assert (r["width"], r["height"]) == (4, 6)
        px = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        assert set(px.tolist()) == {40 * (r["frame_index"] + 1)}


def test_extract_features_real_mp4_stats(spark):
    frames = [np.full((6, 4), 100, dtype=np.uint8) for _ in range(5)]
    data = mp4.encode_mp4(frames, fps=12, codec="raw")
    df = spark.createDataFrame(
        [(1, "video", bytearray(data), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    feat = mm.extract_features(df, dim=8, strict=True).collect()[0]
    assert feat.feature[:4] == [4.0, 6.0, 12.0, 5.0]
    assert abs(feat.feature[4] - 100 / 255) < 1e-9
    assert feat.feature[5] == 0.0
