"""Matroska/EBML container codec: MJPEG frame parity with the
in-repo JPEG codec, EBML varint and element-structure pins, cluster
splitting, honest raises for the unsupported surface (non-MJPEG
codec ids), Xiph/fixed/EBML block lacing round-trips, audio-track
extraction across the four PCM / G.711 codec ids, and the Spark
frame-sampler integration."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import jpeg, mkv
from physicsnemo_curator_spark.sources import multimodal as mm


def _frames(n=5, h=13, w=17, rgb=True, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_vint_roundtrip_and_boundaries():
    """RFC 8794: the all-ones payload is reserved for 'unknown', so
    127 must take 2 bytes; IDs keep their marker bit."""
    for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 3, 2**28):
        enc = mkv._vint(v)
        got, pos = mkv._read_vint(enc, 0)
        assert got == v and pos == len(enc)
    assert len(mkv._vint(126)) == 1
    assert len(mkv._vint(127)) == 2
    eid, _ = mkv._read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True)
    assert eid == 0x1A45DFA3
    # unknown-size marker decodes to None
    assert mkv._read_vint(b"\xff", 0)[0] is None


def test_mjpeg_frames_match_standalone_jpeg_decode():
    frames = _frames(4, 16, 24)
    data = mkv.encode_mkv(frames, fps=30, quality=80)
    out, meta = mkv.decode_mkv(data)
    assert meta["codec"] == "mjpeg" and len(out) == 4
    assert meta["width"] == 24 and meta["height"] == 16
    for a, b in zip(frames, out):
        ref, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=80))
        np.testing.assert_array_equal(ref, b)


def test_ebml_structure_pins():
    """Spec pins: the EBML header leads with 0x1A45DFA3 and declares
    DocType 'matroska'; the Segment carries Info with a 1e6
    TimestampScale; the video TrackEntry pins number/type/codec."""
    data = mkv.encode_mkv(_frames(2, 8, 8), fps=10)
    assert data[:4] == b"\x1a\x45\xdf\xa3"
    assert b"matroska" in data[:64]
    tracks, blocks = mkv._segment_spans(data)
    assert tracks[1]["type"] == 1 and tracks[1]["codec_id"] == "V_MJPEG"
    assert tracks[1]["width"] == 8 and tracks[1]["height"] == 8
    assert len(blocks) == 2
    # every block payload is a JPEG (SOI marker)
    for _tn, ps, _pe in blocks:
        assert data[ps : ps + 2] == b"\xff\xd8"


def test_cluster_split_keeps_rel_timestamps_in_int16():
    """40 frames at 1 fps = 40 s of video → the 30 s cluster split
    must produce >1 cluster and still decode every frame in order."""
    frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(40)]
    data = mkv.encode_mkv(frames, fps=1, quality=100)
    out, meta = mkv.decode_mkv(data)
    assert meta["n_frames"] == 40
    seg = next(
        (b, e) for eid, b, e in mkv._walk(data, 0, len(data))
        if eid == mkv._SEGMENT
    )
    n_clusters = sum(
        1 for eid, _b, _e in mkv._walk(data, *seg) if eid == mkv._CLUSTER
    )
    assert n_clusters >= 2


def test_iter_frames_samples_without_decoding_skipped():
    frames = _frames(7, 8, 8)
    data = bytearray(mkv.encode_mkv(frames, fps=30))
    parsed = mkv.parse_mkv(bytes(data))
    start, size = parsed["frames"][1]
    data[start + size - 3] ^= 0xFF
    idxs = [i for i, _ in mkv.iter_mkv_frames(bytes(data), every_n=2)]
    assert idxs == [0, 2, 4, 6]


def test_unsupported_raises_loudly():
    with pytest.raises(ValueError, match="Matroska"):
        mkv.decode_mkv(b"\x00" * 16)
    with pytest.raises(ValueError, match="empty"):
        mkv.encode_mkv([])
    data = bytearray(mkv.encode_mkv(_frames(2, 8, 8)))
    i = bytes(data).index(b"V_MJPEG")
    data[i : i + 7] = b"V_VP9\x00\x00"
    with pytest.raises(NotImplementedError, match="V_VP9"):
        mkv.decode_mkv(bytes(data))


def test_signed_vint_roundtrip():
    for delta in (0, 1, -1, 63, -63, 64, -64, 8191, -8191, 8192,
                  -8192, 2**20, -(2**20)):
        enc = mkv._svint(delta)
        dec, pos = mkv._read_svint(enc, 0)
        assert dec == delta and pos == len(enc)
    # a 1-byte signed vint holds ±63: width must bump at 64
    assert len(mkv._svint(63)) == 1 and len(mkv._svint(64)) == 2


def test_block_frames_all_three_lacings():
    # payloads chosen so Xiph exercises the 255-run coding (>=510
    # bytes) and EBML exercises a negative delta
    payloads = [b"a" * 600, b"b" * 17, b"c" * 300, b"d" * 5]
    for lacing, flag in (("xiph", 0x02), ("fixed", 0x04), ("ebml", 0x06)):
        ps = [b"x" * 40] * 4 if lacing == "fixed" else payloads
        blk = mkv._laced_simple_block(3, -7, ps, lacing)
        # strip the element header (id + size vint) to the block body
        _eid, p = mkv._read_vint(blk, 0, keep_marker=True)
        _sz, body = mkv._read_vint(blk, p)
        assert blk[body] == 0x80 | 3  # track vint
        assert blk[body + 3] & 0x06 == flag
        track, spans = mkv._block_frames(blk, body, len(blk))
        assert track == 3
        assert [blk[a:b] for a, b in spans] == ps


def test_laced_audio_roundtrips_every_mode():
    frames = _frames(2, 8, 8)
    audio = 0.5 * np.sin(np.arange(4001) / 9.0)  # odd on purpose
    exp16 = np.round(np.clip(audio, -1, 1) * 32767) / 32768
    for lacing in ("xiph", "ebml"):
        d = mkv.encode_mkv(
            frames, fps=10, audio=audio, sample_rate=8000,
            audio_codec="pcm", audio_lacing=lacing, lace_frames=7,
        )
        sig, meta = mkv.extract_mkv_audio(d)
        assert meta["n_frames"] == 4001
        assert np.abs(sig - exp16).max() < 1e-12
        out, _m = mkv.decode_mkv(d)
        assert len(out) == 2  # laced audio never leaks into video
    # fixed: needs an even split — 4000 % 8 == 0
    d = mkv.encode_mkv(
        frames, fps=10, audio=audio[:4000], sample_rate=8000,
        audio_codec="ulaw", audio_lacing="fixed", lace_frames=8,
    )
    sig, meta = mkv.extract_mkv_audio(d)
    assert meta["n_frames"] == 4000 and meta["bits"] == 8
    assert np.abs(sig - audio[:4000]).max() < 0.02
    with pytest.raises(ValueError, match="divisible"):
        mkv.encode_mkv(
            frames, audio=audio, sample_rate=8000,
            audio_lacing="fixed", lace_frames=8,
        )
    with pytest.raises(ValueError, match="unknown audio lacing"):
        mkv.encode_mkv(
            frames, audio=audio, sample_rate=8000, audio_lacing="zip"
        )


def test_single_frame_ebml_lace_has_no_size_table():
    """A 1-frame EBML-laced block (legal: the size table codes all
    frames but the last, so one frame means zero entries) must yield
    the whole payload as one span — not consume payload bytes as a
    phantom size vint."""
    payload = b"\x85hello-world"  # starts with a valid-looking vint
    body = bytes([0x80 | 2]) + b"\x00\x00" + bytes([0x80 | 0x06, 0]) + payload
    blk = mkv._elem(mkv._SIMPLE_BLOCK, body)
    _eid, p = mkv._read_vint(blk, 0, keep_marker=True)
    _sz, start = mkv._read_vint(blk, p)
    track, spans = mkv._block_frames(blk, start, len(blk))
    assert track == 2
    assert [blk[a:b] for a, b in spans] == [payload]


def test_flag_lacing_declares_laced_blocks():
    """FlagLacing (0x9C) in the audio TrackEntry must be 1 when the
    writer emits laced blocks and 0 otherwise — a strict demuxer
    trusts the flag."""
    audio = np.linspace(-0.5, 0.5, 640)
    plain = mkv.encode_mkv(_frames(2, 8, 8), audio=audio, sample_rate=8000)
    laced = mkv.encode_mkv(
        _frames(2, 8, 8), audio=audio, sample_rate=8000,
        audio_lacing="xiph", lace_frames=4,
    )
    assert b"\x9c\x81\x00" in plain and b"\x9c\x81\x01" not in plain
    assert b"\x9c\x81\x01" in laced


def test_laced_stereo_sample_alignment():
    """Lace cuts must land on sample-frame boundaries — stereo 16-bit
    has 4-byte frames, and an uneven split that ignored alignment
    would shear the channels."""
    audio = np.stack(
        [np.linspace(-0.9, 0.9, 1001), -np.linspace(-0.9, 0.9, 1001)],
        axis=1,
    )
    d = mkv.encode_mkv(
        _frames(2, 8, 8), audio=audio, sample_rate=8000,
        audio_codec="pcm", audio_lacing="ebml", lace_frames=7,
    )
    sig, meta = mkv.extract_mkv_audio(d)
    assert meta["channels"] == 2 and sig.shape == (1001, 2)
    assert np.abs(sig + sig[:, ::-1]).max() < 1e-12  # anti-symmetric


def test_audio_track_roundtrip_all_codecs():
    frames = _frames(3, 8, 8)
    audio = 0.5 * np.sin(np.arange(4000) / 9.0)
    exp16 = np.round(np.clip(audio, -1, 1) * 32767) / 32768
    for ac, codec_id in (
        ("pcm", "A_PCM/INT/LIT"),
        ("pcm_be", "A_PCM/INT/BIG"),
    ):
        d = mkv.encode_mkv(
            frames, fps=10, audio=audio, sample_rate=8000, audio_codec=ac
        )
        tracks, _ = mkv._segment_spans(d)
        assert tracks[2]["codec_id"] == codec_id
        sig, meta = mkv.extract_mkv_audio(d)
        assert meta["sample_rate"] == 8000 and meta["n_frames"] == 4000
        assert np.abs(sig - exp16).max() < 1e-12
        out, _m = mkv.decode_mkv(d)
        assert len(out) == 3  # audio blocks never leak into frames
    for ac in ("ulaw", "alaw"):
        d = mkv.encode_mkv(
            frames, fps=10, audio=audio, sample_rate=8000, audio_codec=ac
        )
        sig, meta = mkv.extract_mkv_audio(d)
        assert meta["bits"] == 8
        assert np.abs(sig - audio).max() < 0.02
    # stereo
    st = np.stack([audio[:2000], -audio[:2000]], axis=1)
    d2 = mkv.encode_mkv(frames, audio=st, sample_rate=44100)
    s2, m2 = mkv.extract_mkv_audio(d2)
    assert m2["channels"] == 2 and s2.shape == (2000, 2)
    with pytest.raises(ValueError, match="no audio"):
        mkv.extract_mkv_audio(mkv.encode_mkv(frames))


def test_sample_frames_decodes_mkv_payloads(spark):
    frames = [
        np.full((6, 4), 40 * (i + 1), dtype=np.uint8) for i in range(5)
    ]
    data = mkv.encode_mkv(frames, fps=12, quality=100)
    df = spark.createDataFrame(
        [(31, "video", bytearray(data), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    rows = sorted(
        mm.sample_frames(df, every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [(r["media_id"], r["frame_index"]) for r in rows] == [
        (31, 0), (31, 2), (31, 4)
    ]
    for r in rows:
        assert (r["width"], r["height"]) == (4, 6)


def test_extract_features_real_mkv_stats(spark):
    frames = [np.full((6, 4), 100, dtype=np.uint8) for _ in range(5)]
    data = mkv.encode_mkv(frames, fps=12, quality=100)
    df = spark.createDataFrame(
        [(1, "video", bytearray(data), None, None, len(data))],
        mm.MEDIA_SCHEMA,
    )
    feat = mm.extract_features(df, dim=8, strict=True).collect()[0]
    # width, height, fps (unknown for mkv -> 0), frame count
    assert feat.feature[:4] == [4.0, 6.0, 0.0, 5.0]


def test_truncated_lace_size_tables_raise_valueerror():
    """Every size-table read in _block_frames is bounded by the block
    end: truncating a laced block inside its Xiph or EBML size table
    (or at the frame-count byte) must raise the codec's ValueError,
    never IndexError, and never read into the next element's bytes
    (ADVICE r10)."""
    payloads = [b"a" * 600, b"b" * 17, b"c" * 300, b"d" * 5]
    for lacing in ("xiph", "ebml"):
        blk = mkv._laced_simple_block(3, 0, payloads, lacing)
        _eid, p = mkv._read_vint(blk, 0, keep_marker=True)
        _sz, body = mkv._read_vint(blk, p)
        # truncate progressively through the header + size table; the
        # 255-run Xiph table for a 600-byte frame spans bytes ~5..8
        for cut in range(body, body + 10):
            with pytest.raises(ValueError):
                mkv._block_frames(blk, body, cut)
    # fixed lacing with a bogus end that is not divisible
    blk = mkv._laced_simple_block(3, 0, [b"x" * 40] * 4, "fixed")
    _eid, p = mkv._read_vint(blk, 0, keep_marker=True)
    _sz, body = mkv._read_vint(blk, p)
    # header = track vint + ts16 + flags + count = 5 bytes; 41 payload
    # bytes are not divisible by 4 frames
    with pytest.raises(ValueError):
        mkv._block_frames(blk, body, body + 5 + 41)


def test_lace_frame_count_error_message_says_2_to_256():
    with pytest.raises(ValueError, match="2..256"):
        mkv._laced_simple_block(3, 0, [b"x"] * 257, "xiph")
