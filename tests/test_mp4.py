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


# ---------------------------------------------------------------------------
# fragmented MP4 (14496-12 §8.8)


def test_fmp4_raw_roundtrip_exact():
    frames = _frames(n=7)
    data = mp4.encode_fmp4(frames, fps=24, codec="raw", samples_per_fragment=3)
    out, meta = mp4.decode_mp4(data)
    assert meta["fragmented"] is True
    assert meta["fps"] == 24 and meta["n_frames"] == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_fmp4_mjpeg_matches_progressive_decode():
    frames = _frames(n=4, rgb=False)
    frag = mp4.encode_fmp4(frames, fps=10, codec="mjpeg", quality=85,
                           samples_per_fragment=2)
    prog = mp4.encode_mp4(frames, fps=10, codec="mjpeg", quality=85)
    df, _ = mp4.decode_mp4(frag)
    dp, _ = mp4.decode_mp4(prog)
    assert len(df) == len(dp) == 4
    for a, b in zip(df, dp):
        assert np.array_equal(a, b)


def test_fmp4_structure_pins():
    """Init segment + per-fragment styp|moof|mdat, zero-sample stbl,
    trex defaults present."""
    frames = _frames(n=4)
    data = mp4.encode_fmp4(frames, fps=12, codec="raw",
                           samples_per_fragment=2)
    top = [f for f, _b, _e in mp4._walk_boxes(data, 0, len(data))]
    assert top[:2] == [b"ftyp", b"moov"]
    assert top[2:] == [b"styp", b"moof", b"mdat"] * 2
    boxes = mp4._children(data, 0, len(data))
    moov_ch = mp4._children(data, *boxes[b"moov"])
    assert b"mvex" in moov_ch
    trex = mp4._parse_trex_defaults(data, boxes[b"moov"])
    assert trex == {1: (1, 0)}
    # the moov sample table is empty: without fragments, zero frames
    for _tid, _h, _mdhd, stbl in mp4._iter_traks(data, boxes[b"moov"]):
        st = mp4._parse_stbl(data, stbl)
        assert st["sizes"] == [] and st["chunk_offsets"] == []


def test_fmp4_audio_track_uses_trex_default_size():
    """The audio trun omits per-sample sizes, so decode must resolve
    them through the trex default — and the payload must round-trip."""
    frames = _frames(n=4)
    audio = np.sin(np.linspace(0, 30, 960)) * 0.7
    data = mp4.encode_fmp4(frames, fps=12, codec="raw",
                           samples_per_fragment=2, audio=audio,
                           sample_rate=16000, audio_codec="twos")
    arr, meta = mp4.extract_mp4_audio(data)
    assert meta["sample_rate"] == 16000 and meta["n_frames"] == 960
    assert np.abs(arr - audio).max() < 1.5 / 32767
    # video track unaffected by the audio trafs
    out, _ = mp4.decode_mp4(data)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_fmp4_sequence_number_guard():
    frames = _frames(n=4)
    data = mp4.encode_fmp4(frames, fps=12, codec="raw",
                           samples_per_fragment=2)
    second = data.find(b"mfhd", data.find(b"mfhd") + 4)
    bad = bytearray(data)
    struct.pack_into(">I", bad, second + 8, 1)  # duplicate seq 1
    with pytest.raises(ValueError, match="sequence numbers"):
        mp4.parse_mp4(bytes(bad))


def test_fmp4_trun_without_size_or_default_raises():
    frames = _frames(n=2)
    data = mp4.encode_fmp4(frames, fps=12, codec="raw",
                           samples_per_fragment=2)
    # zero the trex default_sample_size AND strip per-sample sizes is
    # involved; instead corrupt the trun flags to drop size-present so
    # the video track (trex default 0) has no size source
    pos = data.find(b"trun")
    bad = bytearray(data)
    # flags live in the 3 bytes after the version byte at pos+4
    flags = int.from_bytes(data[pos + 5 : pos + 8], "big") & ~0x000200
    bad[pos + 5 : pos + 8] = flags.to_bytes(3, "big")
    with pytest.raises(ValueError, match="no tfhd/trex default"):
        mp4.parse_mp4(bytes(bad))


def test_fmp4_legacy_base_offset_rule():
    """Hand-built moof with TWO trafs and NO default-base-is-moof /
    base_data_offset: the first traf anchors at the moof start, the
    second at the end of the first traf's data (14496-12 §8.8.7)."""
    frames = _frames(n=2)
    h, w = frames[0].shape[:2]
    payloads = [mp4._raw_encode(f) for f in frames]
    sizes = [len(p) for p in payloads]
    entry = mp4._video_entry(b"raw ", w, h)
    ftyp = mp4._box(b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5")
    mvhd = mp4._full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, 0)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
        + mp4._MATRIX_IDENTITY + b"\x00" * 24 + struct.pack(">I", 2))
    trak = mp4._trak(
        mp4._tkhd(1, 0, w, h), mp4._mdhd(12, 0),
        mp4._hdlr(b"vide", b"VideoHandler"),
        mp4._full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        mp4._stbl_empty(entry))
    moov = mp4._box(
        b"moov", mvhd + trak + mp4._box(b"mvex", mp4._trex(1, 1, 0)))

    def tfhd_plain(track_id):  # flags 0: no base, no default-base-is-moof
        return mp4._full(b"tfhd", 0, 0, struct.pack(">I", track_id))

    def build(moof_len):
        # traf 1: sample 0 with explicit data offset (moof-start anchor)
        t1 = mp4._box(b"traf", tfhd_plain(1)
                      + mp4._trun([sizes[0]], 1, moof_len + 8))
        # traf 2: NO data offset -> anchors at end of traf 1's data
        trun2 = mp4._full(b"trun", 0, 0x000200,
                          struct.pack(">I", 1) + struct.pack(">I", sizes[1]))
        t2 = mp4._box(b"traf", tfhd_plain(1) + trun2)
        return mp4._box(
            b"moof", mp4._full(b"mfhd", 0, 0, struct.pack(">I", 1)) + t1 + t2)

    moof = build(len(build(0)))
    data = ftyp + moov + moof + mp4._box(b"mdat", b"".join(payloads))
    out, meta = mp4.decode_mp4(data)
    assert meta["n_frames"] == 2
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_progressive_then_fragments_concatenates_samples():
    """A progressive moov sample table plus trailing moof fragments:
    fragment samples follow the moov samples in decode order."""
    head_frames = _frames(n=2, seed=1)
    tail_frames = _frames(n=2, seed=2)
    prog = mp4.encode_mp4(head_frames, fps=12, codec="raw")
    # graft an mvex into the moov and append a fragment for the same
    # track; rebuild the moov box with mvex appended
    boxes = mp4._children(prog, 0, len(prog))
    mb, me = boxes[b"moov"]
    mvex = mp4._box(b"mvex", mp4._trex(1, 1, 0))
    new_moov = mp4._box(b"moov", prog[mb:me] + mvex)
    pre = prog[: mb - 8] + new_moov
    payloads = [mp4._raw_encode(f) for f in tail_frames]
    sizes = [len(p) for p in payloads]

    def build(moof_len):
        traf = mp4._box(
            b"traf",
            mp4._tfhd(1) + mp4._tfdt(2)
            + mp4._trun(sizes, 2, moof_len + 8))
        return mp4._box(
            b"moof",
            mp4._full(b"mfhd", 0, 0, struct.pack(">I", 1)) + traf)

    moof = build(len(build(0)))
    data = pre + moof + mp4._box(b"mdat", b"".join(payloads))
    out, meta = mp4.decode_mp4(data)
    assert meta["n_frames"] == 4 and meta["fragmented"] is True
    for a, b in zip(head_frames + tail_frames, out):
        assert np.array_equal(a, b)


def _split_segments(data: bytes):
    """Split an encode_fmp4 stream into (init, [media segments])."""
    spans = list(mp4._walk_boxes_spans(data, 0, len(data)))
    # init = ftyp + moov; each segment = styp + moof + mdat
    cut = next(e for f, _s, _b, e in spans if f == b"moov")
    init = data[:cut]
    segs = []
    start = None
    for f, s, _b, e in spans:
        if f == b"styp":
            start = s
        elif f == b"mdat" and start is not None:
            segs.append(data[start:e])
            start = None
    return init, segs


def test_assemble_fmp4_segments_renumbers_sequences():
    """Two independently-encoded representations both number their
    fragments from 1; naive concatenation trips the monotonic guard,
    assemble_fmp4_segments renumbers and decodes all frames in order."""
    fa = _frames(n=4, seed=3)
    fb = _frames(n=2, seed=4)
    da = mp4.encode_fmp4(fa, fps=12, codec="raw", samples_per_fragment=2)
    db = mp4.encode_fmp4(fb, fps=12, codec="raw", samples_per_fragment=2)
    init, segs_a = _split_segments(da)
    _, segs_b = _split_segments(db)
    assert len(segs_a) == 2 and len(segs_b) == 1
    # naive concatenation: second representation restarts at seq 1
    with pytest.raises(ValueError, match="sequence"):
        mp4.parse_mp4(init + b"".join(segs_a + segs_b))
    stream = mp4.assemble_fmp4_segments(init, segs_a + segs_b)
    out, meta = mp4.decode_mp4(stream)
    assert meta["n_frames"] == 6
    for a, b in zip(fa + fb, out):
        assert np.array_equal(a, b)


def test_assemble_fmp4_segments_guards():
    frames = _frames(n=2)
    data = mp4.encode_fmp4(frames, fps=12, codec="raw")
    init, segs = _split_segments(data)
    prog = mp4.encode_mp4(frames, fps=12, codec="raw")
    with pytest.raises(ValueError, match="mvex"):
        mp4.assemble_fmp4_segments(prog, segs)  # non-fragmented init
    with pytest.raises(ValueError, match="no moof"):
        mp4.assemble_fmp4_segments(init, [init])
    # absolute base_data_offset is concatenation-unsafe: rewrite the
    # tfhd to carry flag 0x000001 with a fabricated offset
    seg = bytearray(segs[0])
    pos = bytes(seg).find(b"tfhd")
    flags = int.from_bytes(seg[pos + 5 : pos + 8], "big") | 0x000001
    # rebuild: inject an 8-byte base_data_offset after track_id; box
    # sizes change, so build a minimal moof instead
    tfhd = mp4._full(b"tfhd", 0, flags | 0x020000,
                     struct.pack(">IQ", 1, 0))
    trun = mp4._trun([10], 1, 0)
    moof = mp4._box(
        b"moof",
        mp4._full(b"mfhd", 0, 0, struct.pack(">I", 1))
        + mp4._box(b"traf", tfhd + trun))
    bad_seg = moof + mp4._box(b"mdat", b"\x00" * 10)
    with pytest.raises(ValueError, match="base_data_offset"):
        mp4.assemble_fmp4_segments(init, [bad_seg])
