"""MPEG audio header surface (sources/mpegaudio.py): frame-walk
probing over the full public table matrix, VBR headers, ID3v1/v2
metadata, and the probe/audiotags dispatch integration.

No entropy decode exists (decode_mpeg_audio raises) — every assert
here is header arithmetic the builders and parsers must agree on.
"""

from __future__ import annotations

import struct

import pytest

from physicsnemo_curator_spark.sources import mpegaudio as M
from physicsnemo_curator_spark.sources.audiotags import (
    embed_audio_tags,
    extract_audio_tags,
    supported_keys,
)
from physicsnemo_curator_spark.sources.probe import probe_media

_ALL_RATES = [
    (v, r) for v, rates in M._SAMPLE_RATES.items() for r in rates
]


# ---------------------------------------------------------------------------
# frame walk over the full table matrix


@pytest.mark.parametrize("layer", [1, 2, 3])
def test_full_matrix_round_trip(layer):
    for version, rate in _ALL_RATES:
        group = "1" if version == "1" else "2"
        for bitrate in M._BITRATES[(group, layer)]:
            for channels in (1, 2):
                raw = M.build_mp3(
                    3,
                    bitrate_kbps=bitrate,
                    sample_rate=rate,
                    channels=channels,
                    layer=layer,
                )
                p = M.parse_mp3(raw)
                assert p["version"] == version
                assert p["layer"] == layer
                assert p["sample_rate"] == rate
                assert p["channels"] == channels
                assert p["bitrate_kbps"] == bitrate
                assert p["n_frames"] == 3
                spf = M._samples_per_frame(version, layer)
                assert p["n_samples"] == 3 * spf
                assert p["duration_s"] == pytest.approx(3 * spf / rate)


def test_padding_accumulator_hits_exact_average():
    # 128 kbps @ 44100 Hz: 417.96 bytes/frame — padding must make the
    # long-run average exact: total bytes over N frames equals
    # floor-accumulated slot count, and the parser re-walks it all
    n = 100
    raw = M.build_mp3(n, bitrate_kbps=128, sample_rate=44100, channels=2)
    p = M.parse_mp3(raw)
    assert p["n_frames"] == n
    # average frame length must equal 144*128000/44100 within 1 byte
    assert abs(len(raw) / n - 144 * 128000 / 44100) < 1.0


def test_layer1_slot_of_four():
    raw = M.build_mp3(4, bitrate_kbps=32, sample_rate=32000, layer=1,
                      channels=2)
    p = M.parse_mp3(raw)
    assert p["layer"] == 1
    assert p["n_samples"] == 4 * 384
    # frame length = (12*32000/32000)*4 = 48 bytes exactly
    assert len(raw) == 4 * 48


def test_id3v1_trailer_skipped_and_read():
    raw = M.build_mp3(5, bitrate_kbps=64, sample_rate=32000, channels=1)
    v1 = bytearray(128)
    v1[0:3] = b"TAG"
    v1[3 : 3 + 7] = b"mytitle"
    v1[33 : 33 + 8] = b"myartist"
    v1[93:97] = b"2026"
    full = raw + bytes(v1)
    p = M.parse_mp3(full)
    assert p["n_frames"] == 5  # trailer not mistaken for audio
    tags = M.extract_id3(full)
    assert tags == {"title": "mytitle", "artist": "myartist",
                    "date": "2026"}


def test_xing_header_frame_count_wins():
    raw = bytearray(
        M.build_mp3(4, bitrate_kbps=64, sample_rate=44100, channels=1)
    )
    xo = M._xing_offset("1", 1)
    raw[xo : xo + 4] = b"Xing"
    raw[xo + 4 : xo + 8] = struct.pack(">I", 1)  # frames flag
    raw[xo + 8 : xo + 12] = struct.pack(">I", 999)
    p = M.parse_mp3(bytes(raw))
    assert p["vbr"] is True
    assert p["n_samples"] == 999 * 1152


def test_info_header_marks_cbr():
    raw = bytearray(
        M.build_mp3(4, bitrate_kbps=64, sample_rate=44100, channels=1)
    )
    xo = M._xing_offset("1", 1)
    raw[xo : xo + 4] = b"Info"
    raw[xo + 4 : xo + 8] = struct.pack(">I", 1)
    raw[xo + 8 : xo + 12] = struct.pack(">I", 999)
    p = M.parse_mp3(bytes(raw))
    assert p["vbr"] is False
    # walked count minus the silent Info metadata frame, not Info's
    # own (distrusted) count
    assert p["n_samples"] == 3 * 1152


def test_vbri_header():
    raw = bytearray(
        M.build_mp3(4, bitrate_kbps=64, sample_rate=44100, channels=2)
    )
    raw[36:40] = b"VBRI"
    raw[50:54] = struct.pack(">I", 77)
    p = M.parse_mp3(bytes(raw))
    assert p["vbr"] is True
    assert p["n_samples"] == 77 * 1152


# ---------------------------------------------------------------------------
# ID3v2


def test_id3v24_round_trip_all_keys():
    tags = {
        "title": "T", "artist": "A", "album": "L", "date": "2026",
        "comment": "a note", "genre": "test", "software": "pcs",
    }
    blob = M.build_id3v2(tags)
    assert M.parse_id3v2(blob) == tags


def test_id3v24_utf8_values():
    tags = {"title": "smiley ☺", "comment": "naïve café"}
    assert M.parse_id3v2(M.build_id3v2(tags)) == tags


def test_embed_replaces_existing_leader():
    raw = M.build_mp3(3, bitrate_kbps=64, sample_rate=32000, channels=1,
                      tags={"title": "old", "genre": "g"})
    out = M.embed_id3v2(raw, {"title": "new"})
    assert M.extract_id3(out) == {"title": "new"}
    assert M.parse_mp3(out)["n_frames"] == 3
    assert out.count(b"ID3") == 1


def _v23_tag(frames: list[tuple[bytes, bytes]], flags: int = 0) -> bytes:
    body = bytearray()
    for fid, fbody in frames:
        body += fid + struct.pack(">I", len(fbody)) + b"\x00\x00" + fbody
    return (
        b"ID3\x03\x00" + bytes([flags]) + M._syncsafe(len(body))
        + bytes(body)
    )


def test_id3v23_read_with_tyer_and_latin1():
    blob = _v23_tag(
        [
            (b"TIT2", b"\x00a title"),
            (b"TYER", b"\x001999"),
            (b"COMM", b"\x00engdesc\x00the text"),
        ]
    )
    assert M.parse_id3v2(blob) == {
        "title": "a title", "date": "1999", "comment": "the text",
    }


def test_id3v23_unsynchronisation_reversed():
    body = b"\x00\xffxyz"  # latin-1 'ÿxyz'
    frames = bytearray(
        b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
    )
    stored = bytes(frames).replace(b"\xff", b"\xff\x00")
    blob = (
        b"ID3\x03\x00\x80" + M._syncsafe(len(stored)) + stored
    )
    assert M.parse_id3v2(blob) == {"title": "ÿxyz"}


def test_id3v22_three_byte_frames():
    body = b"\x00old title"
    frames = b"TT2" + len(body).to_bytes(3, "big") + body
    blob = b"ID3\x02\x00\x00" + M._syncsafe(len(frames)) + frames
    assert M.parse_id3v2(blob) == {"title": "old title"}


def test_id3v16_utf16_text():
    body = b"\x01" + "bøm".encode("utf-16")  # BOM-led UTF-16
    frames = b"TIT2" + M._syncsafe(len(body)) + b"\x00\x00" + body
    blob = b"ID3\x04\x00\x00" + M._syncsafe(len(frames)) + frames
    assert M.parse_id3v2(blob) == {"title": "bøm"}


# ---------------------------------------------------------------------------
# ADTS


def test_adts_round_trip():
    raw = M.build_adts(6, profile="lc", sample_rate=48000, channels=2,
                       payload_len=31)
    p = M.parse_adts(raw)
    assert p["profile"] == "lc"
    assert p["sample_rate"] == 48000
    assert p["channels"] == 2
    assert p["n_frames"] == 6
    assert p["n_samples"] == 6 * 1024
    assert p["duration_s"] == pytest.approx(6 * 1024 / 48000)


def test_adts_multiple_raw_data_blocks():
    raw = bytearray(M.build_adts(2, sample_rate=16000, channels=1))
    raw[6] = (raw[6] & 0xFC) | 1  # 2 raw data blocks in frame 0
    p = M.parse_adts(bytes(raw))
    assert p["n_samples"] == 3 * 1024


def test_adts_with_id3_leader():
    raw = M.build_id3v2({"title": "aac"}) + M.build_adts(
        3, sample_rate=22050, channels=1
    )
    assert M.is_adts(raw)
    assert M.parse_adts(raw)["n_frames"] == 3
    assert extract_audio_tags(raw) == {"title": "aac"}


# ---------------------------------------------------------------------------
# dispatch / sniffing


def test_sniffers_disjoint():
    mp3 = M.build_mp3(2, bitrate_kbps=64, sample_rate=32000, channels=1)
    aac = M.build_adts(2, sample_rate=16000, channels=1)
    assert M.is_mp3(mp3) and not M.is_adts(mp3)
    assert M.is_adts(aac) and not M.is_mp3(aac)
    assert not M.is_mp3(b"RIFF\x00\x00\x00\x00WAVE")


def test_probe_and_audiotags_dispatch():
    mp3 = M.build_mp3(
        7, bitrate_kbps=96, sample_rate=32000, channels=2,
        tags={"title": "t"},
    )
    p = probe_media(mp3)
    assert p["format"] == "mp3"
    assert p["n_frames"] == 7 * 1152
    assert p["duration_s"] == pytest.approx(7 * 1152 / 32000)
    assert supported_keys(mp3) == {
        "title", "artist", "album", "date", "comment", "genre",
        "software",
    }
    stamped = embed_audio_tags(mp3, {"artist": "me", "album": "al"})
    assert extract_audio_tags(stamped) == {"artist": "me", "album": "al"}
    assert M.parse_mp3(stamped)["n_frames"] == 7

    aac = M.build_adts(4, sample_rate=24000, channels=2)
    assert probe_media(aac)["format"] == "aac"


def test_decode_honestly_gated():
    mp3 = M.build_mp3(1, bitrate_kbps=64, sample_rate=32000, channels=1)
    with pytest.raises(NotImplementedError):
        M.decode_mpeg_audio(mp3)


# ---------------------------------------------------------------------------
# review-pass regressions


def test_xing_found_behind_crc_field():
    raw = bytearray(
        M.build_mp3(4, bitrate_kbps=64, sample_rate=44100, channels=1)
    )
    raw[1] &= 0xFE  # protection bit 0: 16-bit CRC follows the header
    xo = M._xing_offset("1", 1) + 2
    raw[xo : xo + 4] = b"Xing"
    raw[xo + 4 : xo + 8] = struct.pack(">I", 1)
    raw[xo + 8 : xo + 12] = struct.pack(">I", 55)
    p = M.parse_mp3(bytes(raw))
    assert p["vbr"] is True
    assert p["n_samples"] == 55 * 1152


def test_xing_excludes_metadata_frame_from_walk_count():
    raw = bytearray(
        M.build_mp3(6, bitrate_kbps=64, sample_rate=44100, channels=1)
    )
    xo = M._xing_offset("1", 1)
    raw[xo : xo + 4] = b"Xing"
    raw[xo + 4 : xo + 8] = struct.pack(">I", 0)  # no frames field
    p = M.parse_mp3(bytes(raw))
    assert p["vbr"] is True
    assert p["n_samples"] == 5 * 1152  # walked 6 minus the Xing frame


def _comm_frame(enc: int, desc: bytes, text: bytes) -> bytes:
    body = bytes([enc]) + b"eng" + desc + text
    frames = b"COMM" + M._syncsafe(len(body)) + b"\x00\x00" + body
    return b"ID3\x04\x00\x00" + M._syncsafe(len(frames)) + frames


def test_comm_utf16_with_descriptor():
    desc = "d".encode("utf-16") + b"\x00\x00"
    text = "Hi there".encode("utf-16")
    assert M.parse_id3v2(_comm_frame(1, desc, text)) == {
        "comment": "Hi there"
    }


def test_comm_utf16be_empty_descriptor():
    desc = b"\x00\x00"
    text = "Hi".encode("utf-16-be")
    assert M.parse_id3v2(_comm_frame(2, desc, text)) == {"comment": "Hi"}


def test_v24_data_length_indicator_flag():
    body = b"\x00\x00\x00\x05" + b"\x00title"  # DLI prefix + latin1
    frames = (
        b"TIT2" + M._syncsafe(len(body)) + b"\x00\x01" + body
    )
    blob = b"ID3\x04\x00\x00" + M._syncsafe(len(frames)) + frames
    assert M.parse_id3v2(blob) == {"title": "title"}


def test_v24_per_frame_unsync_flag():
    clean = b"\x00\xffab"  # latin-1 'ÿab'
    stored = clean.replace(b"\xff", b"\xff\x00")
    frames = b"TIT2" + M._syncsafe(len(stored)) + b"\x00\x02" + stored
    blob = b"ID3\x04\x00\x00" + M._syncsafe(len(frames)) + frames
    assert M.parse_id3v2(blob) == {"title": "ÿab"}


def test_v23_compressed_frame_skipped():
    body = b"\x00zipped-garbage"
    frames = (
        b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x80" + body
        + b"TALB" + struct.pack(">I", 6) + b"\x00\x00" + b"\x00album"
    )
    blob = b"ID3\x03\x00\x00" + M._syncsafe(len(frames)) + frames
    assert M.parse_id3v2(blob) == {"album": "album"}
