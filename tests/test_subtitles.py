"""Subtitle codecs (sources/subtitles.py): SRT/VTT parse + write
round trips, timestamp arithmetic, the Spark scan, and frame-to-cue
range alignment."""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.sources.subtitles import (
    align_frames_to_cues,
    is_vtt,
    parse_subtitles,
    read_subtitles,
    write_srt,
    write_vtt,
)

SRT = """1
00:00:01,000 --> 00:00:04,250
First caption
second line

2
00:01:02,500 --> 01:00:00,001
Later one
"""

VTT = """WEBVTT

NOTE a comment block
spanning lines

00:00:01.000 --> 00:00:04.250
First caption

intro-cue-id
00:01:02.500 --> 01:00:00.001 align:start
Later one
"""


def test_parse_srt():
    cues = parse_subtitles(SRT.encode())
    assert len(cues) == 2
    assert cues[0] == {
        "cue_index": 1, "start_ms": 1000, "end_ms": 4250,
        "text": "First caption\nsecond line",
    }
    assert cues[1]["start_ms"] == 62500
    assert cues[1]["end_ms"] == 3600_001


def test_parse_vtt_with_notes_ids_settings():
    cues = parse_subtitles(VTT.encode())
    assert len(cues) == 2
    assert cues[0]["text"] == "First caption"
    assert cues[1]["start_ms"] == 62500
    assert cues[1]["cue_index"] == 2  # sequential; ids are free text


def test_bom_and_crlf_tolerated():
    data = b"\xef\xbb\xbf" + SRT.replace("\n", "\r\n").encode()
    cues = parse_subtitles(data)
    assert len(cues) == 2
    assert is_vtt(b"\xef\xbb\xbfWEBVTT\n")
    assert not is_vtt(SRT.encode())


def test_write_round_trips():
    cues = parse_subtitles(SRT.encode())
    again = parse_subtitles(write_srt(cues))
    assert again == cues
    via_vtt = parse_subtitles(write_vtt(cues))
    assert [c["start_ms"] for c in via_vtt] == [1000, 62500]
    assert via_vtt[0]["text"] == cues[0]["text"]
    # writer output is byte-stable
    assert write_srt(cues) == write_srt(parse_subtitles(write_srt(cues)))


def test_malformed_raises():
    with pytest.raises(ValueError, match="timestamp|timing"):
        parse_subtitles(b"1\nnot a timing line\ntext\n")


def test_spark_scan_and_alignment(spark, tmp_path):
    (tmp_path / "a.srt").write_bytes(write_srt(parse_subtitles(SRT)))
    (tmp_path / "b.vtt").write_bytes(VTT.encode())
    cues = read_subtitles(spark, str(tmp_path))
    assert cues.count() == 4
    frames = spark.createDataFrame(
        [(0, 0), (1, 1500), (2, 4249), (3, 4250), (4, 70_000)],
        "frame_index long, t_ms long",
    )
    aligned = align_frames_to_cues(
        frames,
        cues.filter(cues["path"].endswith("a.srt")),
    )
    got = {r["frame_index"]: r["cue_index"] for r in aligned.collect()}
    # frame 0 precedes the first cue; 4250 is exclusive-end
    assert got == {1: 1, 2: 1, 4: 2}
    plan = aligned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# review-pass regressions


def test_vtt_header_metadata_block_skipped():
    data = (
        "WEBVTT\nKind: captions\nLanguage: en\n\n"
        "00:00:01.000 --> 00:00:02.000\nhi\n"
    ).encode()
    cues = parse_subtitles(data)
    assert len(cues) == 1 and cues[0]["text"] == "hi"


def test_vtt_hourless_and_long_timestamps():
    data = (
        "WEBVTT\n\n00:01.000 --> 00:04.000\nshort form\n\n"
        "100:00:00,000 --> 100:00:01,000\narchive\n"
    ).encode()
    cues = parse_subtitles(data)
    assert cues[0]["start_ms"] == 1000
    assert cues[1]["start_ms"] == 100 * 3600_000


def test_vtt_numeric_identifier_stays_sequential():
    data = (
        "WEBVTT\n\n7\n00:00:01.000 --> 00:00:02.000\na\n\n"
        "00:00:03.000 --> 00:00:04.000\nb\n"
    ).encode()
    cues = parse_subtitles(data)
    assert [c["cue_index"] for c in cues] == [1, 2]


def test_str_input_with_bom():
    cues = parse_subtitles(
        "﻿WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nhi\n"
    )
    assert len(cues) == 1
