"""Subtitle codecs (SubRip ``.srt`` and WebVTT ``.vtt``) — the text
half of video-text training pairs.

Both are public line-oriented formats: cues of (index, start --> end,
text lines) separated by blank lines; SRT timestamps use a comma
before the milliseconds, WebVTT a dot, a ``WEBVTT`` header, optional
cue identifiers and per-cue settings after the end timestamp.  The
parsers normalize onto one row shape ``(cue_index, start_ms, end_ms,
text)``; the writers emit spec-exact bytes (CRLF-free, newline cue
separation) so round trips are byte-stable.

``read_subtitles`` scans ``.srt``/``.vtt`` files task-per-file via
``binaryFile``; ``align_frames_to_cues`` joins a frame table onto
cue windows with a range join — the video-frame <-> caption pairing
step a multimodal corpus build runs after ``sample_frames``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS = re.compile(
    # hours are optional (WebVTT mm:ss.ttt form) and unbounded
    # (>= 100-hour archives are legal)
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[,.](\d{3})"
)


def _parse_ts(token: str) -> int:
    m = _TS.search(token)
    if not m:
        raise ValueError(f"malformed subtitle timestamp {token!r}")
    h = int(m.group(1)) if m.group(1) is not None else 0
    mnt, s, ms = int(m.group(2)), int(m.group(3)), int(m.group(4))
    return ((h * 60 + mnt) * 60 + s) * 1000 + ms


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(int(ms), 3600_000)
    mnt, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{mnt:02d}:{s:02d}{sep}{milli:03d}"


def is_vtt(data: bytes) -> bool:
    head = bytes(data[:9])
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    return head[:6] == b"WEBVTT"


def parse_subtitles(data: bytes | str) -> list[dict]:
    """Parse an SRT or WebVTT body into cue dicts ``{cue_index,
    start_ms, end_ms, text}``.  SRT indices are taken from the file;
    VTT cues are numbered in order (its identifiers are free text).
    Tolerates CRLF, a UTF-8 BOM, and VTT NOTE/STYLE blocks."""
    if isinstance(data, (bytes, bytearray)):
        text = bytes(data).decode("utf-8-sig", "replace")
    else:
        text = data.lstrip("\ufeff")
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    lines = text.split("\n")
    vtt = bool(lines) and lines[0].startswith("WEBVTT")
    cues: list[dict] = []
    i = 0
    if vtt:
        # the header block (signature + metadata like 'Kind:'/
        # 'Language:') runs to the first blank line
        i = 1
        n = len(lines)
        while i < n and lines[i].strip():
            i += 1
    auto_index = 0
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        if vtt and lines[i].split(" ")[0] in ("NOTE", "STYLE", "REGION"):
            while i < n and lines[i].strip():
                i += 1
            continue
        index = None
        if "-->" not in lines[i]:
            head = lines[i].strip()
            # SRT sequence numbers only — a VTT identifier is free
            # text even when it happens to be numeric
            if not vtt and head.isdigit():
                index = int(head)
            i += 1
            if i >= n:
                break
        if "-->" not in lines[i]:
            raise ValueError(
                f"expected a cue timing line, got {lines[i]!r}"
            )
        start_tok, _, rest = lines[i].partition("-->")
        start = _parse_ts(start_tok)
        end = _parse_ts(rest)
        i += 1
        body: list[str] = []
        while i < n and lines[i].strip():
            body.append(lines[i])
            i += 1
        auto_index += 1
        cues.append(
            {
                "cue_index": index if index is not None else auto_index,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(body),
            }
        )
    return cues


def write_srt(cues: list[dict]) -> bytes:
    """Spec-exact SubRip serialization (1-based sequential indices)."""
    out = []
    for k, cue in enumerate(cues, start=1):
        out.append(
            f"{k}\n{_fmt_ts(cue['start_ms'], ',')} --> "
            f"{_fmt_ts(cue['end_ms'], ',')}\n{cue['text']}\n"
        )
    return "\n".join(out).encode("utf-8")


def write_vtt(cues: list[dict]) -> bytes:
    out = ["WEBVTT\n"]
    for cue in cues:
        out.append(
            f"{_fmt_ts(cue['start_ms'], '.')} --> "
            f"{_fmt_ts(cue['end_ms'], '.')}\n{cue['text']}\n"
        )
    return "\n".join(out).encode("utf-8")


SUBTITLE_SCHEMA = (
    "path string, cue_index int, start_ms long, end_ms long, text string"
)


def read_subtitles(
    spark: SparkSession, path: str, *, glob: str = "*.{srt,vtt}"
) -> DataFrame:
    """Scan subtitle files into cue rows — one task per file."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def walk(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for cue in parse_subtitles(bytes(content)):
                    rows.append(
                        (
                            p, cue["cue_index"], cue["start_ms"],
                            cue["end_ms"], cue["text"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "cue_index", "start_ms", "end_ms", "text",
                ],
            )

    return files.mapInPandas(walk, SUBTITLE_SCHEMA)


def align_frames_to_cues(
    frames: DataFrame,
    cues: DataFrame,
    *,
    time_col: str = "t_ms",
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Pair frames with the caption on screen at their timestamp:
    a range join on ``start_ms <= t < end_ms``.  ``broadcast=True``
    (default) hints the cue side — right for per-video or sampled
    cue tables; pass False for a lake-scale cue table so AQE and the
    size thresholds pick the strategy instead of the driver
    collecting it."""
    if "media_id" in frames.columns and "media_id" in cues.columns:
        cues = cues.withColumnRenamed("media_id", "_cue_media_id")
        cond = (
            (frames["media_id"] == cues["_cue_media_id"])
            & (F.col(time_col) >= cues["start_ms"])
            & (F.col(time_col) < cues["end_ms"])
        )
        right = F.broadcast(cues) if broadcast else cues
        return frames.join(right, cond, how).drop("_cue_media_id")
    cond = (F.col(time_col) >= cues["start_ms"]) & (
        F.col(time_col) < cues["end_ms"]
    )
    return frames.join(
        F.broadcast(cues) if broadcast else cues, cond, how
    )
