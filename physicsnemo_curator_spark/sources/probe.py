"""Header-only media probing — metadata without decoding payloads.

The ``file(1)``/``ffprobe`` of the media lake: identify a payload's
format and pull its geometry / duration / sampling parameters by
reading ONLY headers and index structures — no entropy decoding, no
pixel or sample reconstruction.  At the 100 TB design point this is
the cheap first pass every curation pipeline runs (routing,
accounting, corpus cards) before any expensive decode is scheduled.

Covered formats (each probe reads the minimal structure):

- images: PNG (IHDR), JPEG (marker scan to SOFn + EXIF APP1 via
  ``sources/exif.py``), BMP (info header), TIFF (first IFD + page
  count), GIF (screen descriptor + sub-block walk per frame)
- audio: WAV (fmt/fact/data sizes), FLAC (STREAMINFO), Ogg-FLAC
  (first packet's STREAMINFO), AIFF (COMM), MP3 (frame walk +
  Xing/VBRI), ADTS AAC (frame walk) via ``sources/mpegaudio.py``
- video: AVI (avih/strh), MP4 (moov sample tables), Matroska
  (Tracks + block walk), animated GIF

``probe_media`` returns a flat dict; ``with_media_probe`` runs it as
an Arrow-batched ``mapInPandas`` over a media table.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_EMPTY = {
    "format": "unknown",
    "kind": None,
    "width": None,
    "height": None,
    "n_frames": None,
    "sample_rate": None,
    "channels": None,
    "bits": None,
    "duration_s": None,
    "orientation": None,
}


def _probe_png(raw: bytes) -> dict:
    w, h = struct.unpack_from(">II", raw, 16)
    depth, color = raw[24], raw[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    return {
        "format": "png", "kind": "image", "width": w, "height": h,
        "bits": depth, "channels": channels,
    }


def _probe_jpeg(raw: bytes) -> dict:
    from . import exif as _exif

    pos = 2
    out = {"format": "jpeg", "kind": "image"}
    exif_blob = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            break
        marker = raw[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        if marker == 0xE1 and raw[pos + 4 : pos + 10] == b"Exif\x00\x00":
            exif_blob = raw[pos + 10 : pos + 2 + seglen]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xDE):
            prec, h, w, nc = struct.unpack_from(">BHHB", raw, pos + 4)
            out.update(width=w, height=h, bits=prec, channels=nc)
            break
        if marker == 0xDA:
            break
        pos += 2 + seglen
    if exif_blob is not None:
        # a corrupt EXIF blob must not void the geometry already
        # parsed — degrade to metadata-free, whatever the error class
        try:
            tags = _exif.parse_exif_blob(exif_blob)
        except Exception:
            tags = {}
        if "orientation" in tags:
            out["orientation"] = tags["orientation"]
    return out


def _probe_bmp(raw: bytes) -> dict:
    _bi, w, h, _planes, bits = struct.unpack_from("<IiiHH", raw, 14)
    channels = {1: 1, 4: 1, 8: 1, 16: 3, 24: 3, 32: 4}.get(int(bits))
    return {
        "format": "bmp", "kind": "image", "width": int(w),
        "height": abs(int(h)), "bits": int(bits),
        "channels": channels,
    }


def _probe_tiff(raw: bytes) -> dict:
    from . import tiff as _tiff

    e, big, pos = _tiff.tiff_layout(raw)
    tags, nxt = _tiff.read_ifd(raw, e, pos, big)
    n_pages = 1
    seen = {pos}
    while nxt and nxt not in seen:
        seen.add(nxt)
        _t, nxt = _tiff.read_ifd(raw, e, nxt, big)
        n_pages += 1
    bits = tags.get(258, (8,))
    return {
        "format": "bigtiff" if big else "tiff", "kind": "image",
        "width": int(tags.get(256, (0,))[0]),
        "height": int(tags.get(257, (0,))[0]),
        "bits": int(bits[0]),
        "channels": int(tags.get(277, (len(bits),))[0]),
        "n_frames": n_pages,
    }


def _probe_gif(raw: bytes) -> dict:
    from . import gif as _gif

    parsed = _gif.parse_gif(raw)  # container walk only, no LZW decode
    meta = parsed["meta"]
    n = meta["n_frames"]
    delays = [
        (fr["gce"] or {}).get("delay_cs", 0) for fr in parsed["frames"]
    ]
    duration = sum(delays) / 100.0 if any(delays) else None
    return {
        "format": "gif", "kind": "image" if n <= 1 else "video",
        "width": meta["width"], "height": meta["height"],
        "n_frames": n, "bits": 8, "channels": 3,
        "duration_s": duration,
    }


def _probe_wav(raw: bytes) -> dict:
    from . import wav as _wav

    fmt, block_align, fact_frames, payload = _wav._parse_wav_chunks(raw)
    tag, channels, rate, bits = fmt
    if tag in (0x11, 2):  # ADPCM: frame count from fact, else blocks
        n = fact_frames
        if not n and block_align and channels:
            # per-block sample math from the format spec (external
            # writers sometimes omit the fact chunk)
            if tag == 0x11:
                spb = (block_align - 4 * channels) * 2 // channels + 1
            else:
                spb = (block_align - 7 * channels) * 2 // channels + 2
            n = (len(payload) // block_align) * spb
    else:
        bytes_per_frame = max(1, channels * max(bits, 8) // 8)
        n = len(payload) // bytes_per_frame
    return {
        "format": "wav", "kind": "audio", "sample_rate": int(rate),
        "channels": int(channels), "bits": int(bits),
        "n_frames": int(n) if n else None,
        "duration_s": (n / rate) if (n and rate) else None,
    }


def _streaminfo(body: bytes) -> dict:
    rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    channels = ((body[12] >> 1) & 0x07) + 1
    bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
    total = ((body[13] & 0x0F) << 32) | struct.unpack_from(">I", body, 14)[0]
    return {
        "format": "flac", "kind": "audio", "sample_rate": rate,
        "channels": channels, "bits": bps,
        "n_frames": total or None,
        "duration_s": (total / rate) if (total and rate) else None,
    }


def _probe_flac(raw: bytes) -> dict:
    pos = 4
    while pos + 4 <= len(raw):
        btype = raw[pos] & 0x7F
        last = raw[pos] & 0x80
        (size,) = struct.unpack(">I", b"\x00" + raw[pos + 1 : pos + 4])
        if btype == 0:
            return _streaminfo(raw[pos + 4 : pos + 4 + size])
        pos += 4 + size
        if last:
            break
    raise ValueError("FLAC missing STREAMINFO")


def _probe_ogg_flac(raw: bytes) -> dict:
    # first Ogg page's segment carries the FLAC-to-Ogg mapping packet:
    # 0x7F 'FLAC' maj min nheaders(2) 'fLaC' + STREAMINFO block
    nseg = raw[26]
    body = raw[27 + nseg :]
    at = body.find(b"fLaC")
    if at < 0:
        raise ValueError("Ogg page without a FLAC mapping packet")
    out = _probe_flac(body[at:])
    out["format"] = "ogg-flac"
    return out


def _probe_aiff(raw: bytes) -> dict:
    from . import aiff as _aiff

    pos = 12
    out = {"format": "aiff", "kind": "audio"}
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from(">I", raw, pos + 4)
        if cid == b"COMM":
            body = raw[pos + 8 : pos + 8 + size]
            if len(body) < 18:
                raise ValueError("AIFF COMM chunk shorter than 18 bytes")
            channels, frames, bits = struct.unpack_from(">HIH", body, 0)
            rate = round(_aiff._read_extended(body[8:18]))
            out.update(
                channels=channels, bits=bits, sample_rate=rate,
                # zero frames -> None, matching the WAV probe's
                # convention so duration filters behave uniformly
                n_frames=frames or None,
                duration_s=(frames / rate) if (frames and rate) else None,
            )
            break
        pos += 8 + size + (size % 2)
    return out


def _probe_avi(raw: bytes) -> dict:
    from . import avi as _avi

    parsed = _avi.parse_avi(raw)
    meta = parsed["meta"]
    n = len(parsed["frames"])
    rate, scale = meta.get("rate"), meta.get("scale")
    return {
        "format": "avi", "kind": "video", "width": meta["width"],
        "height": meta["height"], "n_frames": n,
        # exact n*scale/rate — never through a rounded integer fps
        "duration_s": (n * scale / rate) if rate else None,
    }


def _probe_mp4(raw: bytes) -> dict:
    from . import mp4 as _mp4

    parsed = _mp4.parse_mp4(raw)
    meta = parsed["meta"]
    n = meta["n_frames"]
    ts, delta = meta.get("timescale"), meta.get("frame_delta")
    return {
        "format": "mp4", "kind": "video", "width": meta["width"],
        "height": meta["height"], "n_frames": n,
        "duration_s": (n * delta / ts) if (ts and delta) else None,
    }


def _probe_mkv(raw: bytes) -> dict:
    from . import mkv as _mkv

    parsed = _mkv.parse_mkv(raw)
    meta = parsed["meta"]
    return {
        "format": "mkv", "kind": "video", "width": meta["width"],
        "height": meta["height"], "n_frames": meta["n_frames"],
    }


def _probe_qoi(raw: bytes) -> dict:
    if len(raw) < 14:
        raise ValueError("truncated QOI header")
    w, h, ch, _cs = struct.unpack_from(">IIBB", raw, 4)
    return {
        "format": "qoi", "kind": "image", "width": int(w),
        "height": int(h), "channels": int(ch), "bits": 8,
    }


def _probe_pnm(raw: bytes) -> dict:
    from . import pnm as _pnm

    kind = int(raw[1:2])
    bitmap = kind in (1, 4)
    fields, _comments, _at = _pnm._read_header(raw, 2 if bitmap else 3)
    maxval = 1 if bitmap else fields[2]
    return {
        "format": "pnm", "kind": "image", "width": int(fields[0]),
        "height": int(fields[1]),
        "channels": 3 if kind in (3, 6) else 1,
        "bits": 1 if bitmap else (16 if maxval > 255 else 8),
    }


def _probe_mp3(raw: bytes) -> dict:
    from . import mpegaudio as _mpeg

    p = _mpeg.parse_mp3(raw)
    return {
        "format": "mp3", "kind": "audio",
        "n_frames": p["n_samples"],  # sample frames, like WAV/FLAC
        "sample_rate": p["sample_rate"], "channels": p["channels"],
        "duration_s": p["duration_s"],
    }


def _probe_adts(raw: bytes) -> dict:
    from . import mpegaudio as _mpeg

    p = _mpeg.parse_adts(raw)
    return {
        "format": "aac", "kind": "audio",
        "n_frames": p["n_samples"],
        "sample_rate": p["sample_rate"], "channels": p["channels"],
        "duration_s": p["duration_s"],
    }


def probe_media(raw: bytes) -> dict:
    """Identify ``raw`` by signature and return header-only metadata
    (see module docstring).  Unknown formats come back as
    ``{"format": "unknown", ...}`` with null fields — never an
    exception for unrecognized content; structurally corrupt payloads
    of a RECOGNIZED format do raise."""
    from . import aiff as _aiff
    from . import avi as _avi
    from . import bmp as _bmp
    from . import flac as _flac
    from . import gif as _gif
    from . import ico as _ico
    from . import mkv as _mkv
    from . import mp4 as _mp4
    from . import mpegaudio as _mpeg
    from . import png as _png
    from . import pnm as _pnm
    from . import qoi as _qoi
    from . import tiff as _tiff
    from . import wav as _wav

    out = dict(_EMPTY)
    raw = bytes(raw)
    if _png.is_png(raw):
        out.update(_probe_png(raw))
    elif raw[:2] == b"\xff\xd8":
        out.update(_probe_jpeg(raw))
    elif _bmp.is_bmp(raw):
        out.update(_probe_bmp(raw))
    elif _tiff.is_tiff(raw):
        out.update(_probe_tiff(raw))
    elif _gif.is_gif(raw):
        out.update(_probe_gif(raw))
    elif _wav.is_wav(raw):
        out.update(_probe_wav(raw))
    elif _flac.is_flac(raw):
        out.update(_probe_flac(raw))
    elif _flac.is_ogg_flac(raw):
        out.update(_probe_ogg_flac(raw))
    elif _aiff.is_aiff(raw):
        out.update(_probe_aiff(raw))
    elif _avi.is_avi(raw):
        out.update(_probe_avi(raw))
    elif _mp4.is_mp4(raw):
        out.update(_probe_mp4(raw))
    elif _mkv.is_mkv(raw):
        out.update(_probe_mkv(raw))
    elif _mpeg.is_adts(raw):
        out.update(_probe_adts(raw))
    elif _mpeg.is_mp3(raw):
        out.update(_probe_mp3(raw))
    elif _qoi.is_qoi(raw):
        out.update(_probe_qoi(raw))
    elif _pnm.is_pnm(raw):
        out.update(_probe_pnm(raw))
    elif _ico.is_ico(raw):
        out.update(_ico.probe_ico(raw))
    return out


PROBE_SCHEMA = (
    "media_id long, format string, kind string, width int, height int, "
    "n_frames long, sample_rate int, channels int, bits int, "
    "duration_s double, orientation int"
)


def with_media_probe(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """Probe every payload header-side inside Arrow-batched
    ``mapInPandas`` — one row per input row, decode never runs.
    Structurally corrupt payloads raise under ``strict`` and come
    back as format='error' otherwise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = probe_media(bytes(payload))
                except Exception:
                    if strict:
                        raise
                    p = dict(_EMPTY)
                    p["format"] = "error"
                rows.append(
                    (
                        int(media_id), p["format"], p["kind"],
                        p["width"], p["height"], p["n_frames"],
                        p["sample_rate"], p["channels"], p["bits"],
                        p["duration_s"], p["orientation"],
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "kind", "width", "height",
                    "n_frames", "sample_rate", "channels", "bits",
                    "duration_s", "orientation",
                ],
            )
            for c, t in (
                ("width", "Int32"), ("height", "Int32"),
                ("n_frames", "Int64"), ("sample_rate", "Int32"),
                ("channels", "Int32"), ("bits", "Int32"),
                ("orientation", "Int32"),
            ):
                out[c] = pd.array(out[c], dtype=t)
            yield out

    return media.mapInPandas(batches, PROBE_SCHEMA)
