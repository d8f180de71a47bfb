"""EXIF metadata: embed into and extract from JPEG APP1 segments.

EXIF is a TIFF IFD riding inside a JPEG ``APP1`` marker (the public
EXIF 2.x specification: ``Exif\\x00\\x00`` + a self-contained TIFF
blob), so the reader reuses ``sources/tiff.py``'s IFD machinery
verbatim.  The writer emits a little-endian IFD0 with the common
curation-relevant tags (orientation, timestamps, make/model,
description, software) plus an Exif sub-IFD for DateTimeOriginal;
the reader follows the sub-IFD pointer and tolerates either byte
order.  ``normalize_orientation`` applies the eight EXIF orientation
transforms so perceptual hashes and resizes operate on upright
pixels.
"""

from __future__ import annotations

import struct

import numpy as np

from . import tiff as _tiff

_IFD0_TAGS = {
    0x010E: "description",
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
    0x013B: "artist",
}
_EXIF_IFD_POINTER = 0x8769
_EXIF_TAGS = {
    0x9003: "datetime_original",
    0xA002: "pixel_width",
    0xA003: "pixel_height",
}
_NAME_TO_TAG = {v: k for k, v in _IFD0_TAGS.items()}
_NAME_TO_EXIF = {v: k for k, v in _EXIF_TAGS.items()}

_ASCII_TAGS = {0x010E, 0x010F, 0x0110, 0x0131, 0x0132, 0x013B, 0x9003}


def build_exif(tags: dict) -> bytes:
    """Serialize a name→value dict into an ``Exif\\x00\\x00`` + TIFF
    payload (little-endian, IFD0 [+ Exif sub-IFD when any sub-IFD
    tag is present]).  Strings become ASCII entries, integers SHORT
    or LONG."""
    ifd0 = {}
    sub = {}
    for name, value in tags.items():
        if name in _NAME_TO_TAG:
            ifd0[_NAME_TO_TAG[name]] = value
        elif name in _NAME_TO_EXIF:
            sub[_NAME_TO_EXIF[name]] = value
        else:
            raise ValueError(f"unknown EXIF tag name {name!r}")

    def entries_bytes(entries: dict, base: int) -> bytes:
        # base = offset of this IFD within the TIFF blob
        n = len(entries)
        extra_at = base + 2 + 12 * n + 4
        out = struct.pack("<H", n)
        extra = bytearray()
        for tag in sorted(entries):
            value = entries[tag]
            if tag in _ASCII_TAGS:
                # UTF-8 in ASCII-typed entries — what exiftool/libexif
                # emit in practice; pure-ASCII values are unchanged
                payload = str(value).encode("utf-8") + b"\x00"
                typ, count = 2, len(payload)
            elif tag == _EXIF_IFD_POINTER or int(value) > 0xFFFF:
                payload = struct.pack("<I", int(value))
                typ, count = 4, 1
            else:
                payload = struct.pack("<H", int(value))
                typ, count = 3, 1
            if len(payload) <= 4:
                val = payload + b"\x00" * (4 - len(payload))
            else:
                val = struct.pack("<I", extra_at + len(extra))
                extra += payload
            out += struct.pack("<HHI", tag, typ, count) + val
        out += struct.pack("<I", 0)  # no next IFD
        return out + bytes(extra)

    # IFD0 starts at offset 8; the sub-IFD (if any) lands after IFD0.
    # Its size incl. the extra blob depends on string lengths —
    # compute with a dry run at a throwaway base, then place sub
    if sub:
        probe0 = dict(ifd0)
        probe0[_EXIF_IFD_POINTER] = 0
        ifd0_bytes = entries_bytes(probe0, 8)
        sub_at = 8 + len(ifd0_bytes)
        real0 = dict(ifd0)
        real0[_EXIF_IFD_POINTER] = sub_at
        blob = entries_bytes(real0, 8) + entries_bytes(sub, sub_at)
    else:
        blob = entries_bytes(ifd0, 8)
    tiff_blob = b"II*\x00" + struct.pack("<I", 8) + blob
    return b"Exif\x00\x00" + tiff_blob


def iter_jpeg_segments(data: bytes):
    """Yield ``(marker, start, end)`` spans of the pre-scan segment
    run — everything between SOI and SOS / the first standalone
    marker.  The ONE marker walk shared by the EXIF embed/extract
    paths and ``sources/imagetags.py``."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9, 0xDA) or 0xD0 <= marker <= 0xD7:
            break  # entropy data / standalone marker: pre-scan ends
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        yield marker, pos, pos + 2 + seglen
        pos += 2 + seglen


def embed_exif(jpeg_bytes: bytes, tags: dict) -> bytes:
    """Insert an APP1 EXIF segment right after SOI, replacing any
    existing EXIF APP1 ANYWHERE in the pre-scan segment run (a stale
    one after a JFIF APP0 would otherwise survive and conflict)."""
    data = bytes(jpeg_bytes)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (bad SOI)")
    payload = build_exif(tags)
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    kept = bytearray()
    tail_at = 2
    for marker, start, end in iter_jpeg_segments(data):
        if not (
            marker == 0xE1
            and data[start + 4 : start + 10] == b"Exif\x00\x00"
        ):
            kept += data[start:end]
        tail_at = end
    return data[:2] + app1 + bytes(kept) + data[tail_at:]


def extract_exif(data: bytes) -> dict:
    """Walk the JPEG marker stream for an EXIF APP1 and parse its
    TIFF blob (either byte order).  Returns a name→value dict —
    empty when no EXIF is present."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream (bad SOI)")
    for marker, start, end in iter_jpeg_segments(data):
        if marker == 0xE1 and data[start + 4 : start + 10] == b"Exif\x00\x00":
            return parse_exif_blob(data[start + 10 : end])
    return {}


def parse_exif_blob(blob: bytes) -> dict:
    """Parse a bare TIFF blob (the part after ``Exif\\x00\\x00``)."""
    if len(blob) < 8 or blob[:2] not in (b"II", b"MM"):
        raise ValueError("malformed EXIF TIFF blob")
    e = "<" if blob[:2] == b"II" else ">"
    (ifd0_at,) = struct.unpack_from(e + "I", blob, 4)
    tags, _nxt = _tiff._read_ifd(blob, e, ifd0_at)
    out: dict = {}

    def absorb(raw_tags: dict, names: dict):
        for tag, vals in raw_tags.items():
            name = names.get(tag)
            if name is None:
                continue
            if tag in _ASCII_TAGS:
                raw = vals[0] if isinstance(vals[0], bytes) else bytes(vals)
                out[name] = raw.split(b"\x00")[0].decode("utf-8", "replace")
            else:
                out[name] = int(vals[0])

    absorb(tags, _IFD0_TAGS)
    if _EXIF_IFD_POINTER in tags:
        sub_at = int(tags[_EXIF_IFD_POINTER][0])
        sub, _n = _tiff._read_ifd(blob, e, sub_at)
        absorb(sub, _EXIF_TAGS)
    return out


def normalize_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Apply the EXIF orientation transform so the returned pixels
    display upright (values 1-8 per the EXIF spec; unknown values
    raise)."""
    if orientation in (0, 1):
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return np.swapaxes(px, 0, 1)
    if orientation == 6:
        return np.rot90(px, -1, axes=(0, 1))
    if orientation == 7:
        return np.swapaxes(px[::-1, ::-1], 0, 1)
    if orientation == 8:
        return np.rot90(px, 1, axes=(0, 1))
    raise ValueError(f"EXIF orientation {orientation} out of range 1..8")
