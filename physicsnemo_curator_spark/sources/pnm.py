"""Netpbm family codec (PBM/PGM/PPM, P1-P6) — the public netpbm
formats.

Reads all six magics: ASCII bitmaps/graymaps/pixmaps (P1/P2/P3,
whitespace-separated decimal samples) and their binary twins
(P4 packed MSB-first bits, P5/P6 raw bytes, 2-byte BIG-endian
samples when maxval > 255).  ``#`` comment lines anywhere in the
header are tolerated and surfaced (``sources/imagetags.py`` uses
them as the PNM comment-tag home).  The writer emits the binary
forms (P4/P5/P6) with optional comment lines after the magic.

PBM polarity note: in PBM a **1 bit is black** — decode maps it to
sample 0 and maxval 1, so downstream ``(px * 255)`` renders
conventionally.
"""

from __future__ import annotations

import re

import numpy as np

_MAGICS = {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"}


def is_pnm(data: bytes) -> bool:
    return bytes(data[:2]) in _MAGICS


def _read_header(data: bytes, n_fields: int):
    """Parse magic + ``n_fields`` decimal header tokens, skipping
    ``#`` comments; returns (fields, comments, body_offset)."""
    fields: list[int] = []
    comments: list[str] = []
    pos = 2
    while len(fields) < n_fields:
        if pos >= len(data):
            raise ValueError("truncated PNM header")
        c = data[pos]
        if c == 0x23:  # '#'
            end = data.find(b"\n", pos)
            if end < 0:
                raise ValueError("unterminated PNM comment")
            comments.append(
                data[pos + 1 : end].decode("utf-8", "replace").strip()
            )
            pos = end + 1
        elif c in b" \t\r\n":
            pos += 1
        else:
            m = re.match(rb"\d+", data[pos:])
            if not m:
                raise ValueError("malformed PNM header token")
            fields.append(int(m.group()))
            pos += m.end()
    # exactly ONE whitespace byte separates the header from binary
    # bodies (a comment may sit between — handled above for tokens;
    # after the last token the single-separator rule applies)
    if pos < len(data) and data[pos] in b" \t\r\n":
        pos += 1
    return fields, comments, pos


def decode_pnm(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode any P1-P6 payload to (H,W) or (H,W,3) uint8/uint16."""
    data = bytes(data)
    magic = data[:2]
    if magic not in _MAGICS:
        raise ValueError("not a PNM payload")
    kind = int(magic[1:2])
    bitmap = kind in (1, 4)
    color = kind in (3, 6)
    n_fields = 2 if bitmap else 3
    fields, comments, body_at = _read_header(data, n_fields)
    w, h = fields[0], fields[1]
    maxval = 1 if bitmap else fields[2]
    if maxval < 1 or maxval > 65535:
        raise ValueError(f"PNM maxval {maxval} out of range")
    nch = 3 if color else 1
    n = w * h * nch
    if kind in (1, 2, 3):  # ASCII samples
        if kind == 1:
            # P1 digits may be packed without whitespace
            toks = re.findall(rb"[01]", data[body_at:])
        else:
            toks = re.findall(rb"\d+", data[body_at:])
        if len(toks) < n:
            raise ValueError("truncated PNM ASCII body")
        vals = np.array([int(t) for t in toks[:n]], dtype=np.int64)
    elif kind == 4:  # packed bits, MSB first, rows padded to bytes
        stride = (w + 7) // 8
        raw = np.frombuffer(
            data[body_at : body_at + stride * h], dtype=np.uint8
        )
        if raw.size < stride * h:
            raise ValueError("truncated PBM body")
        bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
        vals = bits.reshape(-1).astype(np.int64)
    else:  # P5/P6 raw
        if maxval > 255:
            body = data[body_at : body_at + 2 * n]
            if len(body) < 2 * n:
                raise ValueError("truncated PNM raw body")
            vals = np.frombuffer(body, dtype=">u2")[:n].astype(np.int64)
        else:
            body = data[body_at : body_at + n]
            if len(body) < n:
                raise ValueError("truncated PNM raw body")
            vals = np.frombuffer(body, dtype=np.uint8)[:n].astype(np.int64)
    if np.any(vals > maxval):
        raise ValueError("PNM sample exceeds maxval")
    if bitmap:
        vals = 1 - vals  # PBM: 1 is black
    dtype = np.uint16 if maxval > 255 else np.uint8
    px = vals.astype(dtype).reshape((h, w, 3) if color else (h, w))
    meta = {
        "width": int(w), "height": int(h), "maxval": int(maxval),
        "channels": nch, "codec": f"p{kind}",
        "comments": comments,
    }
    return px, meta


def encode_pnm(
    pixels: np.ndarray,
    *,
    comments: list[str] | None = None,
    maxval: int | None = None,
) -> bytes:
    """Encode to the binary form matching the array: bool or
    maxval==1 -> P4, gray -> P5, RGB -> P6; uint16 arrays default to
    maxval 65535 big-endian bodies.  ``maxval`` overrides the
    dtype-derived default (a decode->edit->encode round trip passes
    the original back so low-depth graymaps keep their scale);
    samples above it are refused."""
    px = np.asarray(pixels)
    for c in comments or []:
        if "\n" in c:
            raise ValueError("PNM comments cannot contain newlines")
    chead = "".join(f"#{c}\n" for c in (comments or []))
    if px.dtype == np.bool_ or maxval == 1:
        if px.dtype != np.bool_:
            if px.max(initial=0) > 1:
                raise ValueError("PNM sample exceeds maxval")
            px = px.astype(bool)
        h, w = px.shape
        bits = np.packbits((~px).astype(np.uint8), axis=1)
        head = f"P4\n{chead}{w} {h}\n".encode()
        return head + bits.tobytes()
    if px.dtype == np.uint8:
        maxval = 255 if maxval is None else maxval
    elif px.dtype == np.uint16:
        maxval = 65535 if maxval is None else maxval
    else:
        raise ValueError("PNM encodes bool/uint8/uint16 samples")
    if not 1 <= maxval <= 65535:
        raise ValueError(f"PNM maxval {maxval} out of range")
    if int(px.max(initial=0)) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    if px.ndim == 2:
        magic = "P5"
    elif px.ndim == 3 and px.shape[2] == 3:
        magic = "P6"
    else:
        raise ValueError("expected (H,W) gray or (H,W,3) RGB")
    h, w = px.shape[:2]
    head = f"{magic}\n{chead}{w} {h}\n{maxval}\n".encode()
    body = px.astype(">u2").tobytes() if maxval > 255 else px.tobytes()
    return head + body
