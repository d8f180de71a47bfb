"""QOI ("Quite OK Image") codec — the public qoiformat.org spec.

A single-pass byte-oriented lossless format: 14-byte header
(``qoif`` + BE width/height + channels + colorspace), then a chunk
stream over a running 64-entry color index (hash ``(3r+5g+7b+11a)
% 64``) with RGB/RGBA literals, 2-bit DIFF, LUMA, INDEX and RUN ops,
terminated by seven ``0x00`` bytes and one ``0x01``.

Decode/encode are exact inverses for any uint8 gray/RGB/RGBA array
(gray encodes as replicated-channel RGB, like the BMP codec).  The
per-pixel state machine is inherently sequential, so the kernels are
plain Python loops — payloads in this repo's media paths are small
thumbnails/fixtures; parallelism comes from one task per payload in
``mapInPandas``, not from inside a single image.
"""

from __future__ import annotations

import struct

import numpy as np

_END = b"\x00" * 7 + b"\x01"


def is_qoi(data: bytes) -> bool:
    return bytes(data[:4]) == b"qoif"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: np.ndarray) -> bytes:
    """Encode uint8 gray (H,W), RGB (H,W,3) or RGBA (H,W,4)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("QOI encodes uint8 samples only")
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4)")
    h, w, ch = px.shape
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", w, h, ch, 0)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, ch)
    for row in flat:
        if ch == 4:
            cur = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        else:
            cur = (int(row[0]), int(row[1]), int(row[2]), 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _hash(*cur)
        if index[idx] == cur:
            out.append(idx)
        else:
            index[idx] = cur
            if cur[3] == prev[3]:
                dr = (cur[0] - prev[0] + 128) % 256 - 128
                dg = (cur[1] - prev[1] + 128) % 256 - 128
                db = (cur[2] - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, cur[0], cur[1], cur[2]))
            else:
                out += bytes((0xFF,) + cur)
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode to (H,W,3) or (H,W,4) uint8 (gray inputs come back as
    replicated RGB, collapsible by the caller)."""
    data = bytes(data)
    if not is_qoi(data):
        raise ValueError("not a QOI payload")
    w, h, ch, colorspace = struct.unpack_from(">IIBB", data, 4)
    if ch not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {ch}")
    n = w * h
    out = np.empty((n, ch), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    while i < n:
        if pos >= len(data) - 7:
            raise ValueError("truncated QOI chunk stream")
        op = data[pos]
        pos += 1
        if op == 0xFE:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:
            r, g, b, a = data[pos : pos + 4]
            pos += 4
        elif op >> 6 == 0:  # INDEX
            r, g, b, a = index[op]
        elif op >> 6 == 1:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 2:  # LUMA
            dg = (op & 0x3F) - 32
            nxt = data[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (nxt & 0xF) - 8) % 256
        else:  # RUN
            run = (op & 0x3F) + 1
            row = (r, g, b, a)[:ch]
            out[i : i + run] = row
            i += run
            # reference-decoder semantics: the index slot updates
            # after EVERY chunk, including RUN — matters when the
            # very first chunk runs the initial (0,0,0,255) pixel
            # and a later INDEX op references its hash slot
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)[:ch]
        i += 1
    if data[pos : pos + 8] != _END:
        raise ValueError("QOI stream missing end marker")
    meta = {
        "width": int(w), "height": int(h), "channels": int(ch),
        "colorspace": int(colorspace), "codec": "qoi",
    }
    return out.reshape(h, w, ch), meta
