"""ICO (Windows icon) container codec — multi-resolution favicon
ingestion for web-crawl media lakes.

The public layout: ICONDIR (reserved=0, type=1, count) + 16-byte
ICONDIRENTRY per image (width/height with 0 meaning 256, byte size,
payload offset), each payload either a PNG stream (Vista+ form,
routed to ``sources/png.py``) or a headerless BMP DIB whose
BITMAPINFOHEADER reports DOUBLED height (color rows + the 1-bit AND
transparency mask, both bottom-up, rows padded to 4 bytes).  The
writer emits 24-bit DIB entries (or PNG with ``as_png=True``); the
reader handles both forms plus 32-bit BGRA DIBs.
"""

from __future__ import annotations

import struct

import numpy as np


def is_ico(data: bytes) -> bool:
    return (
        len(data) >= 6
        and bytes(data[:4]) == b"\x00\x00\x01\x00"
        and struct.unpack_from("<H", data, 4)[0] > 0
    )


def _encode_dib(px: np.ndarray) -> bytes:
    """24-bit bottom-up DIB with an all-opaque AND mask."""
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(
            "ICO DIB entries are 24-bit: pass (H,W) gray or (H,W,3) "
            "RGB (use as_png=True for alpha)"
        )
    h, w, _ = px.shape
    bgr = px[:, :, ::-1]  # DIBs store BGR
    row_len = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        body += row + b"\x00" * (row_len - len(row))
    mask_len = (w + 31) // 32 * 4
    body += b"\x00" * (mask_len * h)  # 0 bits = opaque
    header = struct.pack(
        "<IiiHHIIiiII",
        40, w, 2 * h,  # DOUBLED height: color + mask blocks
        1, 24, 0, len(body), 0, 0, 0, 0,
    )
    return header + bytes(body)


def encode_ico(images: list, *, as_png: bool = False) -> bytes:
    """Encode uint8 gray/RGB arrays as a multi-image ICO (RGBA needs
    ``as_png=True`` — the DIB writer is 24-bit)."""
    from . import png as _png

    if not images:
        raise ValueError("cannot encode an empty icon list")
    payloads = []
    dims = []
    for px in images:
        px = np.asarray(px)
        if px.dtype != np.uint8:
            raise ValueError("ICO encodes uint8 samples only")
        if px.ndim == 3 and px.shape[2] == 1:
            px = px[:, :, 0]
        if not as_png and not (
            px.ndim == 2 or (px.ndim == 3 and px.shape[2] == 3)
        ):
            raise ValueError(
                "ICO DIB entries are 24-bit: pass (H,W) gray or "
                "(H,W,3) RGB (use as_png=True for alpha)"
            )
        h, w = px.shape[:2]
        if h > 256 or w > 256:
            raise ValueError("ICO images are at most 256x256")
        payloads.append(
            _png.encode_png(px) if as_png else _encode_dib(px)
        )
        dims.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for (w, h), payload in zip(dims, payloads):
        out += struct.pack(
            "<BBBBHHII",
            w % 256, h % 256,  # 0 encodes 256
            0, 0, 1, 24, len(payload), offset,
        )
        offset += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)


def _decode_dib(payload: bytes) -> np.ndarray:
    (size, w, h2) = struct.unpack_from("<Iii", payload, 0)
    if size != 40:
        raise ValueError(f"unsupported ICO DIB header size {size}")
    bits = struct.unpack_from("<H", payload, 14)[0]
    h = h2 // 2
    row_len = (w * bits // 8 + 3) // 4 * 4
    at = 40
    rows = []
    for y in range(h):
        raw = payload[at + y * row_len : at + y * row_len + w * bits // 8]
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(w, bits // 8)
        rows.append(arr)
    px = np.stack(rows[::-1])  # bottom-up -> top-down
    if bits == 24:
        return px[:, :, ::-1].copy()  # BGR -> RGB
    if bits == 32:
        bgra = px
        rgba = bgra[:, :, [2, 1, 0, 3]].copy()
        return rgba
    raise ValueError(f"unsupported ICO DIB depth {bits}")


def decode_ico(data: bytes) -> list[tuple[np.ndarray, dict]]:
    """Decode every directory entry to (pixels, meta)."""
    from . import png as _png

    data = bytes(data)
    if not is_ico(data):
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack_from("<H", data, 4)
    out = []
    for k in range(count):
        at = 6 + 16 * k
        w, h = data[at], data[at + 1]
        w, h = w or 256, h or 256
        size, offset = struct.unpack_from("<II", data, at + 8)
        payload = data[offset : offset + size]
        if _png.is_png(payload):
            px, _ = _png.decode_png(payload)
            codec = "png"
        else:
            px = _decode_dib(payload)
            codec = "dib"
        meta = {
            "width": int(w), "height": int(h), "codec": codec,
            "entry": k, "n_images": int(count),
        }
        out.append((px, meta))
    return out


def probe_ico(data: bytes) -> dict:
    """Header-only: entry count and the LARGEST directory geometry."""
    (count,) = struct.unpack_from("<H", data, 4)
    if len(data) < 6 + 16 * count:
        raise ValueError("truncated ICO directory")
    best = (0, 0)
    for k in range(count):
        at = 6 + 16 * k
        w, h = data[at] or 256, data[at + 1] or 256
        if w * h > best[0] * best[1]:
            best = (w, h)
    return {
        "format": "ico", "kind": "image", "width": best[0],
        "height": best[1], "n_frames": count, "bits": 8, "channels": 3,
    }
