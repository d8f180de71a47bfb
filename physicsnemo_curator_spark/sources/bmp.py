"""Pure-Python BMP (Windows bitmap) codec.

Follows the public BITMAPFILEHEADER + BITMAPINFOHEADER layout — the
same DIB pixel convention as the AVI container's uncompressed
streams (``sources/avi.py``), so the row packing/unpacking kernels
are shared: 24-bit bottom-up BGR rows padded to 4-byte boundaries,
and 8-bit grayscale with an identity palette.  32-bit BI_RGB (BGRA)
decodes too.  Compressed BMPs (RLE4/RLE8/bitfields) raise
``NotImplementedError`` loudly.

Scale shape: decoded task-side inside ``mapInPandas`` batches like
every other codec — one task per payload.
"""

from __future__ import annotations

import struct

import numpy as np

from . import avi as _avi


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode a uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB array.

    Grayscale writes an 8-bit DIB with a 256-entry identity palette;
    RGB writes a 24-bit DIB.  Both bottom-up, 4-byte row alignment."""
    if pixels.dtype != np.uint8:
        raise ValueError("BMP encode expects uint8 pixels")
    h, w = pixels.shape[:2]
    if pixels.ndim == 2:
        stride = (w + 3) & ~3
        rows = pixels[::-1]
        if stride != w:
            rows = np.concatenate(
                [rows, np.zeros((h, stride - w), dtype=np.uint8)], axis=1
            )
        body = rows.tobytes()
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
        bitcount, n_colors = 8, 256
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        body = _avi._dib_encode(pixels)
        palette = b""
        bitcount, n_colors = 24, 0
    else:
        raise ValueError("BMP encode expects (h,w) gray or (h,w,3) RGB")
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, 0, len(body), 2835, 2835,
        n_colors, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", offset + len(body), 0, 0, offset
    )
    return header + info + palette + body


def decode_bmp(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a BI_RGB BMP to ``(pixels, meta)``: 8-bit palettized
    (resolved through its palette — identity-gray palettes come back
    as ``(h, w)`` gray, anything else as RGB), 24-bit BGR, or 32-bit
    BGRA (alpha dropped)."""
    if not is_bmp(data):
        raise ValueError("not a BMP payload")
    _sig, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
    bi_size, w, h, _planes, bitcount = struct.unpack_from("<IiiHH", data, 14)
    if bi_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs")
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} (only BI_RGB)"
        )
    (n_colors,) = struct.unpack_from("<I", data, 46)
    body = data[offset:]
    meta = {"width": int(w), "height": abs(int(h)), "bits": int(bitcount)}
    if bitcount in (8,):
        n_colors = n_colors or 256
        pal_at = 14 + bi_size
        pal = np.frombuffer(
            data[pal_at : pal_at + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        stride = (w + 3) & ~3
        if len(body) < stride * abs(h):
            raise ValueError("BMP shorter than its geometry")
        idx = np.frombuffer(body[: stride * abs(h)], dtype=np.uint8)
        idx = idx.reshape(abs(h), stride)[:, :w]
        idx = idx[::-1] if h > 0 else idx
        if np.array_equal(pal, np.stack([np.arange(len(pal))] * 3, 1)):
            return idx.copy(), meta
        return pal[idx], meta
    if bitcount == 24:
        return _avi._dib_decode(body, int(w), int(h), 24), meta
    if bitcount == 32:
        stride = w * 4
        if len(body) < stride * abs(h):
            raise ValueError("BMP shorter than its geometry")
        rows = np.frombuffer(body[: stride * abs(h)], dtype=np.uint8)
        rows = rows.reshape(abs(h), w, 4)
        rgb = rows[:, :, 2::-1]  # BGRA -> RGB
        return (rgb[::-1] if h > 0 else rgb).copy(), meta
    raise NotImplementedError(f"{bitcount}-bit BMP")
