"""Pure-Python PNG codec (decode + encode) for the multimodal column
pack.

The multimodal operators treat media as opaque ``binary`` columns; the
decode step was an honest strict-raise stub because no codec library
ships in this environment.  PNG, however, is a fully public
specification (RFC 2083 / ISO 15948): zlib-compressed scanlines, five
reversible per-row filter types, a handful of color types — all
implementable with stdlib ``zlib`` + ``struct`` + numpy, the same
pure-Python-codec discipline as the repo's GRIB2 / LMDB / NetCDF-3 /
VTK-XML readers (reference multimodal decode has no counterpart; this
is a north-star addition per SURVEY §6).

Supported surface (the honest subset, loud on everything else):

- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); all five filter types (None/Sub/Up/
  Average/Paeth); multiple IDAT chunks.
- NOT supported (``NotImplementedError`` with the reason): bit depths
  1/2/4/16, Adam7 interlacing.  Palette transparency (tRNS) is
  ignored (opaque palette decode), documented here.

Decode runs inside Arrow-batched ``mapInPandas`` kernels — per-file
Python, the justified-UDF class (SURVEY §4): the payload is an opaque
byte string no Catalyst expression can open.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def _chunks(data: bytes):
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        # CRC check: a corrupted chunk must fail loudly here, not
        # decode to silent garbage pixels downstream
        crc_bytes = data[off + 8 + length : off + 12 + length]
        if len(crc_bytes) == 4:
            (expect,) = struct.unpack(">I", crc_bytes)
            # seed with the type bytes instead of concatenating —
            # ctype+payload would copy multi-MB IDAT payloads in the
            # mapInPandas hot path
            if zlib.crc32(payload, zlib.crc32(ctype)) & 0xFFFFFFFF != expect:
                raise ValueError(
                    f"PNG chunk {ctype.decode(errors='replace')!r} CRC "
                    "mismatch (corrupted file)"
                )
        yield ctype, payload
        off += 12 + length  # length + type + payload + CRC
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


def _paeth_row(recon: np.ndarray, prior: np.ndarray, bpp: int) -> None:
    """In-place Paeth unfilter of one scanline (recon holds the raw
    filtered bytes on entry).  Sequential in x by definition — the
    predictor reads the just-reconstructed left neighbor."""
    n = recon.shape[0]
    for x in range(n):
        a = int(recon[x - bpp]) if x >= bpp else 0
        b = int(prior[x])
        c = int(prior[x - bpp]) if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        recon[x] = (int(recon[x]) + pred) & 0xFF


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG scanline payload is {len(raw)} bytes, expected "
            f"{height}*(1+{stride})"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    for y in range(height):
        ftype = int(arr[y, 0])
        row = arr[y, 1:].copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row += prior
        elif ftype == 3:  # Average
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((a + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            _paeth_row(row, prior, bpp)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prior = row
    return out


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG byte string to ``(pixels, meta)``.

    ``pixels`` is a uint8 array of shape ``(height, width)`` for
    single-channel images or ``(height, width, channels)`` otherwise
    (palette images expand to RGB).  ``meta`` carries width/height/
    bit_depth/color_type/channels.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG byte stream (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette: bytes | None = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif ctype == b"PLTE":
            palette = payload
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("PNG missing IHDR chunk")
    if interlace != 0:
        raise NotImplementedError(
            "Adam7-interlaced PNG is not supported by this decoder"
        )
    if bit_depth != 8:
        raise NotImplementedError(
            f"PNG bit depth {bit_depth} is not supported (only 8)"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    planes = _unfilter(raw, width, height, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = planes.reshape(height, width)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        pixels = pal[idx]
        channels = 3
    elif channels == 1:
        pixels = planes.reshape(height, width)
    else:
        pixels = planes.reshape(height, width, channels)
    meta = {
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "channels": int(channels),
    }
    return pixels, meta


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a uint8 array — ``(h, w)`` gray, ``(h, w, 2)``
    gray+alpha, ``(h, w, 3)`` RGB, or ``(h, w, 4)`` RGBA — as a PNG
    (bit depth 8, filter type 0 rows, one IDAT)."""
    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"cannot encode array of shape {pixels.shape}")
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * c
    flat = arr.reshape(h, stride)
    scan = bytearray()
    for y in range(h):
        scan.append(0)
        scan.extend(flat[y].tobytes())
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )
