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

- bit depths 1/2/4 (gray + palette, per spec), 8, and 16 (decoded to
  uint16); color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); all five filter types (None/Sub/Up/Average/Paeth);
  multiple IDAT chunks; **Adam7 interlacing** (all seven passes,
  including zero-size passes on small images).
- Sub-8-bit gray samples scale to the full 0..255 range
  (``v * 255 / (2^d - 1)``, the standard expansion); palette indexes
  are used raw.  Palette transparency (tRNS) is ignored (opaque
  palette decode), documented here.

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


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filters over ``height`` scanlines of
    ``stride`` bytes each (``bpp`` = FILTER bytes-per-pixel, i.e.
    ``max(1, channels * depth // 8)`` — filtering is byte-wise per
    spec, so sub-byte depths filter with bpp=1)."""
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


# Adam7 pass geometry: (x offset, y offset, x step, y step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _scan_stride(width: int, channels: int, depth: int) -> int:
    return (width * channels * depth + 7) // 8


def _unpack_samples(
    rows: np.ndarray, width: int, channels: int, depth: int
) -> np.ndarray:
    """(h, stride) unfiltered scanline bytes → (h, width*channels)
    samples: uint8 for depths <= 8 (sub-byte samples MSB-first per
    spec), uint16 for depth 16 (big-endian on the wire)."""
    h = rows.shape[0]
    n = width * channels
    if depth == 8:
        return rows[:, :n]
    if depth == 16:
        return (
            np.ascontiguousarray(rows[:, : 2 * n])
            .view(">u2")
            .astype(np.uint16)
        )
    per = 8 // depth
    shifts = (np.arange(per - 1, -1, -1) * depth).astype(np.uint8)
    mask = (1 << depth) - 1
    expanded = (rows[:, :, None] >> shifts) & mask
    return expanded.reshape(h, -1)[:, :n]


def _decode_planes(
    raw: bytes, width: int, height: int, channels: int, depth: int,
    interlace: int,
) -> np.ndarray:
    """zlib-inflated IDAT payload → (height, width*channels) samples,
    de-interlacing Adam7 when IHDR says so (seven independently
    filtered sub-images, zero-size passes skipped)."""
    bpp = max(1, channels * depth // 8)
    if interlace == 0:
        rows = _unfilter(
            raw, _scan_stride(width, channels, depth), height, bpp
        )
        return _unpack_samples(rows, width, channels, depth)
    dtype = np.uint16 if depth == 16 else np.uint8
    out = np.zeros((height, width, channels), dtype=dtype)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        ps = _scan_stride(pw, channels, depth)
        block = raw[off : off + ph * (1 + ps)]
        off += ph * (1 + ps)
        rows = _unfilter(block, ps, ph, bpp)
        out[y0::dy, x0::dx] = _unpack_samples(
            rows, pw, channels, depth
        ).reshape(ph, pw, channels)
    if off != len(raw):
        raise ValueError(
            f"Adam7 payload is {len(raw)} bytes, passes consumed {off}"
        )
    return out.reshape(height, width * channels)


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG byte string to ``(pixels, meta)``.

    ``pixels`` has shape ``(height, width)`` for single-channel images
    or ``(height, width, channels)`` otherwise (palette images expand
    to RGB); dtype is uint8, or uint16 for 16-bit files.  ``meta``
    carries width/height/bit_depth/color_type/channels.
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
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"PNG bit depth {bit_depth} is only valid for gray/palette "
            f"(color type {color_type})"
        )
    if bit_depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a valid combination")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    planes = _decode_planes(
        raw, width, height, channels, bit_depth, interlace
    )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = planes.reshape(height, width)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        pixels = pal[idx]
        channels = 3
    elif color_type == 0 and bit_depth < 8:
        # expand to the full 0..255 range (v * 255 / (2^d - 1))
        mx = (1 << bit_depth) - 1
        pixels = (
            planes.reshape(height, width).astype(np.uint16) * 255 // mx
        ).astype(np.uint8)
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


def encode_png(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an array — ``(h, w)`` gray, ``(h, w, 2)`` gray+alpha,
    ``(h, w, 3)`` RGB, or ``(h, w, 4)`` RGBA — as a PNG (filter type 0
    rows, one IDAT).  uint16 input encodes at bit depth 16 (big-endian
    samples); everything else encodes at depth 8.  ``interlace=True``
    emits Adam7 pass-split scanlines."""
    arr = np.asarray(pixels)
    if arr.dtype == np.uint16:
        depth = 16
    else:
        arr = arr.astype(np.uint8)
        depth = 8
    arr = np.ascontiguousarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"cannot encode array of shape {pixels.shape}")
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )

    def _rows(sub: np.ndarray) -> bytes:
        sh = sub.shape[0]
        flat = sub.reshape(sh, -1)
        if depth == 16:
            flat = flat.astype(">u2")
        scan = bytearray()
        for y in range(sh):
            scan.append(0)
            scan.extend(flat[y].tobytes())
        return bytes(scan)

    if not interlace:
        payload = _rows(arr)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_rows(sub))
        payload = b"".join(parts)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(payload))
        + _chunk(b"IEND", b"")
    )
