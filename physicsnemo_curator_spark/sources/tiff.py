"""Pure-Python baseline TIFF codec.

Follows the public TIFF 6.0 specification: II/MM byte orders, IFD
entry walk, strip-based layout, and the baseline + common-extension
compression schemes — none (1), LZW (5, MSB-first with the
'early-change' code-width convention every shipping writer uses),
Deflate (8 and the old 32946), PackBits (32773) — with horizontal
differencing (Predictor 2).  Pixel surfaces: 8/16-bit grayscale,
8/16-bit RGB, 8-bit RGBA, and palette-color (resolved through the
ColorMap), chunky planar config; multi-page files decode page by
page (microscopy stacks), and the encoder writes single- or
multi-page little-endian files with a choice of compression.

Anything outside that subset — JPEG-in-TIFF, CCITT fax codings,
tiles, planar config 2 — raises ``NotImplementedError`` loudly (the
honest-subset contract shared by every codec in this package).

Scale shape: decoded task-side inside ``mapInPandas`` batches — one
task per payload, like the PNG/JPEG codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_EXTRA_SAMPLES = 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def is_tiff(data: bytes) -> bool:
    return len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*")


# ---------------------------------------------------------------------------
# LZW (TIFF flavor: MSB-first bit packing, early code-width change)


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, bits, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        bits = 9
        next_code = 258

    bits = 9
    next_code = 258
    reset()
    acc = 0
    acc_bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        acc_bits += 8
        while acc_bits >= bits:
            code = (acc >> (acc_bits - bits)) & ((1 << bits) - 1)
            acc_bits -= bits
            if code == 256:  # ClearCode
                reset()
                prev = None
                continue
            if code == 257:  # EndOfInformation
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt TIFF LZW stream")
            # early change, decoder side: the reader's table lags the
            # writer's by one entry (additions start at the second
            # code), so its width bump fires one entry earlier
            if next_code >= (1 << bits) - 2 and bits < 12:
                bits += 1
            out += entry
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, acc_bits
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    bits = 9
    next_code = 258
    emit(256, bits)  # spec: every strip starts with ClearCode
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], bits)
        table[wc] = next_code
        next_code += 1
        # early change (mirror of the decoder)
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
        if next_code == 4094:
            emit(256, bits)
            table = {bytes([i]): i for i in range(256)}
            bits = 9
            next_code = 258
        w = c
    if w:
        emit(table[w], bits)
    emit(257, bits)  # EOI
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal run until the next >=3 repeat (2-byte runs aren't
        # worth breaking a literal for)
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def _read_ifd(data: bytes, e: str, pos: int):
    (count,) = struct.unpack_from(e + "H", data, pos)
    tags = {}
    for k in range(count):
        tag, typ, n = struct.unpack_from(e + "HHI", data, pos + 2 + 12 * k)
        size = _TYPE_SIZE.get(typ, 1) * n
        voff = pos + 2 + 12 * k + 8
        if size > 4:
            (voff,) = struct.unpack_from(e + "I", data, voff)
        raw = data[voff : voff + size]
        if typ == 3:
            vals = struct.unpack_from(e + "%dH" % n, raw)
        elif typ == 4:
            vals = struct.unpack_from(e + "%dI" % n, raw)
        elif typ == 1:
            vals = tuple(raw[:n])
        elif typ == 5:
            parts = struct.unpack_from(e + "%dI" % (2 * n), raw)
            vals = tuple(
                parts[2 * i] / parts[2 * i + 1] if parts[2 * i + 1] else 0
                for i in range(n)
            )
        else:
            vals = (raw,)
        tags[tag] = vals
    (next_ifd,) = struct.unpack_from(e + "I", data, pos + 2 + 12 * count)
    return tags, next_ifd


def _decode_page(data: bytes, e: str, tags: dict) -> tuple[np.ndarray, dict]:
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_LENGTH][0]
    spp = tags.get(_TAG_SAMPLES, (1,))[0]
    bits = tags.get(_TAG_BITS, (1,) * spp)
    if isinstance(bits[0], bytes):
        raise ValueError("malformed BitsPerSample")
    comp = tags.get(_TAG_COMPRESSION, (1,))[0]
    photo = tags.get(_TAG_PHOTOMETRIC, (1,))[0]
    planar = tags.get(_TAG_PLANAR, (1,))[0]
    predictor = tags.get(_TAG_PREDICTOR, (1,))[0]
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(f"TIFF BitsPerSample {bits}")
    depth = bits[0]
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, (h,))[0]
    row_bytes = w * spp * (depth // 8)

    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = bytes(data[off : off + cnt])
        n_rows = min(rows_per_strip, h - i * rows_per_strip)
        expected = row_bytes * n_rows
        if comp == 1:
            dec = strip
        elif comp == 5:
            dec = _lzw_decode(strip)
        elif comp in (8, 32946):
            dec = zlib.decompress(strip)
        elif comp == 32773:
            dec = _packbits_decode(strip, expected)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} (none/LZW/Deflate/PackBits)"
            )
        if len(dec) < expected:
            raise ValueError("TIFF strip shorter than its geometry")
        raw += dec[:expected]

    dt = np.uint8 if depth == 8 else np.dtype(e + "u2")
    arr = np.frombuffer(bytes(raw), dtype=dt).reshape(h, w, spp)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(
            np.uint8 if depth == 8 else np.uint16
        ).reshape(h, w, spp)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    arr = arr.astype(np.uint8 if depth == 8 else np.uint16)

    meta = {"width": int(w), "height": int(h), "bits": int(depth),
            "channels": int(spp), "compression": int(comp)}
    if photo == 3:
        if _TAG_COLORMAP not in tags:
            raise ValueError("palette TIFF without ColorMap")
        cmap = np.array(tags[_TAG_COLORMAP], dtype=np.uint32)
        n = len(cmap) // 3
        # TIFF colormaps are 16-bit; 8-bit content is value*257
        rgb = (cmap.reshape(3, n).T // 257).astype(np.uint8)
        idx = arr[:, :, 0]
        return rgb[idx], meta
    if photo == 0:  # WhiteIsZero
        arr = (
            (255 if depth == 8 else 65535) - arr.astype(np.uint32)
        ).astype(np.uint8 if depth == 8 else np.uint16)
    if spp == 1:
        return arr[:, :, 0].copy(), meta
    if spp == 3:
        return arr.copy(), meta
    if spp == 4:
        return arr.copy(), meta  # RGBA kept as-is
    raise NotImplementedError(f"TIFF SamplesPerPixel {spp}")


def decode_tiff_pages(data: bytes) -> list[tuple[np.ndarray, dict]]:
    """Decode every IFD page (microscopy stacks are multi-page)."""
    if not is_tiff(data):
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    (pos,) = struct.unpack_from(e + "I", data, 4)
    pages = []
    seen = set()
    while pos and pos not in seen:
        seen.add(pos)
        tags, pos = _read_ifd(data, e, pos)
        pages.append(_decode_page(data, e, tags))
    if not pages:
        raise ValueError("TIFF has no IFD pages")
    return pages


def decode_tiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode the FIRST page; ``meta['n_pages']`` reports the stack
    depth without decoding the rest."""
    if not is_tiff(data):
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    (pos,) = struct.unpack_from(e + "I", data, 4)
    tags, nxt = _read_ifd(data, e, pos)
    px, meta = _decode_page(data, e, tags)
    n_pages = 1
    seen = {pos}
    while nxt and nxt not in seen:
        seen.add(nxt)
        _t, nxt = _read_ifd(data, e, nxt)
        n_pages += 1
    meta["n_pages"] = n_pages
    return px, meta


# ---------------------------------------------------------------------------
# encode (always little-endian II)

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _encode_page(
    pixels: np.ndarray, compression: str, predictor: int
) -> tuple[dict, bytes]:
    if pixels.dtype not in (np.uint8, np.uint16):
        raise ValueError("TIFF encode expects uint8/uint16 pixels")
    if pixels.ndim == 2:
        spp, photo = 1, 1
        arr = pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] in (3, 4):
        spp, photo = pixels.shape[2], 2
        arr = pixels
    else:
        raise ValueError("TIFF encode expects (h,w), (h,w,3) or (h,w,4)")
    h, w = arr.shape[:2]
    depth = 8 if arr.dtype == np.uint8 else 16
    if predictor == 2:
        diff = arr.astype(np.int64)
        diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
        arr = (diff % (1 << depth)).astype(arr.dtype)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")
    raw = arr.astype("<u2" if depth == 16 else np.uint8).tobytes()
    comp_id = _COMP_IDS.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    if compression == "none":
        body = raw
    elif compression == "lzw":
        body = _lzw_encode(raw)
    elif compression == "deflate":
        body = zlib.compress(raw, 6)
    else:
        body = _packbits_encode(raw)
    # dimensions as LONG so >64K microscopy scans stay encodable
    # (TIFF 6.0 allows SHORT or LONG for these tags)
    tags = {
        _TAG_WIDTH: (4, (w,)),
        _TAG_LENGTH: (4, (h,)),
        _TAG_BITS: (3, (depth,) * spp),
        _TAG_COMPRESSION: (3, (comp_id,)),
        _TAG_PHOTOMETRIC: (3, (photo,)),
        _TAG_SAMPLES: (3, (spp,)),
        _TAG_ROWS_PER_STRIP: (4, (h,)),
        _TAG_PLANAR: (3, (1,)),
        _TAG_PREDICTOR: (3, (predictor,)),
    }
    if spp == 4:
        tags[_TAG_EXTRA_SAMPLES] = (3, (2,))  # unassociated alpha
    return tags, body


def _write_ifd(tags: dict, body_at: int, body_len: int, next_ifd: int,
               extra_at: int) -> tuple[bytes, bytes]:
    """Serialize one IFD (tags + strip pointers); out-of-line values
    land in an extra blob at ``extra_at``."""
    full = dict(tags)
    full[_TAG_STRIP_OFFSETS] = (4, (body_at,))
    full[_TAG_STRIP_COUNTS] = (4, (body_len,))
    entries = b""
    extra = bytearray()
    for tag in sorted(full):
        typ, vals = full[tag]
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack("<%d%s" % (len(vals), fmt), *vals)
        if len(packed) <= 4:
            val = packed + b"\x00" * (4 - len(packed))
        else:
            val = struct.pack("<I", extra_at + len(extra))
            extra += packed
        entries += struct.pack("<HHI", tag, typ, len(vals)) + val
    ifd = (
        struct.pack("<H", len(full))
        + entries
        + struct.pack("<I", next_ifd)
    )
    return ifd, bytes(extra)


def encode_tiff_multi(
    pages: list[np.ndarray],
    *,
    compression: str = "deflate",
    predictor: int = 1,
) -> bytes:
    """Encode a multi-page (stacked) little-endian TIFF.  Every page
    is one strip; ``compression`` ∈ none/lzw/deflate/packbits."""
    if not pages:
        raise ValueError("cannot encode an empty page list")
    encoded = [_encode_page(p, compression, predictor) for p in pages]
    # layout: header | page bodies | per-page (IFD + extra)
    pos = 8
    body_at = []
    for _tags, body in encoded:
        body_at.append(pos)
        pos += len(body)
    out = bytearray(b"II*\x00" + struct.pack("<I", 0))
    for _tags, body in encoded:
        out += body
    ifd_at = []
    for i, (tags, body) in enumerate(encoded):
        n_tags = len(tags) + 2
        ifd_len = 2 + 12 * n_tags + 4
        ifd_at.append(pos)
        extra_at = pos + ifd_len
        # dry-run to learn the extra blob size, then place the next IFD
        _ifd, extra = _write_ifd(
            tags, body_at[i], len(body), 0, extra_at
        )
        pos = extra_at + len(extra)
    for i, (tags, body) in enumerate(encoded):
        nxt = ifd_at[i + 1] if i + 1 < len(encoded) else 0
        extra_at = ifd_at[i] + 2 + 12 * (len(tags) + 2) + 4
        ifd, extra = _write_ifd(tags, body_at[i], len(body), nxt, extra_at)
        out += ifd + extra
    struct.pack_into("<I", out, 4, ifd_at[0])
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: str = "deflate",
    predictor: int = 1,
) -> bytes:
    """Encode one uint8/uint16 gray/RGB/RGBA array as a single-page
    TIFF (lossless in every mode)."""
    return encode_tiff_multi(
        [pixels], compression=compression, predictor=predictor
    )
