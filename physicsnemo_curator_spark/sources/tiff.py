"""Pure-Python baseline TIFF codec.

Follows the public TIFF 6.0 specification: II/MM byte orders, IFD
entry walk, strip-based AND tiled layouts, and the baseline +
common-extension compression schemes — none (1), LZW (5, MSB-first
with the 'early-change' code-width convention every shipping writer
uses), Deflate (8 and the old 32946), PackBits (32773) — with
horizontal differencing (Predictor 2, applied per compressed unit).
Pixel surfaces: 8/16-bit grayscale, 8/16-bit RGB, 8-bit RGBA, and
palette-color (resolved through the ColorMap), chunky planar
config; multi-page files decode page by page (microscopy stacks),
and the encoder writes single- or multi-page little-endian files
with a choice of compression and an optional tile grid (the
pyramidal/scientific layout — tiles are the unit of parallel access
at scale).

Anything outside that subset — JPEG-in-TIFF, CCITT fax codings,
planar config 2 — raises ``NotImplementedError`` loudly (the
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
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_EXTRA_SAMPLES = 338

_TYPE_SIZE = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
    # BigTIFF 8-byte types: LONG8 / SLONG8 / IFD8
    16: 8, 17: 8, 18: 8,
}


def is_classic_tiff(data: bytes) -> bool:
    return len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*")


def is_bigtiff(data: bytes) -> bool:
    """BigTIFF: version 43 ('+'), 8-byte offsets (the >4 GB layout
    scientific stacks use)."""
    return len(data) >= 16 and data[:4] in (b"II+\x00", b"MM\x00+")


def is_tiff(data: bytes) -> bool:
    return is_classic_tiff(data) or is_bigtiff(data)


def tiff_layout(data: bytes) -> tuple[str, bool, int]:
    """Header dispatch shared by every IFD walker: returns
    (endian, bigtiff, first_ifd_offset)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF byte order mark")
    (ver,) = struct.unpack_from(e + "H", data, 2)
    if ver == 42:
        (first,) = struct.unpack_from(e + "I", data, 4)
        return e, False, first
    if ver == 43:
        bytesize, zero = struct.unpack_from(e + "HH", data, 4)
        if bytesize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header constants")
        (first,) = struct.unpack_from(e + "Q", data, 8)
        return e, True, first
    raise ValueError(f"unknown TIFF version {ver}")


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
        # the decoder ADDS a table entry for this final code (the
        # encoder does not), so its width bump can fire before the
        # EOI — mirror it or the EOI is read one bit wide
        if next_code >= (1 << bits) - 2 and bits < 12:
            bits += 1
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


def _decompress(chunk: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return chunk
    if comp == 5:
        return _lzw_decode(chunk)
    if comp in (8, 32946):
        return zlib.decompress(chunk)
    if comp == 32773:
        return _packbits_decode(chunk, expected)
    raise NotImplementedError(
        f"TIFF compression {comp} (none/LZW/Deflate/PackBits)"
    )


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


def _read_ifd8(data: bytes, e: str, pos: int):
    """BigTIFF IFD: 8-byte entry count, 20-byte entries (8-byte
    counts and value/offset fields), 8-byte next pointer."""
    (count,) = struct.unpack_from(e + "Q", data, pos)
    tags = {}
    for k in range(count):
        at = pos + 8 + 20 * k
        tag, typ = struct.unpack_from(e + "HH", data, at)
        (n,) = struct.unpack_from(e + "Q", data, at + 4)
        size = _TYPE_SIZE.get(typ, 1) * n
        voff = at + 12
        if size > 8:
            (voff,) = struct.unpack_from(e + "Q", data, voff)
        raw = data[voff : voff + size]
        if typ == 3:
            vals = struct.unpack_from(e + "%dH" % n, raw)
        elif typ == 4:
            vals = struct.unpack_from(e + "%dI" % n, raw)
        elif typ in (16, 18):
            vals = struct.unpack_from(e + "%dQ" % n, raw)
        elif typ == 17:
            vals = struct.unpack_from(e + "%dq" % n, raw)
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
    (next_ifd,) = struct.unpack_from(e + "Q", data, pos + 8 + 20 * count)
    return tags, next_ifd


def read_ifd(data: bytes, e: str, pos: int, big: bool):
    """Layout-dispatched IFD read (classic 12-byte or BigTIFF
    20-byte entries)."""
    return _read_ifd8(data, e, pos) if big else _read_ifd(data, e, pos)


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
    dt = np.uint8 if depth == 8 else np.dtype(e + "u2")
    out_dt = np.uint8 if depth == 8 else np.uint16
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")

    def undiff(a: np.ndarray) -> np.ndarray:
        # horizontal differencing accumulates per row, per sample,
        # within ONE compressed unit (strip row or tile row)
        if predictor != 2:
            return a.astype(out_dt)
        return np.cumsum(a.astype(np.uint32), axis=1).astype(out_dt)

    if _TAG_TILE_WIDTH in tags:
        if _TAG_TILE_LENGTH not in tags or _TAG_TILE_OFFSETS not in tags \
                or _TAG_TILE_COUNTS not in tags:
            raise ValueError("tiled TIFF missing tile length/offset tags")
        tw = tags[_TAG_TILE_WIDTH][0]
        tl = tags[_TAG_TILE_LENGTH][0]
        offsets = tags[_TAG_TILE_OFFSETS]
        counts = tags[_TAG_TILE_COUNTS]
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) < across * down or len(counts) < across * down:
            raise ValueError("TIFF tile table shorter than its grid")
        expected = tl * tw * spp * (depth // 8)
        full = np.zeros((down * tl, across * tw, spp), dtype=out_dt)
        for i in range(across * down):
            off, cnt = offsets[i], counts[i]
            dec = _decompress(
                bytes(data[off : off + cnt]), comp, expected
            )
            if len(dec) < expected:
                raise ValueError("TIFF tile shorter than its geometry")
            tile = np.frombuffer(dec[:expected], dtype=dt).reshape(
                tl, tw, spp
            )
            ty, tx = divmod(i, across)
            full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = (
                undiff(tile)
            )
        arr = full[:h, :w]
    else:
        if _TAG_STRIP_OFFSETS not in tags:
            raise ValueError("TIFF page has neither strips nor tiles")
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
        rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, (h,))[0]
        row_bytes = w * spp * (depth // 8)
        raw = bytearray()
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            n_rows = min(rows_per_strip, h - i * rows_per_strip)
            expected = row_bytes * n_rows
            dec = _decompress(bytes(data[off : off + cnt]), comp, expected)
            if len(dec) < expected:
                raise ValueError("TIFF strip shorter than its geometry")
            raw += dec[:expected]
        arr = undiff(
            np.frombuffer(bytes(raw), dtype=dt).reshape(h, w, spp)
        )
    arr = arr.astype(out_dt)

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
    """Decode every IFD page (microscopy stacks are multi-page);
    classic and BigTIFF layouts both."""
    if not is_tiff(data):
        raise ValueError("not a TIFF payload")
    e, big, pos = tiff_layout(data)
    pages = []
    seen = set()
    while pos and pos not in seen:
        seen.add(pos)
        tags, pos = read_ifd(data, e, pos, big)
        pages.append(_decode_page(data, e, tags))
    if not pages:
        raise ValueError("TIFF has no IFD pages")
    return pages


def decode_tiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode the FIRST page; ``meta['n_pages']`` reports the stack
    depth without decoding the rest."""
    if not is_tiff(data):
        raise ValueError("not a TIFF payload")
    e, big, pos = tiff_layout(data)
    tags, nxt = read_ifd(data, e, pos, big)
    px, meta = _decode_page(data, e, tags)
    meta["bigtiff"] = big
    n_pages = 1
    seen = {pos}
    while nxt and nxt not in seen:
        seen.add(nxt)
        _t, nxt = read_ifd(data, e, nxt, big)
        n_pages += 1
    meta["n_pages"] = n_pages
    return px, meta


# ---------------------------------------------------------------------------
# encode (always little-endian II)

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _compress_unit(raw: bytes, compression: str) -> bytes:
    if compression == "none":
        return raw
    if compression == "lzw":
        return _lzw_encode(raw)
    if compression == "deflate":
        return zlib.compress(raw, 6)
    if compression == "packbits":
        return _packbits_encode(raw)
    raise ValueError(f"unknown compression {compression!r}")


def _encode_page(
    pixels: np.ndarray,
    compression: str,
    predictor: int,
    tile: tuple[int, int] | None,
) -> tuple[dict, list[bytes], bool]:
    """Returns ``(tags, chunk_bodies, tiled)``.  Strips: one chunk.
    Tiles: row-major grid of independently predicted + compressed
    tiles, edge tiles zero-padded to full tile size per TIFF 6.0."""
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
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    comp_id = _COMP_IDS.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    wire = "<u2" if depth == 16 else np.uint8

    def diffed(a: np.ndarray) -> np.ndarray:
        if predictor != 2:
            return a
        d = a.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        return (d % (1 << depth)).astype(a.dtype)

    # dimensions as LONG so >64K microscopy scans stay encodable
    # (TIFF 6.0 allows SHORT or LONG for these tags)
    tags = {
        _TAG_WIDTH: (4, (w,)),
        _TAG_LENGTH: (4, (h,)),
        _TAG_BITS: (3, (depth,) * spp),
        _TAG_COMPRESSION: (3, (comp_id,)),
        _TAG_PHOTOMETRIC: (3, (photo,)),
        _TAG_SAMPLES: (3, (spp,)),
        _TAG_PLANAR: (3, (1,)),
        _TAG_PREDICTOR: (3, (predictor,)),
    }
    if spp == 4:
        tags[_TAG_EXTRA_SAMPLES] = (3, (2,))  # unassociated alpha
    if tile is None:
        tags[_TAG_ROWS_PER_STRIP] = (4, (h,))
        raw = diffed(arr).astype(wire).tobytes()
        return tags, [_compress_unit(raw, compression)], False
    tl, tw = tile
    if tl % 16 or tw % 16 or tl < 16 or tw < 16:
        raise ValueError("tile dimensions must be positive multiples of 16")
    tags[_TAG_TILE_WIDTH] = (4, (tw,))
    tags[_TAG_TILE_LENGTH] = (4, (tl,))
    across = -(-w // tw)
    down = -(-h // tl)
    padded = np.zeros((down * tl, across * tw, spp), dtype=arr.dtype)
    padded[:h, :w] = arr
    bodies = []
    for ty in range(down):
        for tx in range(across):
            t = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
            bodies.append(
                _compress_unit(diffed(t).astype(wire).tobytes(), compression)
            )
    return tags, bodies, True


def _write_ifd(tags: dict, offs: list[int], lens: list[int], tiled: bool,
               next_ifd: int, extra_at: int) -> tuple[bytes, bytes]:
    """Serialize one IFD (tags + strip/tile pointer arrays);
    out-of-line values land in an extra blob at ``extra_at``."""
    full = dict(tags)
    if tiled:
        full[_TAG_TILE_OFFSETS] = (4, tuple(offs))
        full[_TAG_TILE_COUNTS] = (4, tuple(lens))
    else:
        full[_TAG_STRIP_OFFSETS] = (4, tuple(offs))
        full[_TAG_STRIP_COUNTS] = (4, tuple(lens))
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


def _write_ifd8(tags: dict, offs: list[int], lens: list[int], tiled: bool,
                next_ifd: int, extra_at: int) -> tuple[bytes, bytes]:
    """BigTIFF IFD writer: 20-byte entries, LONG8 chunk pointers,
    8-byte inline value slots."""
    full = dict(tags)
    if tiled:
        full[_TAG_TILE_OFFSETS] = (16, tuple(offs))
        full[_TAG_TILE_COUNTS] = (16, tuple(lens))
    else:
        full[_TAG_STRIP_OFFSETS] = (16, tuple(offs))
        full[_TAG_STRIP_COUNTS] = (16, tuple(lens))
    entries = b""
    extra = bytearray()
    for tag in sorted(full):
        typ, vals = full[tag]
        fmt = {3: "H", 4: "I", 16: "Q"}[typ]
        packed = struct.pack("<%d%s" % (len(vals), fmt), *vals)
        if len(packed) <= 8:
            val = packed + b"\x00" * (8 - len(packed))
        else:
            val = struct.pack("<Q", extra_at + len(extra))
            extra += packed
        entries += struct.pack("<HHQ", tag, typ, len(vals)) + val
    ifd = (
        struct.pack("<Q", len(full))
        + entries
        + struct.pack("<Q", next_ifd)
    )
    return ifd, bytes(extra)


def encode_tiff_multi(
    pages: list[np.ndarray],
    *,
    compression: str = "deflate",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    bigtiff: bool = False,
) -> bytes:
    """Encode a multi-page (stacked) little-endian TIFF.  Pages are
    one strip each, or a tile grid when ``tile=(length, width)`` is
    given (pyramidal/scientific layouts; multiples of 16);
    ``compression`` ∈ none/lzw/deflate/packbits; ``bigtiff=True``
    emits the version-43 8-byte-offset layout (the same pixel
    bodies — only header/IFD widths change, so >4 GB stacks stay
    addressable)."""
    if not pages:
        raise ValueError("cannot encode an empty page list")
    encoded = [_encode_page(p, compression, predictor, tile) for p in pages]
    head_len = 16 if bigtiff else 8
    writer = _write_ifd8 if bigtiff else _write_ifd
    # layout: header | page chunk bodies | per-page (IFD + extra)
    pos = head_len
    body_at: list[list[int]] = []
    for _tags, bodies, _tiled in encoded:
        offs = []
        for b in bodies:
            offs.append(pos)
            pos += len(b)
        body_at.append(offs)
    if bigtiff:
        out = bytearray(
            b"II+\x00" + struct.pack("<HHQ", 8, 0, 0)
        )
    else:
        out = bytearray(b"II*\x00" + struct.pack("<I", 0))
    for _tags, bodies, _tiled in encoded:
        for b in bodies:
            out += b
    ifd_at = []
    for i, (tags, bodies, tiled) in enumerate(encoded):
        n_tags = len(tags) + 2
        ifd_len = (
            8 + 20 * n_tags + 8 if bigtiff else 2 + 12 * n_tags + 4
        )
        ifd_at.append(pos)
        extra_at = pos + ifd_len
        # dry-run to learn the extra blob size, then place the next IFD
        _ifd, extra = writer(
            tags, body_at[i], [len(b) for b in bodies], tiled, 0, extra_at
        )
        pos = extra_at + len(extra)
    for i, (tags, bodies, tiled) in enumerate(encoded):
        nxt = ifd_at[i + 1] if i + 1 < len(encoded) else 0
        n_tags = len(tags) + 2
        extra_at = ifd_at[i] + (
            8 + 20 * n_tags + 8 if bigtiff else 2 + 12 * n_tags + 4
        )
        ifd, extra = writer(
            tags, body_at[i], [len(b) for b in bodies], tiled, nxt,
            extra_at,
        )
        out += ifd + extra
    if bigtiff:
        struct.pack_into("<Q", out, 8, ifd_at[0])
    else:
        struct.pack_into("<I", out, 4, ifd_at[0])
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: str = "deflate",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    bigtiff: bool = False,
) -> bytes:
    """Encode one uint8/uint16 gray/RGB/RGBA array as a single-page
    TIFF (lossless in every mode); ``tile=(length, width)`` selects
    the tiled layout, ``bigtiff=True`` the 8-byte-offset variant."""
    return encode_tiff_multi(
        [pixels], compression=compression, predictor=predictor,
        tile=tile, bigtiff=bigtiff,
    )
