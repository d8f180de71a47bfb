"""Image metadata tags: embed into and extract from PNG / JPEG /
TIFF / GIF containers — the image analog of ``sources/audiotags.py``.

Each container family stores free-text metadata in its own public
structure; this module normalizes all of them onto one key set
(``title author description software date comment``):

- **PNG**: ``tEXt`` chunks (Latin-1) with the spec's registered
  keywords (``Title Author Description Software Creation Time
  Comment``), falling back to ``iTXt`` (UTF-8, uncompressed) when a
  value isn't Latin-1-encodable.  Chunks sit between IHDR and the
  first IDAT.
- **JPEG**: the EXIF IFD0 ASCII tags carry ``description author
  software date`` (merged into any EXISTING EXIF so orientation and
  other unmanaged tags survive — ``sources/exif.py`` does the IFD
  work) and ``comment`` rides a ``COM`` (0xFFFE) marker.  ``title``
  has no public JPEG home and is refused.
- **TIFF**: first-IFD ASCII tags — DocumentName (0x010D, title),
  ImageDescription (0x010E), Artist (0x013B), Software (0x0131),
  DateTime (0x0132).  The embed REWRITES ONLY THE IFD: the original
  byte stream (strips, tiles, every other IFD entry's out-of-line
  value) stays in place untouched, a new first IFD is appended at
  EOF and the header's IFD pointer is repointed — so embedding is
  byte-preserving for the image data and works for any compression
  the codec itself can't even decode.
- **GIF**: the Comment Extension (0x21 0xFE) — ``comment`` only.
- **PNM**: ``#`` comment lines in the header (rebuilt after the
  magic; the sample body is copied verbatim) — ``comment`` only.

``extract_image_tags`` / ``embed_image_tags`` dispatch on the
container signature; unsupported keys for a narrower container are
refused loudly rather than dropped silently.
"""

from __future__ import annotations

import struct
import zlib

_PNG_KEYWORDS = {
    "title": b"Title",
    "author": b"Author",
    "description": b"Description",
    "software": b"Software",
    "date": b"Creation Time",
    "comment": b"Comment",
}
_PNG_REV = {v: k for k, v in _PNG_KEYWORDS.items()}

# normalized name -> EXIF name (sources/exif.py) for the JPEG family
_JPEG_EXIF = {
    "description": "description",
    "author": "artist",
    "software": "software",
    "date": "datetime",
}
_JPEG_EXIF_REV = {v: k for k, v in _JPEG_EXIF.items()}

_TIFF_TAGS = {
    "title": 0x010D,
    "description": 0x010E,
    "author": 0x013B,
    "software": 0x0131,
    "date": 0x0132,
}
_TIFF_REV = {v: k for k, v in _TIFF_TAGS.items()}


# ---------------------------------------------------------------------------
# PNG (tEXt / iTXt chunks)


def _extract_png(data: bytes) -> dict:
    from . import png as _png

    out: dict = {}
    for ctype, payload in _png._chunks(data):
        if ctype == b"tEXt":
            kw, _, text = payload.partition(b"\x00")
            name = _PNG_REV.get(kw)
            if name:
                out[name] = text.decode("latin-1")
        elif ctype == b"iTXt":
            kw, _, rest = payload.partition(b"\x00")
            name = _PNG_REV.get(kw)
            if name is None or len(rest) < 2:
                continue
            comp_flag, comp_method = rest[0], rest[1]
            body = rest[2:]
            # language tag and translated keyword, both NUL-terminated
            _lang, _, body = body.partition(b"\x00")
            _tkw, _, body = body.partition(b"\x00")
            if comp_flag:
                body = zlib.decompress(body) if comp_method == 0 else b""
            out[name] = body.decode("utf-8", "replace")
    return out


def _embed_png(data: bytes, tags: dict) -> bytes:
    from . import png as _png

    text_chunks = bytearray()
    for name in sorted(tags):
        kw = _PNG_KEYWORDS.get(name)
        if kw is None:
            raise ValueError(f"PNG text chunks cannot carry tag {name!r}")
        value = str(tags[name])
        try:
            text_chunks += _png._chunk(
                b"tEXt", kw + b"\x00" + value.encode("latin-1")
            )
        except UnicodeEncodeError:
            text_chunks += _png._chunk(
                b"iTXt",
                kw + b"\x00\x00\x00" + b"\x00" + b"\x00"
                + value.encode("utf-8"),
            )
    out = bytearray(data[:8])
    for ctype, payload in _png._chunks(data):
        if ctype in (b"tEXt", b"iTXt") and _PNG_REV.get(
            payload.partition(b"\x00")[0]
        ):
            continue  # replace managed keywords, keep foreign ones
        out += _png._chunk(ctype, payload)
        if ctype == b"IHDR":
            out += text_chunks
    return bytes(out)


# ---------------------------------------------------------------------------
# JPEG (EXIF ASCII tags + COM marker)


def _extract_jpeg(data: bytes) -> dict:
    from . import exif as _exif

    out: dict = {}
    for exif_name, value in _exif.extract_exif(data).items():
        name = _JPEG_EXIF_REV.get(exif_name)
        if name:
            out[name] = str(value)
    for marker, start, end in _exif.iter_jpeg_segments(data):
        if marker == 0xFE:
            out["comment"] = data[start + 4 : end].decode("utf-8", "replace")
            break
    return out


def _embed_jpeg(data: bytes, tags: dict) -> bytes:
    from . import exif as _exif

    exif_part = {}
    comment = None
    for name in tags:
        if name in _JPEG_EXIF:
            exif_part[_JPEG_EXIF[name]] = str(tags[name])
        elif name == "comment":
            comment = str(tags[name])
        else:
            raise ValueError(f"JPEG metadata cannot carry tag {name!r}")
    if exif_part:
        # replace the managed EXIF names but keep unmanaged tags
        # (orientation, make/model, sub-IFD timestamps) alive
        merged = {
            k: v
            for k, v in _exif.extract_exif(data).items()
            if k not in _JPEG_EXIF_REV
        }
        merged.update(exif_part)
        data = _exif.embed_exif(data, merged)
    # strip existing COM markers, then splice the new one after the
    # last pre-scan segment (or right after SOI when there are none)
    out = bytearray(data[:2])
    tail_at = 2
    for marker, start, end in _exif.iter_jpeg_segments(data):
        if marker != 0xFE:
            out += data[start:end]
        tail_at = end
    if comment is not None:
        payload = comment.encode("utf-8")
        out += b"\xff\xfe" + struct.pack(">H", len(payload) + 2) + payload
    return bytes(out) + data[tail_at:]


# ---------------------------------------------------------------------------
# TIFF (first-IFD ASCII tags, append-only IFD rewrite)


def _extract_tiff(data: bytes) -> dict:
    from . import tiff as _tiff

    e, big, first = _tiff.tiff_layout(data)
    ifd_tags, _next = _tiff.read_ifd(data, e, first, big)
    out: dict = {}
    for tag, name in _TIFF_REV.items():
        if tag in ifd_tags:
            raw = ifd_tags[tag][0]
            if isinstance(raw, bytes):
                out[name] = raw.split(b"\x00")[0].decode("utf-8", "replace")
            elif isinstance(raw, int):
                # BYTE-typed fallback: _read_ifd returns per-byte ints
                out[name] = bytes(ifd_tags[tag]).split(b"\x00")[0].decode(
                    "utf-8", "replace"
                )
    return out


def _embed_tiff(data: bytes, tags: dict) -> bytes:
    """Append-only first-IFD rewrite: keep every original byte in
    place (absolute offsets in retained entries stay valid), write a
    new IFD + string values at EOF, repoint the header.  Handles the
    classic 12-byte and BigTIFF 20-byte entry layouts."""
    from . import tiff as _tiff

    for name in tags:
        if name not in _TIFF_TAGS:
            raise ValueError(f"TIFF ASCII tags cannot carry tag {name!r}")
    e, big, first = _tiff.tiff_layout(data)
    # layout widths: (count fmt/size, entry size, ptr fmt/size,
    # inline value capacity, header IFD-pointer offset)
    if big:
        cfmt, csz, esz, pfmt, inline, hdr_at = "Q", 8, 20, "Q", 8, 8
    else:
        cfmt, csz, esz, pfmt, inline, hdr_at = "H", 2, 12, "I", 4, 4
    (count,) = struct.unpack_from(e + cfmt, data, first)
    kept: list[tuple[int, bytes]] = []
    for k in range(count):
        at = first + csz + esz * k
        (tag,) = struct.unpack_from(e + "H", data, at)
        if tag not in _TIFF_REV:  # managed family is fully replaced
            kept.append((tag, data[at : at + esz]))
    (next_ifd,) = struct.unpack_from(
        e + pfmt, data, first + csz + esz * count
    )

    out = bytearray(data)
    if len(out) % 2:
        out += b"\x00"
    new_entries: list[tuple[int, bytes]] = list(kept)
    n_total = len(kept) + len(tags)
    ifd_at = len(out)
    extra_at = ifd_at + csz + esz * n_total + struct.calcsize(pfmt)
    extra = bytearray()
    cnt_fmt = "Q" if big else "I"
    for name in tags:
        payload = str(tags[name]).encode("utf-8") + b"\x00"
        if len(payload) <= inline:
            val = payload + b"\x00" * (inline - len(payload))
        else:
            val = struct.pack(e + pfmt, extra_at + len(extra))
            extra += payload
        new_entries.append(
            (
                _TIFF_TAGS[name],
                struct.pack(
                    e + "HH" + cnt_fmt, _TIFF_TAGS[name], 2, len(payload)
                )
                + val,
            )
        )
    new_entries.sort(key=lambda kv: kv[0])
    out += struct.pack(e + cfmt, n_total)
    for _tag, entry in new_entries:
        out += entry
    out += struct.pack(e + pfmt, next_ifd)
    out += extra
    struct.pack_into(e + pfmt, out, hdr_at, ifd_at)
    return bytes(out)


# ---------------------------------------------------------------------------
# PNM (header comment lines)


def _extract_pnm(data: bytes) -> dict:
    from . import pnm as _pnm

    kind = int(data[1:2])
    fields, comments, _at = _pnm._read_header(
        data, 2 if kind in (1, 4) else 3
    )
    return {"comment": "\n".join(comments)} if comments else {}


def _embed_pnm(data: bytes, tags: dict) -> bytes:
    """Rebuild the header with the comment lines after the magic;
    the sample body is copied verbatim."""
    from . import pnm as _pnm

    for name in tags:
        if name != "comment":
            raise ValueError(
                f"PNM header comments cannot carry tag {name!r}"
            )
    kind = int(data[1:2])
    bitmap = kind in (1, 4)
    fields, _old, body_at = _pnm._read_header(data, 2 if bitmap else 3)
    lines = str(tags["comment"]).split("\n")
    chead = "".join(f"#{line}\n" for line in lines)
    head = f"P{kind}\n{chead}{fields[0]} {fields[1]}\n"
    if not bitmap:
        head += f"{fields[2]}\n"
    return head.encode() + data[body_at:]


# ---------------------------------------------------------------------------
# GIF (Comment Extension)


def _gif_data_start(data: bytes) -> int:
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    return pos


def _gif_spans(data: bytes):
    """Yield ``(kind, start, end)`` block spans after the global
    color table: ``("ext", label)`` extensions, ``("img", None)``
    image blocks, up to (not including) the trailer."""
    from . import gif as _gif

    pos = _gif_data_start(data)
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            return
        start = pos
        if b == 0x21:
            label = data[pos + 1]
            _blk, pos = _gif._read_sub_blocks(data, pos + 2)
            yield ("ext", label), start, pos
        elif b == 0x2C:
            fpacked = data[pos + 9]
            pos += 10
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 7))
            pos += 1  # LZW minimum code size
            _blk, pos = _gif._read_sub_blocks(data, pos)
            yield ("img", None), start, pos
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def _extract_gif(data: bytes) -> dict:
    from . import gif as _gif

    for (kind, label), start, end in _gif_spans(data):
        if kind == "ext" and label == 0xFE:
            blk, _pos = _gif._read_sub_blocks(data, start + 2)
            return {"comment": blk.decode("utf-8", "replace")}
    return {}


def _embed_gif(data: bytes, tags: dict) -> bytes:
    from . import gif as _gif

    for name in tags:
        if name != "comment":
            raise ValueError(
                f"GIF comment extension cannot carry tag {name!r}"
            )
    head = _gif_data_start(data)
    out = bytearray(data[:head])
    out += b"\x21\xfe" + _gif._sub_blocks(
        str(tags["comment"]).encode("utf-8")
    )
    for (kind, label), start, end in _gif_spans(data):
        if kind == "ext" and label == 0xFE:
            continue
        out += data[start:end]
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch


def extract_image_tags(raw: bytes) -> dict:
    """Normalized tag dict from any supported image container; empty
    when none are present, ``ValueError`` for non-image payloads."""
    from . import gif as _gif
    from . import png as _png
    from . import pnm as _pnm
    from . import tiff as _tiff

    raw = bytes(raw)
    if _png.is_png(raw):
        return _extract_png(raw)
    if raw[:2] == b"\xff\xd8":
        return _extract_jpeg(raw)
    if _tiff.is_tiff(raw):
        return _extract_tiff(raw)
    if _gif.is_gif(raw):
        return _extract_gif(raw)
    if _pnm.is_pnm(raw):
        return _extract_pnm(raw)
    raise ValueError("not a supported image container")


def embed_image_tags(raw: bytes, tags: dict) -> bytes:
    """Embed (replacing any existing managed metadata of the same
    family); decoded pixels are byte-identical to the input's."""
    from . import gif as _gif
    from . import png as _png
    from . import pnm as _pnm
    from . import tiff as _tiff

    raw = bytes(raw)
    if _png.is_png(raw):
        return _embed_png(raw, tags)
    if raw[:2] == b"\xff\xd8":
        return _embed_jpeg(raw, tags)
    if _tiff.is_tiff(raw):
        return _embed_tiff(raw, tags)
    if _gif.is_gif(raw):
        return _embed_gif(raw, tags)
    if _pnm.is_pnm(raw):
        return _embed_pnm(raw, tags)
    raise ValueError("not a supported image container")


def supported_keys(raw: bytes) -> set[str]:
    """The normalized key subset this payload's container can carry
    (empty set for recognized-but-untaggable formats is not a case
    here — unsupported containers raise ``ValueError``)."""
    from . import gif as _gif
    from . import png as _png
    from . import pnm as _pnm
    from . import tiff as _tiff

    raw = bytes(raw)
    if _png.is_png(raw):
        return set(_PNG_KEYWORDS)
    if raw[:2] == b"\xff\xd8":
        return set(_JPEG_EXIF) | {"comment"}
    if _tiff.is_tiff(raw):
        return set(_TIFF_TAGS)
    if _gif.is_gif(raw):
        return {"comment"}
    if _pnm.is_pnm(raw):
        return {"comment"}
    raise ValueError("not a supported image container")
