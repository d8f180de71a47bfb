"""Audio metadata tags: embed into and extract from WAV / FLAC /
AIFF containers — the audio analog of ``sources/exif.py``.

Each container family stores free-text metadata in its own public
structure; this module normalizes all of them onto one key set
(``title artist album date comment genre software``):

- **WAV**: a RIFF ``LIST``/``INFO`` chunk with ``INAM IART IPRD
  ICRD ICMT IGNR ISFT`` sub-chunks (NUL-terminated, word-aligned).
- **FLAC**: the ``VORBIS_COMMENT`` metadata block (type 4) —
  little-endian vendor string + ``KEY=value`` UTF-8 comments,
  spliced into the metadata chain with correct last-block flags.
  Ogg-FLAC extracts through the page/packet walk (embed on the Ogg
  framing is out of the honest subset and raises).
- **AIFF**: the ``NAME`` (title), ``AUTH`` (artist) and ``ANNO``
  (comment) text chunks.

``extract_audio_tags`` / ``embed_audio_tags`` dispatch on the
container signature; unsupported keys for a narrower container are
refused loudly rather than dropped silently.
"""

from __future__ import annotations

import struct

_WAV_INFO = {
    "title": b"INAM",
    "artist": b"IART",
    "album": b"IPRD",
    "date": b"ICRD",
    "comment": b"ICMT",
    "genre": b"IGNR",
    "software": b"ISFT",
}
_WAV_INFO_REV = {v: k for k, v in _WAV_INFO.items()}

_VORBIS_KEYS = {
    "title": "TITLE",
    "artist": "ARTIST",
    "album": "ALBUM",
    "date": "DATE",
    "comment": "COMMENT",
    "genre": "GENRE",
    "software": "ENCODER",
}
_VORBIS_REV = {v: k for k, v in _VORBIS_KEYS.items()}

_AIFF_CHUNKS = {"title": b"NAME", "artist": b"AUTH", "comment": b"ANNO"}
_AIFF_REV = {v: k for k, v in _AIFF_CHUNKS.items()}


# ---------------------------------------------------------------------------
# WAV (RIFF LIST/INFO)


def _wav_chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos, size
        pos += 8 + size + (size % 2)


def _extract_wav(data: bytes) -> dict:
    out: dict = {}
    for cid, pos, size in _wav_chunks(data):
        if cid != b"LIST" or data[pos + 8 : pos + 12] != b"INFO":
            continue
        sub = pos + 12
        end = pos + 8 + size
        while sub + 8 <= end:
            sid = data[sub : sub + 4]
            (ssize,) = struct.unpack_from("<I", data, sub + 4)
            body = data[sub + 8 : sub + 8 + ssize]
            name = _WAV_INFO_REV.get(sid)
            if name:
                out[name] = body.split(b"\x00")[0].decode("utf-8", "replace")
            sub += 8 + ssize + (ssize % 2)
    return out


def _embed_wav(data: bytes, tags: dict) -> bytes:
    body = bytearray(b"INFO")
    for name in sorted(tags):
        cid = _WAV_INFO.get(name)
        if cid is None:
            raise ValueError(f"WAV INFO cannot carry tag {name!r}")
        payload = str(tags[name]).encode("utf-8") + b"\x00"
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    chunk = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    # rebuild without any existing INFO list, then append the new one
    out = bytearray(data[:12])
    for cid, pos, size in _wav_chunks(data):
        if cid == b"LIST" and data[pos + 8 : pos + 12] == b"INFO":
            continue
        out += data[pos : pos + 8 + size + (size % 2)]
    out += chunk
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC (VORBIS_COMMENT, block type 4)


def _vorbis_block(tags: dict) -> bytes:
    vendor = b"physicsnemo-curator-spark"
    comments = []
    for name in sorted(tags):
        key = _VORBIS_KEYS.get(name)
        if key is None:
            raise ValueError(f"VORBIS_COMMENT cannot carry tag {name!r}")
        comments.append(f"{key}={tags[name]}".encode())
    body = struct.pack("<I", len(vendor)) + vendor
    body += struct.pack("<I", len(comments))
    for c in comments:
        body += struct.pack("<I", len(c)) + c
    return body


def _parse_vorbis(body: bytes) -> dict:
    (vlen,) = struct.unpack_from("<I", body, 0)
    pos = 4 + vlen
    (count,) = struct.unpack_from("<I", body, pos)
    pos += 4
    out: dict = {}
    for _ in range(count):
        (clen,) = struct.unpack_from("<I", body, pos)
        pos += 4
        entry = body[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        key, _, value = entry.partition("=")
        name = _VORBIS_REV.get(key.upper())
        if name:
            out[name] = value
    return out


def _flac_blocks(data: bytes):
    pos = 4
    while pos + 4 <= len(data):
        btype = data[pos] & 0x7F
        last = bool(data[pos] & 0x80)
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        yield btype, last, pos, size
        pos += 4 + size
        if last:
            return


def _extract_flac(data: bytes) -> dict:
    for btype, _last, pos, size in _flac_blocks(data):
        if btype == 4:
            return _parse_vorbis(data[pos + 4 : pos + 4 + size])
    return {}


def _embed_flac(data: bytes, tags: dict) -> bytes:
    body = _vorbis_block(tags)
    blocks = list(_flac_blocks(data))
    audio_at = blocks[-1][2] + 4 + blocks[-1][3]
    out = bytearray(b"fLaC")
    kept = [b for b in blocks if b[0] != 4]
    for i, (btype, _last, pos, size) in enumerate(kept):
        header = bytes([btype]) + data[pos + 1 : pos + 4]
        out += header + data[pos + 4 : pos + 4 + size]
    # the new comment block goes last in the chain
    out += bytes([0x80 | 4]) + struct.pack(">I", len(body))[1:] + body
    # clear the last-block flag on every earlier block
    at = 4
    for i in range(len(kept)):
        out[at] = out[at] & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + bytes(out[at + 1 : at + 4]))
        at += 4 + size
    return bytes(out) + data[audio_at:]


def _extract_ogg_flac(data: bytes) -> dict:
    from . import flac as _flac

    # reassemble the header packets from the Ogg pages and look for a
    # VORBIS_COMMENT metadata block
    packets = _flac._ogg_packets(data)
    for pkt in packets:
        if pkt[:1] == b"\xff":
            break  # frame packets follow the headers
        at = pkt.find(b"fLaC")
        if at >= 0:
            # the mapping packet's inline chain rarely carries the
            # comment block, but check it before the later headers
            try:
                found = _extract_flac(pkt[at:])
            except Exception:
                found = {}
            if found:
                return found
            continue
        # later header packets carry bare metadata blocks
        if len(pkt) >= 4 and (pkt[0] & 0x7F) == 4:
            (size,) = struct.unpack(">I", b"\x00" + pkt[1:4])
            return _parse_vorbis(pkt[4 : 4 + size])
    return {}


# ---------------------------------------------------------------------------
# AIFF (NAME / AUTH / ANNO text chunks)


def _aiff_chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        yield cid, pos, size
        pos += 8 + size + (size % 2)


def _extract_aiff(data: bytes) -> dict:
    out: dict = {}
    for cid, pos, size in _aiff_chunks(data):
        name = _AIFF_REV.get(cid)
        if name:
            out[name] = data[pos + 8 : pos + 8 + size].decode(
                "utf-8", "replace"
            )
    return out


def _embed_aiff(data: bytes, tags: dict) -> bytes:
    extra = bytearray()
    for name in sorted(tags):
        cid = _AIFF_CHUNKS.get(name)
        if cid is None:
            raise ValueError(f"AIFF text chunks cannot carry tag {name!r}")
        payload = str(tags[name]).encode("utf-8")
        extra += cid + struct.pack(">I", len(payload)) + payload
        if len(payload) % 2:
            extra += b"\x00"
    out = bytearray(data[:12])
    for cid, pos, size in _aiff_chunks(data):
        if cid in _AIFF_REV:
            continue
        out += data[pos : pos + 8 + size + (size % 2)]
    out += extra
    struct.pack_into(">I", out, 4, len(out) - 8)
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch


def extract_audio_tags(raw: bytes) -> dict:
    """Normalized tag dict from any supported audio container; empty
    when none are present, ``ValueError`` for non-audio payloads."""
    from . import aiff as _aiff
    from . import flac as _flac
    from . import mpegaudio as _mpeg
    from . import wav as _wav

    raw = bytes(raw)
    if _wav.is_wav(raw):
        return _extract_wav(raw)
    if _flac.is_flac(raw):
        return _extract_flac(raw)
    if _flac.is_ogg_flac(raw):
        return _extract_ogg_flac(raw)
    if _aiff.is_aiff(raw):
        return _extract_aiff(raw)
    if _mpeg.is_adts(raw) or _mpeg.is_mp3(raw):
        return _mpeg.extract_id3(raw)
    raise ValueError("not a supported audio container")


def embed_audio_tags(raw: bytes, tags: dict) -> bytes:
    """Embed (replacing any existing metadata of the same family);
    decode output is byte-identical to the input's samples."""
    from . import aiff as _aiff
    from . import flac as _flac
    from . import mpegaudio as _mpeg
    from . import wav as _wav

    raw = bytes(raw)
    if _wav.is_wav(raw):
        return _embed_wav(raw, tags)
    if _flac.is_flac(raw):
        return _embed_flac(raw, tags)
    if _flac.is_ogg_flac(raw):
        raise NotImplementedError(
            "embedding tags through Ogg framing (extract works; "
            "re-encapsulate via encode_ogg_flac for writes)"
        )
    if _aiff.is_aiff(raw):
        return _embed_aiff(raw, tags)
    if _mpeg.is_adts(raw) or _mpeg.is_mp3(raw):
        return _mpeg.embed_id3v2(raw, tags)
    raise ValueError("not a supported audio container")


def supported_keys(raw: bytes) -> set[str]:
    """The normalized key subset this payload's container can carry
    through ``embed_audio_tags`` (empty for Ogg-FLAC, whose tags ride
    the encode path only)."""
    from . import aiff as _aiff
    from . import flac as _flac
    from . import mpegaudio as _mpeg
    from . import wav as _wav

    raw = bytes(raw)
    if _wav.is_wav(raw):
        return set(_WAV_INFO)
    if _flac.is_flac(raw):
        return set(_VORBIS_KEYS)
    if _flac.is_ogg_flac(raw):
        return set()
    if _aiff.is_aiff(raw):
        return set(_AIFF_CHUNKS)
    if _mpeg.is_adts(raw) or _mpeg.is_mp3(raw):
        return set(_WAV_INFO)  # ID3v2 carries the full key set
    raise ValueError("not a supported audio container")
