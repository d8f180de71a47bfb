"""Pure-Python ISO BMFF (MP4 / QuickTime MOV) container codec.

The multimodal frame sampler treats a video payload as an opaque
binary column; this module gives it the other mainstream container
family next to RIFF/AVI (``sources/avi.py``).  The implementation
follows the public ISO/IEC 14496-12 box grammar — ``ftyp`` /
``mdat`` / ``moov`` with the full sample-table machinery (``stsd``
``stts`` ``stsc`` ``stsz`` ``stco``/``co64``) — and the QuickTime
classic-codec sample entries that the repo's existing kernels can
open:

- **video**: sample entry ``'jpeg'`` (Motion-JPEG: every sample is
  one T.81 JPEG, decoded by ``sources/jpeg.py``) and ``'raw '``
  (uncompressed 24-bit RGB top-down rows).
- **audio**: ``'sowt'`` / ``'twos'`` (16-bit PCM little/big endian),
  ``'ulaw'`` / ``'alaw'`` (G.711, via the ``sources/wav.py``
  companders), ``'lpcm'``-free by design.

Anything outside that subset — ``avc1``/``hvc1`` H.26x video,
``mp4a`` AAC audio, edit lists that reorder samples — raises
``NotImplementedError`` loudly (the module's honest-subset contract,
same as the JPEG/PNG/FLAC codecs).

**Fragmented MP4 (fMP4 / CMAF)** is supported end to end per ISO/IEC
14496-12 §8.8: the decoder resolves ``mvex``/``trex`` track defaults
and per-fragment ``moof``/``mfhd``/``traf`` (``tfhd`` with all five
optional-field flags plus ``default-base-is-moof``, ``tfdt``, multiple
``trun`` runs per traf with per-sample or defaulted sizes), including
the legacy base-data-offset rule (first traf = moof start, later trafs
= end of the preceding traf's data).  Crawled web video is
predominantly DASH/HLS fMP4 segments, so a self-initializing segment
stream (``ftyp|moov(mvex)|`` then ``[styp]moof|mdat``…) yields exactly
the same frames/samples tables as a progressive file; a progressive
``moov`` sample table followed by fragments concatenates, matching the
spec's sample-numbering order.  ``mfhd`` sequence numbers must be
strictly increasing — a corrupt segment concatenation fails loudly.

Scale shape: containers are decoded task-side inside ``mapInPandas``
batches — one task per file/payload, exactly like the VTK/GRIB2
binary-scan family, so throughput scales with file count.
"""

from __future__ import annotations

import struct

import numpy as np

_MATRIX_IDENTITY = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)
_MOVIE_TIMESCALE = 1000


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# box writers


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def _stbl(
    entry: bytes,
    *,
    n_samples: int,
    delta: int,
    sizes: list[int] | int,
    chunk_offset: int,
) -> bytes:
    """One-chunk sample table: all samples consecutive at
    ``chunk_offset``; ``sizes`` is a per-sample list or a constant."""
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1))
    if isinstance(sizes, int):
        stsz_body = struct.pack(">II", sizes, n_samples)
    else:
        stsz_body = struct.pack(">II", 0, n_samples) + struct.pack(
            ">%dI" % n_samples, *sizes
        )
    stsz = _full(b"stsz", 0, 0, stsz_body)
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _dinf() -> bytes:
    url = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    return _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(
        b"hdlr",
        0,
        0,
        struct.pack(">I", 0) + handler + b"\x00" * 12 + name + b"\x00",
    )


def _tkhd(track_id: int, duration_mv: int, w: int, h: int) -> bytes:
    # flags 7: enabled | in movie | in preview
    return _full(
        b"tkhd",
        0,
        7,
        struct.pack(">III", 0, 0, track_id)
        + struct.pack(">II", 0, duration_mv)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt group, volume, rsvd
        + _MATRIX_IDENTITY
        + struct.pack(">II", w << 16, h << 16),
    )


def _mdhd(timescale: int, duration: int) -> bytes:
    # language 0x55C4 = 'und' packed 5-bit
    return _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )


def _video_entry(fourcc: bytes, w: int, h: int, depth: int = 24) -> bytes:
    name = b"\x04mjpg" + b"\x00" * 27  # 32-byte pascal compressorname
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HH", 0, 0)
        + b"\x00" * 12
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count per sample
        + name
        + struct.pack(">Hh", depth, -1)
    )
    return _box(fourcc, body)


def _audio_entry(
    fourcc: bytes, channels: int, bits: int, sample_rate: int
) -> bytes:
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HHI", 0, 0, 0)  # version, revision, vendor
        + struct.pack(">HHHH", channels, bits, 0, 0)
        + struct.pack(">I", sample_rate << 16)  # 16.16 fixed
    )
    return _box(fourcc, body)


def _trak(tkhd: bytes, mdhd: bytes, hdlr: bytes, mhd: bytes, stbl: bytes) -> bytes:
    minf = _box(b"minf", mhd + _dinf() + stbl)
    return _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))


def _raw_encode(frame: np.ndarray) -> bytes:
    """'raw ' sample: 24-bit RGB, top-down rows, no padding."""
    if frame.ndim == 2:
        frame = np.stack([frame] * 3, axis=2)
    return np.ascontiguousarray(frame[:, :, :3], dtype=np.uint8).tobytes()


def encode_mp4(
    frames: list[np.ndarray],
    *,
    fps: int = 30,
    codec: str = "mjpeg",
    quality: int = 90,
) -> bytes:
    """Encode uint8 frames (all ``(h, w)`` or all ``(h, w, 3)``) as an
    ISO BMFF file with a single video track.

    ``codec``: ``'mjpeg'`` (each sample an in-repo-encoded JPEG under
    a ``'jpeg'`` sample entry) or ``'raw'`` (top-down 24-bit RGB rows
    under ``'raw '``).  Layout is ``ftyp | mdat | moov`` so the chunk
    offsets are known before the movie box is built.
    """
    from . import jpeg as _jpeg

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with equal shape")
    if codec == "mjpeg":
        payloads = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
        entry = _video_entry(b"jpeg", w, h)
    elif codec == "raw":
        payloads = [_raw_encode(f) for f in frames]
        entry = _video_entry(b"raw ", w, h)
    else:
        raise ValueError(f"unknown codec {codec!r}")

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"qt  "
    )
    n = len(frames)
    chunk_offset = len(ftyp) + 8  # first byte of the mdat body
    stbl = _stbl(
        entry,
        n_samples=n,
        delta=1,
        sizes=[len(p) for p in payloads],
        chunk_offset=chunk_offset,
    )
    duration_mv = n * _MOVIE_TIMESCALE // fps
    trak = _trak(
        _tkhd(1, duration_mv, w, h),
        _mdhd(fps, n),
        _hdlr(b"vide", b"VideoHandler"),
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        stbl,
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, _MOVIE_TIMESCALE, duration_mv)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX_IDENTITY
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", b"".join(payloads)) + moov


_AUDIO_FOURCC = {"sowt": b"sowt", "twos": b"twos", "ulaw": b"ulaw", "alaw": b"alaw"}


def _audio_payload(
    audio: np.ndarray, audio_codec: str
) -> tuple[bytes, int, int, int]:
    """Returns (payload, channels, bits, bytes_per_frame)."""
    from . import wav as _wav

    arr = np.asarray(audio, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    pcm16 = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int64)
    if audio_codec == "sowt":
        return pcm16.astype("<i2").tobytes(), channels, 16, channels * 2
    if audio_codec == "twos":
        return pcm16.astype(">i2").tobytes(), channels, 16, channels * 2
    if audio_codec == "ulaw":
        enc = _wav._ulaw_encode(pcm16.reshape(-1))
        return enc.tobytes(), channels, 8, channels
    if audio_codec == "alaw":
        enc = _wav._alaw_encode(pcm16.reshape(-1))
        return enc.tobytes(), channels, 8, channels
    raise ValueError(f"unknown audio codec {audio_codec!r}")


def encode_mp4_with_audio(
    frames: list[np.ndarray],
    audio: np.ndarray,
    sample_rate: int,
    *,
    fps: int = 30,
    codec: str = "mjpeg",
    quality: int = 90,
    audio_codec: str = "sowt",
) -> bytes:
    """Two-track ISO BMFF: track 1 = video (as :func:`encode_mp4`),
    track 2 = audio (``sowt``/``twos`` PCM16 or G.711 ``ulaw``/
    ``alaw``).  The mdat carries the video samples first, then the
    audio frames as one contiguous chunk."""
    from . import jpeg as _jpeg

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    if codec == "mjpeg":
        payloads = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
        entry = _video_entry(b"jpeg", w, h)
    elif codec == "raw":
        payloads = [_raw_encode(f) for f in frames]
        entry = _video_entry(b"raw ", w, h)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    a_payload, channels, bits, bpf = _audio_payload(audio, audio_codec)
    n_aframes = len(a_payload) // bpf

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"qt  "
    )
    n = len(frames)
    v_off = len(ftyp) + 8
    a_off = v_off + sum(len(p) for p in payloads)
    v_dur_mv = n * _MOVIE_TIMESCALE // fps
    a_dur_mv = (
        n_aframes * _MOVIE_TIMESCALE // sample_rate if sample_rate else 0
    )
    v_trak = _trak(
        _tkhd(1, v_dur_mv, w, h),
        _mdhd(fps, n),
        _hdlr(b"vide", b"VideoHandler"),
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _stbl(
            entry,
            n_samples=n,
            delta=1,
            sizes=[len(p) for p in payloads],
            chunk_offset=v_off,
        ),
    )
    a_trak = _trak(
        _tkhd(2, a_dur_mv, 0, 0),
        _mdhd(sample_rate, n_aframes),
        _hdlr(b"soun", b"SoundHandler"),
        _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0)),
        _stbl(
            _audio_entry(_AUDIO_FOURCC[audio_codec], channels, bits, sample_rate),
            n_samples=n_aframes,
            delta=1,
            sizes=bpf,
            chunk_offset=a_off,
        ),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(
            ">IIII", 0, 0, _MOVIE_TIMESCALE, max(v_dur_mv, a_dur_mv)
        )
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX_IDENTITY
        + b"\x00" * 24
        + struct.pack(">I", 3),
    )
    moov = _box(b"moov", mvhd + v_trak + a_trak)
    return ftyp + _box(b"mdat", b"".join(payloads) + a_payload) + moov


# ---------------------------------------------------------------------------
# fragmented MP4 (ISO 14496-12 §8.8) — encode


def _stbl_empty(entry: bytes) -> bytes:
    """Zero-sample stbl for a fragmented track: the sample description
    stays in stsd, all sample tables are empty (samples live in moofs)."""
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trex(track_id: int, default_duration: int, default_size: int) -> bytes:
    return _full(
        b"trex",
        0,
        0,
        struct.pack(">IIIII", track_id, 1, default_duration, default_size, 0),
    )


def _tfhd(track_id: int) -> bytes:
    # 0x020000 = default-base-is-moof (offsets relative to moof start)
    return _full(b"tfhd", 0, 0x020000, struct.pack(">I", track_id))


def _tfdt(decode_time: int) -> bytes:
    return _full(b"tfdt", 1, 0, struct.pack(">Q", decode_time))


def _trun(sizes: list[int] | int, count: int, data_offset: int) -> bytes:
    """Track run: data-offset always present; per-sample sizes when a
    list is given, else sizes come from the trex default (int = count
    with defaulted size — exercises the default-size decode path)."""
    if isinstance(sizes, list):
        flags = 0x000001 | 0x000200
        body = struct.pack(">Ii", count, data_offset) + struct.pack(
            ">%dI" % count, *sizes
        )
    else:
        flags = 0x000001
        body = struct.pack(">Ii", count, data_offset)
    return _full(b"trun", 0, flags, body)


def encode_fmp4(
    frames: list[np.ndarray],
    *,
    fps: int = 30,
    codec: str = "mjpeg",
    quality: int = 90,
    samples_per_fragment: int = 2,
    audio: np.ndarray | None = None,
    sample_rate: int = 8000,
    audio_codec: str = "sowt",
) -> bytes:
    """Encode frames (and optionally audio) as a **fragmented** ISO
    BMFF stream: ``ftyp | moov(mvex/trex, zero-sample stbl) |
    (styp moof mdat)*`` — the self-initializing CMAF segment layout
    that DASH/HLS crawls produce.  Each moof carries one video traf
    (per-sample trun sizes) and, when ``audio`` is given, one audio
    traf whose trun omits sizes so decode must fall back to the trex
    default — both tfhd use default-base-is-moof.  ``mfhd`` sequence
    numbers start at 1 and increase by 1."""
    from . import jpeg as _jpeg

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    if samples_per_fragment < 1:
        raise ValueError("samples_per_fragment must be >= 1")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with equal shape")
    if codec == "mjpeg":
        payloads = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
        entry = _video_entry(b"jpeg", w, h)
    elif codec == "raw":
        payloads = [_raw_encode(f) for f in frames]
        entry = _video_entry(b"raw ", w, h)
    else:
        raise ValueError(f"unknown codec {codec!r}")

    have_audio = audio is not None
    if have_audio:
        a_payload, channels, bits, bpf = _audio_payload(audio, audio_codec)
        n_aframes = len(a_payload) // bpf
    ftyp = _box(
        b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5" + b"isom"
    )
    v_trak = _trak(
        _tkhd(1, 0, w, h),
        _mdhd(fps, 0),
        _hdlr(b"vide", b"VideoHandler"),
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _stbl_empty(entry),
    )
    traks = v_trak
    trexes = _trex(1, 1, 0)
    next_track = 2
    if have_audio:
        traks += _trak(
            _tkhd(2, 0, 0, 0),
            _mdhd(sample_rate, 0),
            _hdlr(b"soun", b"SoundHandler"),
            _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0)),
            _stbl_empty(
                _audio_entry(
                    _AUDIO_FOURCC[audio_codec], channels, bits, sample_rate
                )
            ),
        )
        trexes += _trex(2, 1, bpf)
        next_track = 3
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, _MOVIE_TIMESCALE, 0)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX_IDENTITY
        + b"\x00" * 24
        + struct.pack(">I", next_track),
    )
    out = [ftyp, _box(b"moov", mvhd + traks + _box(b"mvex", trexes))]

    n_frag = (len(payloads) + samples_per_fragment - 1) // samples_per_fragment
    styp = _box(
        b"styp", b"iso5" + struct.pack(">I", 0x200) + b"iso5" + b"isom"
    )
    a_done = 0
    for i in range(n_frag):
        chunk = payloads[
            i * samples_per_fragment : (i + 1) * samples_per_fragment
        ]
        sizes = [len(p) for p in chunk]
        a_chunk = b""
        a_count = 0
        if have_audio:
            a_count = (
                n_aframes - a_done
                if i == n_frag - 1
                else n_aframes // n_frag
            )
            a_chunk = a_payload[a_done * bpf : (a_done + a_count) * bpf]

        def build(moof_len: int) -> bytes:
            data_off_v = moof_len + 8
            traf_v = _box(
                b"traf",
                _tfhd(1)
                + _tfdt(i * samples_per_fragment)
                + _trun(sizes, len(chunk), data_off_v),
            )
            body = _full(b"mfhd", 0, 0, struct.pack(">I", i + 1)) + traf_v
            if have_audio:
                body += _box(
                    b"traf",
                    _tfhd(2)
                    + _tfdt(a_done)
                    + _trun(bpf, a_count, data_off_v + sum(sizes)),
                )
            return _box(b"moof", body)

        # two passes: trun data offsets depend on the (fixed-width)
        # moof size, so size converges after one rebuild
        moof = build(len(build(0)))
        out.append(styp + moof + _box(b"mdat", b"".join(chunk) + a_chunk))
        a_done += a_count
    return b"".join(out)


def assemble_fmp4_segments(init: bytes, segments: list[bytes]) -> bytes:
    """Reassemble a DASH/HLS fetch — one init segment plus N media
    segments downloaded as separate blobs — into a single parseable
    stream for :func:`parse_mp4` / :func:`decode_mp4`.

    The init segment must carry ``moov`` with ``mvex`` (track defaults);
    each media segment must carry at least one ``moof``.  ``mfhd``
    sequence numbers are REWRITTEN to a strictly increasing run in the
    given segment order: crawled segments routinely restart numbering
    per representation/period, which the parser's monotonic-sequence
    guard would (correctly) reject on naive concatenation.  A traf that
    uses an explicit ``base_data_offset`` (absolute file position)
    cannot survive reassembly and fails loudly — only moof-relative
    offsets (default-base-is-moof or the legacy first-traf rule) are
    concatenation-safe."""
    top = list(_walk_boxes(init, 0, len(init)))
    names = {f for f, _b, _e in top}
    if b"moov" not in names:
        raise ValueError("init segment missing moov")
    moov = next((b, e) for f, b, e in top if f == b"moov")
    if b"mvex" not in _children(init, *moov):
        raise ValueError("init segment moov missing mvex (not fragmented)")
    out = [init]
    seq = 0
    for si, seg in enumerate(segments):
        buf = bytearray(seg)
        n_moof = 0
        for fourcc, _start, body, end in _walk_boxes_spans(seg, 0, len(seg)):
            if fourcc != b"moof":
                continue
            n_moof += 1
            for f, b, e in _walk_boxes(seg, body, end):
                if f == b"mfhd":
                    seq += 1
                    _, p, _e = _full_body(seg, (b, e))
                    struct.pack_into(">I", buf, p, seq)
                elif f == b"traf":
                    for f2, b2, _e2 in _walk_boxes(seg, b, e):
                        if f2 != b"tfhd":
                            continue
                        (vf,) = struct.unpack_from(">I", seg, b2)
                        if vf & 0x000001:
                            raise ValueError(
                                f"segment {si} tfhd uses an absolute "
                                "base_data_offset; offsets cannot "
                                "survive reassembly — only "
                                "moof-relative segments are "
                                "concatenation-safe"
                            )
        if not n_moof:
            raise ValueError(f"segment {si} has no moof (not a media segment)")
        out.append(bytes(buf))
    return b"".join(out)


# ---------------------------------------------------------------------------
# decode


def _walk_boxes_spans(data: bytes, pos: int, end: int):
    """Yield (fourcc, box_start, body_start, body_end) for a box run;
    handles 64-bit largesize and size-0 (extends to end) per
    14496-12 §4.2.  box_start is needed by the fragment decoder: the
    default-base-is-moof rule anchors trun offsets at the moof's first
    byte."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError("truncated ISO BMFF box")
        yield fourcc, pos, body, box_end
        pos = box_end


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for a box run."""
    for fourcc, _start, body, box_end in _walk_boxes_spans(data, pos, end):
        yield fourcc, body, box_end


def _children(data: bytes, body: int, end: int) -> dict[bytes, tuple[int, int]]:
    """First child of each type (sufficient for the moov tree, where
    the repeated type — trak — is handled by the caller's walk)."""
    out: dict[bytes, tuple[int, int]] = {}
    for fourcc, b, e in _walk_boxes(data, body, end):
        out.setdefault(fourcc, (b, e))
    return out


def _full_body(data: bytes, span: tuple[int, int]) -> tuple[int, int, int]:
    """(version, payload_start, payload_end) of a full box."""
    b, e = span
    (vf,) = struct.unpack_from(">I", data, b)
    return vf >> 24, b + 4, e


def _parse_stbl(data: bytes, stbl: tuple[int, int]) -> dict:
    ch = _children(data, *stbl)
    out: dict = {}
    if b"stsd" not in ch or b"stsz" not in ch or b"stsc" not in ch:
        raise ValueError("stbl missing stsd/stsz/stsc")
    _, p, e = _full_body(data, ch[b"stsd"])
    (n_entries,) = struct.unpack_from(">I", data, p)
    if n_entries < 1:
        raise ValueError("empty stsd")
    entries = list(_walk_boxes(data, p + 4, e))
    fourcc, eb, ee = entries[0]
    out["entry_fourcc"] = fourcc
    out["entry_body"] = data[eb:ee]
    # stts: first delta (fps recovery); tolerate empty tables
    if b"stts" in ch:
        _, p, _e = _full_body(data, ch[b"stts"])
        (n,) = struct.unpack_from(">I", data, p)
        out["stts_delta"] = (
            struct.unpack_from(">I", data, p + 8)[0] if n else 0
        )
    # stsz
    _, p, _e = _full_body(data, ch[b"stsz"])
    sample_size, count = struct.unpack_from(">II", data, p)
    if sample_size:
        sizes = [sample_size] * count
    else:
        sizes = list(struct.unpack_from(">%dI" % count, data, p + 8))
    out["sizes"] = sizes
    # stsc
    _, p, _e = _full_body(data, ch[b"stsc"])
    (n,) = struct.unpack_from(">I", data, p)
    out["stsc"] = [
        struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(n)
    ]
    # stco / co64
    if b"stco" in ch:
        _, p, _e = _full_body(data, ch[b"stco"])
        (n,) = struct.unpack_from(">I", data, p)
        out["chunk_offsets"] = list(struct.unpack_from(">%dI" % n, data, p + 4))
    elif b"co64" in ch:
        _, p, _e = _full_body(data, ch[b"co64"])
        (n,) = struct.unpack_from(">I", data, p)
        out["chunk_offsets"] = list(struct.unpack_from(">%dQ" % n, data, p + 4))
    else:
        raise ValueError("stbl missing stco/co64")
    return out


def _resolve_samples(st: dict) -> list[tuple[int, int]]:
    """Flatten stsc×stco×stsz into absolute (offset, size) per sample
    — the general 14496-12 resolution, not the one-chunk shortcut."""
    sizes = st["sizes"]
    offsets = st["chunk_offsets"]
    stsc = st["stsc"]
    samples: list[tuple[int, int]] = []
    si = 0
    for i, (first, per_chunk, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
        for c in range(first, last + 1):
            if c - 1 >= len(offsets):
                break
            pos = offsets[c - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return samples
                samples.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
    return samples


def _parse_mdhd(data: bytes, span: tuple[int, int]) -> tuple[int, int]:
    version, p, _e = _full_body(data, span)
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)
    return timescale, duration


def _iter_traks(data: bytes, moov: tuple[int, int]):
    """Yield (track_id, handler, mdhd_span, stbl_span) per trak."""
    for fourcc, b, e in _walk_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        ch = _children(data, b, e)
        if b"mdia" not in ch:
            continue
        track_id = 0
        if b"tkhd" in ch:
            version, p, _e = _full_body(data, ch[b"tkhd"])
            (track_id,) = struct.unpack_from(
                ">I", data, p + (16 if version == 1 else 8)
            )
        mdia = _children(data, *ch[b"mdia"])
        if b"hdlr" not in mdia or b"minf" not in mdia or b"mdhd" not in mdia:
            continue
        _, hp, _he = _full_body(data, mdia[b"hdlr"])
        handler = data[hp + 4 : hp + 8]
        minf = _children(data, *mdia[b"minf"])
        if b"stbl" not in minf:
            continue
        yield track_id, handler, mdia[b"mdhd"], minf[b"stbl"]


def _parse_trex_defaults(
    data: bytes, moov: tuple[int, int]
) -> dict[int, tuple[int, int]]:
    """mvex/trex per-track (default_sample_duration, default_sample_size);
    empty when the file is not fragmented."""
    ch = _children(data, *moov)
    if b"mvex" not in ch:
        return {}
    out: dict[int, tuple[int, int]] = {}
    for fourcc, b, e in _walk_boxes(data, *ch[b"mvex"]):
        if fourcc != b"trex":
            continue
        _, p, _e = _full_body(data, (b, e))
        track_id, _sdi, d_dur, d_size, _flags = struct.unpack_from(
            ">IIIII", data, p
        )
        out[track_id] = (d_dur, d_size)
    return out


def _traf_samples(
    data: bytes,
    traf: tuple[int, int],
    moof_start: int,
    prev_traf_end: int | None,
    trex: dict[int, tuple[int, int]],
) -> tuple[int, int, list[tuple[int, int]], int | None]:
    """Resolve one traf (14496-12 §8.8.7/8.8.8) into absolute
    (offset, size) samples.  Returns (track_id, default_duration,
    samples, data_end) where data_end feeds the legacy base-offset rule
    of the NEXT traf."""
    tfhd = None
    truns: list[tuple[int, int]] = []
    for f, b, e in _walk_boxes(data, *traf):
        if f == b"tfhd":
            tfhd = (b, e)
        elif f == b"trun":
            truns.append((b, e))
    if tfhd is None:
        raise ValueError("traf missing tfhd")
    (vf,) = struct.unpack_from(">I", data, tfhd[0])
    flags = vf & 0xFFFFFF
    p = tfhd[0] + 4
    (track_id,) = struct.unpack_from(">I", data, p)
    p += 4
    base = None
    if flags & 0x000001:  # base-data-offset-present
        (base,) = struct.unpack_from(">Q", data, p)
        p += 8
    if flags & 0x000002:  # sample-description-index-present
        p += 4
    d_dur, d_size = trex.get(track_id, (0, 0))
    if flags & 0x000008:  # default-sample-duration-present
        (d_dur,) = struct.unpack_from(">I", data, p)
        p += 4
    if flags & 0x000010:  # default-sample-size-present
        (d_size,) = struct.unpack_from(">I", data, p)
        p += 4
    if base is None:
        if flags & 0x020000 or prev_traf_end is None:
            # default-base-is-moof, or first traf under the legacy rule
            base = moof_start
        else:
            # legacy: end of the preceding traf's data
            base = prev_traf_end
    pos: int | None = None
    samples: list[tuple[int, int]] = []
    for tb, _te in truns:
        (vf2,) = struct.unpack_from(">I", data, tb)
        tflags = vf2 & 0xFFFFFF
        q = tb + 4
        (count,) = struct.unpack_from(">I", data, q)
        q += 4
        if tflags & 0x000001:  # data-offset-present (signed)
            (doff,) = struct.unpack_from(">i", data, q)
            q += 4
            pos = base + doff
        elif pos is None:
            pos = base
        if tflags & 0x000004:  # first-sample-flags-present
            q += 4
        for _ in range(count):
            if tflags & 0x000100:  # sample-duration-present
                q += 4
            if tflags & 0x000200:  # sample-size-present
                (size,) = struct.unpack_from(">I", data, q)
                q += 4
            else:
                size = d_size
                if not size:
                    raise ValueError(
                        "trun sample without a size and no tfhd/trex default"
                    )
            if tflags & 0x000400:  # sample-flags-present
                q += 4
            if tflags & 0x000800:  # composition-time-offset-present
                q += 4
            if pos + size > len(data):
                raise ValueError("fragment sample beyond end of data")
            samples.append((pos, size))
            pos += size
    return track_id, d_dur, samples, pos if pos is not None else prev_traf_end


def _fragment_samples(
    data: bytes, want_track_id: int, trex: dict[int, tuple[int, int]]
) -> tuple[list[tuple[int, int]], int]:
    """All moof/traf samples for one track, in fragment order.
    Returns (samples, default_duration).  mfhd sequence numbers must be
    strictly increasing — a corrupt segment concatenation fails here
    rather than yielding silently reordered media."""
    samples: list[tuple[int, int]] = []
    duration = trex.get(want_track_id, (0, 0))[0]
    last_seq = 0
    for fourcc, start, body, end in _walk_boxes_spans(data, 0, len(data)):
        if fourcc != b"moof":
            continue
        prev_end: int | None = None
        for f, b, e in _walk_boxes(data, body, end):
            if f == b"mfhd":
                _, p, _e = _full_body(data, (b, e))
                (seq,) = struct.unpack_from(">I", data, p)
                if seq <= last_seq:
                    raise ValueError(
                        "moof sequence numbers not strictly increasing "
                        f"({seq} after {last_seq})"
                    )
                last_seq = seq
            elif f == b"traf":
                tid, d_dur, s, prev_end = _traf_samples(
                    data, (b, e), start, prev_end, trex
                )
                if tid == want_track_id:
                    samples.extend(s)
                    if d_dur:
                        duration = d_dur
    return samples, duration


def parse_mp4(data: bytes) -> dict:
    """Parse container structure without decoding sample payloads.

    Returns ``{"meta": {...}, "frames": [(start, size), ...]}`` for
    the FIRST video track; audio tracks are reached through
    :func:`extract_mp4_audio`.
    """
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF payload")
    boxes = _children(data, 0, len(data))
    if b"moov" not in boxes:
        raise ValueError("ISO BMFF missing moov")
    trex = _parse_trex_defaults(data, boxes[b"moov"])
    fragmented = bool(trex) or b"moof" in boxes
    for track_id, handler, mdhd_span, stbl_span in _iter_traks(
        data, boxes[b"moov"]
    ):
        if handler != b"vide":
            continue
        st = _parse_stbl(data, stbl_span)
        fourcc = st["entry_fourcc"]
        if fourcc == b"jpeg":
            codec = "mjpeg"
        elif fourcc == b"raw ":
            codec = "raw"
        else:
            raise NotImplementedError(
                f"MP4 video sample entry {fourcc!r} "
                "(only 'jpeg' Motion-JPEG and 'raw ' RGB)"
            )
        w, h = struct.unpack_from(">HH", st["entry_body"], 24)
        timescale, _duration = _parse_mdhd(data, mdhd_span)
        delta = st.get("stts_delta", 0)
        frames = _resolve_samples(st)
        if fragmented:
            # 14496-12 §8.8: fragment samples follow the moov samples
            frag, frag_delta = _fragment_samples(data, track_id, trex)
            frames += frag
            if not delta:
                delta = frag_delta
        meta = {
            "width": int(w),
            "height": int(h),
            "n_frames": len(frames),
            "fps": round(timescale / delta) if delta else 0,
            # exact pair for duration math (NTSC 30000/1001 material
            # must not round through an integer fps)
            "timescale": int(timescale),
            "frame_delta": int(delta),
            "codec": codec,
            "fragmented": fragmented,
        }
        return {"meta": meta, "frames": frames}
    raise ValueError("ISO BMFF has no video (vide) track")


def decode_mp4_frame(data: bytes, parsed: dict, index: int) -> np.ndarray:
    """Decode ONE sample of an already-parsed container."""
    from . import jpeg as _jpeg

    meta = parsed["meta"]
    start, size = parsed["frames"][index]
    body = data[start : start + size]
    if meta["codec"] == "mjpeg":
        px, _ = _jpeg.decode_jpeg(body)
        return px
    w, h = meta["width"], meta["height"]
    if len(body) < w * h * 3:
        raise ValueError("raw RGB sample shorter than its geometry")
    return (
        np.frombuffer(body[: w * h * 3], dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


def iter_mp4_frames(data: bytes, *, every_n: int = 1):
    """Yield ``(frame_index, np.ndarray)`` for every ``every_n``-th
    sample; skipped samples are never entropy-decoded."""
    parsed = parse_mp4(data)
    for i in range(0, len(parsed["frames"]), every_n):
        yield i, decode_mp4_frame(data, parsed, i)


def decode_mp4(data: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every video sample; returns ``(frames, meta)``."""
    parsed = parse_mp4(data)
    frames = [px for _, px in iter_mp4_frames(data)]
    meta = dict(parsed["meta"])
    meta["n_frames"] = len(frames)
    return frames, meta


def extract_mp4_audio(data: bytes) -> tuple[np.ndarray, dict]:
    """Extract the FIRST audio track: resolve its sample table, pull
    the sample bytes in order, and decode through the sample-entry
    codec (``sowt``/``twos`` PCM16, G.711 ``ulaw``/``alaw``).  Returns
    ``(samples, meta)`` with the same contract as
    ``wav.decode_wav``."""
    from . import wav as _wav

    if not is_mp4(data):
        raise ValueError("not an ISO BMFF payload")
    boxes = _children(data, 0, len(data))
    if b"moov" not in boxes:
        raise ValueError("ISO BMFF missing moov")
    trex = _parse_trex_defaults(data, boxes[b"moov"])
    fragmented = bool(trex) or b"moof" in boxes
    for track_id, handler, mdhd_span, stbl_span in _iter_traks(
        data, boxes[b"moov"]
    ):
        if handler != b"soun":
            continue
        st = _parse_stbl(data, stbl_span)
        fourcc = st["entry_fourcc"]
        entry = st["entry_body"]
        channels, bits = struct.unpack_from(">HH", entry, 16)
        (rate_fixed,) = struct.unpack_from(">I", entry, 24)
        sample_rate = rate_fixed >> 16
        if not sample_rate:
            timescale, _d = _parse_mdhd(data, mdhd_span)
            sample_rate = timescale
        spans = _resolve_samples(st)
        if fragmented:
            spans += _fragment_samples(data, track_id, trex)[0]
        payload = b"".join(data[o : o + s] for o, s in spans)
        if fourcc == b"sowt":
            arr = np.frombuffer(payload, "<i2").astype(np.float64) / 32768.0
        elif fourcc == b"twos":
            arr = np.frombuffer(payload, ">i2").astype(np.float64) / 32768.0
        elif fourcc == b"ulaw":
            u = np.frombuffer(payload, np.uint8)
            arr = _wav._ulaw_decode(u).astype(np.float64) / 32768.0
        elif fourcc == b"alaw":
            a = np.frombuffer(payload, np.uint8)
            arr = _wav._alaw_decode(a).astype(np.float64) / 32768.0
        else:
            raise NotImplementedError(
                f"MP4 audio sample entry {fourcc!r} "
                "(only sowt/twos PCM16 and G.711 ulaw/alaw; AAC is "
                "codec-gated)"
            )
        channels = max(int(channels), 1)
        n_frames = len(arr) // channels
        arr = arr[: n_frames * channels]
        if channels > 1:
            arr = arr.reshape(n_frames, channels)
        meta = {
            "sample_rate": int(sample_rate),
            "channels": channels,
            "bits": int(bits) if bits else (16 if fourcc in (b"sowt", b"twos") else 8),
            "n_frames": int(n_frames),
            "duration_s": n_frames / sample_rate if sample_rate else 0.0,
        }
        return arr, meta
    raise ValueError("ISO BMFF has no audio (soun) track")
