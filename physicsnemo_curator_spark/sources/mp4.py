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
# decode


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for a box run; handles
    64-bit largesize and size-0 (extends to end) per 14496-12 §4.2."""
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
        yield fourcc, body, box_end
        pos = box_end


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
    for fourcc, b, e in _walk_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        ch = _children(data, b, e)
        if b"mdia" not in ch:
            continue
        mdia = _children(data, *ch[b"mdia"])
        if b"hdlr" not in mdia or b"minf" not in mdia or b"mdhd" not in mdia:
            continue
        _, hp, _he = _full_body(data, mdia[b"hdlr"])
        handler = data[hp + 4 : hp + 8]
        minf = _children(data, *mdia[b"minf"])
        if b"stbl" not in minf:
            continue
        yield handler, mdia[b"mdhd"], minf[b"stbl"]


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
    for handler, mdhd_span, stbl_span in _iter_traks(data, boxes[b"moov"]):
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
    for handler, mdhd_span, stbl_span in _iter_traks(data, boxes[b"moov"]):
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
        payload = b"".join(
            data[o : o + s] for o, s in _resolve_samples(st)
        )
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
