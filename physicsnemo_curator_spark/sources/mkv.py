"""Pure-Python Matroska (MKV) container codec.

Third container family next to RIFF/AVI (``sources/avi.py``) and ISO
BMFF (``sources/mp4.py``), following the public Matroska/EBML
specification (RFC 8794 EBML varints + the matroska.org element
registry): EBML header / Segment / Info / Tracks / Cluster with
SimpleBlock framing.  Supported codec ids map onto the repo's
existing kernels:

- **video**: ``V_MJPEG`` — every SimpleBlock is one T.81 JPEG,
  decoded by ``sources/jpeg.py``.
- **audio**: ``A_PCM/INT/LIT`` / ``A_PCM/INT/BIG`` (16-bit PCM),
  ``A_MULAW`` / ``A_ALAW`` (G.711 via the ``sources/wav.py``
  companders).

Block lacing — Xiph, fixed-size and EBML (RFC 8794 §11 varints +
matroska.org block structure) — is handled on both the encode and
decode paths; real-world Matroska audio tracks lace almost always.
Anything outside the subset — ``V_MPEG4/ISO/AVC`` video, ``A_AAC``
audio — raises ``NotImplementedError`` loudly (the module's
honest-subset contract, same as the JPEG/PNG/FLAC codecs).

Scale shape: containers are decoded task-side inside ``mapInPandas``
batches — one task per file/payload, like the VTK/GRIB2 binary-scan
family, so throughput scales with file count.
"""

from __future__ import annotations

import struct

import numpy as np

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_BIT_DEPTH = 0x6264

# master elements the parser recurses into
_MASTERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _CLUSTER,
            _BLOCK_GROUP, _VIDEO, _AUDIO}


def is_mkv(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == b"\x1a\x45\xdf\xa3"


# ---------------------------------------------------------------------------
# EBML primitives


def _id_bytes(eid: int) -> bytes:
    """Element IDs are stored verbatim (length marker included)."""
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint(value: int) -> bytes:
    """Encode a size as the shortest EBML varint (all-ones value is
    reserved for 'unknown', so bump the width at the boundary)."""
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _read_vint(data: bytes, pos: int, *, keep_marker: bool = False):
    """Returns (value, next_pos).  ``keep_marker`` reads an element ID
    (marker bit retained); otherwise a size (marker stripped, all-ones
    payload = unknown → None)."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint")
    n = 9 - first.bit_length()  # leading-zeros + 1
    if pos + n > len(data):
        raise ValueError("truncated EBML varint")
    raw = int.from_bytes(data[pos : pos + n], "big")
    if keep_marker:
        return raw, pos + n
    value = raw & ((1 << (7 * n)) - 1)
    if value == (1 << (7 * n)) - 1:
        return None, pos + n  # unknown size
    return value, pos + n


def _svint(delta: int) -> bytes:
    """Encode a SIGNED EBML varint (EBML-lacing size deltas): an
    n-byte signed vint stores ``delta + (2**(7n-1) - 1)`` in the
    unsigned layout, range ±(2**(7n-1)-1); the all-ones pattern can
    never occur (max stored value is 2**(7n)-2)."""
    for n in range(1, 9):
        off = (1 << (7 * n - 1)) - 1
        if -off <= delta <= off:
            return ((1 << (7 * n)) | (delta + off)).to_bytes(n, "big")
    raise ValueError("EBML signed varint out of range")


def _read_svint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode a SIGNED EBML varint; returns (delta, next_pos)."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint")
    n = 9 - first.bit_length()
    if pos + n > len(data):
        raise ValueError("truncated EBML varint")
    raw = int.from_bytes(data[pos : pos + n], "big")
    value = raw & ((1 << (7 * n)) - 1)
    return value - ((1 << (7 * n - 1)) - 1), pos + n


def _elem(eid: int, body: bytes) -> bytes:
    return _id_bytes(eid) + _vint(len(body)) + body


def _uint_elem(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def _float_elem(eid: int, value: float) -> bytes:
    return _elem(eid, struct.pack(">d", value))


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for a sibling run."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos)
        body_end = end if size is None else pos + size
        if body_end > end:
            raise ValueError("truncated EBML element")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _float(data: bytes, b: int, e: int) -> float:
    if e - b == 4:
        return struct.unpack(">f", data[b:e])[0]
    if e - b == 8:
        return struct.unpack(">d", data[b:e])[0]
    raise ValueError("EBML float must be 4 or 8 bytes")


# ---------------------------------------------------------------------------
# encode


def _ebml_header() -> bytes:
    return _elem(
        _EBML,
        _uint_elem(0x4286, 1)  # EBMLVersion
        + _uint_elem(0x42F7, 1)  # EBMLReadVersion
        + _uint_elem(0x42F2, 4)  # EBMLMaxIDLength
        + _uint_elem(0x42F3, 8)  # EBMLMaxSizeLength
        + _elem(0x4282, b"matroska")  # DocType
        + _uint_elem(0x4287, 4)  # DocTypeVersion
        + _uint_elem(0x4285, 2),  # DocTypeReadVersion
    )


def _simple_block(track: int, rel_ts: int, payload: bytes) -> bytes:
    if not 0 < track < 128:
        raise ValueError("track number out of 1-byte vint range")
    body = bytes([0x80 | track]) + struct.pack(">h", rel_ts) + b"\x80" + payload
    return _elem(_SIMPLE_BLOCK, body)


_LACE_FLAG = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}


def _laced_simple_block(
    track: int, rel_ts: int, payloads: list[bytes], lacing: str
) -> bytes:
    """One SimpleBlock carrying ``len(payloads)`` laced frames.

    Size coding per matroska.org block structure: Xiph = 255-run
    bytes per frame except the last; fixed = none (all frames equal);
    EBML = unsigned vint for the first size then signed-vint deltas.
    The LAST frame's size is always implied by the block end."""
    if len(payloads) == 1:
        return _simple_block(track, rel_ts, payloads[0])
    if not 2 <= len(payloads) <= 256:
        # single-payload lists take the unlaced early return above
        raise ValueError("lace frame count must be in 2..256")
    if not 0 < track < 128:
        raise ValueError("track number out of 1-byte vint range")
    flag = _LACE_FLAG[lacing]
    head = (
        bytes([0x80 | track])
        + struct.pack(">h", rel_ts)
        + bytes([0x80 | flag, len(payloads) - 1])
    )
    sizes = b""
    if lacing == "xiph":
        for p in payloads[:-1]:
            sizes += b"\xff" * (len(p) // 255) + bytes([len(p) % 255])
    elif lacing == "fixed":
        if len({len(p) for p in payloads}) != 1:
            raise ValueError("fixed lacing needs equal-size frames")
    else:  # ebml
        sizes = _vint(len(payloads[0]))
        prev = len(payloads[0])
        for p in payloads[1:-1]:
            sizes += _svint(len(p) - prev)
            prev = len(p)
    return _elem(_SIMPLE_BLOCK, head + sizes + b"".join(payloads))


def _video_track_entry(w: int, h: int, codec_id: bytes) -> bytes:
    return _elem(
        _TRACK_ENTRY,
        _uint_elem(_TRACK_NUMBER, 1)
        + _uint_elem(0x73C5, 1)  # TrackUID
        + _uint_elem(_TRACK_TYPE, 1)
        + _uint_elem(0x9C, 0)  # FlagLacing
        + _elem(_CODEC_ID, codec_id)
        + _elem(
            _VIDEO,
            _uint_elem(_PIXEL_WIDTH, w) + _uint_elem(_PIXEL_HEIGHT, h),
        ),
    )


def _audio_track_entry(
    rate: int, channels: int, bits: int, codec_id: bytes,
    *, laced: bool = False,
) -> bytes:
    # FlagLacing must declare what the blocks actually do — a strict
    # demuxer that trusts 0 would read lace headers as payload
    return _elem(
        _TRACK_ENTRY,
        _uint_elem(_TRACK_NUMBER, 2)
        + _uint_elem(0x73C5, 2)
        + _uint_elem(_TRACK_TYPE, 2)
        + _uint_elem(0x9C, 1 if laced else 0)
        + _elem(_CODEC_ID, codec_id)
        + _elem(
            _AUDIO,
            _float_elem(_SAMPLING_FREQ, float(rate))
            + _uint_elem(_CHANNELS, channels)
            + _uint_elem(_BIT_DEPTH, bits),
        ),
    )


_MKV_AUDIO_CODEC = {
    "pcm": b"A_PCM/INT/LIT",
    "pcm_be": b"A_PCM/INT/BIG",
    "ulaw": b"A_MULAW",
    "alaw": b"A_ALAW",
}


def encode_mkv(
    frames: list[np.ndarray],
    *,
    fps: int = 30,
    quality: int = 90,
    codec: str = "mjpeg",
    audio: np.ndarray | None = None,
    sample_rate: int = 0,
    audio_codec: str = "pcm",
    audio_lacing: str = "none",
    lace_frames: int = 8,
) -> bytes:
    """Encode uint8 frames as a Matroska file with one ``V_MJPEG``
    video track (each SimpleBlock one in-repo-encoded JPEG — lossy
    baseline, or T.81 Annex H lossless with ``codec='mjpeg_lossless'``
    for archival-exact frames), plus an optional audio track (16-bit
    PCM or G.711).  Millisecond timestamps (TimestampScale 1e6 ns),
    clusters split so block-relative timestamps stay inside int16.

    ``audio_lacing`` = ``'none' | 'xiph' | 'fixed' | 'ebml'`` writes
    the audio as ONE laced SimpleBlock of ``lace_frames`` frames
    split on sample-frame boundaries (the real-world Matroska audio
    shape; ``'fixed'`` requires the sample count to split evenly —
    equal-size frames are what the format mandates — and raises a
    ``ValueError`` otherwise)."""
    from . import jpeg as _jpeg
    from . import wav as _wav

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with equal shape")
    if codec == "mjpeg":
        payloads = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
    elif codec == "mjpeg_lossless":
        payloads = [_jpeg.encode_jpeg_lossless(f) for f in frames]
    else:
        raise ValueError(f"unknown codec {codec!r}")

    tracks_body = _video_track_entry(w, h, b"V_MJPEG")
    audio_payload = b""
    if audio is not None:
        arr = np.asarray(audio, dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[:, None]
        channels = arr.shape[1]
        pcm16 = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int64)
        if audio_codec == "pcm":
            audio_payload, bits = pcm16.astype("<i2").tobytes(), 16
        elif audio_codec == "pcm_be":
            audio_payload, bits = pcm16.astype(">i2").tobytes(), 16
        elif audio_codec == "ulaw":
            audio_payload, bits = (
                _wav._ulaw_encode(pcm16.reshape(-1)).tobytes(), 8
            )
        elif audio_codec == "alaw":
            audio_payload, bits = (
                _wav._alaw_encode(pcm16.reshape(-1)).tobytes(), 8
            )
        else:
            raise ValueError(f"unknown audio codec {audio_codec!r}")
        tracks_body += _audio_track_entry(
            sample_rate, channels, bits, _MKV_AUDIO_CODEC[audio_codec],
            laced=audio_lacing != "none",
        )
        # split the payload into lace frames on sample-frame
        # boundaries (never mid-sample)
        if audio_lacing == "none":
            audio_frames = [audio_payload]
        else:
            if audio_lacing not in _LACE_FLAG:
                raise ValueError(f"unknown audio lacing {audio_lacing!r}")
            frame_bytes = channels * (bits // 8)
            n_sf = len(audio_payload) // frame_bytes
            count = max(1, min(lace_frames, n_sf))
            if audio_lacing == "fixed":
                if n_sf % count:
                    raise ValueError(
                        "fixed lacing needs the sample count "
                        f"({n_sf}) divisible by lace_frames ({count})"
                    )
                per = n_sf // count
                cuts = [i * per for i in range(count + 1)]
            else:
                # uneven on purpose so Xiph/EBML size coding is
                # actually exercised (first frame one sample longer
                # when it doesn't divide evenly)
                base, extra = divmod(n_sf, count)
                cuts = [0]
                for i in range(count):
                    cuts.append(cuts[-1] + base + (1 if i < extra else 0))
            audio_frames = [
                audio_payload[cuts[i] * frame_bytes : cuts[i + 1] * frame_bytes]
                for i in range(count)
            ]

    duration_ms = len(frames) * 1000.0 / fps
    info = _elem(
        _INFO,
        _uint_elem(_TIMESTAMP_SCALE, 1_000_000)
        + _float_elem(_DURATION, duration_ms)
        + _elem(0x4D80, b"physicsnemo-curator-spark")  # MuxingApp
        + _elem(0x5741, b"physicsnemo-curator-spark"),  # WritingApp
    )

    clusters = b""
    cluster_body = b""
    cluster_t0 = 0
    for i, p in enumerate(payloads):
        t = i * 1000 // fps
        if cluster_body and t - cluster_t0 > 30_000:
            clusters += _elem(_CLUSTER, cluster_body)
            cluster_body = b""
        if not cluster_body:
            cluster_t0 = t
            cluster_body = _uint_elem(_TIMESTAMP, t)
            if i == 0 and audio_payload:
                # all audio in the first cluster as one block — PCM
                # needs no per-sample framing; laced when asked
                if len(audio_frames) > 1:
                    cluster_body += _laced_simple_block(
                        2, 0, audio_frames, audio_lacing
                    )
                else:
                    cluster_body += _simple_block(2, 0, audio_payload)
        cluster_body += _simple_block(1, t - cluster_t0, p)
    clusters += _elem(_CLUSTER, cluster_body)

    segment = _elem(_SEGMENT, info + _elem(_TRACKS, tracks_body) + clusters)
    return _ebml_header() + segment


# ---------------------------------------------------------------------------
# decode


def _parse_tracks(data: bytes, b: int, e: int) -> dict[int, dict]:
    tracks: dict[int, dict] = {}
    for eid, tb, te in _walk(data, b, e):
        if eid != _TRACK_ENTRY:
            continue
        t: dict = {}
        for fid, fb, fe in _walk(data, tb, te):
            if fid == _TRACK_NUMBER:
                t["number"] = _uint(data, fb, fe)
            elif fid == _TRACK_TYPE:
                t["type"] = _uint(data, fb, fe)
            elif fid == _CODEC_ID:
                t["codec_id"] = data[fb:fe].decode("ascii", "replace")
            elif fid == _VIDEO:
                for vid, vb, ve in _walk(data, fb, fe):
                    if vid == _PIXEL_WIDTH:
                        t["width"] = _uint(data, vb, ve)
                    elif vid == _PIXEL_HEIGHT:
                        t["height"] = _uint(data, vb, ve)
            elif fid == _AUDIO:
                for aid, ab, ae in _walk(data, fb, fe):
                    if aid == _SAMPLING_FREQ:
                        t["sample_rate"] = round(_float(data, ab, ae))
                    elif aid == _CHANNELS:
                        t["channels"] = _uint(data, ab, ae)
                    elif aid == _BIT_DEPTH:
                        t["bits"] = _uint(data, ab, ae)
        if "number" in t:
            tracks[t["number"]] = t
    return tracks


def _block_frames(
    data: bytes, b: int, e: int
) -> tuple[int, list[tuple[int, int]]]:
    """(track_number, [(payload_start, payload_end), ...]) of a
    (Simple)Block, resolving Xiph / fixed-size / EBML lacing
    (RFC 8794 varints + matroska.org block structure).  The last
    lace frame's size is always implied by the block end."""
    track, pos = _read_vint(data, b)
    if track is None:
        raise ValueError("block with unknown track number")
    pos += 2  # int16 relative timestamp
    if pos >= e:
        raise ValueError("truncated block header")
    flags = data[pos]
    pos += 1
    lacing = flags & 0x06
    if lacing == 0:
        return track, [(pos, e)]
    if pos >= e:
        raise ValueError("truncated laced block: missing frame count")
    count = data[pos] + 1
    pos += 1
    sizes: list[int] = []
    # every size-table read is bounded by the block end e: a truncated
    # or malformed lace table must fail with the codec's ValueError
    # contract, never an IndexError or a silent read into the next
    # element's bytes
    if lacing == 0x02:  # Xiph: 255-run coding per frame but the last
        for _ in range(count - 1):
            sz = 0
            while True:
                if pos >= e:
                    raise ValueError("truncated Xiph lace size table")
                v = data[pos]
                pos += 1
                sz += v
                if v < 255:
                    break
            sizes.append(sz)
    elif lacing == 0x06:  # EBML: unsigned first, signed deltas after
        # a 1-frame lace has ZERO size entries (the table codes all
        # frames but the last)
        if count >= 2:
            if pos >= e:
                raise ValueError("truncated EBML lace size table")
            first, pos = _read_vint(data, pos)
            if first is None or pos > e:
                raise ValueError("EBML lace size with reserved pattern")
            sizes.append(first)
            prev = first
            for _ in range(count - 2):
                if pos >= e:
                    raise ValueError("truncated EBML lace size table")
                delta, pos = _read_svint(data, pos)
                if pos > e:
                    raise ValueError("truncated EBML lace size table")
                prev += delta
                if prev < 0:
                    raise ValueError("negative EBML lace frame size")
                sizes.append(prev)
    else:  # 0x04 fixed: no size table, equal frames
        total = e - pos
        if total % count:
            raise ValueError(
                f"fixed-laced payload ({total} bytes) not divisible "
                f"by frame count ({count})"
            )
        sizes = [total // count] * (count - 1)
    spans: list[tuple[int, int]] = []
    p = pos
    for sz in sizes:
        spans.append((p, p + sz))
        p += sz
    if p > e:
        raise ValueError("laced frame sizes exceed block payload")
    spans.append((p, e))
    return track, spans


# segment-level element ids: an unknown-size Cluster (legal EBML,
# common in live-muxed streams) ends when any of these begins
_SEGMENT_LEVEL = {
    _INFO, _TRACKS, _CLUSTER,
    0x114D9B74,  # SeekHead
    0x1C53BB6B,  # Cues
    0x1043A770,  # Chapters
    0x1254C367,  # Tags
    0x1941A469,  # Attachments
}


def _segment_children(data: bytes, pos: int, end: int):
    """Like :func:`_walk` over a Segment body, but resolves
    unknown-size Clusters by scanning their children until the next
    segment-level element id."""
    while pos < end:
        eid, p2 = _read_vint(data, pos, keep_marker=True)
        size, p2 = _read_vint(data, p2)
        if size is not None:
            body_end = p2 + size
            if body_end > end:
                raise ValueError("truncated EBML element")
            yield eid, p2, body_end
            pos = body_end
            continue
        if eid != _CLUSTER:
            # unknown-size Segment children other than Cluster are
            # vanishingly rare; treating them as till-end would
            # swallow real data, so refuse loudly
            raise NotImplementedError(
                f"unknown-size Matroska element 0x{eid:08x}"
            )
        cpos = p2
        while cpos < end:
            cid, cp2 = _read_vint(data, cpos, keep_marker=True)
            if cid in _SEGMENT_LEVEL:
                break
            csize, cp2 = _read_vint(data, cp2)
            if csize is None:
                raise NotImplementedError(
                    "nested unknown-size Matroska element"
                )
            cpos = cp2 + csize
        yield eid, p2, cpos
        pos = cpos


def _segment_spans(data: bytes) -> tuple[dict[int, dict], list]:
    """Parse the full tree once: returns (tracks, blocks) where each
    block is (track_number, payload_start, payload_end) in stream
    order."""
    if not is_mkv(data):
        raise ValueError("not a Matroska payload")
    tracks: dict[int, dict] = {}
    blocks: list[tuple[int, int, int]] = []
    for eid, b, e in _walk(data, 0, len(data)):
        if eid != _SEGMENT:
            continue
        for sid, sb, se in _segment_children(data, b, e):
            if sid == _TRACKS:
                tracks = _parse_tracks(data, sb, se)
            elif sid == _CLUSTER:
                for cid, cb, ce in _walk(data, sb, se):
                    if cid == _SIMPLE_BLOCK:
                        tn, spans = _block_frames(data, cb, ce)
                        blocks.extend((tn, ps, pe) for ps, pe in spans)
                    elif cid == _BLOCK_GROUP:
                        for gid, gb, ge in _walk(data, cb, ce):
                            if gid == _BLOCK:
                                tn, spans = _block_frames(data, gb, ge)
                                blocks.extend(
                                    (tn, ps, pe) for ps, pe in spans
                                )
    if not tracks:
        raise ValueError("Matroska segment has no Tracks element")
    return tracks, blocks


def parse_mkv(data: bytes) -> dict:
    """Parse container structure without decoding frame payloads.

    Returns ``{"meta": {...}, "frames": [(start, size), ...]}`` for
    the FIRST video track (TrackType 1)."""
    tracks, blocks = _segment_spans(data)
    video = next(
        (t for t in tracks.values() if t.get("type") == 1), None
    )
    if video is None:
        raise ValueError("Matroska has no video track")
    codec_id = video.get("codec_id", "")
    if codec_id != "V_MJPEG":
        raise NotImplementedError(
            f"Matroska video codec {codec_id!r} (only V_MJPEG)"
        )
    frames = [
        (ps, pe - ps) for tn, ps, pe in blocks if tn == video["number"]
    ]
    meta = {
        "width": int(video.get("width", 0)),
        "height": int(video.get("height", 0)),
        "n_frames": len(frames),
        "fps": 0,
        "codec": "mjpeg",
    }
    return {"meta": meta, "frames": frames}


def decode_mkv_frame(data: bytes, parsed: dict, index: int) -> np.ndarray:
    """Decode ONE frame of an already-parsed container."""
    from . import jpeg as _jpeg

    start, size = parsed["frames"][index]
    px, _ = _jpeg.decode_jpeg(data[start : start + size])
    return px


def iter_mkv_frames(data: bytes, *, every_n: int = 1):
    parsed = parse_mkv(data)
    for i in range(0, len(parsed["frames"]), every_n):
        yield i, decode_mkv_frame(data, parsed, i)


def decode_mkv(data: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every video frame; returns ``(frames, meta)``."""
    parsed = parse_mkv(data)
    frames = [px for _, px in iter_mkv_frames(data)]
    meta = dict(parsed["meta"])
    meta["n_frames"] = len(frames)
    return frames, meta


def extract_mkv_audio(data: bytes) -> tuple[np.ndarray, dict]:
    """Extract the FIRST audio track (TrackType 2), decoding through
    the CodecID (PCM int LE/BE, G.711 u/a-law).  Same ``(samples,
    meta)`` contract as ``wav.decode_wav``."""
    from . import wav as _wav

    tracks, blocks = _segment_spans(data)
    track = next((t for t in tracks.values() if t.get("type") == 2), None)
    if track is None:
        raise ValueError("Matroska has no audio track")
    payload = b"".join(
        data[ps:pe] for tn, ps, pe in blocks if tn == track["number"]
    )
    codec_id = track.get("codec_id", "")
    bits = int(track.get("bits", 16))
    if codec_id == "A_PCM/INT/LIT":
        if bits != 16:
            raise NotImplementedError(f"{bits}-bit Matroska PCM")
        arr = np.frombuffer(payload, "<i2").astype(np.float64) / 32768.0
    elif codec_id == "A_PCM/INT/BIG":
        if bits != 16:
            raise NotImplementedError(f"{bits}-bit Matroska PCM")
        arr = np.frombuffer(payload, ">i2").astype(np.float64) / 32768.0
    elif codec_id == "A_MULAW":
        u = np.frombuffer(payload, np.uint8)
        arr = _wav._ulaw_decode(u).astype(np.float64) / 32768.0
    elif codec_id == "A_ALAW":
        a = np.frombuffer(payload, np.uint8)
        arr = _wav._alaw_decode(a).astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"Matroska audio codec {codec_id!r} "
            "(only PCM int and G.711; AAC/Vorbis are codec-gated)"
        )
    channels = max(int(track.get("channels", 1)), 1)
    rate = int(track.get("sample_rate", 0))
    n_frames = len(arr) // channels
    arr = arr[: n_frames * channels]
    if channels > 1:
        arr = arr.reshape(n_frames, channels)
    meta = {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": int(n_frames),
        "duration_s": n_frames / rate if rate else 0.0,
    }
    return arr, meta
