"""Pure-Python AVI (RIFF) video container codec.

The multimodal frame sampler treats a video payload as an opaque
binary column; this module gives the container half a real on-disk
format instead of the raw-plane-concatenation convention alone.  The
implementation follows the public Microsoft RIFF/AVI specification
(``AVIMAINHEADER`` / ``AVISTREAMHEADER`` / ``BITMAPINFOHEADER`` and
the ``movi`` chunk list with the optional ``idx1`` index):

- **MJPEG** streams (``biCompression == 'MJPG'``): every ``00dc``
  chunk is one baseline/progressive JPEG, decoded by the in-repo
  T.81 codec (``sources/jpeg.py``) — no ffmpeg, no PIL.
- **Uncompressed DIB** streams (``biCompression == BI_RGB``): 24-bit
  bottom-up BGR rows padded to 4-byte boundaries (``00db`` chunks),
  and 8-bit grayscale with an identity palette.

Anything outside that subset raises ``NotImplementedError`` loudly
(the module's honest-subset contract, same as the JPEG/PNG codecs).

Scale shape: containers are decoded task-side inside ``mapInPandas``
batches — one task per file/payload, exactly like the VTK/GRIB2
binary-scan family, so throughput scales with file count.
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB = 0

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


# ---------------------------------------------------------------------------
# encode


def _dib_encode(frame: np.ndarray) -> bytes:
    """24-bit BI_RGB DIB: bottom-up BGR rows, 4-byte row alignment."""
    h, w = frame.shape[:2]
    if frame.ndim == 2:
        frame = np.stack([frame] * 3, axis=2)
    bgr = frame[::-1, :, ::-1]  # bottom-up, BGR
    row = bgr.reshape(h, w * 3)
    pad = (-w * 3) % 4
    if pad:
        row = np.concatenate(
            [row, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    return row.tobytes()


def encode_avi(
    frames: list[np.ndarray],
    *,
    fps: int = 30,
    codec: str = "mjpeg",
    quality: int = 90,
) -> bytes:
    """Encode uint8 frames (all ``(h, w)`` or all ``(h, w, 3)``) as an
    AVI file with a single video stream.

    ``codec``: ``'mjpeg'`` (each frame an in-repo-encoded JPEG in a
    ``00dc`` chunk) or ``'raw'`` (24-bit bottom-up DIB ``00db``
    chunks).  Emits hdrl (avih + strl), the movi list, and a
    conformant idx1 index (offsets relative to the ``movi`` fourcc).
    """
    from . import jpeg as _jpeg

    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with equal shape")
    if codec == "mjpeg":
        payloads = [
            _jpeg.encode_jpeg(f, quality=quality) for f in frames
        ]
        ckid, compression, bitcount = b"00dc", b"MJPG", 24
    elif codec == "raw":
        payloads = [_dib_encode(f) for f in frames]
        ckid, compression, bitcount = (
            b"00db", struct.pack("<I", BI_RGB), 24
        )
    else:
        raise ValueError(f"unknown codec {codec!r}")

    max_size = max(len(p) for p in payloads)
    usec_per_frame = round(1_000_000 / fps)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame,
        max_size * fps,
        0,
        _AVIF_HASINDEX,
        len(frames),
        0,
        1,
        max_size,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids",
        b"MJPG" if codec == "mjpeg" else b"\x00\x00\x00\x00",
        0,
        0,
        0,
        0,
        1,          # dwScale
        fps,        # dwRate: rate/scale = fps
        0,
        len(frames),
        max_size,
        -1,         # dwQuality: default
        0,
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,
        w,
        h,
        1,
        bitcount,
        compression if isinstance(compression, bytes) and len(compression) == 4
        else struct.pack("<I", BI_RGB),
        max(len(p) for p in payloads),
        0,
        0,
        0,
        0,
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            out += b"\x00"
        return out

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = len(movi_body) - 4 + 4  # == offset of the chunk fourcc
        idx += ckid + struct.pack("<III", _AVIIF_KEYFRAME, off, len(p))
        movi_body += ckid + struct.pack("<I", len(p)) + p
        if len(p) % 2:
            movi_body += b"\x00"
    movi = chunk(b"LIST", bytes(movi_body))
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# decode


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def _parse_strf(body: bytes):
    (
        bi_size, w, h, planes, bitcount,
    ) = struct.unpack_from("<IiiHH", body, 0)
    compression = body[16:20]
    return {
        "width": w,
        "height": h,
        "bitcount": bitcount,
        "compression": compression,
    }


def _dib_decode(body: bytes, w: int, h: int, bitcount: int) -> np.ndarray:
    if bitcount == 24:
        stride = (w * 3 + 3) & ~3
        if len(body) < stride * abs(h):
            raise ValueError("DIB frame shorter than its geometry")
        rows = np.frombuffer(body[: stride * abs(h)], dtype=np.uint8)
        rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        rgb = rows[:, :, ::-1]
        return rgb[::-1] if h > 0 else rgb  # positive height = bottom-up
    if bitcount == 8:
        stride = (w + 3) & ~3
        rows = np.frombuffer(body[: stride * abs(h)], dtype=np.uint8)
        gray = rows.reshape(abs(h), stride)[:, :w]
        return (gray[::-1] if h > 0 else gray).copy()
    raise NotImplementedError(f"{bitcount}-bit DIB frames")


def parse_avi(data: bytes) -> dict:
    """Parse container structure without decoding frame payloads.

    Returns ``{"meta": {...}, "frames": [(fourcc, start, size), ...]}``
    where each frame entry points into ``data``.
    """
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    meta = None
    stream = None
    stream_no = -1  # strl index of the elected video stream
    n_strl = 0
    frames: list[tuple[bytes, int, int]] = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        kind = data[body : body + 4]
        if kind == b"hdrl":
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4 == b"avih":
                    (
                        usec, _, _, _, total, _, nstreams, _, w, h,
                    ) = struct.unpack_from("<IIIIIIIIII", data, b2)
                    meta = {
                        "width": w,
                        "height": h,
                        "n_frames": total,
                        "fps": round(1_000_000 / usec) if usec else 0,
                    }
                elif c4 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    st = {}
                    for c5, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if c5 == b"strh":
                            fcc_type = data[b3 : b3 + 4]
                            scale, rate = struct.unpack_from(
                                "<II", data, b3 + 20
                            )
                            st["type"] = fcc_type
                            if scale:
                                st["fps"] = round(rate / scale)
                                # exact rate/scale for duration math
                                # (29.97 fps material must not round)
                                st["rate"] = rate
                                st["scale"] = scale
                        elif c5 == b"strf" and st.get("type") == b"vids":
                            st.update(_parse_strf(data[b3 : b3 + s3]))
                    if st.get("type") == b"vids" and stream is None:
                        stream = st
                        stream_no = n_strl
                    n_strl += 1
        elif kind == b"movi":
            # chunk ids carry the 2-digit stream number ('00dc'); only
            # the elected video stream's chunks become frames — other
            # streams (audio '01wb', a second video) must not
            # interleave into the frame list
            want = b"%02d" % stream_no if stream_no >= 0 else b"00"
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4[2:4] in (b"dc", b"db") and c4[:2] == want:
                    frames.append((c4, b2, s2))
                elif c4 == b"LIST" and data[b2 : b2 + 4] == b"rec ":
                    for c5, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if c5[2:4] in (b"dc", b"db") and c5[:2] == want:
                            frames.append((c5, b3, s3))
    if meta is None or stream is None:
        raise ValueError("AVI missing avih/strl headers")
    comp = stream.get("compression", struct.pack("<I", BI_RGB))
    if comp in (b"MJPG", b"mjpg"):
        codec = "mjpeg"
    elif comp == struct.pack("<I", BI_RGB):
        codec = "raw"
    else:
        raise NotImplementedError(
            f"AVI compression {comp!r} (only MJPG and BI_RGB DIB)"
        )
    meta["codec"] = codec
    meta["bitcount"] = stream.get("bitcount", 24)
    if "fps" in stream:
        meta["fps"] = stream["fps"]
        meta["rate"] = stream["rate"]
        meta["scale"] = stream["scale"]
    return {"meta": meta, "frames": frames}


def decode_avi_frame(data: bytes, parsed: dict, index: int) -> np.ndarray:
    """Decode ONE frame of an already-parsed container (avoids
    re-walking the RIFF structure for per-frame access)."""
    from . import jpeg as _jpeg

    meta = parsed["meta"]
    fourcc, start, size = parsed["frames"][index]
    body = data[start : start + size]
    if meta["codec"] == "mjpeg":
        px, _ = _jpeg.decode_jpeg(body)
        return px
    return _dib_decode(
        body, meta["width"], meta["height"], meta["bitcount"]
    )


def iter_avi_frames(data: bytes, *, every_n: int = 1):
    """Yield ``(frame_index, np.ndarray)`` for every ``every_n``-th
    frame.  Skipped frames are never entropy-decoded — sampling a
    sparse subset of a long MJPEG stream costs only the container
    walk."""
    parsed = parse_avi(data)
    for i in range(0, len(parsed["frames"]), every_n):
        yield i, decode_avi_frame(data, parsed, i)


def decode_avi(data: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every frame; returns ``(frames, meta)``."""
    parsed = parse_avi(data)
    frames = [px for _, px in iter_avi_frames(data)]
    meta = dict(parsed["meta"])
    meta["n_frames"] = len(frames)
    return frames, meta


def extract_avi_audio(data: bytes) -> tuple[np.ndarray, dict]:
    """Extract the FIRST audio stream from an interleaved AVI: parse
    its ``auds`` stream header (the ``strf`` is a WAVEFORMATEX), pull
    the stream's ``##wb`` chunks from the movi list in order, and
    decode the concatenation through the WAV codec's kernels (PCM,
    IMA/MS-ADPCM, G.711 — same tag dispatch as ``decode_wav``).
    Raises ValueError when the container has no audio stream."""
    from . import wav as _wav

    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    fmt = None
    stream_no = -1
    n_strl = 0
    chunks: list[bytes] = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        kind = data[body : body + 4]
        if kind == b"hdrl":
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    st_type = None
                    for c5, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if c5 == b"strh":
                            st_type = data[b3 : b3 + 4]
                        elif (
                            c5 == b"strf"
                            and st_type == b"auds"
                            and fmt is None
                        ):
                            fmt = bytes(data[b3 : b3 + s3])
                            stream_no = n_strl
                    n_strl += 1
        elif kind == b"movi" and stream_no >= 0:
            want = b"%02dwb" % stream_no
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4 == want:
                    chunks.append(data[b2 : b2 + s2])
    if fmt is None:
        raise ValueError("AVI has no audio (auds) stream")
    # WAVEFORMATEX prefix: tag, channels, rate, byterate, align, bits
    tag, channels, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    # rebuild a minimal WAV around the payload and reuse the tag
    # dispatch (incl. ADPCM block walkers and G.711 companders)
    payload = b"".join(chunks)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return _wav.decode_wav(
        b"RIFF" + struct.pack("<I", len(body)) + body
    )


def encode_avi_with_audio(
    frames: list[np.ndarray],
    audio: np.ndarray,
    sample_rate: int,
    *,
    fps: int = 30,
    codec: str = "mjpeg",
    quality: int = 90,
) -> bytes:
    """Encode video frames plus a 16-bit PCM audio track as a
    two-stream AVI (stream 0 = vids, stream 1 = auds, audio split
    into one ``01wb`` chunk per video frame — the usual interleave)."""
    from . import wav as _wav

    base = encode_avi(frames, fps=fps, codec=codec, quality=quality)
    arr = np.asarray(audio, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    pcm = (
        np.round(np.clip(arr, -1.0, 1.0) * 32767.0)
        .astype("<i2")
        .tobytes()
    )
    block = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"auds", b"\x00" * 4, 0, 0, 0, 0,
        1, sample_rate, 0, len(arr), len(pcm), -1, block,
        0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, bodyb: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(bodyb)) + bodyb
        if len(bodyb) % 2:
            out += b"\x00"
        return out

    strl = chunk(
        b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", fmt)
    )
    out = bytearray(base)
    # splice the audio strl into hdrl (after the video strl) and bump
    # the stream count
    hdrl_at = out.index(b"hdrl") - 8
    (hdrl_sz,) = struct.unpack_from("<I", out, hdrl_at + 4)
    insert_at = hdrl_at + 8 + 4 + hdrl_sz - 4  # end of hdrl body
    avih_at = out.index(b"avih")
    struct.pack_into("<I", out, avih_at + 8 + 24, 2)  # dwStreams = 2
    out[insert_at:insert_at] = strl
    struct.pack_into("<I", out, hdrl_at + 4, hdrl_sz + len(strl))
    # interleave audio chunks into movi: append per video frame
    movi_at = out.index(b"movi") - 8
    (movi_sz,) = struct.unpack_from("<I", out, movi_at + 4)
    movi_end = movi_at + 8 + movi_sz
    nf = max(len(frames), 1)
    per = -(-len(pcm) // nf)
    audio_chunks = bytearray()
    for i in range(nf):
        piece = pcm[i * per : (i + 1) * per]
        if piece:
            audio_chunks += chunk(b"01wb", piece)
    out[movi_end:movi_end] = audio_chunks
    struct.pack_into("<I", out, movi_at + 4, movi_sz + len(audio_chunks))
    # fix the RIFF size
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)
