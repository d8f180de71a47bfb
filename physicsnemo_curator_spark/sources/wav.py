"""Pure-Python WAV (RIFF PCM) codec for the multimodal audio column.

The third leg of the native codec pack (PNG, baseline JPEG, WAV): the
RIFF/WAVE container with PCM payloads is a public specification and
needs only stdlib ``struct`` + numpy, so the multimodal ``audio`` kind
gets a REAL decode path — sample rate, channel layout, and the sample
matrix itself — instead of the digest stub.  Compressed audio (MP3,
AAC, ...) stays honestly codec-gated behind the strict/plumbing
policy in :mod:`physicsnemo_curator_spark.sources.multimodal`.

Supported surface (loud on the rest): RIFF little-endian, ``fmt ``
format 1 (integer PCM, 8-bit unsigned / 16-bit / 24-bit / 32-bit
signed) and format 3 (IEEE float32/float64), any channel count,
extra chunks (LIST, fact, ...) skipped; NOT supported: WAVE_FORMAT_
EXTENSIBLE subformats other than PCM/float, ADPCM, a-law/mu-law.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a RIFF/WAVE byte string to ``(samples, meta)``:
    ``samples`` is float64 in [-1, 1] of shape ``(n_frames,)`` mono or
    ``(n_frames, n_channels)``; ``meta`` carries sample_rate /
    channels / bits / n_frames / duration_s."""
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV byte stream (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a declared size past EOF must fail loudly — silently
            # accepting the short slice would yield confidently wrong
            # n_frames/duration/RMS downstream
            raise ValueError(
                f"truncated WAV chunk {cid.decode(errors='replace')!r}: "
                f"declares {size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            tag, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, bits = fmt
    if channels < 1:
        raise ValueError(f"WAV fmt declares {channels} channels")
    if tag == 1:  # integer PCM
        if bits == 8:
            arr = (
                np.frombuffer(payload, np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            arr = np.frombuffer(payload, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(payload, np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(payload, "<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif tag == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(payload, "<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(payload, "<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE float PCM")
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (only integer PCM and IEEE float)"
        )
    n_frames = len(arr) // channels
    arr = arr[: n_frames * channels]
    if channels > 1:
        arr = arr.reshape(n_frames, channels)
    meta = {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_s": n_frames / rate if rate else 0.0,
    }
    return arr, meta


def encode_wav(
    samples: np.ndarray, sample_rate: int, *, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1] (``(n,)`` or ``(n, c)``) as
    integer-PCM WAV (8 or 16 bit)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    flat = np.clip(arr, -1.0, 1.0).reshape(-1)
    if bits == 16:
        pcm = np.round(flat * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.round(flat * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("encode_wav supports bits in (8, 16)")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        # RIFF chunks are word-aligned: odd-sized data (8-bit, odd
        # sample count) carries a pad byte not counted in the size
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
