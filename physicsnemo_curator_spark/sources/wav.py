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
signed), format 3 (IEEE float32/float64), and format 0x11 (IMA/DVI
ADPCM, the public 4-bit compressed-PCM scheme — mono/stereo, any
block align), any channel count, extra chunks (LIST, ...) skipped
with ``fact`` honored for the ADPCM frame count; NOT supported:
WAVE_FORMAT_EXTENSIBLE subformats other than PCM/float, MS-ADPCM,
a-law/mu-law, MP3/AAC.

ADPCM blocks are independent decode units (each block header carries
its own predictor + step index), so both codec directions vectorize
ACROSS blocks with numpy — the serial loop is only over the ~2k
nibble positions within a block, shared by every block at once.
"""

from __future__ import annotations

import struct

import numpy as np

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def _adpcm_reconstruct(pred, idx, nib):
    """One IMA step, vectorized over any leading shape: returns the
    new (pred, idx) after consuming nibble array ``nib``."""
    step = _IMA_STEP_TABLE[idx]
    diff = (
        (step >> 3)
        + np.where(nib & 1, step >> 2, 0)
        + np.where(nib & 2, step >> 1, 0)
        + np.where(nib & 4, step, 0)
    )
    pred = np.clip(
        pred + np.where(nib & 8, -diff, diff), -32768, 32767
    )
    idx = np.clip(idx + _IMA_INDEX_TABLE[nib], 0, 88)
    return pred, idx


def _decode_adpcm_ima(
    payload: bytes, channels: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """IMA ADPCM data chunk -> float64 PCM, block-parallel."""
    if block_align <= 4 * channels or (block_align - 4 * channels) % (
        4 * channels
    ):
        raise ValueError(
            f"IMA ADPCM block align {block_align} invalid for "
            f"{channels} channels"
        )
    usable = len(payload) - len(payload) % block_align
    if usable == 0:
        raise ValueError("IMA ADPCM data shorter than one block")
    blocks = np.frombuffer(payload[:usable], np.uint8).reshape(
        -1, block_align
    )
    nb = blocks.shape[0]
    heads = blocks[:, : 4 * channels].reshape(nb, channels, 4)
    pred = (
        heads[:, :, 0].astype(np.int32)
        | (heads[:, :, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(heads[:, :, 2].astype(np.int32), 0, 88)
    # data region: alternating 4-byte groups per channel
    data = blocks[:, 4 * channels :].reshape(nb, -1, channels, 4)
    chan_bytes = data.transpose(0, 2, 1, 3).reshape(nb, channels, -1)
    nsamp = chan_bytes.shape[2] * 2  # nibbles per channel per block
    nib = np.empty((nb, channels, nsamp), dtype=np.int32)
    nib[:, :, 0::2] = chan_bytes & 0x0F  # low nibble first
    nib[:, :, 1::2] = chan_bytes >> 4
    out = np.empty((nb, channels, nsamp + 1), dtype=np.int32)
    out[:, :, 0] = pred
    for t in range(nsamp):
        pred, idx = _adpcm_reconstruct(pred, idx, nib[:, :, t])
        out[:, :, t + 1] = pred
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    if n_frames is not None:
        frames = frames[:n_frames]
    return frames.astype(np.float64).reshape(-1) / 32768.0


def _encode_adpcm_ima(
    arr: np.ndarray, sample_rate: int, *, block_align: int | None = None
) -> bytes:
    """float (n, c) in [-1, 1] -> complete IMA ADPCM WAV bytes."""
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot ADPCM-encode an empty signal")
    ba = block_align if block_align else 256 * channels
    spb = (ba - 4 * channels) * 2 // channels + 1
    pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int32)
    nblk = -(-n // spb)
    pad = nblk * spb - n
    if pad:
        pcm = np.concatenate([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    s = pcm.reshape(nblk, spb, channels).transpose(0, 2, 1)
    pred = s[:, :, 0].copy()
    # block-local initial step index: nearest table step to the first
    # in-block delta (blocks stay independent => parallel encode)
    d0 = np.abs(s[:, :, 1] - s[:, :, 0]) if spb > 1 else np.zeros_like(pred)
    idx = np.clip(
        np.searchsorted(_IMA_STEP_TABLE, d0), 0, 88
    ).astype(np.int32)
    idx0 = idx.copy()
    nib = np.empty((nblk, channels, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        step = _IMA_STEP_TABLE[idx]
        delta = s[:, :, t] - pred
        sign = delta < 0
        d = np.abs(delta)
        b4 = d >= step
        d = d - np.where(b4, step, 0)
        b2 = d >= step >> 1
        d = d - np.where(b2, step >> 1, 0)
        b1 = d >= step >> 2
        code = sign * 8 + b4 * 4 + b2 * 2 + b1 * 1
        nib[:, :, t - 1] = code
        pred, idx = _adpcm_reconstruct(pred, idx, code)
    packed = (nib[:, :, 0::2] | (nib[:, :, 1::2] << 4)).astype(np.uint8)
    groups = packed.reshape(nblk, channels, -1, 4).transpose(0, 2, 1, 3)
    heads = np.empty((nblk, channels, 4), dtype=np.uint8)
    first = np.where(s[:, :, 0] < 0, s[:, :, 0] + (1 << 16), s[:, :, 0])
    heads[:, :, 0] = first & 0xFF
    heads[:, :, 1] = first >> 8
    heads[:, :, 2] = idx0
    heads[:, :, 3] = 0
    body = np.concatenate(
        [heads.reshape(nblk, -1), groups.reshape(nblk, -1)], axis=1
    )
    payload = body.astype(np.uint8).tobytes()
    byte_rate = -(-sample_rate * ba // spb)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate, ba, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    out = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(out)) + out


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
    block_align = 0
    fact_frames = None
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
            tag, channels, rate, _brate, block_align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            fmt = (tag, channels, rate, bits)
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, bits = fmt
    if channels < 1:
        raise ValueError(f"WAV fmt declares {channels} channels")
    if tag == 0x11:  # IMA/DVI ADPCM
        if bits != 4:
            raise NotImplementedError(f"{bits}-bit IMA ADPCM")
        arr = _decode_adpcm_ima(payload, channels, block_align, fact_frames)
    elif tag == 1:  # integer PCM
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
    integer-PCM WAV (8 or 16 bit), or as IMA/DVI ADPCM with
    ``bits=4`` (lossy 4:1 vs 16-bit, block-parallel encode)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if bits == 4:
        return _encode_adpcm_ima(arr, sample_rate)
    flat = np.clip(arr, -1.0, 1.0).reshape(-1)
    if bits == 16:
        pcm = np.round(flat * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.round(flat * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("encode_wav supports bits in (4, 8, 16)")
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
