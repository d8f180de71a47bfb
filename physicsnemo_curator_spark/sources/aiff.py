"""Pure-Python AIFF / AIFF-C codec for the multimodal audio column.

Apple's IFF-structured audio container (public EA-IFF-85 derivative):
big-endian chunks, a ``COMM`` header whose sample rate is an 80-bit
IEEE 754 extended float, and ``SSND`` sample data.  Supported (loud
on the rest):

- AIFF: big-endian signed PCM at 8/16/24/32 bits, any channel count;
- AIFF-C compression types: ``NONE`` (big-endian PCM), ``sowt``
  (little-endian PCM, the common Mac variant), ``ulaw``/``ULAW`` and
  ``alaw``/``ALAW`` (G.711 — decoded by the WAV module's companders,
  so they stay bit-for-bit against audioop), and ``ima4``
  (QuickTime IMA: 34-byte packets through the same step tables as
  the WAV IMA kernel, packet-parallel), plus ``fl32``/``fl64``
  (big-endian IEEE float);
- encoder: 16-bit big-endian AIFF.

Scale shape: payloads decode task-side inside ``mapInPandas``
batches, one task per file, like the rest of the codec pack.
"""

from __future__ import annotations

import struct

import numpy as np


def is_aiff(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == b"FORM"
        and bytes(data[8:12]) in (b"AIFF", b"AIFC")
    )


def _read_extended(b: bytes) -> float:
    """80-bit IEEE 754 extended float (big-endian): the COMM sample
    rate field."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("AIFF sample rate is inf/nan")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended(value: float) -> bytes:
    if value <= 0:
        raise ValueError("sample rate must be positive")
    exp = 16383 + 63
    mant = value
    while mant >= 1 << 64:
        mant /= 2.0
        exp += 1
    while mant < 1 << 63:
        mant *= 2.0
        exp -= 1
    return struct.pack(">HQ", exp, int(round(mant)))


def decode_aiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode AIFF/AIFF-C to the WAV decoder's conventions: float64
    in [-1, 1], ``(n,)`` mono or ``(n, channels)``, meta with
    sample_rate / channels / bits / n_frames / duration_s."""
    from . import wav as _wav

    data = bytes(data)
    if not is_aiff(data):
        raise ValueError("not an AIFF byte stream (bad FORM/AIFF header)")
    aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(
                f"truncated AIFF chunk {cid.decode(errors='replace')!r}"
            )
        if cid == b"COMM":
            channels, nframes, bits = struct.unpack_from(">HIH", body, 0)
            rate = _read_extended(body[8:18])
            comp = body[18:22] if (aifc and len(body) >= 22) else b"NONE"
            comm = (channels, nframes, bits, rate, comp)
        elif cid == b"SSND":
            offset, _blk = struct.unpack_from(">II", body, 0)
            ssnd = body[8 + offset :]
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    channels, nframes, bits, rate, comp = comm
    if channels < 1:
        raise ValueError(f"AIFF declares {channels} channels")
    if comp in (b"NONE", b"sowt"):
        bo = "<" if comp == b"sowt" else ">"
        if bits == 8:
            arr = (
                np.frombuffer(ssnd, np.int8).astype(np.float64) / 128.0
            )
        elif bits == 16:
            arr = (
                np.frombuffer(ssnd, f"{bo}i2").astype(np.float64)
                / 32768.0
            )
        elif bits == 24:
            b3 = np.frombuffer(ssnd, np.uint8)
            b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int64)
            if comp == b"sowt":
                v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            else:
                v = b3[:, 2] | (b3[:, 1] << 8) | (b3[:, 0] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(ssnd, f"{bo}i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"{bits}-bit AIFF PCM")
    elif comp.lower() == b"ulaw":
        arr = (
            _wav._ulaw_decode(np.frombuffer(ssnd, np.uint8)).astype(
                np.float64
            )
            / 32768.0
        )
        bits = 8
    elif comp.lower() == b"alaw":
        arr = (
            _wav._alaw_decode(np.frombuffer(ssnd, np.uint8)).astype(
                np.float64
            )
            / 32768.0
        )
        bits = 8
    elif comp == b"ima4":
        arr = _decode_ima4(ssnd, channels) / 32768.0
        bits = 16
    elif comp.lower() in (b"fl32", b"fl64"):
        dt = ">f4" if comp.lower() == b"fl32" else ">f8"
        arr = np.frombuffer(ssnd, dt).astype(np.float64)
        bits = 32 if comp.lower() == b"fl32" else 64
    else:
        raise NotImplementedError(
            f"AIFF-C compression {comp.decode(errors='replace')!r}"
        )
    n = min(len(arr) // channels, nframes) if nframes else (
        len(arr) // channels
    )
    arr = arr[: n * channels]
    if channels > 1:
        arr = arr.reshape(n, channels)
    meta = {
        "sample_rate": int(round(rate)),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(n),
        "duration_s": n / rate if rate else 0.0,
    }
    return arr, meta


def _decode_ima4(ssnd: bytes, channels: int) -> np.ndarray:
    """QuickTime 'ima4' AIFF-C packets -> float64-able int samples.

    Each 34-byte packet carries a 2-byte big-endian state word (top 9
    bits = predictor, low 7 = step index) and 32 nibble bytes (64
    samples, LOW nibble first) through the standard IMA step tables —
    the same reconstruction the WAV module vectorizes, so packets
    stack as the parallel axis here too.  Stereo packets interleave
    per channel in 64-frame groups."""
    from . import wav as _wav

    usable = len(ssnd) - len(ssnd) % (34 * channels)
    if usable == 0:
        raise ValueError("ima4 data shorter than one packet group")
    pk = np.frombuffer(ssnd[:usable], np.uint8).reshape(-1, 34)
    npk = pk.shape[0]
    state = (pk[:, 0].astype(np.int32) << 8) | pk[:, 1].astype(np.int32)
    pred = np.where(state & 0x8000, state - (1 << 16), state) & ~0x7F
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(state & 0x7F, 0, 88)
    data = pk[:, 2:]
    nib = np.empty((npk, 64), dtype=np.int32)
    nib[:, 0::2] = data & 0x0F
    nib[:, 1::2] = data >> 4
    out = np.empty((npk, 64), dtype=np.int32)
    for t in range(64):
        pred, idx = _wav._adpcm_reconstruct(pred, idx, nib[:, t])
        out[:, t] = pred
    # packets alternate channels: (group, channel, 64) -> frames
    groups = out.reshape(-1, channels, 64).transpose(0, 2, 1)
    return groups.reshape(-1, channels).astype(np.float64).reshape(-1)


def encode_aiff(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit big-endian AIFF."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    pcm = (
        np.round(np.clip(arr, -1.0, 1.0) * 32767.0)
        .astype(">i2")
        .tobytes()
    )
    comm = (
        struct.pack(">HIH", channels, n, 16)
        + _write_extended(float(sample_rate))
    )
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = bytearray(b"AIFF")
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) % 2:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + bytes(body)
