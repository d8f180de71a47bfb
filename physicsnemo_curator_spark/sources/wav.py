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
signed), format 3 (IEEE float32/float64), format 6 (G.711 a-law),
format 7 (G.711 mu-law), format 2 (MS-ADPCM, per-block predictor
election over the seven spec coefficient pairs), and format 0x11
(IMA/DVI ADPCM, the public 4-bit compressed-PCM scheme —
mono/stereo, any block align), any channel count, extra chunks
(LIST, ...) skipped with ``fact`` honored for the ADPCM frame count;
WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat
GUID to any of the above; NOT supported: non-media SubFormat GUIDs,
MP3/AAC.  The G.711 companders are ported from the
canonical Sun segment-table algorithm and pinned bit-for-bit against
CPython's audioop in the tests; the MS-ADPCM kernel is pinned
against a scalar spec-reference decoder.

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


_SEG_ULAW = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)
_SEG_ALAW = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def _ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> G.711 mu-law bytes (Sun/CCITT segment algorithm)."""
    p = x.astype(np.int32) >> 2  # 14-bit domain
    mask = np.where(p < 0, 0x7F, 0xFF)
    p = np.minimum(np.abs(p), 8159) + 33  # CLIP, BIAS>>2
    seg = np.searchsorted(_SEG_ULAW, p, side="left")
    seg_c = np.minimum(seg, 7)
    uval = (seg_c << 4) | ((p >> (seg_c + 1)) & 0x0F)
    return (np.where(seg >= 8, 0x7F ^ mask, uval ^ mask) & 0xFF).astype(
        np.uint8
    )


def _ulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16."""
    u = (~u.astype(np.int32)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> G.711 a-law bytes (Sun/CCITT segment algorithm)."""
    p = x.astype(np.int32) >> 3  # 13-bit domain
    mask = np.where(p >= 0, 0xD5, 0x55)
    p = np.where(p >= 0, p, -p - 1)
    seg = np.searchsorted(_SEG_ALAW, p, side="left")
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 1, seg_c)
    aval = (seg_c << 4) | ((p >> shift) & 0x0F)
    return (np.where(seg >= 8, 0x7F ^ mask, aval ^ mask) & 0xFF).astype(
        np.uint8
    )


def _alaw_decode(a: np.ndarray) -> np.ndarray:
    """G.711 a-law bytes -> int16."""
    a = a.astype(np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    mant = a & 0x0F
    t = np.where(
        seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(
            seg - 1, 0
        )
    )
    return np.where(a & 0x80, t, -t)


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


def _adpcm_decode_blocks(blocks: np.ndarray, channels: int) -> np.ndarray:
    """uint8 block matrix ``(nb, block_align)`` -> int32 frames
    ``(nb, samples_per_block, channels)``.  The vectorization axis is
    BLOCKS — stack blocks from many files/signals and the serial loop
    over nibble positions runs once for all of them."""
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
    return out.transpose(0, 2, 1)


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
    blocks = _payload_blocks(payload, block_align, "IMA ADPCM")
    frames = _adpcm_decode_blocks(blocks, channels).reshape(-1, channels)
    if n_frames is not None:
        frames = frames[:n_frames]
    return frames.astype(np.float64).reshape(-1) / 32768.0


def _adpcm_encode_blocks(s: np.ndarray) -> np.ndarray:
    """int32 samples ``(nblk, channels, samples_per_block)`` -> uint8
    encoded block bodies ``(nblk, block_bytes)``.  Like the decode
    kernel, blocks are the vectorization axis — callers may stack
    blocks from MANY signals into one call."""
    nblk, channels, spb = s.shape
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
    return np.concatenate(
        [heads.reshape(nblk, -1), groups.reshape(nblk, -1)], axis=1
    ).astype(np.uint8)


def _adpcm_block_shape(arr, block_align):
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot ADPCM-encode an empty signal")
    ba = block_align if block_align else 256 * channels
    if ba <= 4 * channels or (ba - 4 * channels) % (4 * channels):
        # same gate as the decode side: the data region must split
        # into whole 4-byte channel groups, or the written
        # wSamplesPerBlock disagrees with the actual nibble count
        raise ValueError(
            f"IMA ADPCM block align {ba} invalid for {channels} channels"
        )
    spb = (ba - 4 * channels) * 2 // channels + 1
    pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int32)
    nblk = -(-n // spb)
    pad = nblk * spb - n
    if pad:
        pcm = np.concatenate([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    return pcm.reshape(nblk, spb, channels).transpose(0, 2, 1), ba, spb


def _wrap_riff_fact(fmt: bytes, n_frames: int, payload: bytes) -> bytes:
    """RIFF/WAVE shell shared by every fact-carrying codec: fmt +
    fact + word-aligned data chunk."""
    fact = struct.pack("<I", n_frames)
    out = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(out)) + out


def _adpcm_wrap_riff(payload, n, channels, sample_rate, ba, spb):
    byte_rate = -(-sample_rate * ba // spb)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate, ba, 4, 2, spb
    )
    return _wrap_riff_fact(fmt, n, payload)


def _payload_blocks(payload: bytes, block_align: int, what: str) -> np.ndarray:
    """Whole-block uint8 matrix from a data chunk (shared ADPCM
    slicing; trailing partial blocks are dropped, empty data raises)."""
    usable = len(payload) - len(payload) % block_align
    if usable == 0:
        raise ValueError(f"{what} data shorter than one block")
    return np.frombuffer(payload[:usable], np.uint8).reshape(
        -1, block_align
    )


def _encode_adpcm_ima(
    arr: np.ndarray, sample_rate: int, *, block_align: int | None = None
) -> bytes:
    """float (n, c) in [-1, 1] -> complete IMA ADPCM WAV bytes."""
    s, ba, spb = _adpcm_block_shape(arr, block_align)
    payload = _adpcm_encode_blocks(s).tobytes()
    return _adpcm_wrap_riff(
        payload, arr.shape[0], arr.shape[1], sample_rate, ba, spb
    )


_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int64
)
_MS_COEFS = np.array(
    [(256, 0), (512, -256), (0, 0), (192, 64),
     (240, 0), (460, -208), (392, -232)], dtype=np.int64
)


def _ms_adpcm_decode_blocks(
    blocks: np.ndarray, channels: int
) -> np.ndarray:
    """MS-ADPCM uint8 blocks ``(nb, block_align)`` -> int32 frames
    ``(nb, samples_per_block, channels)``.  Same block-parallel shape
    as the IMA kernel: per-block headers carry predictor index,
    initial delta, and the two seed samples, so blocks from many
    files decode in one call."""
    nb, ba = blocks.shape
    hdr = 7 * channels
    b = blocks.astype(np.int64)
    pred_ix = np.clip(b[:, :channels], 0, 6)  # (nb, C)
    def i16(lo, hi):
        v = lo | (hi << 8)
        return np.where(v >= 1 << 15, v - (1 << 16), v)
    off = channels
    idelta = i16(b[:, off : off + 2 * channels : 2],
                 b[:, off + 1 : off + 2 * channels : 2])
    off += 2 * channels
    samp1 = i16(b[:, off : off + 2 * channels : 2],
                b[:, off + 1 : off + 2 * channels : 2])
    off += 2 * channels
    samp2 = i16(b[:, off : off + 2 * channels : 2],
                b[:, off + 1 : off + 2 * channels : 2])
    c1 = _MS_COEFS[pred_ix, 0]
    c2 = _MS_COEFS[pred_ix, 1]
    data = blocks[:, hdr:]
    # nibble stream: HIGH nibble first, alternating channels
    nibs = np.empty((nb, data.shape[1] * 2), dtype=np.int64)
    nibs[:, 0::2] = data >> 4
    nibs[:, 1::2] = data & 0x0F
    ns_per_chan = nibs.shape[1] // channels
    spb = ns_per_chan + 2
    out = np.empty((nb, spb, channels), dtype=np.int32)
    out[:, 0, :] = samp2
    out[:, 1, :] = samp1
    signed = np.where(nibs >= 8, nibs - 16, nibs)
    for t in range(ns_per_chan):
        n_u = nibs[:, t * channels : (t + 1) * channels]
        n_s = signed[:, t * channels : (t + 1) * channels]
        pred = (samp1 * c1 + samp2 * c2) >> 8
        s = np.clip(pred + n_s * idelta, -32768, 32767)
        samp2, samp1 = samp1, s
        idelta = np.maximum(16, (_MS_ADAPT[n_u] * idelta) >> 8)
        out[:, t + 2, :] = s
    return out


def _decode_ms_adpcm(
    payload: bytes, channels: int, block_align: int, n_frames: int | None
) -> np.ndarray:
    """MS-ADPCM data chunk -> float64 PCM (mirrors _decode_adpcm_ima)."""
    hdr = 7 * channels
    if block_align <= hdr or ((block_align - hdr) * 2) % channels:
        raise ValueError(
            f"MS-ADPCM block align {block_align} invalid for "
            f"{channels} channels"
        )
    blocks = _payload_blocks(payload, block_align, "MS-ADPCM")
    frames = _ms_adpcm_decode_blocks(blocks, channels).reshape(-1, channels)
    if n_frames is not None:
        frames = frames[:n_frames]
    return frames.astype(np.float64).reshape(-1) / 32768.0


def _ms_adpcm_encode_blocks(s: np.ndarray) -> np.ndarray:
    """int32 samples ``(nblk, channels, spb)`` -> uint8 MS-ADPCM block
    bodies.  All seven spec predictors are evaluated for every block
    in parallel and the best (least squared error) is kept — the
    scheme the format's own encoder guidance describes."""
    nblk, channels, spb = s.shape
    npred = 7
    # state per (pred, nblk, C)
    samp2 = np.broadcast_to(s[:, :, 0], (npred, nblk, channels)).copy()
    samp1 = np.broadcast_to(s[:, :, 1], (npred, nblk, channels)).copy()
    d0 = np.maximum(
        16, np.abs(s[:, :, 1] - s[:, :, 0]) // 4
    ).astype(np.int64)
    idelta = np.broadcast_to(d0, (npred, nblk, channels)).copy()
    idelta0 = idelta[0].copy()
    c1 = _MS_COEFS[:, 0][:, None, None]
    c2 = _MS_COEFS[:, 1][:, None, None]
    err = np.zeros((npred, nblk, channels), dtype=np.float64)
    nibs = np.empty((npred, nblk, channels, spb - 2), dtype=np.uint8)
    for t in range(2, spb):
        x = s[:, :, t]
        pred = (samp1 * c1 + samp2 * c2) >> 8
        diff = x - pred
        n_s = np.clip(
            np.floor_divide(diff, np.maximum(idelta, 1)), -8, 7
        )
        # rounding refinement: +1 if it reduces error and stays <= 7
        cand = np.clip(n_s + 1, -8, 7)
        better = np.abs(diff - cand * idelta) < np.abs(diff - n_s * idelta)
        n_s = np.where(better, cand, n_s)
        rec = np.clip(pred + n_s * idelta, -32768, 32767)
        err += (x - rec).astype(np.float64) ** 2
        nibs[:, :, :, t - 2] = (n_s & 0x0F).astype(np.uint8)
        samp2, samp1 = samp1, rec
        idelta = np.maximum(16, (_MS_ADAPT[(n_s & 0x0F)] * idelta) >> 8)
    best = np.argmin(err.sum(axis=2), axis=0)  # (nblk,)
    ar = np.arange(nblk)
    nib_best = nibs[best, ar]  # (nblk, C, spb-2)
    # interleave channels, high nibble first
    inter = nib_best.transpose(0, 2, 1).reshape(nblk, -1)
    packed = (inter[:, 0::2] << 4) | inter[:, 1::2]
    def le16(v):
        v = np.where(v < 0, v + (1 << 16), v).astype(np.int64)
        out = np.empty((nblk, channels, 2), dtype=np.uint8)
        out[:, :, 0] = v & 0xFF
        out[:, :, 1] = (v >> 8) & 0xFF
        return out.reshape(nblk, -1)
    head = np.concatenate(
        [
            best[:, None].astype(np.uint8).repeat(channels, axis=1),
            le16(idelta0),
            le16(s[:, :, 1]),
            le16(s[:, :, 0]),
        ],
        axis=1,
    )
    return np.concatenate([head, packed.astype(np.uint8)], axis=1)


def _ms_block_shape(arr, block_align):
    """(stacked int64 blocks, ba, spb) for one signal — the MS twin
    of _adpcm_block_shape."""
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot ADPCM-encode an empty signal")
    ba = block_align if block_align else 256 * channels
    hdr = 7 * channels
    spb = (ba - hdr) * 2 // channels + 2
    pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int32)
    if n < 2:
        pcm = np.concatenate([pcm, pcm[-1:]])
    nblk = -(-max(n, 2) // spb)
    pad = nblk * spb - max(n, 2)
    if pad:
        pcm = np.concatenate([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    s = pcm.reshape(nblk, spb, channels).transpose(0, 2, 1).astype(np.int64)
    return s, ba, spb


def _ms_wrap_riff(payload, n, channels, sample_rate, ba, spb):
    byte_rate = -(-sample_rate * ba // spb)
    ext = struct.pack("<HH", spb, 7) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in _MS_COEFS
    )
    fmt = struct.pack(
        "<HHIIHHH", 2, channels, sample_rate, byte_rate, ba, 4, len(ext)
    ) + ext
    return _wrap_riff_fact(fmt, n, payload)


def _encode_ms_adpcm(
    arr: np.ndarray, sample_rate: int, *, block_align: int | None = None
) -> bytes:
    """float (n, c) in [-1, 1] -> complete MS-ADPCM (format 2) WAV."""
    s, ba, spb = _ms_block_shape(arr, block_align)
    payload = _ms_adpcm_encode_blocks(s).tobytes()
    return _ms_wrap_riff(
        payload, arr.shape[0], arr.shape[1], sample_rate, ba, spb
    )


def _parse_wav_chunks(data: bytes):
    """Walk the RIFF chunk list; returns ``(fmt, block_align,
    fact_frames, payload)`` with ``fmt = (tag, channels, rate,
    bits)``."""
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
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                # the effective format lives in the SubFormat GUID's
                # first two bytes; the remainder must be the standard
                # media-type suffix
                if len(body) < 40:
                    raise ValueError("EXTENSIBLE fmt chunk too short")
                guid = body[24:40]
                if guid[2:] != (
                    b"\x00\x00\x00\x00\x10\x00"
                    b"\x80\x00\x00\xaa\x00\x38\x9b\x71"
                ):
                    raise NotImplementedError(
                        f"EXTENSIBLE SubFormat GUID {guid.hex()}"
                    )
                (tag,) = struct.unpack_from("<H", guid, 0)
            fmt = (tag, channels, rate, bits)
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    return fmt, block_align, fact_frames, payload


def decode_wav(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a RIFF/WAVE byte string to ``(samples, meta)``:
    ``samples`` is float64 in [-1, 1] of shape ``(n_frames,)`` mono or
    ``(n_frames, n_channels)``; ``meta`` carries sample_rate /
    channels / bits / n_frames / duration_s."""
    fmt, block_align, fact_frames, payload = _parse_wav_chunks(data)
    tag, channels, rate, bits = fmt
    if channels < 1:
        raise ValueError(f"WAV fmt declares {channels} channels")
    if tag == 0x11:  # IMA/DVI ADPCM
        if bits != 4:
            raise NotImplementedError(f"{bits}-bit IMA ADPCM")
        arr = _decode_adpcm_ima(payload, channels, block_align, fact_frames)
    elif tag == 2:  # MS-ADPCM
        if bits != 4:
            raise NotImplementedError(f"{bits}-bit MS-ADPCM")
        arr = _decode_ms_adpcm(payload, channels, block_align, fact_frames)
    elif tag == 7:  # G.711 mu-law
        u = np.frombuffer(payload, np.uint8)
        arr = _ulaw_decode(u).astype(np.float64) / 32768.0
    elif tag == 6:  # G.711 a-law
        a = np.frombuffer(payload, np.uint8)
        arr = _alaw_decode(a).astype(np.float64) / 32768.0
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
    samples: np.ndarray, sample_rate: int, *, bits: int = 16,
    codec: str = "pcm",
) -> bytes:
    """Encode float samples in [-1, 1] (``(n,)`` or ``(n, c)``) as
    integer-PCM WAV (8 or 16 bit), as IMA/DVI ADPCM with ``bits=4``
    (lossy 4:1 vs 16-bit, block-parallel encode), or as G.711 with
    ``codec='ulaw'`` / ``codec='alaw'`` (8-bit logarithmic
    companding, format tags 7 / 6)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if codec not in ("pcm", "ms_adpcm", "ulaw", "alaw"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "ms_adpcm":
        return _encode_ms_adpcm(arr, sample_rate)
    if bits == 4:
        if codec != "pcm":
            # bits=4 selects IMA ADPCM; an explicit 8-bit G.711
            # request alongside it is contradictory — refuse rather
            # than silently dropping the codec argument
            raise ValueError(f"bits=4 (IMA ADPCM) conflicts with codec={codec!r}")
        return _encode_adpcm_ima(arr, sample_rate)
    flat = np.clip(arr, -1.0, 1.0).reshape(-1)
    if codec in ("ulaw", "alaw"):
        s16 = np.round(flat * 32767.0).astype(np.int16)
        enc = _ulaw_encode(s16) if codec == "ulaw" else _alaw_encode(s16)
        pcm, tag, bits = enc.tobytes(), 7 if codec == "ulaw" else 6, 8
    elif codec != "pcm":
        raise ValueError(f"unknown codec {codec!r}")
    elif bits == 16:
        pcm, tag = np.round(flat * 32767.0).astype("<i2").tobytes(), 1
    elif bits == 8:
        pcm, tag = (
            (np.round(flat * 127.0) + 128).astype(np.uint8).tobytes(), 1
        )
    else:
        raise ValueError("encode_wav supports bits in (4, 8, 16)")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * block, block,
        bits,
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


def encode_wav_batch(
    signals: list, sample_rate: int, *, bits: int = 16,
    codec: str = "pcm",
) -> list[bytes]:
    """Encode MANY signals at once.  For the block codecs (IMA ADPCM
    via ``bits=4``, MS-ADPCM via ``codec='ms_adpcm'``) all signals'
    blocks are stacked into ONE kernel call, so the serial per-sample
    loop runs once for the whole batch instead of once per signal —
    the shape an Arrow/mapInPandas batch of small audio payloads
    needs (per-signal calls pay ~1000 tiny-array numpy ops each).
    PCM depths and G.711 are already one-shot vectorized per signal
    and just loop."""
    if codec not in ("pcm", "ms_adpcm", "ulaw", "alaw"):
        raise ValueError(f"unknown codec {codec!r}")
    if bits == 4 and codec not in ("pcm", "ms_adpcm"):
        raise ValueError(
            f"bits=4 (IMA ADPCM) conflicts with codec={codec!r}"
        )
    arrs = []
    for s in signals:
        a = np.asarray(s, dtype=np.float64)
        arrs.append(a[:, None] if a.ndim == 1 else a)
    ms = codec == "ms_adpcm"
    if bits != 4 and not ms:
        return [
            encode_wav(a, sample_rate, bits=bits, codec=codec)
            for a in arrs
        ]
    if not arrs:
        return []
    channel_counts = {a.shape[1] for a in arrs}
    if len(channel_counts) > 1:
        out: list[bytes | None] = [None] * len(arrs)
        for c in channel_counts:
            ix = [i for i, a in enumerate(arrs) if a.shape[1] == c]
            for i, enc in zip(
                ix,
                encode_wav_batch(
                    [arrs[j] for j in ix], sample_rate, bits=bits,
                    codec=codec,
                ),
            ):
                out[i] = enc
        return out
    shaper = _ms_block_shape if ms else _adpcm_block_shape
    kernel = _ms_adpcm_encode_blocks if ms else _adpcm_encode_blocks
    wrapper = _ms_wrap_riff if ms else _adpcm_wrap_riff
    shaped = [shaper(a, None) for a in arrs]
    ba, spb = shaped[0][1], shaped[0][2]
    bodies = kernel(np.concatenate([s for s, _, _ in shaped], axis=0))
    outs, off = [], 0
    for a, (s, _, _) in zip(arrs, shaped):
        nb = s.shape[0]
        payload = bodies[off : off + nb].tobytes()
        off += nb
        outs.append(
            wrapper(
                payload, a.shape[0], a.shape[1], sample_rate, ba, spb
            )
        )
    return outs


def decode_wav_batch(datas: list) -> list[tuple[np.ndarray, dict]]:
    """Decode MANY WAV byte strings at once.  ADPCM payloads sharing
    (channels, block_align) are stacked into one block-parallel kernel
    call; everything else routes through :func:`decode_wav`."""
    parsed = [_parse_wav_chunks(d) for d in datas]
    results: list = [None] * len(datas)
    groups: dict[tuple[int, int, int], list[int]] = {}
    for i, (fmt, ba, _fact, payload) in enumerate(parsed):
        tag, channels, _rate, bits = fmt
        if tag == 0x11 and bits == 4 and channels >= 1:
            if ba <= 4 * channels or (ba - 4 * channels) % (4 * channels):
                raise ValueError(
                    f"IMA ADPCM block align {ba} invalid for "
                    f"{channels} channels"
                )
            if len(payload) < ba:
                raise ValueError("IMA ADPCM data shorter than one block")
            groups.setdefault((tag, channels, ba), []).append(i)
        elif tag == 2 and bits == 4 and channels >= 1:
            hdr = 7 * channels
            if ba <= hdr or ((ba - hdr) * 2) % channels:
                raise ValueError(
                    f"MS-ADPCM block align {ba} invalid for "
                    f"{channels} channels"
                )
            if len(payload) < ba:
                raise ValueError("MS-ADPCM data shorter than one block")
            groups.setdefault((tag, channels, ba), []).append(i)
        else:
            results[i] = decode_wav(datas[i])
    for (tag, channels, ba), idxs in groups.items():
        mats, counts = [], []
        for i in idxs:
            payload = parsed[i][3]
            usable = len(payload) - len(payload) % ba
            m = np.frombuffer(payload[:usable], np.uint8).reshape(-1, ba)
            mats.append(m)
            counts.append(m.shape[0])
        decode_blocks = (
            _ms_adpcm_decode_blocks if tag == 2 else _adpcm_decode_blocks
        )
        frames = decode_blocks(np.concatenate(mats), channels)
        off = 0
        for i, nb in zip(idxs, counts):
            f = frames[off : off + nb].reshape(-1, channels)
            off += nb
            (_tag, ch, rate, bits), _ba, fact, _p = parsed[i]
            if fact is not None:
                f = f[:fact]
            arr = f.astype(np.float64) / 32768.0
            n = arr.shape[0]
            if ch == 1:
                arr = arr.reshape(-1)
            results[i] = (
                arr,
                {
                    "sample_rate": int(rate),
                    "channels": int(ch),
                    "bits": int(bits),
                    "n_frames": int(n),
                    "duration_s": n / rate if rate else 0.0,
                },
            )
    return results
