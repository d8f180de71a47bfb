"""Pure-Python FLAC codec for the multimodal audio column.

FLAC (Free Lossless Audio Codec) is an open, fully published format
(xiph.org specification): metadata blocks, frame headers with CRC-8,
per-channel subframes (CONSTANT / VERBATIM / FIXED / LPC), Rice-coded
residuals, stereo decorrelation (left/side, right/side, mid/side),
and a CRC-16 frame footer.  Implementable from the spec with stdlib
+ numpy — no libFLAC.

Supported surface (loud on the rest):

- decode: all four subframe types (LPC any order), Rice methods 0/1
  incl. escape partitions, wasted bits, all four channel assignments,
  4/8/16/24-bit samples, any block size, STREAMINFO md5 verification;
- encode: FIXED predictors (best of orders 0..4 per channel per
  block), single-partition Rice residuals, independent channels,
  16-bit samples — a valid subset every conforming decoder reads;
- Ogg encapsulation (RFC 3533 pages, CRC-32, lacing-value packet
  reassembly, the \x7fFLAC mapping header) both directions;
- NOT supported: variable-blocksize encode, non-byte-multiple md5
  verification (12/20-bit streams decode, their md5 check is
  skipped).

Scale shape: like WAV/JPEG, payloads decode task-side inside
``mapInPandas`` batches — one task per file, scaling with file count.
"""

from __future__ import annotations

import struct

import numpy as np


def is_flac(data: bytes) -> bool:
    return bytes(data[:4]) == b"fLaC"


# --- CRCs (FLAC polynomials, spec section on frame CRCs) -------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[(c ^ b) & 0xFF])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ (c << 8)) & 0xFFFF
    return c


# --- bit I/O ---------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsOut:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


# --- decode ----------------------------------------------------------------

_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = first & (0x3F >> n)
    for _ in range(n):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _read_residual(bits: _Bits, n: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 + method
    escape = (1 << plen) - 1
    po = bits.read(4)
    res: list[int] = []
    nparts = 1 << po
    for p in range(nparts):
        count = (n >> po) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                res.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                res.append((v >> 1) ^ -(v & 1))  # zigzag
    return res


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_subframe(bits: _Bits, n: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = [v] * n
    elif stype == 1:  # VERBATIM
        out = [bits.read_signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        res = _read_residual(bits, n, order)
        coefs = _FIXED_COEFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 0x0F:
            raise ValueError("invalid LPC precision")
        prec += 1
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _read_residual(bits, n, order)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a FLAC byte string to ``(samples, meta)`` with the WAV
    decoder's conventions: float64 in [-1, 1], ``(n,)`` mono or
    ``(n, channels)``, meta with sample_rate/channels/bits/n_frames/
    duration_s.  Verifies the STREAMINFO md5 when present."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("not a FLAC byte stream (bad fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            bits = _Bits(body)
            bits.read(16)  # min blocksize
            bits.read(16)
            bits.read(24)
            bits.read(24)
            rate = bits.read(20)
            channels = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            md5 = body[18:34]
            info = (rate, channels, bps, total, md5)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total, md5 = info

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(data):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at {pos}")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ca = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            n = bits.read(8) + 1
        elif bs_code == 7:
            n = bits.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            n = _BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        bps_f = _SAMPLE_SIZES.get(ss_code, bps) if ss_code else bps
        hdr_end = bits.byte + (1 if bits.bit else 0)
        crc8 = data[hdr_end]
        if _crc8(data[frame_start:hdr_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        bits = _Bits(data, hdr_end + 1)

        if ca < 8:
            nch = ca + 1
            if nch != channels:
                raise ValueError("frame channel count != STREAMINFO")
            subs = [
                _decode_subframe(bits, n, bps_f) for _ in range(nch)
            ]
        elif ca in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation on non-stereo")
            if ca == 8:  # left/side
                left = _decode_subframe(bits, n, bps_f)
                side = _decode_subframe(bits, n, bps_f + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ca == 9:  # right/side
                side = _decode_subframe(bits, n, bps_f + 1)
                right = _decode_subframe(bits, n, bps_f)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, n, bps_f)
                side = _decode_subframe(bits, n, bps_f + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise ValueError(f"reserved channel assignment {ca}")
        bits.align()
        crc_end = bits.byte
        (crc16,) = struct.unpack_from(">H", data, crc_end)
        if _crc16(data[frame_start:crc_end]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = crc_end + 2
        for c in range(channels):
            chans[c].extend(subs[c])

    arr = np.array(chans, dtype=np.int64).T  # (n, channels)
    if total:
        arr = arr[:total]
    if md5 != b"\x00" * 16 and bps in (8, 16, 24, 32):
        # the md5 covers the unencoded samples as whole little-endian
        # bytes; bit depths that are not byte multiples (12/20-bit)
        # have a packing this subset does not model — skip the check
        # rather than false-fail on a valid stream
        import hashlib

        if bps == 16:
            raw = arr.astype("<i2").tobytes()
        elif bps == 8:
            raw = arr.astype(np.int8).tobytes()
        elif bps == 32:
            raw = arr.astype("<i4").tobytes()
        else:  # 24-bit: 3-byte little-endian
            b = arr.astype("<i4").tobytes()
            raw = b"".join(
                b[i : i + 3] for i in range(0, len(b), 4)
            )
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("decoded audio md5 != STREAMINFO md5")
    scale = float(1 << (bps - 1))
    out = arr.astype(np.float64) / scale
    n_frames = out.shape[0]
    meta = {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bps),
        "n_frames": int(n_frames),
        "duration_s": n_frames / rate if rate else 0.0,
    }
    if channels == 1:
        out = out.reshape(-1)
    return out, meta


# --- encode ----------------------------------------------------------------


def _rice_write(bw: _BitsOut, res: np.ndarray, param: int):
    zz = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
    for v in zz:
        q = int(v) >> param
        bw.write(1, q + 1)  # q zeros then a 1
        if param:
            bw.write(int(v) & ((1 << param) - 1), param)


def _best_fixed_order(x: np.ndarray) -> tuple[int, np.ndarray]:
    best, best_res = 0, x
    best_cost = np.abs(x).sum()
    cur = x
    for order in range(1, 5):
        cur = np.diff(cur)
        if len(x) <= order:
            break
        cost = np.abs(cur).sum() + (1 << 14) * order
        if cost < best_cost:
            best, best_res, best_cost = order, cur, cost
    return best, best_res


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    p = 0
    while (1 << p) < mean * 2 and p < 14:
        p += 1
    return p


def _rice_cost(res: np.ndarray, param: int) -> int:
    """Exact bit count of a single-partition Rice coding."""
    if len(res) == 0:
        return 0
    zz = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
    return int((zz >> param).sum()) + len(res) * (param + 1)


def _lpc_analyze(x: np.ndarray, max_order: int = 8):
    """Welch-windowed autocorrelation + Levinson-Durbin.  Yields the
    float predictor coefficients at orders 2/4/max (snapshots of the
    recursion) — the window shapes ANALYSIS only; losslessness never
    depends on it.  None for blocks too short or degenerate."""
    n = len(x)
    if n < max_order + 2:
        return None
    xf = x.astype(np.float64)
    t = (np.arange(n) - (n - 1) / 2.0) / ((n + 1) / 2.0)
    xw = xf * (1.0 - t * t)
    r = np.array(
        [float(np.dot(xw[: n - k], xw[k:])) for k in range(max_order + 1)]
    )
    if r[0] <= 0:
        return None
    a = np.zeros(0)
    err = r[0]
    snaps = []
    for i in range(max_order):
        acc = r[i + 1] - (float(a @ r[1 : i + 1][::-1]) if i else 0.0)
        k = acc / err
        a = np.concatenate([a - k * a[::-1], [k]])
        err *= 1.0 - k * k
        if (i + 1) in (2, 4, max_order):
            snaps.append(a.copy())
        if err <= 0:
            break
    return snaps or None


def _quantize_lpc(a: np.ndarray, precision: int = 12):
    """FLAC-style coefficient quantization with error feedback;
    returns (int64 coefs, shift) or None when degenerate."""
    import math

    cmax = float(np.max(np.abs(a)))
    if cmax <= 0 or not np.all(np.isfinite(a)):
        return None
    shift = precision - 1 - (math.floor(math.log2(cmax)) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.empty(len(a), dtype=np.int64)
    err = 0.0
    for i, c in enumerate(a):
        v = c * (1 << shift) + err
        qi = max(-lim, min(lim - 1, round(v)))
        err = v - qi
        q[i] = qi
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """Integer residual matching the decoder's reconstruction
    EXACTLY: pred[i] = (sum_j q[j] * x[i-1-j]) >> shift (arithmetic
    shift), res = x[order:] - pred."""
    order = len(q)
    acc = np.convolve(x, q)[order - 1 : len(x) - 1]
    return x[order:] - (acc >> shift)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    block_size: int = 4096,
    predictor: str = "auto",
) -> bytes:
    """Encode float samples in [-1, 1] (``(n,)`` or ``(n, c)``) as a
    conforming FLAC stream: 16-bit, independent channels,
    single-partition Rice residuals, STREAMINFO md5.  ``predictor``:
    ``"fixed"`` restricts to the FIXED orders 0..4, ``"lpc"``/
    ``"auto"`` also evaluate Levinson-Durbin LPC subframes at orders
    2/4/8 (12-bit quantized coefficients) and emit whichever costs
    fewest EXACT Rice bits per channel per block — all candidates
    are lossless by construction, the choice only moves size."""
    import hashlib

    if predictor not in ("auto", "fixed", "lpc"):
        raise ValueError(f"unknown predictor mode {predictor!r}")

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot FLAC-encode an empty signal")
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int64)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()

    frames = bytearray()
    frame_sizes = []
    fno = 0
    for start in range(0, n, block_size):
        block = pcm[start : start + block_size]
        bs = block.shape[0]
        bw = _BitsOut()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(channels - 1, 4)  # independent
        bw.write(4, 3)  # 16-bit
        bw.write(0, 1)
        # UTF-8 coded frame number (the full scheme: 1..7 bytes)
        if fno < 0x80:
            bw.write(fno, 8)
        else:
            v = fno
            nbytes = 2
            # an n-byte coding carries (7 - n) + 6*(n - 1) = 5n + 1
            # payload bits; pick the shortest form
            while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
                nbytes += 1
            payload_bits = 6 * (nbytes - 1)
            lead = ((0xFF << (8 - nbytes)) & 0xFF) | (v >> payload_bits)
            bw.write(lead & 0xFF, 8)
            for k in range(nbytes - 1):
                shift = payload_bits - 6 * (k + 1)
                bw.write(0x80 | ((v >> shift) & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        hdr += bytes([_crc8(hdr)])

        bw = _BitsOut()
        for c in range(channels):
            x = block[:, c]
            order, res = _best_fixed_order(x)
            param = min(_rice_param(res), 14)
            # exact subframe bit costs: warmup + residual (+ LPC's
            # precision/shift/coefficient fields)
            best = (
                16 * order + _rice_cost(res, param),
                "fixed", order, res, param, None, None,
            )
            if predictor != "fixed":
                for a in _lpc_analyze(x) or []:
                    qz = _quantize_lpc(a)
                    if qz is None:
                        continue
                    q, shift = qz
                    lres = _lpc_residual(x, q, shift)
                    lparam = min(_rice_param(lres), 14)
                    cost = (
                        16 * len(q) + 4 + 5 + 12 * len(q)
                        + _rice_cost(lres, lparam)
                    )
                    if cost < best[0]:
                        best = (
                            cost, "lpc", len(q), lres, lparam, q, shift,
                        )
            _cost, kind, order, res, param, q, shift = best
            bw.write(0, 1)
            if kind == "fixed":
                bw.write(8 + order, 6)  # FIXED subframe
            else:
                bw.write(32 + order - 1, 6)  # LPC subframe
            bw.write(0, 1)  # no wasted bits
            for w in x[:order]:
                bw.write(int(w), 16)
            if kind == "lpc":
                bw.write(12 - 1, 4)  # coefficient precision
                bw.write(shift, 5)
                for qc in q:
                    bw.write(int(qc), 12)
            bw.write(0, 2)  # rice method 0
            bw.write(0, 4)  # partition order 0
            bw.write(param, 4)
            _rice_write(bw, res, param)
        bw.align()
        body = hdr + bytes(bw.out)
        body += struct.pack(">H", _crc16(body))
        frames += body
        frame_sizes.append(len(body))
        fno += 1

    si = _BitsOut()
    # fixed-blocksize stream: min == max == block_size (the short
    # last block is exempt from min/max per spec)
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min(frame_sizes), 24)
    si.write(max(frame_sizes), 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    si.align()
    streaminfo = bytes(si.out) + md5
    out = b"fLaC"
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo
    return out + bytes(frames)


# --- Ogg encapsulation (RFC 3533 + the FLAC-to-Ogg mapping) ----------------

_OGG_CRC_TAB = _crc_table(0x04C11DB7, 32)


def _ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) ^ int(_OGG_CRC_TAB[((c >> 24) ^ b) & 0xFF])) & 0xFFFFFFFF
    return c


def is_ogg_flac(data: bytes) -> bool:
    return bytes(data[:4]) == b"OggS" and b"\x7fFLAC" in bytes(data[:128])


def _ogg_packets(data: bytes) -> list[bytes]:
    """Walk the Ogg pages of the FIRST logical stream (CRC-32
    verified) and reassemble its packets via lacing values."""
    data = bytes(data)
    pos = 0
    packets: list[bytes] = []
    partial = b""
    serial = None
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at {pos}")
        (
            version, htype, _granule, ser, _seq, crc, nsegs,
        ) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise NotImplementedError(f"Ogg version {version}")
        lacing = data[pos + 27 : pos + 27 + nsegs]
        body_start = pos + 27 + nsegs
        body_len = sum(lacing)
        page = bytearray(data[pos : body_start + body_len])
        page[22:26] = b"\x00" * 4
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        if serial is None:
            serial = ser
        if ser == serial:
            off = body_start
            for lv in lacing:
                partial += data[off : off + lv]
                off += lv
                if lv < 255:
                    packets.append(partial)
                    partial = b""
        pos = body_start + body_len
    if partial:
        packets.append(partial)
    return packets


def decode_ogg_flac(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode Ogg-encapsulated FLAC (the \\x7fFLAC mapping): walk the
    Ogg pages (CRC-32 verified, lacing-value packet reassembly),
    rebuild the NATIVE FLAC stream — STREAMINFO from the mapping
    header packet, remaining metadata packets, then frame packets —
    and hand it to :func:`decode_flac`."""
    packets = _ogg_packets(data)
    if not packets or packets[0][:5] != b"\x7fFLAC":
        raise ValueError("first Ogg packet is not the FLAC mapping header")
    head = packets[0]
    # mapping header: 0x7f 'FLAC' major minor nheaders(2, BE) 'fLaC'
    # followed by the native STREAMINFO metadata block
    if head[9:13] != b"fLaC":
        raise ValueError("mapping header missing native fLaC signature")
    native = bytearray(b"fLaC")
    native += head[13:]  # STREAMINFO block (header + body)
    (nheaders,) = struct.unpack_from(">H", head, 7)
    # force last-metadata flags so the rebuilt stream terminates its
    # metadata where the packets actually end
    meta_pkts = packets[1 : 1 + nheaders] if nheaders else []
    rest = packets[1 + len(meta_pkts) :]
    if not nheaders:
        # unknown count: packets before the first frame sync are
        # metadata blocks (they start with a block-type byte < 0x80
        # or 0xFF sync for frames)
        meta_pkts = []
        rest = []
        for p in packets[1:]:
            if p[:1] == b"\xff" and not rest:
                rest = [p]
            elif rest:
                rest.append(p)
            else:
                meta_pkts.append(p)
    native[4] &= 0x7F
    for i, p in enumerate(meta_pkts):
        native += p
    # set the last-metadata flag on the final block header
    if meta_pkts:
        # find the last metadata block's header position: rebuild
        # rather than patch — append order is known
        rebuilt = bytearray(b"fLaC")
        blocks = [bytes(native[4 : 4 + 4 + struct.unpack(">I", b"\x00" + bytes(native[5:8]))[0]])]
        off = 4 + len(blocks[0])
        while off < len(native):
            (sz,) = struct.unpack(">I", b"\x00" + bytes(native[off + 1 : off + 4]))
            blocks.append(bytes(native[off : off + 4 + sz]))
            off += 4 + sz
        for i, b in enumerate(blocks):
            hdr = bytearray(b)
            if i == len(blocks) - 1:
                hdr[0] |= 0x80
            else:
                hdr[0] &= 0x7F
            rebuilt += hdr
        native = rebuilt
    else:
        native[4] |= 0x80
    for p in rest:
        native += p
    return decode_flac(bytes(native))


def encode_ogg_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    block_size: int = 4096,
    tags: dict | None = None,
) -> bytes:
    """Wrap :func:`encode_flac` output in Ogg pages per the FLAC
    mapping: mapping-header packet on its own beginning-of-stream
    page, an optional VORBIS_COMMENT header packet (``tags``, the
    normalized names of ``sources/audiotags.py``), then one frame per
    packet, one packet per page."""
    native = encode_flac(samples, sample_rate, block_size=block_size)
    # split: magic(4) + STREAMINFO block, then frames
    (si_size,) = struct.unpack(">I", b"\x00" + native[5:8])
    si_end = 4 + 4 + si_size
    streaminfo = native[4:si_end]
    frames_blob = native[si_end:]
    # split frames on sync codes by re-walking with the decoder's
    # frame parser (frames are self-delimiting via CRC-16 at known
    # positions — reuse the simple fixed layout: our encoder writes
    # frames back to back, so split by decoding lengths)
    n_headers = 1 if tags else 0
    if tags:
        # more header packets follow: STREAMINFO must drop its
        # last-metadata-block flag (conformant readers end the
        # metadata chain at the flagged block)
        streaminfo = bytes([streaminfo[0] & 0x7F]) + streaminfo[1:]
    packets = [
        b"\x7fFLAC\x01\x00"
        + struct.pack(">H", n_headers)
        + b"fLaC"
        + streaminfo
    ]
    header_pkts = []
    if tags:
        from . import audiotags as _audiotags

        body = _audiotags._vorbis_block(tags)
        # final header packet carries the last-metadata flag (0x80)
        header_pkts.append(
            bytes([0x80 | 4]) + struct.pack(">I", len(body))[1:] + body
        )

    def pages(packet: bytes, *, bos=False, eos=False, granule=0, seq=[0]):
        out = bytearray()
        remaining = packet
        first = True
        while True:
            # <= 255*254 bytes per page keeps the lacing count < 256
            # even when the final lacing value is 255-terminated
            chunk = remaining[: 255 * 254]
            remaining = remaining[len(chunk) :]
            n = len(chunk)
            lacing = [255] * (n // 255) + [n % 255]
            htype = (
                (0x01 if not first else 0)  # packet continuation
                | (0x02 if bos and first else 0)
                | (0x04 if eos and not remaining else 0)
            )
            hdr = b"OggS" + struct.pack(
                "<BBqIIIB",
                0, htype, granule, 0x464C4143, seq[0], 0, len(lacing),
            ) + bytes(lacing)
            seq[0] += 1
            page = bytearray(hdr + chunk)
            crc = _ogg_crc(bytes(page))
            page[22:26] = struct.pack("<I", crc)
            out += page
            first = False
            if not remaining:
                return bytes(out)

    out = bytearray(pages(packets[0], bos=True))
    for hp in header_pkts:
        out += pages(hp)
    # Frame packets: split the blob at byte-aligned sync codes.  FLAC
    # entropy data CAN contain sync-looking bytes, so a split may land
    # mid-frame — harmless here, because the decode side reassembles
    # packets in order and re-parses frames from the concatenation
    # (packet boundaries are advisory in the FLAC mapping).
    pos = 0
    frame_spans = []
    while pos < len(frames_blob):
        nxt = pos + 1
        end = len(frames_blob)
        while nxt < len(frames_blob) - 1:
            if (
                frames_blob[nxt] == 0xFF
                and (frames_blob[nxt + 1] >> 2) == 0x3E
            ):
                end = nxt
                break
            nxt += 1
        frame_spans.append((pos, end))
        pos = end
    total = 0
    for i, (s, e) in enumerate(frame_spans):
        total += block_size  # granule: last sample position (approx
        # for the final short block — advisory in this subset)
        out += pages(
            frames_blob[s:e], eos=(i == len(frame_spans) - 1),
            granule=total,
        )
    return bytes(out)
