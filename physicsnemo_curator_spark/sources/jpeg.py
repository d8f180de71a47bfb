"""Pure-Python baseline JPEG codec (decode + encode) for the
multimodal column pack.

Like :mod:`physicsnemo_curator_spark.sources.png`, this closes an
encoded-format gap from public knowledge alone: baseline JPEG is the
ITU-T T.81 / ISO 10918-1 specification — marker segments, Huffman
entropy coding, 8x8 DCT blocks, YCbCr color — implementable with
stdlib ``struct`` + numpy.  The reference pipeline has no JPEG decode
(multimodal is a north-star addition per SURVEY §6); PIL-based decode
remains the production path where PIL exists, this codec makes the
Spark kernels work end-to-end without it.

Supported surface (honest subset, loud on the rest):

- baseline sequential DCT (SOF0), 8-bit samples, interleaved OR
  per-component non-interleaved scans;
- **extended sequential DCT (SOF1) with 12-bit samples** (uint16 in
  [0, 4095], 16-bit quant tables, extended Huffman category range) —
  the scientific/medical-imaging depth; encoder via
  ``encode_jpeg(..., precision=12)``;
- grayscale (1 component) and YCbCr (3 components) with any sampling
  factors up to 2x2 (4:4:4, 4:2:2, 4:2:0 all covered), nearest
  chroma upsampling;
- multiple DQT/DHT segments, 16-bit quant entries, restart markers
  (DRI/RSTn), 0xFF00 byte stuffing;
- **progressive DCT (SOF2)**: spectral selection, successive
  approximation (DC and AC first + refinement scans, EOB runs),
  restart markers — the web's default ``libjpeg`` progression
  decodes;
- **lossless sequential (SOF3, Annex H)**: all seven Table H.1
  predictors, 2..16-bit precision, modulo-65536 wraps via category
  16, bit-exact round-trips; encoder via ``encode_jpeg_lossless``
  (the DICOM-adjacent mode scientific archives carry);
- **CMYK/YCCK 4-component sequential scans** (Adobe APP14
  transforms 0/2, incl. transform-0 RGB);
- **hierarchical lossless pyramid (Annex J)**: DHP full-geometry
  declaration, decimated SOF3 first frame, EXP reference expansion
  (the ``(a+b+1)>>1`` interpolation filter) + differential lossless
  SOF7 refinement frames, bit-exact at every stage; encoder via
  ``encode_jpeg_hierarchical`` (progressive transmission with exact
  final delivery);
- NOT supported (``NotImplementedError``): arithmetic coding,
  hierarchical differential DCT stages (SOF5/SOF6), 12-bit
  progressive, lossless restart markers / nonzero point transform.

The encoder emits baseline 4:4:4 (or grayscale) with the T.81 Annex K
example tables (quality-scaled quantization) — the round-trip partner
for tests and the ``encode`` half of the multimodal resize kernel.

Decode is lossy-compression-exact: the decoder reproduces the
bit-stream's dequantized IDCT exactly (float64 IDCT, rounded once),
so encoder→decoder round-trips are within quantization error of the
source; flat-color images round-trip exactly whenever the DC quant
step resolves the level offset (base tables: quality >= 50), and
mid-gray at any quality.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (T.81 Figure A.6) ---------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8-point DCT-II matrix: spatial = C.T @ coefs @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# --- T.81 Annex K example tables (public spec) -----------------------------

K_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
K_CHROMA_QUANT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)
# (bits per code length 1..16, symbol values) — Annex K.3
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# 12-bit extended-sequential (SOF1) Huffman tables.  T.81 fixes only
# the DHT *format*; the code assignment is the encoder's choice.  DC
# covers difference categories 0..15 (12-bit DC diffs reach category
# 15) with short codes for the common small categories; AC gives all
# 226 possible run/size symbols (sizes 1..14 plus EOB and ZRL) a flat
# 10-bit code — correctness-first, Kraft sum 226/1024 < 1.
X12_DC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
    list(range(16)),
)
X12_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | s for s in range(1, 15) for r in range(16)],
)


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


def _build_huffman(bits, values):
    """(length, code) -> symbol map from the DHT counts-per-length."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, stops at
    markers (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        # drop already-consumed high bits: without this mask bitbuf
        # grows into an unbounded Python int and every shift becomes
        # O(stream length) — measured quadratic decode on large scans
        self.bitbuf &= (1 << self.nbits) - 1
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs; pad for now
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # real marker (EOI etc.): pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_to_restart(self):
        """Skip to just past the next RSTn marker and byte-align."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker, hit end of stream")


def _extend(v: int, size: int) -> int:
    # T.81 F.12: map the raw SIZE-bit value to its signed amplitude
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline JPEG byte string to ``(pixels, meta)``:
    uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG byte stream (bad SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    prog = None  # progressive coefficient state, created at first SOS
    seq = None  # sequential multi-scan planes, created at first partial SOS
    hier = None  # hierarchical pyramid state, created at DHP
    restart_interval = 0
    adobe_transform = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them, or the fill byte parses as the
        # marker and garbage as the segment length
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(data):
                raise ValueError("truncated JPEG after fill bytes")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            # byte 11 of the Adobe segment: 0 = no transform
            # (RGB/CMYK stored directly), 1 = YCbCr, 2 = YCCK
            adobe_transform = seg[11] if len(seg) > 11 else 0
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive.  SOF0 and (here) SOF2 are 8-bit; SOF1 also
            # carries 12-bit samples (T.81 Table B.2).
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 and not (prec == 12 and marker == 0xC1):
                raise NotImplementedError(
                    f"{prec}-bit precision for SOF{marker - 0xC0}"
                )
            comps = []
            for c in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "progressive": marker == 0xC2,
            }
            if nc == 4 and marker == 0xC2:
                raise NotImplementedError("4-component progressive scans")
        elif marker in (0xC3, 0xC7):
            # SOF3 lossless sequential (Annex H) / SOF7 differential
            # lossless (a hierarchical refinement frame, Annex J)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if not 2 <= prec <= 16:
                raise ValueError(
                    f"SOF{marker - 0xC0} precision {prec} out of range"
                )
            comps = []
            for c in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "progressive": False, "lossless": True,
                "differential": marker == 0xC7,
            }
            if marker == 0xC7 and hier is None:
                raise ValueError(
                    "differential frame (SOF7) outside a hierarchical "
                    "stream (no DHP)"
                )
        elif marker == 0xDE:  # DHP: hierarchical full geometry
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
            hier = {
                "h": h, "w": w, "prec": prec, "comps": comps,
                "planes": {}, "exp": None,
            }
        elif marker == 0xDF:  # EXP: expand reference before next frame
            if hier is None:
                raise ValueError("EXP marker outside a hierarchical stream")
            hier["exp"] = (seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC5, 0xC6, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only sequential (SOF0/SOF1), "
                "progressive (SOF2), lossless (SOF3) and the "
                "hierarchical lossless pyramid (DHP/EXP/SOF7) are "
                "supported — differential DCT stages are codec-gated"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is not None:
                frame["adobe"] = adobe_transform
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            pos = pos + 2 + seglen
            if hier is not None and frame is not None and not frame.get(
                "lossless"
            ):
                # a DCT first frame under DHP would silently decode
                # only the decimated stage — refuse loudly instead
                raise NotImplementedError(
                    "hierarchical DCT pyramids (DHP + SOF0/1/2) — "
                    "only the lossless pyramid (SOF3 + SOF7) is "
                    "supported"
                )
            if frame is not None and frame.get("lossless"):
                ss = seg[1 + 2 * ns]       # predictor selector
                al = seg[3 + 2 * ns] & 0x0F  # point transform
                if hier is not None:
                    planes = frame.setdefault("hplanes", {})
                    if frame.get("differential"):
                        pos = _decode_diff_scan(
                            data, pos, frame, scan, huff,
                            restart_interval, planes, al,
                        )
                    else:
                        pos = _decode_lossless_scan(
                            data, pos, frame, scan, huff,
                            restart_interval, planes, ss, al,
                        )
                    if len(planes) == len(frame["comps"]):
                        _hier_absorb(hier, frame)
                    continue
                if seq is None:
                    seq = {}
                pos = _decode_lossless_scan(
                    data, pos, frame, scan, huff, restart_interval,
                    seq, ss, al,
                )
                continue
            if frame is not None and frame["progressive"]:
                if prog is None:
                    prog = _init_progressive(frame)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                a = seg[3 + 2 * ns]
                pos = _decode_prog_scan(
                    data, pos, frame, scan, huff, restart_interval,
                    prog, ss, se, a >> 4, a & 0x0F,
                )
                continue
            if frame is not None and ns < len(frame["comps"]):
                # sequential multi-scan (T.81 B.2.3, Ns < Nf): decode
                # each non-interleaved scan into persistent component
                # planes; assemble at EOI once every scan has landed
                if seq is None:
                    seq = _init_sequential(frame)
                pos = _decode_seq_scan(
                    data, pos, frame, scan, quant, huff,
                    restart_interval, seq,
                )
                continue
            if seq is not None:
                raise NotImplementedError(
                    "mixed interleaved + non-interleaved scans"
                )
            return _decode_scan(
                data, pos, frame, scan, quant, huff, restart_interval
            )
        pos = pos + 2 + seglen
    if hier is not None:
        return _finish_hier(hier)
    if prog is not None:
        return _finish_progressive(frame, quant, prog)
    if seq is not None and frame.get("lossless"):
        return _finish_lossless(frame, seq)
    if seq is not None:
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _assemble_image(
            seq, comps, frame["h"], frame["w"], hmax, vmax,
            frame.get("prec", 8), frame.get("adobe"),
        )
    raise ValueError("no SOS marker found")


# --- progressive mode (T.81 Annex G) ---------------------------------------


def _init_progressive(frame):
    """Per-component coefficient planes + block geometry for a SOF2
    frame.  Coefficients live in ZIGZAG order per block and accumulate
    across scans; IDCT happens once at EOI."""
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component images")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2x2")
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    prog = {"mcus_x": mcus_x, "mcus_y": mcus_y, "comps": {}}
    for c in comps:
        # padded dims (MCU-interleaved scans) vs true dims (the block
        # count a non-interleaved scan walks, T.81 A.2.3)
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        prog["comps"][c["id"]] = {
            "bw_pad": mcus_x * c["h"],
            "bh_pad": mcus_y * c["v"],
            "bw": -(-cw // 8),
            "bh": -(-ch // 8),
            "coef": np.zeros(
                (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
            ),
        }
    return prog


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First offset >= pos holding a REAL marker (not 0xFF00 stuffing,
    not a fill 0xFF, not RSTn) — where the next header segment starts
    after a progressive scan's entropy data."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt not in (0x00, 0xFF) and not (0xD0 <= nxt <= 0xD7):
                return pos
        pos += 1
    return len(data)


def _refine_nonzero(reader, coef, k, se, p1):
    """Correction-bit pass over the remaining nonzero coefficients of
    a band (T.81 G.1.2.3): each already-nonzero coefficient consumes
    one bit; a 1 moves its magnitude outward by 1 << Al."""
    while k <= se:
        c = int(coef[k])
        if c != 0 and reader.read_bit():
            if (c if c > 0 else -c) & p1 == 0:
                coef[k] = c + (p1 if c > 0 else -p1)
        k += 1


def _decode_prog_scan(
    data, pos, frame, scan, huff, restart_interval, prog, ss, se, ah, al
):
    """Decode ONE progressive scan's entropy data into the coefficient
    planes; returns the offset of the next marker segment."""
    comps = frame["comps"]
    reader = _BitReader(data, pos)
    order = [c for c in comps if c["id"] in scan]
    if len(order) != len(scan):
        raise ValueError("SOS names a component missing from SOF2")
    eobrun = 0
    pred = {cid: 0 for cid in scan}
    unit = 0  # MCUs (interleaved) or blocks (non-interleaved)

    def maybe_restart():
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_to_restart()
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    if ss == 0:  # DC scan (interleaved when ns > 1)
        if se != 0:
            raise ValueError("DC progressive scan must have Se = 0")
        if len(order) > 1:
            for my in range(prog["mcus_y"]):
                for mx in range(prog["mcus_x"]):
                    maybe_restart()
                    for c in order:
                        st = prog["comps"][c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                coef = st["coef"][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ]
                                _dc_unit(
                                    reader, coef, scan[c["id"]][0],
                                    huff, pred, c["id"], ah, al,
                                )
                    unit += 1
        else:
            c = order[0]
            st = prog["comps"][c["id"]]
            for row in range(st["bh"]):
                for col in range(st["bw"]):
                    maybe_restart()
                    _dc_unit(
                        reader, st["coef"][row, col], scan[c["id"]][0],
                        huff, pred, c["id"], ah, al,
                    )
                    unit += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1)
        if len(order) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        c = order[0]
        ac_tab = huff[(1, scan[c["id"]][1])]
        st = prog["comps"][c["id"]]
        p1 = 1 << al
        for row in range(st["bh"]):
            for col in range(st["bw"]):
                maybe_restart()
                unit += 1
                coef = st["coef"][row, col]
                if ah == 0:  # first pass for these bit positions
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index out of band")
                        coef[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
                else:  # refinement pass
                    if eobrun > 0:
                        eobrun -= 1
                        _refine_nonzero(reader, coef, ss, se, p1)
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                _refine_nonzero(reader, coef, k, se, p1)
                                break
                            # ZRL: pass 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement scan symbol with size > 1"
                                )
                            newval = p1 if reader.read_bit() else -p1
                        while k <= se:
                            cv = int(coef[k])
                            if cv != 0:
                                if reader.read_bit():
                                    if (cv if cv > 0 else -cv) & p1 == 0:
                                        coef[k] = cv + (p1 if cv > 0 else -p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            coef[k] = newval
                        k += 1
    return _next_marker_pos(data, reader.pos)


def _dc_unit(reader, coef, dc_id, huff, pred, cid, ah, al):
    if ah == 0:
        size = reader.decode_symbol(huff[(0, dc_id)])
        diff = _extend(reader.read_bits(size), size)
        pred[cid] += diff
        coef[0] = pred[cid] << al
    elif reader.read_bit():
        # two's-complement append: OR-ing the bit in equals +1<<Al for
        # the stored signed value in both signs
        coef[0] = int(coef[0]) | (1 << al)


def _finish_progressive(frame, quant, prog):
    """Dequantize + IDCT every accumulated block (vectorized einsum per
    component), then the shared upsample/crop/convert tail."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        st = prog["comps"][c["id"]]
        q = quant[c["tq"]].astype(np.float64)
        bh, bw = st["coef"].shape[:2]
        blocks = np.zeros((bh, bw, 64))
        blocks[..., ZIGZAG] = st["coef"] * q
        blocks = blocks.reshape(bh, bw, 8, 8)
        # stacked matmul, NOT einsum: same FP summation order as the
        # baseline per-block `_C.T @ block @ _C`, so baseline and
        # progressive decodes of identical coefficients give identical
        # pixels (einsum's different reduction order flips the odd
        # 0.5-boundary rounding)
        spatial = _C.T @ blocks @ _C + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _assemble_image(planes, comps, frame["h"], frame["w"], hmax, vmax)


def _assemble_image(planes, comps, h, w, hmax, vmax, prec=8, adobe=None):
    """Upsample subsampled planes to full resolution, crop the MCU
    padding, color-convert (shared by the baseline and progressive
    paths).  ``prec`` sets the sample range: 8-bit -> uint8 in
    [0, 255], 12-bit -> uint16 in [0, 4095] with chroma centered at
    2048.  Four-component frames honor the Adobe APP14 ``adobe``
    transform: 0/None = CMYK stored directly, 2 = YCCK (YCbCr math on
    the first three channels, then inverted back to CMY; K passes
    through) — output is always the CMYK channel stack."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    meta = {"width": w, "height": h, "channels": len(comps)}
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    if prec != 8:
        meta["bits"] = prec
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype), meta
    if len(comps) == 4:
        if adobe in (None, 0):
            out = np.stack(full, axis=2)
        elif adobe == 2:  # YCCK
            y, cb, cr = full[0], full[1] - center, full[2] - center
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            out = np.stack([maxv - r, maxv - g, maxv - b, full[3]], axis=2)
        else:
            raise NotImplementedError(f"Adobe APP14 transform {adobe}")
        return np.clip(np.round(out), 0, maxv).astype(dtype), meta
    if adobe == 0:
        # Adobe transform 0 on a 3-component frame: RGB stored
        # directly, no YCbCr inverse
        rgb = np.stack(full, axis=2)
        return np.clip(np.round(rgb), 0, maxv).astype(dtype), meta
    y, cb, cr = full[0], full[1] - center, full[2] - center
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype), meta


def _init_sequential(frame):
    """MCU-padded per-component pixel planes for a sequential
    multi-scan (Ns < Nf) baseline frame."""
    comps = frame["comps"]
    if len(comps) not in (1, 3, 4):
        raise NotImplementedError(f"{len(comps)}-component images")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2x2")
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]))
        for c in comps
    ]


def _decode_seq_scan(
    data, pos, frame, scan, quant, huff, restart_interval, planes
):
    """Decode ONE non-interleaved sequential scan (exactly one
    component — T.81 A.2.2: the scan covers the component's TRUE block
    grid in raster order, one block per restart unit) into its plane;
    returns the offset of the next marker segment."""
    comps = frame["comps"]
    order = [c for c in comps if c["id"] in scan]
    if len(order) != len(scan):
        raise ValueError("SOS names a component missing from SOF0")
    if len(order) != 1:
        raise NotImplementedError(
            "sequential scans over a strict component subset larger "
            "than one (Nf > Ns > 1) are not in the subset"
        )
    c = order[0]
    dc_tab = huff[(0, scan[c["id"]][0])]
    ac_tab = huff[(1, scan[c["id"]][1])]
    q = quant[c["tq"]]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    plane = planes[comps.index(c)]
    reader = _BitReader(data, pos)
    pred = 0
    unit = 0
    for row in range(-(-ch // 8)):
        for col in range(-(-cw // 8)):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.align_to_restart()
                pred = 0
            size = reader.decode_symbol(dc_tab)
            pred += _extend(reader.read_bits(size), size)
            coefs = np.zeros(64)
            coefs[0] = pred * q[0]
            k = 1
            while k <= 63:
                rs = reader.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC index out of range")
                coefs[k] = _extend(reader.read_bits(s), s) * q[k]
                k += 1
            block = np.zeros((8, 8))
            block.flat[ZIGZAG] = coefs
            plane[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = (
                _C.T @ block @ _C + float(1 << (frame.get("prec", 8) - 1))
            )
            unit += 1
    return _next_marker_pos(data, reader.pos)


# lossless (SOF3) Huffman table: difference categories 0..16
# (category 16 = the modulo-65536 special, no extra bits)
L16_DC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    list(range(17)),
)


def _lossless_predict(ra, rb, rc, sel):
    """T.81 Table H.1 predictors (integer arithmetic)."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless predictor {sel} out of range 1..7")


def _decode_lossless_scan(
    data, pos, frame, scan, huff, restart_interval, planes, sel, pt
):
    """Decode ONE lossless scan (Annex H): non-interleaved (Ns=1) or
    interleaved with all sampling factors 1x1 (MCU = one sample per
    component, raster order).  Accumulates full-resolution component
    planes into ``planes`` keyed by component id."""
    if restart_interval:
        raise NotImplementedError("restart markers in lossless scans")
    if pt:
        raise NotImplementedError("nonzero point transform")
    comps = frame["comps"]
    order = [c for c in comps if c["id"] in scan]
    if len(order) != len(scan):
        raise ValueError("SOS names a component missing from SOF3")
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        # T.81 gives subsampled lossless components per-component scan
        # dimensions; this decoder only implements the 1x1 geometry —
        # decoding a subsampled scan at frame geometry would overrun
        # the bitstream, so refuse loudly even for Ns=1 scans
        raise NotImplementedError(
            "lossless scans with sampling factors above 1x1"
        )
    h, w = frame["h"], frame["w"]
    prec = frame["prec"]
    default = 1 << (prec - 1)
    tabs = [huff[(0, scan[c["id"]][0])] for c in order]
    outs = [np.zeros((h, w), dtype=np.int64) for _ in order]
    reader = _BitReader(data, pos)
    for row in range(h):
        for col in range(w):
            for ci in range(len(order)):
                ssss = reader.decode_symbol(tabs[ci])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(ssss), ssss)
                o = outs[ci]
                if row == 0 and col == 0:
                    pred = default
                elif row == 0:
                    pred = int(o[0, col - 1])  # Ra on the first line
                elif col == 0:
                    pred = int(o[row - 1, 0])  # Rb on line starts
                else:
                    pred = _lossless_predict(
                        int(o[row, col - 1]),
                        int(o[row - 1, col]),
                        int(o[row - 1, col - 1]),
                        sel,
                    )
                o[row, col] = (pred + diff) & 0xFFFF
    for c, o in zip(order, outs):
        planes[c["id"]] = o
    return _next_marker_pos(data, reader.pos)


def _finish_lossless(frame, planes):
    """Stack decoded lossless component planes; samples are stored
    verbatim (no color transform — SOF3 components are not YCbCr by
    default)."""
    comps = frame["comps"]
    missing = [c["id"] for c in comps if c["id"] not in planes]
    if missing:
        raise ValueError(f"lossless scan(s) missing components {missing}")
    prec = frame["prec"]
    dtype = np.uint8 if prec <= 8 else np.uint16
    stacked = [planes[c["id"]].astype(dtype) for c in comps]
    meta = {
        "width": frame["w"], "height": frame["h"],
        "channels": len(comps),
    }
    if prec != 8:
        meta["bits"] = prec
    if len(comps) == 1:
        return stacked[0], meta
    return np.stack(stacked, axis=2), meta


def encode_jpeg_lossless(
    pixels: np.ndarray, *, predictor: int = 4, precision: int | None = None
) -> bytes:
    """Encode ``(h, w)`` or ``(h, w, 3)`` integer samples as LOSSLESS
    JPEG (SOF3, T.81 Annex H): predictor residuals, Huffman-coded
    difference categories, modulo-65536 arithmetic, one scan per
    component.  ``precision`` defaults to 8 for uint8 input and 16
    otherwise; decode returns the samples bit-exactly."""
    arr = np.asarray(pixels)
    if arr.dtype.kind not in "ui":
        raise ValueError("lossless encode expects integer samples")
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"precision {precision} out of range 2..16")
    if arr.size and (
        int(arr.max()) >= 1 << precision or int(arr.min()) < 0
    ):
        raise ValueError(f"samples outside the {precision}-bit range")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"cannot encode array of shape {arr.shape}")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    nc = 1 if gray else 3
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(
            struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload
        )

    sof = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)
    seg(0xC3, sof)
    seg(
        0xC4,
        bytes([0x00]) + bytes(L16_DC[0]) + bytes(L16_DC[1]),
    )
    tab = _encode_table(*L16_DC)
    default = 1 << (precision - 1)
    for ci in range(nc):
        plane = (arr if gray else arr[:, :, ci]).astype(np.int64)
        pred = np.empty((h, w), dtype=np.int64)
        pred[0, 0] = default
        if w > 1:
            pred[0, 1:] = plane[0, :-1]  # Ra on the first line
        if h > 1:
            pred[1:, 0] = plane[:-1, 0]  # Rb on line starts
        if h > 1 and w > 1:
            ra = plane[1:, :-1]
            rb = plane[:-1, 1:]
            rc = plane[:-1, :-1]
            pred[1:, 1:] = _lossless_predict(ra, rb, rc, predictor)
        diff = ((plane - pred + 32768) & 0xFFFF) - 32768
        seg(0xDA, bytes([1, ci + 1, 0x00, predictor, 0, 0]))
        bw = _BitWriter()
        _entropy_diffs(bw, diff, tab)
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _entropy_diffs(bw, diff, tab):
    """Huffman-code a plane of mod-2^16 differences (Annex H category
    scheme, shared by the lossless and hierarchical encoders)."""
    for d in diff.reshape(-1):
        d = int(d)
        if d == -32768:
            code, length = tab[16]
            bw.write(code, length)
            continue
        size = _csize(d)
        code, length = tab[size]
        bw.write(code, length)
        if size:
            bw.write(d if d > 0 else d - 1 + (1 << size), size)


def _hier_expand(plane: np.ndarray, eh: int, ev: int, out_h: int, out_w: int) -> np.ndarray:
    """T.81 Annex J.1.1.2 reference expansion: double a dimension with
    the ``(a + b + 1) >> 1`` interpolation filter (even outputs copy
    the reference, odd outputs interpolate, last sample replicated),
    then crop to the target frame geometry."""
    p = plane.astype(np.int64)
    if eh:
        right = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        wide = np.empty((p.shape[0], 2 * p.shape[1]), dtype=np.int64)
        wide[:, 0::2] = p
        wide[:, 1::2] = (p + right + 1) >> 1
        p = wide
    if ev:
        down = np.concatenate([p[1:], p[-1:]], axis=0)
        tall = np.empty((2 * p.shape[0], p.shape[1]), dtype=np.int64)
        tall[0::2] = p
        tall[1::2] = (p + down + 1) >> 1
        p = tall
    if out_h > p.shape[0] or out_w > p.shape[1]:
        raise ValueError("expanded reference smaller than its frame")
    return p[:out_h, :out_w]


def encode_jpeg_hierarchical(
    pixels: np.ndarray,
    *,
    levels: int = 2,
    predictor: int = 4,
    precision: int | None = None,
) -> bytes:
    """Encode a LOSSLESS hierarchical pyramid (T.81 Annex J): DHP
    declares the full geometry, the first frame is a ``levels``-times
    decimated SOF3 lossless image, and each subsequent frame is an
    EXP reference expansion followed by a differential lossless SOF7
    frame coding ``source − expand(reference)`` mod 2^16.  Every
    stage reconstructs exactly, so decode returns the input
    bit-exactly while a prefix of the stream yields a ready-to-show
    preview — the progressive-transmission use the mode exists for.
    Gray ``(h, w)`` or RGB ``(h, w, 3)``, 2..16-bit samples."""
    arr = np.asarray(pixels)
    if arr.dtype.kind not in "ui":
        raise ValueError("hierarchical encode expects integer samples")
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"precision {precision} out of range 2..16")
    if arr.size and (
        int(arr.max()) >= 1 << precision or int(arr.min()) < 0
    ):
        raise ValueError(f"samples outside the {precision}-bit range")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"cannot encode array of shape {arr.shape}")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    nc = 1 if gray else 3

    # pyramid, full resolution last; the downsampling filter is the
    # encoder's choice per the spec — plain decimation here, since
    # every differential stage corrects to exact anyway
    pyr = [arr.astype(np.int64)]
    for _ in range(levels):
        pyr.append(pyr[-1][::2, ::2])
    pyr = pyr[::-1]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(
            struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload
        )

    def sof_payload(hh, ww):
        p = struct.pack(">BHHB", precision, hh, ww, nc)
        for c in range(nc):
            p += struct.pack(">BBB", c + 1, 0x11, 0)
        return p

    seg(0xDE, sof_payload(h, w))  # DHP: full geometry
    seg(0xC4, bytes([0x00]) + bytes(L16_DC[0]) + bytes(L16_DC[1]))
    tab = _encode_table(*L16_DC)
    default = 1 << (precision - 1)

    for li, level in enumerate(pyr):
        lh, lw = level.shape[:2]
        if li:
            seg(0xDF, bytes([0x11]))  # EXP: expand 2x both axes
            seg(0xC7, sof_payload(lh, lw))  # differential lossless
        else:
            seg(0xC3, sof_payload(lh, lw))
        for ci in range(nc):
            plane = level if gray else level[:, :, ci]
            if li == 0:
                pred = np.empty((lh, lw), dtype=np.int64)
                pred[0, 0] = default
                if lw > 1:
                    pred[0, 1:] = plane[0, :-1]
                if lh > 1:
                    pred[1:, 0] = plane[:-1, 0]
                if lh > 1 and lw > 1:
                    pred[1:, 1:] = _lossless_predict(
                        plane[1:, :-1], plane[:-1, 1:], plane[:-1, :-1],
                        predictor,
                    )
                ss = predictor
            else:
                ref_level = pyr[li - 1]
                ref = ref_level if gray else ref_level[:, :, ci]
                pred = _hier_expand(ref, 1, 1, lh, lw)
                ss = 0  # differential frames carry no spatial predictor
            diff = ((plane - pred + 32768) & 0xFFFF) - 32768
            seg(0xDA, bytes([1, ci + 1, 0x00, ss, 0, 0]))
            bw = _BitWriter()
            _entropy_diffs(bw, diff, tab)
            bw.flush()
            out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _decode_diff_scan(
    data, pos, frame, scan, huff, restart_interval, planes, pt
):
    """Decode ONE differential lossless scan (SOF7): the entropy
    layer is Annex H's category coding, but samples are raw
    mod-2^16 differences against the expanded reference — no spatial
    prediction chains through the plane."""
    if restart_interval:
        raise NotImplementedError("restart markers in lossless scans")
    if pt:
        raise NotImplementedError("nonzero point transform")
    comps = frame["comps"]
    order = [c for c in comps if c["id"] in scan]
    if len(order) != len(scan):
        raise ValueError("SOS names a component missing from SOF7")
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless scans with sampling factors above 1x1"
        )
    h, w = frame["h"], frame["w"]
    tabs = [huff[(0, scan[c["id"]][0])] for c in order]
    outs = [np.zeros((h, w), dtype=np.int64) for _ in order]
    reader = _BitReader(data, pos)
    for row in range(h):
        for col in range(w):
            for ci in range(len(order)):
                ssss = reader.decode_symbol(tabs[ci])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(ssss), ssss)
                outs[ci][row, col] = diff
    for c, o in zip(order, outs):
        planes[c["id"]] = o
    return _next_marker_pos(data, reader.pos)


def _hier_absorb(hier, frame):
    """Fold a completed hierarchical frame into the pyramid state:
    store a non-differential frame's planes, or expand the reference
    and add a differential frame's mod-2^16 corrections."""
    exp = hier["exp"]
    hier["exp"] = None
    for c in frame["comps"]:
        cid = c["id"]
        plane = frame["hplanes"][cid]
        if not frame.get("differential"):
            hier["planes"][cid] = plane
            continue
        ref = hier["planes"].get(cid)
        if ref is None:
            raise ValueError(
                "differential hierarchical frame without a reference"
            )
        if exp:
            ref = _hier_expand(
                ref, exp[0], exp[1], frame["h"], frame["w"]
            )
        if ref.shape != plane.shape:
            raise ValueError(
                "hierarchical reference/frame geometry mismatch"
            )
        hier["planes"][cid] = (ref + plane) & 0xFFFF


def _finish_hier(hier):
    """Assemble the final full-resolution hierarchical image."""
    comps = hier["comps"]
    h, w, prec = hier["h"], hier["w"], hier["prec"]
    missing = [c["id"] for c in comps if c["id"] not in hier["planes"]]
    if missing:
        raise ValueError(
            f"hierarchical stream missing components {missing}"
        )
    dtype = np.uint8 if prec <= 8 else np.uint16
    stacked = []
    for c in comps:
        plane = hier["planes"][c["id"]]
        if plane.shape != (h, w):
            raise ValueError(
                "hierarchical stream ended below full resolution"
            )
        stacked.append(plane.astype(dtype))
    meta = {"width": w, "height": h, "channels": len(comps)}
    if prec != 8:
        meta["bits"] = prec
    if len(comps) == 1:
        return stacked[0], meta
    return np.stack(stacked, axis=2), meta


def _decode_scan(data, pos, frame, scan, quant, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    comps = frame["comps"]
    if len(comps) not in (1, 3, 4):
        raise NotImplementedError(f"{len(comps)}-component images")
    if len(scan) != len(comps):
        raise ValueError(
            "_decode_scan handles the single interleaved scan; "
            "decode_jpeg routes partial scans to _decode_seq_scan"
        )
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2x2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    level = float(1 << (frame.get("prec", 8) - 1))
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw)))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.align_to_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, scan[c["id"]][0])]
                ac_tab = huff[(1, scan[c["id"]][1])]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64)
                        size = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(size), size)
                        pred[ci] += diff
                        coefs[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            coefs[k] = (
                                _extend(reader.read_bits(s), s) * q[k]
                            )
                            k += 1
                        block = np.zeros((8, 8))
                        block.flat[ZIGZAG] = coefs
                        spatial = _C.T @ block @ _C + level
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    return _assemble_image(
        planes, comps, h, w, hmax, vmax, frame.get("prec", 8),
        frame.get("adobe"),
    )


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _encode_table(bits, values):
    """symbol -> (code, length) from the DHT layout."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


def _csize(v: int) -> int:
    size = 0
    v = abs(v)
    while v:
        size += 1
        v >>= 1
    return size


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate to the MCU-padded size (T.81 recommends edge
    extension so padding never leaks high-frequency energy)."""
    h, w = plane.shape
    return plane[
        np.ix_(
            np.minimum(np.arange(ph), h - 1),
            np.minimum(np.arange(pw), w - 1),
        )
    ]


def _prep_planes(pixels, quality: int, subsampling: str, precision=8):
    """Shared encoder front half: color conversion, chroma
    subsampling, MCU padding, quality-scaled quant tables.  For
    ``precision=12`` samples are uint16 in [0, 4095], the chroma
    center is 2048, and the Annex-K quant tables are scaled x16 (the
    sample range grew x16, so quantization error stays proportionate;
    written as 16-bit DQT entries)."""
    if precision == 8:
        arr = np.asarray(pixels)
        if arr.dtype != np.uint8:
            # np.asarray(..., dtype=uint8) would WRAP wider samples
            # mod 256 — silent corruption; demand explicit intent
            if arr.dtype.kind not in "ui" or (
                arr.size
                and (int(arr.max()) > 255 or int(arr.min()) < 0)
            ):
                raise ValueError(
                    "8-bit encode expects uint8 samples; use "
                    "precision=12 for wider data"
                )
            arr = arr.astype(np.uint8)
    elif precision == 12:
        arr = np.asarray(pixels)
        if arr.dtype.kind not in "ui" or (
            arr.size and int(arr.max()) > 4095
        ):
            raise ValueError(
                "12-bit encode expects integer samples in [0, 4095]"
            )
        arr = arr.astype(np.float64)
    else:
        raise NotImplementedError(f"{precision}-bit encode")
    gray = arr.ndim == 2
    cmyk = arr.ndim == 3 and arr.shape[2] == 4
    if not gray and not cmyk and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"cannot encode array of shape {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r}: use '444' or '420'")
    h, w = arr.shape[:2]
    if cmyk:
        # CMYK stored directly (Adobe transform 0), no subsampling
        if subsampling != "444":
            raise ValueError("CMYK encode supports subsampling='444' only")
        planes = [arr[:, :, i].astype(np.float64) for i in range(4)]
        samplings = [(1, 1)] * 4
    elif gray:
        planes = [arr.astype(np.float64)]
        samplings = [(1, 1)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        center = float(1 << (precision - 1))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        if subsampling == "420":
            # average full-res chroma over 2x2 (edge-padded to even)
            cbp = _pad_to(cb, -(-h // 2) * 2, -(-w // 2) * 2)
            crp = _pad_to(cr, -(-h // 2) * 2, -(-w // 2) * 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            samplings = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        _pad_to(p, mcus_y * 8 * sv, mcus_x * 8 * sh)
        for p, (sh, sv) in zip(planes, samplings)
    ]
    ql = _scaled_quant(K_LUMA_QUANT, quality)
    qc = _scaled_quant(K_CHROMA_QUANT, quality)
    if precision == 12:
        ql = ql * 16
        qc = qc * 16
    if cmyk:
        quants = [ql] * 4
    else:
        quants = [ql] + ([] if gray else [qc, qc])
    return planes, samplings, gray, h, w, mcus_x, mcus_y, quants


def encode_jpeg(
    pixels: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    scan_script: str = "interleaved",
    precision: int = 8,
) -> bytes:
    """Encode uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB as a
    baseline JPEG with Annex-K tables (quality-scaled).

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2x2 luma sampling, chroma averaged over 2x2 — the common camera
    layout).  ``restart_interval`` > 0 emits DRI + RSTn markers every
    N MCUs (the error-resilience feature large scans carry).
    ``scan_script``: 'interleaved' (single SOS over all components) or
    'separate' (one non-interleaved SOS per component — the other
    layout T.81 sequential mode permits).
    ``precision=12`` emits extended sequential (SOF1) with uint16
    samples in [0, 4095], x16-scaled 16-bit quant tables, and
    extended Huffman tables covering the 12-bit category range."""
    (
        planes, samplings, gray, h, w, mcus_x, mcus_y, quants
    ) = _prep_planes(pixels, quality, subsampling, precision)
    nc = len(planes)
    cmyk = nc == 4
    center = float(1 << (precision - 1))
    ql = quants[0]
    qc = quants[1] if nc == 3 else None
    if precision == 12:
        dc_tabs = [_encode_table(*X12_DC)] * nc
        ac_tabs = [_encode_table(*X12_AC)] * nc
    elif cmyk:
        dc_tabs = [_encode_table(*K_DC_LUMA)] * 4
        ac_tabs = [_encode_table(*K_AC_LUMA)] * 4
    else:
        dc_tabs = [_encode_table(*K_DC_LUMA)] + (
            [] if gray else [_encode_table(*K_DC_CHROMA)] * 2
        )
        ac_tabs = [_encode_table(*K_AC_LUMA)] + (
            [] if gray else [_encode_table(*K_AC_CHROMA)] * 2
        )

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes):
        out.extend(
            struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload
        )

    if cmyk:
        # Adobe APP14: version 100, flags 0/0, transform 0 (CMYK
        # stored directly) — the tag 4-component decoders key on
        seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    if precision == 12:
        # Pq=1: 16-bit big-endian quant entries
        zq16 = np.empty(64, dtype=">u2")
        zq16[...] = ql.flat[ZIGZAG]
        seg(0xDB, b"\x10" + zq16.tobytes())
        if qc is not None:
            zq16[...] = qc.flat[ZIGZAG]
            seg(0xDB, b"\x11" + zq16.tobytes())
    else:
        zq = np.empty(64, dtype=np.uint8)
        zq[...] = ql.flat[ZIGZAG]
        seg(0xDB, b"\x00" + zq.tobytes())
        if qc is not None:
            zq[...] = qc.flat[ZIGZAG]
            seg(0xDB, b"\x01" + zq.tobytes())
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sh, sv = samplings[c]
        tq = 0 if (c == 0 or cmyk) else 1
        sof += struct.pack(">BBB", c + 1, (sh << 4) | sv, tq)
    seg(0xC1 if precision == 12 else 0xC0, sof)
    if precision == 12:
        dht_list = (((0, 0), X12_DC), ((1, 0), X12_AC)) + (
            () if nc == 1 or cmyk else (((0, 1), X12_DC), ((1, 1), X12_AC))
        )
    elif cmyk:
        dht_list = (((0, 0), K_DC_LUMA), ((1, 0), K_AC_LUMA))
    else:
        dht_list = (((0, 0), K_DC_LUMA), ((1, 0), K_AC_LUMA)) + (
            () if gray else (((0, 1), K_DC_CHROMA), ((1, 1), K_AC_CHROMA))
        )
    for (tc, th), (bits, values) in dht_list:
        seg(
            0xC4,
            bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(values),
        )
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    bw = _BitWriter()
    pred = [0] * nc
    rst = 0
    mcu_count = 0

    def encode_block(ci: int, plane, y0: int, x0: int):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - center
        coefs = _C @ block @ _C.T
        q = quants[ci]
        zz = np.round(coefs.flat[ZIGZAG] / q.flat[ZIGZAG]).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size = _csize(diff)
        code, length = dc_tabs[ci][size]
        bw.write(code, length)
        if size:
            bw.write(diff if diff > 0 else diff - 1 + (1 << size), size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, length = ac_tabs[ci][0x00]  # EOB
                    bw.write(code, length)
                    break
                run += 1
                if run == 16:
                    code, length = ac_tabs[ci][0xF0]  # ZRL
                    bw.write(code, length)
                    run = 0
                continue
            size = _csize(v)
            code, length = ac_tabs[ci][(run << 4) | size]
            bw.write(code, length)
            bw.write(v if v > 0 else v - 1 + (1 << size), size)
            run = 0

    if scan_script == "separate":
        # one non-interleaved SOS per component (T.81 allows 1..4
        # sequential scans; each covers the component's TRUE block
        # grid, not the MCU-padded one — A.2.2), restart numbering
        # restarting at 0 per scan
        hmax = max(s[0] for s in samplings)
        vmax = max(s[1] for s in samplings)
        for ci in range(nc):
            seg(
                0xDA,
                bytes([1, ci + 1, 0x00 if (ci == 0 or cmyk) else 0x11])
                + b"\x00\x3f\x00",
            )
            bw = _BitWriter()
            pred = [0] * nc
            rst = 0
            unit = 0
            sh, sv = samplings[ci]
            cw = -(-w * sh // hmax)
            ch = -(-h * sv // vmax)
            for row in range(-(-ch // 8)):
                for col in range(-(-cw // 8)):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        bw.flush()
                        out.extend(bw.out)
                        bw.out = bytearray()
                        out.extend(bytes([0xFF, 0xD0 + rst]))
                        rst = (rst + 1) % 8
                        pred[ci] = 0
                    encode_block(ci, planes[ci], row * 8, col * 8)
                    unit += 1
            bw.flush()
            out.extend(bw.out)
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)
    if scan_script != "interleaved":
        raise ValueError(f"unknown scan_script {scan_script!r}")

    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if (c == 0 or cmyk) else 0x11])
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                bw.flush()
                out.extend(bw.out)
                bw.out = bytearray()
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                pred[:] = [0] * nc
            for ci in range(nc):
                sh, sv = samplings[ci]
                for by in range(sv):
                    for bx in range(sh):
                        encode_block(
                            ci,
                            planes[ci],
                            (my * sv + by) * 8,
                            (mx * sh + bx) * 8,
                        )
            mcu_count += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- progressive encoder (T.81 Annex G encode side) ------------------------


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(
    pixels: np.ndarray, *, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode as progressive JPEG (SOF2) with the standard two-step
    successive-approximation script: interleaved DC first scan at
    Al=1 + DC refinement, then per-component AC 1..63 first scans at
    Al=1 + AC refinement scans — exercising every progressive decode
    path (spectral selection, EOB runs, DC/AC refinement bits).  Same
    Annex-K tables and quantized coefficients as :func:`encode_jpeg`,
    so baseline and progressive encodes of one image decode to
    IDENTICAL pixels."""
    (
        planes, samplings, gray, h, w, mcus_x, mcus_y, quants
    ) = _prep_planes(pixels, quality, subsampling)
    nc = len(planes)
    dc_tabs = [_encode_table(*K_DC_LUMA)] + (
        [] if gray else [_encode_table(*K_DC_CHROMA)] * 2
    )
    ac_tabs = [_encode_table(*K_AC_LUMA)] + (
        [] if gray else [_encode_table(*K_AC_CHROMA)] * 2
    )

    # quantized zigzag coefficients per component, (bh_pad, bw_pad, 64)
    coefs = []
    for ci, p in enumerate(planes):
        sh, sv = samplings[ci]
        bh, bw = mcus_y * sv, mcus_x * sh
        q = quants[ci].flat[ZIGZAG].astype(np.float64)
        blocks = (
            p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        )
        # stacked matmul, NOT einsum: bit-identical FP order to the
        # baseline encoder's `_C @ block @ _C.T`, so both encoders
        # quantize every coefficient identically
        f = _C @ blocks @ _C.T
        zz = np.round(f.reshape(bh, bw, 64)[..., ZIGZAG] / q).astype(
            np.int64
        )
        coefs.append(zz)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes):
        out.extend(
            struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload
        )

    zq = np.empty(64, dtype=np.uint8)
    zq[...] = quants[0].flat[ZIGZAG]
    seg(0xDB, b"\x00" + zq.tobytes())
    if not gray:
        zq[...] = quants[1].flat[ZIGZAG]
        seg(0xDB, b"\x01" + zq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sh, sv = samplings[c]
        sof += struct.pack(">BBB", c + 1, (sh << 4) | sv, 0 if c == 0 else 1)
    seg(0xC2, sof)
    for (tc, th), (bits, values) in (
        ((0, 0), K_DC_LUMA),
        ((1, 0), K_AC_LUMA),
    ) + (() if gray else (((0, 1), K_DC_CHROMA), ((1, 1), K_AC_CHROMA))):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    def sos_header(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            tq = 0 if cid == 1 else 1
            p += bytes([cid, (tq << 4) | tq if not gray else 0x00])
        return p + bytes([ss, se, (ah << 4) | al])

    # --- scan 1: DC first, interleaved, Al=1 (arithmetic shift) ---
    seg(0xDA, sos_header(list(range(1, nc + 1)), 0, 0, 0, 1))
    bw_ = _BitWriter()
    pred = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samplings[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        size = _csize(diff)
                        code, length = dc_tabs[ci][size]
                        bw_.write(code, length)
                        if size:
                            bw_.write(
                                diff if diff > 0 else diff - 1 + (1 << size),
                                size,
                            )
    bw_.flush()
    out.extend(bw_.out)

    # --- scan 2: DC refinement, Ah=1 Al=0 (one raw bit per block) ---
    seg(0xDA, sos_header(list(range(1, nc + 1)), 0, 0, 1, 0))
    bw_ = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samplings[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw_.write(
                            int(coefs[ci][my * sv + by, mx * sh + bx, 0]) & 1,
                            1,
                        )
    bw_.flush()
    out.extend(bw_.out)

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)

    def true_blocks(ci):
        sh, sv = samplings[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        return -(-ch // 8), -(-cw // 8)

    # --- per component: AC first scan (Ss=1..63, Al=1) ---
    for ci in range(nc):
        seg(0xDA, sos_header([ci + 1], 1, 63, 0, 1))
        bw_ = _BitWriter()
        tab = ac_tabs[ci]
        eobrun = 0

        # The Annex-K baseline AC tables define only EOB0 (0x00) and ZRL
        # (0xF0) among the zero-size symbols — no EOBn (n>=1).  EOB runs
        # are therefore capped at 1: flush immediately after each EOB so
        # only symbol 0x00 is ever emitted.  Spec-valid, slightly larger
        # bitstream than EOBn coding.
        def flush_eob():
            nonlocal eobrun
            if eobrun:
                code, length = tab[0x00]
                bw_.write(code, length)
                eobrun = 0

        bh, bwid = true_blocks(ci)
        for row in range(bh):
            for col in range(bwid):
                band = [
                    _pt_ac(int(coefs[ci][row, col, k]), 1)
                    for k in range(64)
                ]
                nz = [k for k in range(1, 64) if band[k]]
                if not nz:
                    eobrun += 1
                    flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(1, nz[-1] + 1):
                    v = band[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = tab[0xF0]
                        bw_.write(code, length)
                        run -= 16
                    size = _csize(v)
                    code, length = tab[(run << 4) | size]
                    bw_.write(code, length)
                    bw_.write(v if v > 0 else v - 1 + (1 << size), size)
                    run = 0
                if nz[-1] < 63:
                    eobrun += 1
                    flush_eob()
        flush_eob()
        bw_.flush()
        out.extend(bw_.out)

    # --- per component: AC refinement scan (Ss=1..63, Ah=1 Al=0) ---
    for ci in range(nc):
        seg(0xDA, sos_header([ci + 1], 1, 63, 1, 0))
        bw_ = _BitWriter()
        tab = ac_tabs[ci]
        eobrun = 0
        eob_bits: list[int] = []

        # Same EOBn-free constraint as the first scan: cap EOB runs at 1
        # (only symbol 0x00), appending the tail correction bits the
        # decoder consumes while scanning out the rest of the block.
        def flush_eob_refine():
            nonlocal eobrun
            if eobrun:
                code, length = tab[0x00]
                bw_.write(code, length)
                for b in eob_bits:
                    bw_.write(b, 1)
                eob_bits.clear()
                eobrun = 0

        bh, bwid = true_blocks(ci)
        for row in range(bh):
            for col in range(bwid):
                t = [abs(int(coefs[ci][row, col, k])) for k in range(64)]
                # eob = index of the last newly-significant coefficient;
                # zero runs past it fold into the EOB, never into ZRLs.
                eob = 0
                for k in range(1, 64):
                    if t[k] == 1:
                        eob = k
                run = 0
                corr: list[int] = []
                for k in range(1, 64):
                    if t[k] == 0:
                        run += 1
                        continue
                    # Drain the zero-run history BEFORE handling any
                    # nonzero coefficient (libjpeg jcphuff ordering):
                    # each ZRL carries exactly the correction bits
                    # buffered so far — the ones for already-significant
                    # coefficients inside its 16-zero span — never bits
                    # for coefficients beyond it.
                    while run > 15 and k <= eob:
                        flush_eob_refine()
                        code, length = tab[0xF0]
                        bw_.write(code, length)
                        run -= 16
                        for b in corr:
                            bw_.write(b, 1)
                        corr.clear()
                    if t[k] > 1:
                        # already significant at Al=1: buffer the
                        # correction bit; does not reset the zero run
                        corr.append(t[k] & 1)
                        continue
                    # newly significant (t[k] == 1)
                    flush_eob_refine()
                    code, length = tab[(run << 4) | 1]
                    bw_.write(code, length)
                    bw_.write(
                        1 if int(coefs[ci][row, col, k]) > 0 else 0, 1
                    )
                    for b in corr:
                        bw_.write(b, 1)
                    corr.clear()
                    run = 0
                if run > 0 or corr:
                    # trailing insignificant zeros / correction bits:
                    # fold into an EOB carrying the tail bits
                    eobrun += 1
                    eob_bits.extend(corr)
                    flush_eob_refine()
        flush_eob_refine()
        bw_.flush()
        out.extend(bw_.out)

    out.extend(b"\xff\xd9")
    return bytes(out)
