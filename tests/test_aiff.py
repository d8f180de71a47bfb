"""AIFF/AIFF-C codec: round-trips, CROSS-VALIDATION against CPython's
aifc module in both directions, the 80-bit extended sample-rate
field, AIFF-C compression variants (sowt little-endian, G.711), and
the multimodal integration."""

from __future__ import annotations

import os
import struct
import tempfile
import warnings

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import aiff, wav
from physicsnemo_curator_spark.sources import multimodal as mm


def test_roundtrip_and_extended_rate():
    sig = 0.7 * np.sin(np.arange(4000) / 9.0)
    for rate in (8000, 22050, 44100, 96000):
        out, meta = aiff.decode_aiff(aiff.encode_aiff(sig, rate))
        assert meta["sample_rate"] == rate and meta["n_frames"] == 4000
        exp = np.round(np.clip(sig, -1, 1) * 32767) / 32768
        np.testing.assert_allclose(out, exp, atol=1e-15)
    st = np.stack([sig, -sig], axis=1)
    o2, m2 = aiff.decode_aiff(aiff.encode_aiff(st, 8000))
    assert o2.shape == (4000, 2) and m2["channels"] == 2
    # the 80-bit field round-trips arbitrary positive rates exactly
    for r in (1, 7, 11025, 192000):
        assert aiff._read_extended(aiff._write_extended(float(r))) == r


def test_cross_validation_against_stdlib_aifc():
    """Our encode must be readable by aifc; aifc's output must decode
    identically here (sample-for-sample)."""
    aifc = pytest.importorskip("aifc")

    sig = 0.5 * np.sin(np.arange(2000) / 5.0)
    data = aiff.encode_aiff(sig, 44100)
    import io

    f = aifc.open(io.BytesIO(data), "rb")
    assert (f.getnchannels(), f.getframerate(), f.getnframes()) == (
        1, 44100, 2000,
    )
    ref = np.frombuffer(f.readframes(2000), ">i2").astype(np.float64)
    np.testing.assert_array_equal(ref / 32768, aiff.decode_aiff(data)[0])

    st = np.stack([sig, -sig], axis=1)
    pcm = np.round(st * 32767).astype(">i2").tobytes()
    fd, path = tempfile.mkstemp(suffix=".aiff")
    os.close(fd)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            w = aifc.open(path, "wb")
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(pcm)
            w.close()
        out, meta = aiff.decode_aiff(open(path, "rb").read())
    finally:
        os.unlink(path)
    assert meta == {
        "sample_rate": 22050, "channels": 2, "bits": 16,
        "n_frames": 2000, "duration_s": 2000 / 22050,
    }
    np.testing.assert_array_equal(
        out, np.frombuffer(pcm, ">i2").astype(np.float64).reshape(-1, 2)
        / 32768,
    )


def _aifc_stream(comp, payload, *, channels=1, bits=16, n=None):
    comm = (
        struct.pack(">HIH", channels, n or 0, bits)
        + aiff._write_extended(8000.0)
        + comp + b"\x00\x00"  # compression name: empty pstring, padded
    )
    ssnd = struct.pack(">II", 0, 0) + payload
    body = bytearray(b"AIFC")
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) % 2:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + bytes(body)


def test_aifc_sowt_and_g711_variants():
    """AIFF-C: 'sowt' = little-endian PCM; 'ulaw'/'alaw' route through
    the WAV module's audioop-pinned companders."""
    v = np.array([1000, -2000, 32767, -32768], dtype="<i2")
    out, meta = aiff.decode_aiff(
        _aifc_stream(b"sowt", v.tobytes(), n=4)
    )
    np.testing.assert_array_equal(out * 32768, v.astype(np.float64))

    s16 = np.array([500, -12000, 31000], dtype=np.int16)
    ub = wav._ulaw_encode(s16).tobytes()
    ou, mu = aiff.decode_aiff(_aifc_stream(b"ulaw", ub, n=3))
    np.testing.assert_array_equal(
        ou * 32768, wav._ulaw_decode(np.frombuffer(ub, np.uint8))
    )
    ab = wav._alaw_encode(s16).tobytes()
    oa, _ = aiff.decode_aiff(_aifc_stream(b"ALAW", ab, n=3))
    np.testing.assert_array_equal(
        oa * 32768, wav._alaw_decode(np.frombuffer(ab, np.uint8))
    )

    with pytest.raises(NotImplementedError, match="MAC3"):
        aiff.decode_aiff(_aifc_stream(b"MAC3", b"\x00" * 34, n=4))
    with pytest.raises(ValueError, match="FORM"):
        aiff.decode_aiff(b"RIFFnope")


def test_aifc_ima4_matches_scalar_reference():
    """QuickTime 'ima4' packets: the vectorized packet-parallel decode
    must match a scalar step-by-step reference built from the IMA
    spec, including carried predictor/index state across packets and
    mono packet sequencing."""
    STEP, INDEX = wav._IMA_STEP_TABLE, wav._IMA_INDEX_TABLE
    sig = (0.6 * np.sin(np.arange(256) / 5.0) * 32767).astype(int)
    pred, idx = 0, 0
    packets = b""
    expect = []
    for g in range(4):
        block = sig[g * 64 : (g + 1) * 64]
        pkt = bytearray(struct.pack(">H", (pred & 0xFF80) | idx))
        nibs = []
        for s in block:
            step = int(STEP[idx])
            delta = int(s) - pred
            code = 8 if delta < 0 else 0
            d = abs(delta)
            if d >= step:
                code |= 4
                d -= step
            if d >= step >> 1:
                code |= 2
                d -= step >> 1
            if d >= step >> 2:
                code |= 1
            diff = (
                (step >> 3)
                + ((step >> 2) if code & 1 else 0)
                + ((step >> 1) if code & 2 else 0)
                + (step if code & 4 else 0)
            )
            pred = max(-32768, min(
                32767, pred - diff if code & 8 else pred + diff
            ))
            idx = max(0, min(88, idx + int(INDEX[code])))
            nibs.append(code)
        for i in range(0, 64, 2):
            pkt.append(nibs[i] | (nibs[i + 1] << 4))
        # scalar decode from the PACKET header state (predictor is
        # quantized to 9 bits there) to know the exact expectation
        p0 = pred_hdr = int.from_bytes(pkt[:2], "big")
        p0 = (pred_hdr - (1 << 16) if pred_hdr & 0x8000 else pred_hdr) & ~0x7F
        if p0 >= 1 << 15:
            p0 -= 1 << 16
        ii = pred_hdr & 0x7F
        pp = p0
        for b in pkt[2:]:
            for code in (b & 0x0F, b >> 4):
                step = int(STEP[ii])
                diff = (
                    (step >> 3)
                    + ((step >> 2) if code & 1 else 0)
                    + ((step >> 1) if code & 2 else 0)
                    + (step if code & 4 else 0)
                )
                pp = max(-32768, min(
                    32767, pp - diff if code & 8 else pp + diff
                ))
                ii = max(0, min(88, ii + int(INDEX[code])))
                expect.append(pp)
        packets += bytes(pkt)
    out, meta = aiff.decode_aiff(
        _aifc_stream(b"ima4", packets, n=256)
    )
    assert meta["n_frames"] == 256 and meta["bits"] == 16
    np.testing.assert_array_equal(
        (out * 32768).astype(int), np.array(expect)
    )


def test_extract_features_aiff_audio(spark):
    t = np.arange(8000) / 8000.0
    sig = 0.8 * np.sin(2 * np.pi * 100 * t)
    rows = [(7, "audio", bytearray(aiff.encode_aiff(sig, 8000)),
             None, None, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feat = mm.extract_features(media, dim=8, strict=True).collect()[0]
    assert feat.feature[0] == 8000.0 and feat.feature[1] == 1.0
    assert abs(feat.feature[3] - 0.8 / np.sqrt(2)) < 1e-3


def test_aifc_float_variants():
    """AIFF-C fl32/fl64: big-endian IEEE float payloads decode
    exactly."""
    v32 = np.array([0.25, -0.5, 1.0, -1.0], dtype=">f4")
    out, meta = aiff.decode_aiff(
        _aifc_stream(b"fl32", v32.tobytes(), bits=32, n=4)
    )
    assert meta["bits"] == 32
    np.testing.assert_array_equal(out, v32.astype(np.float64))
    v64 = np.array([0.125, -0.625], dtype=">f8")
    o2, m2 = aiff.decode_aiff(
        _aifc_stream(b"FL64", v64.tobytes(), bits=64, n=2)
    )
    assert m2["bits"] == 64
    np.testing.assert_array_equal(o2, v64.astype(np.float64))
