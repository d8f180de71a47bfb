"""FLAC codec: lossless round-trips (the decode must equal the
quantized input BIT-EXACTLY), STREAMINFO md5 verification, frame CRC
enforcement, spec-level structure pins, subframe types the in-repo
encoder does not emit (CONSTANT / VERBATIM / LPC, mid-side stereo)
via hand-built streams, and the multimodal integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import flac
from physicsnemo_curator_spark.sources import multimodal as mm


def _q16(x):
    return np.round(np.clip(x, -1.0, 1.0) * 32767.0) / 32768.0


def test_mono_roundtrip_lossless():
    t = np.arange(10000)
    sig = 0.6 * np.sin(2 * np.pi * t / 50) + 0.2 * np.sin(2 * np.pi * t / 7)
    data = flac.encode_flac(sig, 8000)
    out, meta = flac.decode_flac(data)
    assert meta == {
        "sample_rate": 8000, "channels": 1, "bits": 16,
        "n_frames": 10000, "duration_s": 1.25,
    }
    np.testing.assert_array_equal(out, _q16(sig))
    assert len(data) < 2 * len(sig)  # beats raw 16-bit


def test_stereo_and_multiframe_roundtrip():
    rng = np.random.default_rng(1)
    sig = np.stack(
        [np.sin(np.arange(9000) / 9.0), rng.uniform(-1, 1, 9000)], axis=1
    )
    out, meta = flac.decode_flac(
        flac.encode_flac(sig, 44100, block_size=1024)
    )
    assert meta["channels"] == 2 and meta["n_frames"] == 9000
    np.testing.assert_array_equal(out, _q16(sig))
    # tiny, constant, non-multiple-of-block
    for n in (1, 17, 1025):
        z = np.zeros(n)
        o, m = flac.decode_flac(flac.encode_flac(z, 8000, block_size=1024))
        assert m["n_frames"] == n and np.all(o == 0)


def test_stream_structure_pins():
    """fLaC magic, last-metadata STREAMINFO with rate/channels/bps/
    total in the right bit positions, frame sync code, CRC-8 and
    CRC-16 actually verified (corruption raises)."""
    sig = np.sin(np.arange(600) / 5.0)
    data = flac.encode_flac(sig, 22050, block_size=256)
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80  # last-metadata-block, type 0
    (size,) = struct.unpack(">I", b"\x00" + data[5:8])
    assert size == 34  # STREAMINFO is exactly 34 bytes
    rate_chan = struct.unpack(">I", data[8 + 10 : 8 + 14])[0]
    assert rate_chan >> 12 == 22050
    assert ((rate_chan >> 9) & 0x7) + 1 == 1  # channels
    assert ((rate_chan >> 4) & 0x1F) + 1 == 16  # bps
    first_frame = 8 + 34
    assert data[first_frame] == 0xFF and data[first_frame + 1] >> 2 == 0x3E

    # corrupt one entropy byte: the frame CRC-16 must catch it
    bad = bytearray(data)
    bad[-5] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(bad))
    # corrupt the stored md5: the stream-level check must catch it
    bad = bytearray(data)
    bad[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="md5"):
        flac.decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="fLaC"):
        flac.decode_flac(b"RIFF not a flac")


def _raw_frame_stream(body_bits, *, n, rate=8000, channels=1, bps=16,
                      total=None, ca=None):
    """Hand-assemble a one-frame FLAC stream around pre-encoded
    subframe bits (a _BitsOut), for subframe types the encoder does
    not emit."""
    si = flac._BitsOut()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n if total is None else total, 36)
    si.align()
    streaminfo = bytes(si.out) + b"\x00" * 16  # md5 unset: skip check
    hdr_bw = flac._BitsOut()
    hdr_bw.write(0x3FFE, 14)
    hdr_bw.write(0, 2)
    hdr_bw.write(7, 4)  # 16-bit blocksize at end
    hdr_bw.write(0, 4)
    hdr_bw.write((channels - 1) if ca is None else ca, 4)
    hdr_bw.write(4 if bps == 16 else 0, 3)
    hdr_bw.write(0, 1)
    hdr_bw.write(0, 8)  # frame 0
    hdr_bw.write(n - 1, 16)
    hdr_bw.align()
    hdr = bytes(hdr_bw.out)
    hdr += bytes([flac._crc8(hdr)])
    body_bits.align()
    frame = hdr + bytes(body_bits.out)
    frame += struct.pack(">H", flac._crc16(frame))
    return (
        b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
        + streaminfo + frame
    )


def test_constant_verbatim_and_lpc_subframes_decode():
    """Decoder-only subframe types, hand-encoded: CONSTANT, VERBATIM,
    and a real LPC subframe (order 2, shift 1, coefs [3, -1] -> the
    predictor (3*s1 - s2) >> 1) with Rice residuals."""
    n = 16
    # CONSTANT = 77
    bw = flac._BitsOut()
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(77 & 0xFFFF, 16)
    out, _ = flac.decode_flac(_raw_frame_stream(bw, n=n))
    np.testing.assert_array_equal(out * 32768, np.full(n, 77.0))

    # VERBATIM = ramp
    bw = flac._BitsOut()
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in range(n):
        bw.write(v - 8, 16)
    out, _ = flac.decode_flac(_raw_frame_stream(bw, n=n))
    np.testing.assert_array_equal(out * 32768, np.arange(n) - 8.0)

    # LPC order 2: s[i] = ((3*s[i-1] - 1*s[i-2]) >> 1) + res[i]
    warm = [100, 110]
    res = [3, -2, 0, 5, -7, 1, 0, 0, 2, -1, 4, 0, -3, 6]
    expect = list(warm)
    for r in res:
        expect.append(((3 * expect[-1] - expect[-2]) >> 1) + r)
    bw = flac._BitsOut()
    bw.write(0, 1)
    bw.write(32 + 1, 6)  # LPC, order-1 = 1 -> order 2
    bw.write(0, 1)
    for w in warm:
        bw.write(w, 16)
    bw.write(4 - 1, 4)   # precision 4 bits
    bw.write(1, 5)       # shift 1
    bw.write(3, 4)       # coef 3
    bw.write(-1 & 0xF, 4)  # coef -1
    bw.write(0, 2)       # rice method 0
    bw.write(0, 4)       # partition order 0
    bw.write(4, 4)       # rice param
    flac._rice_write(bw, np.array(res), 4)
    out, _ = flac.decode_flac(_raw_frame_stream(bw, n=n))
    np.testing.assert_array_equal(out * 32768, np.array(expect, float))


def test_mid_side_stereo_decodes():
    """Channel assignment 10 (mid/side), hand-encoded as two CONSTANT
    subframes: mid = (L+R)>>1 (with the side LSB trick), side = L-R;
    decode must restore exact L and R."""
    L, R = 1000, -337
    mid, side = (L + R) >> 1, L - R
    bw = flac._BitsOut()
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(mid & 0xFFFF, 16)
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(side & 0x1FFFF, 17)  # side channel carries bps+1 bits
    out, meta = flac.decode_flac(
        _raw_frame_stream(bw, n=8, channels=2, ca=10)
    )
    assert meta["channels"] == 2
    np.testing.assert_array_equal(out[:, 0] * 32768, np.full(8, float(L)))
    np.testing.assert_array_equal(out[:, 1] * 32768, np.full(8, float(R)))


def test_extract_features_flac_audio(spark):
    """FLAC audio flows through the multimodal feature kernel under
    strict=True with the same feature semantics as WAV."""
    t = np.arange(8000) / 8000.0
    sig = 0.8 * np.sin(2 * np.pi * 100 * t)
    rows = [(6, "audio", bytearray(flac.encode_flac(sig, 8000)),
             None, None, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feat = mm.extract_features(media, dim=8, strict=True).collect()[0]
    assert feat.feature[0] == 8000.0 and feat.feature[1] == 1.0
    assert abs(feat.feature[2] - 1.0) < 1e-12
    assert abs(feat.feature[3] - 0.8 / np.sqrt(2)) < 1e-3


def test_ogg_flac_roundtrip_and_page_structure():
    """Ogg encapsulation: encode wraps the native stream in CRC-32
    verified pages (BOS flag on the mapping-header page, EOS on the
    last), decode reassembles packets and must produce the exact
    native decode.  Page CRC corruption raises."""
    sig = 0.5 * np.sin(np.arange(9000) / 11.0)
    ogg = flac.encode_ogg_flac(sig, 8000, block_size=1024)
    assert flac.is_ogg_flac(ogg) and not flac.is_flac(ogg)
    assert ogg[:4] == b"OggS" and ogg[5] & 0x02  # BOS
    out, meta = flac.decode_ogg_flac(ogg)
    np.testing.assert_array_equal(out, _q16(sig))
    assert meta["n_frames"] == 9000
    ref, _ = flac.decode_flac(flac.encode_flac(sig, 8000, block_size=1024))
    np.testing.assert_array_equal(out, ref)
    # find the EOS page
    assert any(
        ogg[i + 5] & 0x04
        for i in range(len(ogg) - 6)
        if ogg[i : i + 4] == b"OggS"
    )
    bad = bytearray(ogg)
    bad[-3] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_ogg_flac(bytes(bad))
    with pytest.raises(ValueError, match="capture"):
        flac.decode_ogg_flac(b"NotOgg" + bytes(30))


def test_long_stream_frame_numbers_and_large_ogg_pages():
    """Streams with >= 2048 frames exercise 3-byte UTF-8 frame
    numbers (the 2-byte form overflows at 0x800 — a truncated lead
    byte desynced the header CRC before the fix), and Ogg pages near
    the 255-lacing limit must split with the continuation flag
    instead of overflowing the one-byte segment count."""
    sig = np.zeros(2100 * 64)
    out, meta = flac.decode_flac(flac.encode_flac(sig, 8000, block_size=64))
    assert meta["n_frames"] == len(sig)

    rng = np.random.default_rng(7)
    big = rng.uniform(-1, 1, (32768, 2))
    ogg = flac.encode_ogg_flac(big, 8000, block_size=32768)
    o, _ = flac.decode_ogg_flac(ogg)
    np.testing.assert_array_equal(o, _q16(big))
    # a continuation page exists (0x01 header flag)
    assert any(
        ogg[i + 5] & 0x01
        for i in range(len(ogg) - 6)
        if ogg[i : i + 4] == b"OggS"
    )


def test_short_signal_streaminfo_is_fixed_blocksize():
    """min == max == block_size even when the signal is shorter than
    one block (values < 16 are reserved; the short last block is
    exempt from min/max per spec)."""
    d = flac.encode_flac(np.zeros(5), 8000)
    mn, mx = struct.unpack(">HH", d[8:12])
    assert mn == mx == 4096


def test_lpc_beats_fixed_on_tonal_and_stays_lossless():
    """LPC subframes (orders 2/4/8, 12-bit quantized Levinson-Durbin
    coefficients) must round-trip EXACTLY and compress a tonal
    signal tighter than the FIXED orders."""
    import numpy as np

    from physicsnemo_curator_spark.sources.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(5)
    t = np.arange(6000)
    sig = np.clip(
        0.5 * np.sin(2 * np.pi * 440 * t / 8000)
        + 0.2 * np.sin(2 * np.pi * 1234 * t / 8000)
        + 0.01 * rng.normal(size=len(t)),
        -1,
        1,
    )
    fixed = encode_flac(sig, 8000, predictor="fixed")
    auto = encode_flac(sig, 8000, predictor="auto")
    assert len(auto) < len(fixed)
    ref = np.round(sig * 32767) / 32768.0
    for enc in (fixed, auto):
        dec, _ = decode_flac(enc)  # md5 self-check runs inside
        np.testing.assert_allclose(dec.reshape(-1), ref, atol=1e-9)


def test_lpc_mode_validation_and_short_blocks():
    import numpy as np
    import pytest as _pytest

    from physicsnemo_curator_spark.sources.flac import (
        decode_flac,
        encode_flac,
    )

    with _pytest.raises(ValueError, match="predictor"):
        encode_flac(np.zeros(10), 8000, predictor="cnn")
    # blocks shorter than the max LPC order fall back to FIXED paths
    rng = np.random.default_rng(6)
    sig = rng.normal(0, 0.3, 7).clip(-1, 1)
    dec, _ = decode_flac(encode_flac(sig, 8000, predictor="lpc"))
    np.testing.assert_allclose(
        dec.reshape(-1), np.round(sig * 32767) / 32768.0, atol=1e-9
    )
