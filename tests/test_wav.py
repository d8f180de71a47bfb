"""WAV (RIFF PCM) codec: round-trips across bit depths and channel
layouts, known-signal feature extraction through the multimodal
kernel, chunk-walking robustness, and honest raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import wav


def test_roundtrip_16bit_stereo():
    t = np.arange(800) / 8000.0
    left = np.sin(2 * np.pi * 440 * t)
    right = 0.5 * np.sin(2 * np.pi * 880 * t)
    sig = np.stack([left, right], axis=1)
    out, meta = wav.decode_wav(wav.encode_wav(sig, 8000))
    assert meta == {
        "sample_rate": 8000, "channels": 2, "bits": 16,
        "n_frames": 800, "duration_s": 0.1,
    }
    assert np.abs(out - sig).max() < 1e-4  # 16-bit quantization


def test_roundtrip_8bit_mono():
    sig = np.linspace(-1, 1, 256)
    out, meta = wav.decode_wav(wav.encode_wav(sig, 16000, bits=8))
    assert meta["bits"] == 8 and meta["channels"] == 1
    assert np.abs(out - sig).max() < 1e-2  # 8-bit quantization


def test_extra_chunks_skipped_and_float_format():
    """LIST/fact chunks between fmt and data must be skipped; IEEE
    float32 payloads (format tag 3) decode exactly."""
    sig = np.array([0.25, -0.5, 1.0, -1.0], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
        + b"data" + struct.pack("<I", sig.nbytes) + sig.tobytes()
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, meta = wav.decode_wav(data)
    assert meta["bits"] == 32 and meta["sample_rate"] == 44100
    np.testing.assert_allclose(out, sig.astype(np.float64))


def test_24bit_pcm_decode():
    # hand-pack two 24-bit frames: +2^23-1 and -2^23
    payload = b"\xff\xff\x7f" + b"\x00\x00\x80"
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    out, meta = wav.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert meta["bits"] == 24
    assert abs(out[0] - (2**23 - 1) / 2**23) < 1e-12 and out[1] == -1.0


def test_unsupported_raises_loudly():
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode_wav(b"not a wav at all")
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)  # MP3
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0) + b""
    )
    with pytest.raises(NotImplementedError, match="format tag 85"):
        wav.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_extract_features_real_wav_stats(spark):
    """The multimodal kernel decodes WAV audio for real: a known sine
    wave's sample rate, duration, RMS (1/sqrt(2) * amplitude), and
    zero-crossing rate come out right, strict=True included."""
    from physicsnemo_curator_spark.sources import multimodal

    t = np.arange(8000) / 8000.0
    sig = 0.8 * np.sin(2 * np.pi * 100 * t)  # 1 s, 100 Hz
    rows = [(1, "audio", bytearray(wav.encode_wav(sig, 8000)),
             None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_features(media, dim=8, strict=True).collect()[0]
    assert feat.feature[0] == 8000.0 and feat.feature[1] == 1.0
    assert abs(feat.feature[2] - 1.0) < 1e-12          # duration
    assert abs(feat.feature[3] - 0.8 / np.sqrt(2)) < 1e-3  # RMS
    assert abs(feat.feature[5] - 200 / 7999) < 1e-3    # ~200 crossings/s


def test_strict_still_raises_for_compressed_audio(spark):
    from physicsnemo_curator_spark.sources import multimodal

    rows = [(2, "audio", bytearray(b"ID3\x04fake-mp3"), None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec-gated"):
        multimodal.extract_features(media, strict=True).collect()
    # plumbing mode: digest stub
    feat = multimodal.extract_features(media, dim=4).collect()[0]
    assert len(feat.feature) == 4


def test_truncated_data_chunk_raises():
    """A data chunk declaring more bytes than exist must raise, not
    silently yield wrong n_frames/duration/RMS."""
    t = np.arange(100) / 8000.0
    data = wav.encode_wav(np.sin(t), 8000)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        wav.decode_wav(data[:-50])


def test_zero_channels_raises_cleanly():
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="channels"):
        wav.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_odd_8bit_data_chunk_is_padded():
    """RIFF requires word-aligned chunks: an odd-sized 8-bit data
    chunk carries a pad byte (total file length even) and still
    round-trips."""
    sig = np.linspace(-1, 1, 5)
    data = wav.encode_wav(sig, 8000, bits=8)
    assert len(data) % 2 == 0
    out, meta = wav.decode_wav(data)
    assert meta["n_frames"] == 5 and np.abs(out - sig).max() < 1e-2


def test_bad_wav_plumbing_mode_digest_stub(spark):
    """A corrupt WAV under strict=False falls through to the SHARED
    digest stub (not a diverging inline copy)."""
    import hashlib

    from physicsnemo_curator_spark.sources import multimodal

    bad = wav.encode_wav(np.zeros(50), 8000)[:-20]
    rows = [(9, "audio", bytearray(bad), None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_features(media, dim=4).collect()[0]
    digest = hashlib.sha256(bytes(bad)).digest()
    assert feat.feature == [b / 255.0 for b in digest[:4]]
    with pytest.raises(Exception):
        multimodal.extract_features(media, strict=True).collect()


def test_adpcm_roundtrip_snr_and_exact_count():
    """IMA/DVI ADPCM (format 0x11): lossy 4-bit, but a smooth signal
    must survive with > 25 dB SNR, the fact chunk must restore the
    exact frame count (blocks are padded), and meta reports bits=4."""
    t = np.arange(5000)
    sig = 0.6 * np.sin(2 * np.pi * t / 50) + 0.2 * np.sin(2 * np.pi * t / 7)
    out, meta = wav.decode_wav(wav.encode_wav(sig, 8000, bits=4))
    assert meta == {
        "sample_rate": 8000, "channels": 1, "bits": 4,
        "n_frames": 5000, "duration_s": 0.625,
    }
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((out - sig) ** 2))
    assert snr > 25

    stereo = np.stack([sig, np.roll(sig, 13)], axis=1)
    o2, m2 = wav.decode_wav(wav.encode_wav(stereo, 44100, bits=4))
    assert o2.shape == (5000, 2) and m2["channels"] == 2
    snr2 = 10 * np.log10(np.mean(stereo**2) / np.mean((o2 - stereo) ** 2))
    assert snr2 > 25

    # shorter than one block: single padded block, exact count back
    o3, m3 = wav.decode_wav(wav.encode_wav(sig[:37], 8000, bits=4))
    assert len(o3) == 37 and m3["n_frames"] == 37


def test_adpcm_reconstruction_matches_stdlib_audioop():
    """The IMA nibble->sample reconstruction must agree BIT-FOR-BIT
    with an independent implementation: CPython's audioop (Intel/DVI
    ADPCM, same step/index tables).  audioop packs the first sample
    in the HIGH nibble (WAV blocks use low-first), and carries no
    block headers, so the comparison drives the core kernel
    directly."""
    audioop = pytest.importorskip("audioop")

    sig = (0.5 * np.sin(np.arange(300) / 9) * 32767).astype(np.int16)
    adp, _ = audioop.lin2adpcm(sig.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(adp, 2, None)[0], "<i2")
    b = np.frombuffer(adp, np.uint8)
    nib = np.empty(len(b) * 2, np.int32)
    nib[0::2] = b >> 4
    nib[1::2] = b & 0x0F
    pred, idx = np.zeros(1, np.int32), np.zeros(1, np.int32)
    mine = np.empty(len(nib), np.int16)
    for i, n in enumerate(nib):
        pred, idx = wav._adpcm_reconstruct(pred, idx, np.array([n]))
        mine[i] = pred[0]
    np.testing.assert_array_equal(mine, ref[: len(mine)])


def test_adpcm_block_structure_pins():
    """Spec pins: fmt tag 0x11 with cbSize=2 + wSamplesPerBlock, a
    fact chunk carrying the true frame count, per-block 4-byte
    channel headers (predictor = first sample, step index in range),
    data region a whole number of blocks."""
    sig = np.linspace(-0.5, 0.5, 700)
    data = wav.encode_wav(sig, 8000, bits=4)
    i = data.index(b"fmt ")
    tag, ch, rate, _br, ba, bits, cb, spb = struct.unpack_from(
        "<HHIIHHHH", data, i + 8
    )
    assert (tag, ch, bits, cb) == (0x11, 1, 4, 2)
    assert spb == (ba - 4) * 2 + 1
    i = data.index(b"fact")
    assert struct.unpack_from("<I", data, i + 8)[0] == 700
    i = data.index(b"data")
    (dsize,) = struct.unpack_from("<I", data, i + 4)
    assert dsize % ba == 0 and dsize // ba == -(-700 // spb)
    first = struct.unpack_from("<h", data, i + 8)[0]
    assert first == round(-0.5 * 32767)
    assert 0 <= data[i + 10] <= 88  # step index


def test_adpcm_strict_extract_features(spark):
    """ADPCM audio flows through the multimodal feature kernel under
    strict=True — compressed audio is no longer gate-only."""
    from physicsnemo_curator_spark.sources import multimodal

    t = np.arange(8000) / 8000.0
    sig = 0.8 * np.sin(2 * np.pi * 100 * t)
    rows = [(5, "audio", bytearray(wav.encode_wav(sig, 8000, bits=4)),
             None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_features(media, dim=8, strict=True).collect()[0]
    assert feat.feature[0] == 8000.0 and feat.feature[1] == 1.0
    assert abs(feat.feature[2] - 1.0) < 1e-12
    assert abs(feat.feature[3] - 0.8 / np.sqrt(2)) < 1e-2


def test_adpcm_batch_apis_match_per_signal():
    """encode_wav_batch / decode_wav_batch must be byte- and
    sample-identical to the per-signal calls — the batch path stacks
    blocks from many signals into one kernel invocation (this is the
    mapInPandas batch shape), changing the schedule but not one bit
    of output.  Mixed channel counts and PCM fallbacks included."""
    rng = np.random.default_rng(7)
    sigs = [
        0.5 * np.sin(np.arange(n) / 9.0) for n in (37, 505, 700, 1300)
    ] + [
        np.stack(
            [0.3 * np.sin(np.arange(600) / 5.0),
             rng.uniform(-1, 1, 600)], axis=1
        )
    ]
    batch = wav.encode_wav_batch(sigs, 8000, bits=4)
    single = [wav.encode_wav(s, 8000, bits=4) for s in sigs]
    assert batch == single
    dec_b = wav.decode_wav_batch(batch)
    for (arr_b, meta_b), data in zip(dec_b, single):
        arr_s, meta_s = wav.decode_wav(data)
        assert meta_b == meta_s
        np.testing.assert_array_equal(arr_b, arr_s)
    # PCM fallback keeps the loop semantics
    pcm = wav.encode_wav_batch(sigs[:2], 8000, bits=16)
    assert pcm == [wav.encode_wav(s, 8000, bits=16) for s in sigs[:2]]
    mixed = wav.decode_wav_batch([pcm[0], batch[0]])
    np.testing.assert_array_equal(mixed[0][0], wav.decode_wav(pcm[0])[0])
    np.testing.assert_array_equal(mixed[1][0], wav.decode_wav(batch[0])[0])
    assert wav.encode_wav_batch([], 8000, bits=4) == []


def test_g711_companders_match_stdlib_audioop():
    """The G.711 mu-law and a-law encode AND decode must agree
    BIT-FOR-BIT with CPython's audioop over random + edge int16
    samples (both implement the canonical Sun/CCITT segment
    algorithm)."""
    audioop = pytest.importorskip("audioop")

    rng = np.random.default_rng(3)
    x = np.concatenate(
        [
            rng.integers(-32768, 32768, 50000),
            np.array([-32768, -32635, -132, -1, 0, 1, 131, 32635, 32767]),
        ]
    ).astype(np.int16)
    for law, enc_fn, dec_fn, lin2, law2lin in (
        ("ulaw", wav._ulaw_encode, wav._ulaw_decode,
         audioop.lin2ulaw, audioop.ulaw2lin),
        ("alaw", wav._alaw_encode, wav._alaw_decode,
         audioop.lin2alaw, audioop.alaw2lin),
    ):
        ref = np.frombuffer(lin2(x.tobytes(), 2), np.uint8)
        np.testing.assert_array_equal(enc_fn(x), ref, err_msg=law)
        refd = np.frombuffer(law2lin(ref.tobytes(), 2), "<i2")
        np.testing.assert_array_equal(
            dec_fn(ref).astype(np.int16), refd, err_msg=law
        )


def test_g711_wav_roundtrip():
    """WAV format tags 7 (mu-law) / 6 (a-law): logarithmic companding
    keeps relative error small — absolute error bounded by half the
    top segment step (1024/32768 = 0.03125) everywhere, and much
    smaller for quiet samples."""
    t = np.arange(4000)
    sig = 0.9 * np.sin(2 * np.pi * t / 80)
    for codec in ("ulaw", "alaw"):
        data = wav.encode_wav(sig, 8000, codec=codec)
        out, meta = wav.decode_wav(data)
        assert meta["n_frames"] == 4000 and meta["bits"] == 8
        assert np.abs(out - sig).max() < 0.0313
        quiet = 0.01 * np.sin(2 * np.pi * t / 80)
        oq, _ = wav.decode_wav(wav.encode_wav(quiet, 8000, codec=codec))
        assert np.abs(oq - quiet).max() < 0.0006
    # stereo keeps the channel interleave
    st = np.stack([sig, -sig], axis=1)
    o2, m2 = wav.decode_wav(wav.encode_wav(st, 8000, codec="ulaw"))
    assert o2.shape == (4000, 2) and m2["channels"] == 2
    assert np.abs(o2[:, 1] + o2[:, 0]).max() < 0.002  # symmetric law
    with pytest.raises(ValueError, match="unknown codec"):
        wav.encode_wav(sig, 8000, codec="mp3")


def _ms_ref_decode(block: bytes, channels: int) -> list:
    """Scalar reference MS-ADPCM block decoder written straight from
    the public spec text — validates the vectorized kernel
    independently (no stdlib implementation exists)."""
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    COEF = [(256, 0), (512, -256), (0, 0), (192, 64),
            (240, 0), (460, -208), (392, -232)]

    def i16(lo, hi):
        v = lo | (hi << 8)
        return v - (1 << 16) if v >= 1 << 15 else v

    pred = [block[c] for c in range(channels)]
    o = channels
    idelta = [i16(block[o + 2 * c], block[o + 2 * c + 1])
              for c in range(channels)]
    o += 2 * channels
    s1 = [i16(block[o + 2 * c], block[o + 2 * c + 1])
          for c in range(channels)]
    o += 2 * channels
    s2 = [i16(block[o + 2 * c], block[o + 2 * c + 1])
          for c in range(channels)]
    o += 2 * channels
    nibs = []
    for byte in block[o:]:
        nibs += [byte >> 4, byte & 0x0F]
    out = [list(s2), list(s1)]
    for t in range(len(nibs) // channels):
        row = []
        for c in range(channels):
            n = nibs[t * channels + c]
            sn = n - 16 if n >= 8 else n
            c1, c2 = COEF[pred[c]]
            p = (s1[c] * c1 + s2[c] * c2) >> 8
            v = max(-32768, min(32767, p + sn * idelta[c]))
            s2[c], s1[c] = s1[c], v
            idelta[c] = max(16, (ADAPT[n] * idelta[c]) >> 8)
            row.append(v)
        out.append(row)
    return out


def test_ms_adpcm_kernel_matches_scalar_spec_reference():
    """Vectorized MS-ADPCM decode vs an independent scalar decoder on
    random blocks (mono and stereo, all seven predictors forced via
    real encodes of varied signals)."""
    rng = np.random.default_rng(9)
    for channels in (1, 2):
        sig = rng.uniform(-1, 1, (1300, channels))
        data = wav.encode_wav(sig, 8000, codec="ms_adpcm")
        _fmt, ba, _fact, payload = wav._parse_wav_chunks(data)
        blocks = np.frombuffer(
            payload[: len(payload) - len(payload) % ba], np.uint8
        ).reshape(-1, ba)
        got = wav._ms_adpcm_decode_blocks(blocks, channels)
        for bi in range(blocks.shape[0]):
            ref = _ms_ref_decode(bytes(blocks[bi]), channels)
            np.testing.assert_array_equal(got[bi], np.array(ref), str(bi))


def test_ms_adpcm_roundtrip_and_structure():
    """Format-2 structure pins (extended fmt with wSamplesPerBlock +
    the seven spec coefficient pairs, fact chunk) and round-trip
    quality: > 25 dB SNR on a smooth signal, exact frame counts
    through block padding, seed samples bit-exact."""
    t = np.arange(5000)
    sig = 0.6 * np.sin(2 * np.pi * t / 50) + 0.2 * np.sin(2 * np.pi * t / 7)
    data = wav.encode_wav(sig, 8000, codec="ms_adpcm")
    i = data.index(b"fmt ")
    tag, ch, _rate, _br, ba, bits, cb = struct.unpack_from(
        "<HHIIHHH", data, i + 8
    )
    assert (tag, ch, bits, cb) == (2, 1, 4, 32)
    spb, ncoef = struct.unpack_from("<HH", data, i + 26)
    assert ncoef == 7 and spb == (ba - 7) * 2 + 2
    assert struct.unpack_from("<hh", data, i + 30) == (256, 0)  # coef 0
    out, meta = wav.decode_wav(data)
    assert meta["n_frames"] == 5000 and meta["bits"] == 4
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((out - sig) ** 2))
    assert snr > 25
    # first two decoded samples are the stored seeds: bit-exact
    np.testing.assert_allclose(
        out[:2], np.round(sig[:2] * 32767) / 32768.0, atol=0
    )
    st = np.stack([sig, np.roll(sig, 13)], axis=1)
    o2, m2 = wav.decode_wav(wav.encode_wav(st, 8000, codec="ms_adpcm"))
    assert o2.shape == (5000, 2)
    snr2 = 10 * np.log10(np.mean(st**2) / np.mean((o2 - st) ** 2))
    assert snr2 > 25
    o3, m3 = wav.decode_wav(wav.encode_wav(sig[:5], 8000, codec="ms_adpcm"))
    assert len(o3) == 5 and m3["n_frames"] == 5


def test_conflicting_codec_and_bits_rejected():
    """bits=4 selects IMA ADPCM; combining it with an explicit G.711
    request must refuse rather than silently dropping the codec, and
    a caller-supplied invalid ADPCM block align must fail the same
    validation the decoder applies."""
    sig = np.zeros(100)
    with pytest.raises(ValueError, match="conflicts"):
        wav.encode_wav(sig, 8000, bits=4, codec="ulaw")
    with pytest.raises(ValueError, match="block align 262"):
        wav._encode_adpcm_ima(sig[:, None], 8000, block_align=262)


def test_ms_adpcm_batch_apis_match_per_signal():
    """The MS-ADPCM batch paths must be byte- and sample-identical to
    the per-signal calls, like the IMA ones (blocks stacked across
    the whole batch)."""
    rng = np.random.default_rng(8)
    sigs = [0.5 * np.sin(np.arange(n) / 7.0) for n in (5, 499, 500, 1300)]
    sigs.append(np.stack([sigs[3], rng.uniform(-1, 1, 1300)], axis=1))
    batch = wav.encode_wav_batch(sigs, 8000, codec="ms_adpcm")
    single = [wav.encode_wav(s, 8000, codec="ms_adpcm") for s in sigs]
    assert batch == single
    for (arr_b, meta_b), data in zip(wav.decode_wav_batch(batch), single):
        arr_s, meta_s = wav.decode_wav(data)
        assert meta_b == meta_s
        np.testing.assert_array_equal(arr_b, arr_s)


def test_wave_format_extensible_resolves_subformat():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the effective format comes
    from the SubFormat GUID's first two bytes — 24-bit multichannel
    PCM and float32 payloads decode through the normal dispatch;
    non-media GUIDs raise."""
    media_suffix = (
        b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )

    def build(sub_tag, channels, bits, payload, guid=None):
        guid = guid or (struct.pack("<H", sub_tag) + media_suffix)
        blk = channels * max(bits // 8, 1)
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, 8000, 8000 * blk, blk,
            bits, 22, bits, 0,
        ) + guid
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) % 2 else b"")
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = np.random.default_rng(0)
    v = rng.integers(-(1 << 23), 1 << 23, (100, 3)).astype(np.int64)
    raw = b"".join(
        int(x & 0xFFFFFF).to_bytes(3, "little") for x in v.reshape(-1)
    )
    out, meta = wav.decode_wav(build(1, 3, 24, raw))
    assert (meta["channels"], meta["bits"], meta["n_frames"]) == (3, 24, 100)
    np.testing.assert_allclose(out, v / (1 << 23), atol=1e-15)

    f32 = rng.uniform(-1, 1, 50).astype("<f4")
    o3, m3 = wav.decode_wav(build(3, 1, 32, f32.tobytes()))
    assert m3["bits"] == 32
    np.testing.assert_allclose(o3, f32.astype(np.float64))

    with pytest.raises(NotImplementedError, match="SubFormat"):
        wav.decode_wav(
            build(1, 1, 8, b"", guid=struct.pack("<H", 1) + b"\xde" * 14)
        )


def test_batch_rejects_conflicting_codec_like_single():
    with pytest.raises(ValueError, match="conflicts"):
        wav.encode_wav_batch([np.zeros(10)], 8000, bits=4, codec="ulaw")
    with pytest.raises(ValueError, match="unknown codec"):
        wav.encode_wav_batch([np.zeros(10)], 8000, codec="mp3")
