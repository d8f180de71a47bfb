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
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0) + b""
    )
    with pytest.raises(NotImplementedError, match="format tag 2"):
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
