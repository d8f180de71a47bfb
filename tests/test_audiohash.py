"""Acoustic fingerprints (envelope + Haitsma-Kalker spectral) and the
banded audio near-dup operator: kernel exactness vs scalar reference,
codec-path parity across WAV/FLAC/AIFF, robustness properties, and
the shared pigeonhole join."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.operators import audiohash as ah
from physicsnemo_curator_spark.sources import aiff, flac, wav
from physicsnemo_curator_spark.sources import multimodal as mm

_RNG = np.random.default_rng(23)


def _levels_signal(levels, frame=50):
    return np.concatenate(
        [np.full(frame, k / 255.0) for k in levels]
    )


def test_envelope_kernel_matches_scalar_reference():
    levels = _RNG.integers(0, 256, 65)
    sig = _levels_signal(levels)
    _h, bits = ah.envelope_fingerprint_kernel(sig)
    exp = "".join(
        "1" if levels[i + 1] > levels[i] else "0" for i in range(64)
    )
    assert bits == exp
    with pytest.raises(ValueError, match="65"):
        ah.envelope_fingerprint_kernel(np.zeros(10))


def test_envelope_gain_invariance():
    """Envelope bits follow the loudness PROFILE: a global gain
    rescales every frame RMS equally, so bits are gain-invariant."""
    levels = _RNG.integers(1, 256, 65)
    sig = _levels_signal(levels)
    assert (
        ah.envelope_fingerprint_kernel(sig)
        == ah.envelope_fingerprint_kernel(sig * 0.5)
    )


def test_spectral_kernel_properties():
    """64 bits, deterministic, distinguishes tones, and survives
    small additive noise better than chance."""
    t = np.arange(9 * 512)
    a = np.sin(2 * np.pi * t * 0.01) + 0.5 * np.sin(2 * np.pi * t * 0.13)
    b = np.sin(2 * np.pi * t * 0.31)
    ha, bits_a = ah.spectral_fingerprint_kernel(a)
    hb, _ = ah.spectral_fingerprint_kernel(b)
    assert len(bits_a) == 64
    assert ah.spectral_fingerprint_kernel(a.copy())[0] == ha
    far = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
    noisy = a + 0.01 * _RNG.standard_normal(len(a))
    hn, _ = ah.spectral_fingerprint_kernel(noisy)
    near = bin((ha ^ hn) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert near < far


def test_codec_path_parity(spark):
    """The same signal fingerprints identically through WAV, FLAC and
    AIFF payloads (all quantize PCM16 the same way)."""
    levels = _RNG.integers(0, 256, 65)
    sig = _levels_signal(levels)
    rows = [
        (1, "audio", bytearray(wav.encode_wav(sig, 8000)), None, None, 0),
        (2, "audio", bytearray(flac.encode_flac(sig, 8000)), None, None, 0),
        (3, "audio", bytearray(aiff.encode_aiff(sig, 8000)), None, None, 0),
        (4, "image", bytearray(b"zz"), None, None, 2),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r.media_id: r.bits
        for r in ah.with_audio_fingerprints(df).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == got[2] == got[3]
    exp = "".join(
        "1" if levels[i + 1] > levels[i] else "0" for i in range(64)
    )
    assert got[1] == exp


def test_audio_near_duplicates_pairs(spark):
    """A one-level perturbation flips at most 2 envelope bits — the
    pigeonhole join must find every twin."""
    rows = []
    fps = {}
    for i in range(20):
        levels = _RNG.integers(0, 255, 65)
        pert = levels.copy()
        pert[i % 65] += 1
        for mid, lv in ((2 * i, levels), (2 * i + 1, pert)):
            sig = _levels_signal(lv)
            fps[mid] = ah.envelope_fingerprint_kernel(sig)[0]
            rows.append(
                (mid, "audio", bytearray(wav.encode_wav(sig, 8000)),
                 None, None, 0)
            )
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r.a, r.b): r.hamming
        for r in ah.audio_near_duplicates(
            df, max_hamming=3, n_bands=4
        ).collect()
    }
    for i in range(20):
        a, b = 2 * i, 2 * i + 1
        exp = bin((fps[a] ^ fps[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert exp <= 2
        assert pairs.get((a, b)) == exp


def test_strict_policy(spark):
    df = spark.createDataFrame(
        [(0, "audio", bytearray(b"NOTAUDIO" * 20), None, None, 160)],
        mm.MEDIA_SCHEMA,
    )
    assert ah.with_audio_fingerprints(df).count() == 0
    with pytest.raises(Exception):
        ah.with_audio_fingerprints(df, strict=True).collect()
