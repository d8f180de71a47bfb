"""Acoustic fingerprinting and banded audio near-duplicate pairs.

The audio-side twin of ``operators/imagehash.py``: condense a
decoded signal into a 64-bit signature whose hamming distance tracks
acoustic similarity, then find near-dup pairs with the shared
pigeonhole-banded hamming join — the curation primitive for
deduplicating audio corpora.

Two fingerprint families:

- **envelope**: split the signal into 65 equal frames, take each
  frame's RMS, bit ``i`` = RMS rises from frame ``i`` to ``i+1``.
  Loudness-profile shaped, integer-exact on quantized PCM — the
  SQL-replayable oracle variant.
- **spectral**: Haitsma–Kalker-style energy-difference bits — frame
  the signal, rFFT per frame, split the spectrum into 9 bands
  ``E(f, b)``, bit = sign of the time-and-band double difference
  ``(E(f,b) − E(f,b+1)) − (E(f−1,b) − E(f−1,b+1))``.  The classic
  robust-audio-hash construction (published form), 8 frames x 8
  band-pairs = 64 bits.

Scale: hashing is per-payload inside Arrow-batched ``mapInPandas``;
the near-dup join reuses ``imagehash.banded_hamming_pairs`` (band
equi-join + JVM ``bit_count``), so no all-pairs path exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from physicsnemo_curator_spark.operators.imagehash import (
    _pack_bits,
    banded_hamming_pairs,
)

FINGERPRINT_SCHEMA = (
    "media_id long, method string, hash long, bits string, "
    "n_frames long, sample_rate int"
)


def _mono(samples: np.ndarray) -> np.ndarray:
    arr = np.asarray(samples, dtype=np.float64)
    return arr.mean(axis=1) if arr.ndim == 2 else arr


def envelope_fingerprint_kernel(samples: np.ndarray) -> tuple[int, str]:
    """64 bits from the loudness profile: 65 equal frames (remainder
    truncated), bit ``i`` = RMS(frame i+1) > RMS(frame i)."""
    mono = _mono(samples)
    n = len(mono) // 65
    if n < 1:
        raise ValueError("signal shorter than 65 samples")
    frames = mono[: 65 * n].reshape(65, n)
    rms = np.sqrt((frames**2).mean(axis=1))
    return _pack_bits(rms[1:] > rms[:-1])


def spectral_fingerprint_kernel(
    samples: np.ndarray, *, n_frames: int = 9, n_bands: int = 9
) -> tuple[int, str]:
    """Haitsma–Kalker energy-difference bits: ``n_frames`` frames,
    ``n_bands`` spectral bands each, bit(f, b) = the double
    difference across time and band is positive — (n_frames−1) x
    (n_bands−1) = 64 bits at the defaults."""
    mono = _mono(samples)
    n = len(mono) // n_frames
    if n < 2 * n_bands:
        raise ValueError("signal too short for the spectral frame grid")
    frames = mono[: n_frames * n].reshape(n_frames, n)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # equal-width bands over the positive spectrum (DC excluded)
    usable = spec[:, 1:]
    per = usable.shape[1] // n_bands
    bands = usable[:, : per * n_bands].reshape(n_frames, n_bands, per).sum(
        axis=2
    )
    d = bands[:, :-1] - bands[:, 1:]
    bits = (d[1:] - d[:-1]) > 0
    return _pack_bits(bits)


_KERNELS = {
    "envelope": envelope_fingerprint_kernel,
    "spectral": spectral_fingerprint_kernel,
}


def _decode_audio(raw: bytes):
    """Signature-dispatch decode across the audio codec family."""
    from physicsnemo_curator_spark.sources import aiff as _aiff
    from physicsnemo_curator_spark.sources import flac as _flac
    from physicsnemo_curator_spark.sources import wav as _wav

    if _wav.is_wav(raw):
        return _wav.decode_wav(raw)
    if _flac.is_flac(raw):
        return _flac.decode_flac(raw)
    if _flac.is_ogg_flac(raw):
        return _flac.decode_ogg_flac(raw)
    if _aiff.is_aiff(raw):
        return _aiff.decode_aiff(raw)
    return None


def with_audio_fingerprints(
    media: DataFrame, *, method: str = "envelope", strict: bool = False
) -> DataFrame:
    """Fingerprint every audio payload (WAV / FLAC / Ogg-FLAC /
    AIFF).  Non-audio rows are dropped; undecodable or too-short
    payloads raise under ``strict`` and are skipped otherwise."""
    if method not in _KERNELS:
        raise ValueError(f"unknown fingerprint method {method!r}")
    kernel = _KERNELS[method]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, bit_strs, frames, rates = [], [], [], [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                raw = bytes(payload)
                try:
                    decoded = _decode_audio(raw)
                    if decoded is None:
                        raise NotImplementedError(
                            "audio payload in an unrecognized format "
                            "cannot be fingerprinted"
                        )
                    samples, meta = decoded
                    hv, bs = kernel(samples)
                except Exception:
                    if strict:
                        raise
                    continue
                ids.append(media_id)
                hashes.append(hv)
                bit_strs.append(bs)
                frames.append(meta["n_frames"])
                rates.append(meta["sample_rate"])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "method": method,
                    "hash": pd.array(hashes, dtype="Int64"),
                    "bits": bit_strs,
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, FINGERPRINT_SCHEMA)


def audio_near_duplicates(
    media: DataFrame,
    *,
    method: str = "envelope",
    max_hamming: int = 3,
    n_bands: int = 4,
    strict: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs ``(a, b, hamming)`` via the shared
    pigeonhole-banded hamming join."""
    return banded_hamming_pairs(
        with_audio_fingerprints(media, method=method, strict=strict),
        max_hamming=max_hamming,
        n_bands=n_bands,
        max_bucket=max_bucket,
    )
