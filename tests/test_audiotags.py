"""Audio metadata tags (sources/audiotags.py): embed/extract across
WAV INFO, FLAC VORBIS_COMMENT, Ogg-FLAC and AIFF text chunks.

Mirrors the EXIF tests' shape: round-trip identity of both the tag
dict and the decoded samples, replacement of stale metadata, loud
refusal of unsupported keys/containers.  (Reference parity: the
reference curates audio corpora with sidecar metadata; public
container specs — RIFF INFO, FLAC metadata blocks, AIFF text chunks.)
"""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import audiotags as AT
from physicsnemo_curator_spark.sources.aiff import decode_aiff, encode_aiff
from physicsnemo_curator_spark.sources.flac import (
    decode_flac,
    decode_ogg_flac,
    encode_flac,
    encode_ogg_flac,
)
from physicsnemo_curator_spark.sources.wav import decode_wav, encode_wav

TAGS = {
    "title": "Sine Study",
    "artist": "Curator",
    "album": "Fixtures",
    "date": "2026-08-15",
    "comment": "odd-length payload!",
    "genre": "test",
    "software": "pcs",
}


def _signal(n=900, ch=1, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.integers(-20000, 20000, size=(n, ch), dtype=np.int64)
    return (x.astype(np.float64) / 32768.0).astype(np.float32)


# ---------------------------------------------------------------------------
# WAV


def test_wav_tags_round_trip():
    raw = encode_wav(_signal(), 16000)
    assert AT.extract_audio_tags(raw) == {}
    tagged = AT.embed_audio_tags(raw, TAGS)
    assert AT.extract_audio_tags(tagged) == TAGS
    a, meta_a = decode_wav(raw)
    b, meta_b = decode_wav(tagged)
    np.testing.assert_array_equal(a, b)
    assert meta_a["sample_rate"] == meta_b["sample_rate"]


def test_wav_tags_replace_existing():
    raw = encode_wav(_signal(), 8000)
    once = AT.embed_audio_tags(raw, TAGS)
    twice = AT.embed_audio_tags(once, {"title": "v2"})
    got = AT.extract_audio_tags(twice)
    assert got == {"title": "v2"}  # stale INFO list fully replaced
    assert twice.count(b"LIST") == 1


def test_wav_word_alignment_pad():
    # odd-length value forces the NUL+pad path; chunk walk must stay
    # aligned for a following extract
    raw = encode_wav(_signal(64), 8000)
    tagged = AT.embed_audio_tags(raw, {"title": "ab", "comment": "xyz"})
    assert AT.extract_audio_tags(tagged) == {"title": "ab", "comment": "xyz"}


# ---------------------------------------------------------------------------
# FLAC


def test_flac_tags_round_trip():
    raw = encode_flac(_signal(1200, 2), 44100)
    tagged = AT.embed_audio_tags(raw, TAGS)
    assert AT.extract_audio_tags(tagged) == TAGS
    a, _ = decode_flac(raw)
    b, meta = decode_flac(tagged)
    np.testing.assert_array_equal(a, b)
    assert meta["sample_rate"] == 44100


def test_flac_tags_replace_existing():
    raw = encode_flac(_signal(400), 8000)
    once = AT.embed_audio_tags(raw, TAGS)
    twice = AT.embed_audio_tags(once, {"artist": "only"})
    assert AT.extract_audio_tags(twice) == {"artist": "only"}
    # exactly one VORBIS_COMMENT block survives
    from physicsnemo_curator_spark.sources.audiotags import _flac_blocks

    assert sum(1 for bt, *_ in _flac_blocks(twice) if bt == 4) == 1


def test_ogg_flac_tags_via_encoder():
    sig = _signal(700)
    raw = encode_ogg_flac(sig, 16000, tags={"title": "ogg", "genre": "g"})
    assert AT.extract_audio_tags(raw) == {"title": "ogg", "genre": "g"}
    dec, meta = decode_ogg_flac(raw)
    ref, _ = decode_flac(encode_flac(sig, 16000))
    np.testing.assert_array_equal(dec, ref)
    assert meta["sample_rate"] == 16000


def test_ogg_flac_untagged_still_empty_and_embed_raises():
    raw = encode_ogg_flac(_signal(300), 8000)
    assert AT.extract_audio_tags(raw) == {}
    with pytest.raises(NotImplementedError):
        AT.embed_audio_tags(raw, {"title": "x"})


# ---------------------------------------------------------------------------
# AIFF


def test_aiff_tags_round_trip():
    raw = encode_aiff(_signal(500), 22050)
    tagged = AT.embed_audio_tags(
        raw, {"title": "t", "artist": "a", "comment": "odd"}
    )
    assert AT.extract_audio_tags(tagged) == {
        "title": "t",
        "artist": "a",
        "comment": "odd",
    }
    a, _ = decode_aiff(raw)
    b, meta = decode_aiff(tagged)
    np.testing.assert_array_equal(a, b)
    assert meta["sample_rate"] == 22050


def test_aiff_rejects_unsupported_key():
    raw = encode_aiff(_signal(100), 8000)
    with pytest.raises(ValueError, match="AIFF"):
        AT.embed_audio_tags(raw, {"album": "nope"})


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="container"):
        AT.extract_audio_tags(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    with pytest.raises(ValueError, match="container"):
        AT.embed_audio_tags(b"garbage-bytes-here", {"title": "x"})


def test_wav_rejects_unsupported_key():
    raw = encode_wav(_signal(100), 8000)
    with pytest.raises(ValueError, match="WAV INFO"):
        AT.embed_audio_tags(raw, {"bogus": "x"})


def test_ogg_flac_tagged_header_flags_conformant():
    """The mapping's metadata chain must terminate at the LAST header
    packet: tagged streams clear STREAMINFO's last-block flag and set
    it on the VORBIS_COMMENT packet (a conformant external reader
    would otherwise stop at STREAMINFO and drop the tags)."""
    from physicsnemo_curator_spark.sources.flac import _ogg_packets

    raw = encode_ogg_flac(_signal(200), 8000, tags={"title": "x"})
    packets = _ogg_packets(raw)
    head = packets[0]
    assert head[:5] == b"\x7fFLAC"
    (nheaders,) = (int.from_bytes(head[7:9], "big"),)
    assert nheaders == 1
    streaminfo_hdr = head[13]  # first native block header byte
    assert streaminfo_hdr & 0x80 == 0  # NOT last
    comment_pkt = packets[1]
    assert comment_pkt[0] & 0x7F == 4
    assert comment_pkt[0] & 0x80  # IS last
    # untagged: STREAMINFO stays the last (and only) metadata block
    raw0 = encode_ogg_flac(_signal(200), 8000)
    head0 = _ogg_packets(raw0)[0]
    assert head0[13] & 0x80
