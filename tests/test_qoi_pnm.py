"""QOI (qoiformat.org) and Netpbm P1-P6 codecs: exact round trips
across every op/magic, header probing, metadata comments, and the
multimodal resize dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from physicsnemo_curator_spark.sources import pnm as P
from physicsnemo_curator_spark.sources import qoi as Q
from physicsnemo_curator_spark.sources.imagetags import (
    embed_image_tags,
    extract_image_tags,
)
from physicsnemo_curator_spark.sources.probe import probe_media


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# QOI


def test_qoi_round_trip_gray_rgb_rgba():
    rng = _rng(1)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    d, m = Q.decode_qoi(Q.encode_qoi(g))
    np.testing.assert_array_equal(d, np.repeat(g[:, :, None], 3, 2))
    assert (m["width"], m["height"], m["channels"]) == (24, 16, 3)
    np.testing.assert_array_equal(Q.decode_qoi(Q.encode_qoi(rgb))[0], rgb)
    np.testing.assert_array_equal(
        Q.decode_qoi(Q.encode_qoi(rgba))[0], rgba
    )


def test_qoi_long_runs_split_at_62():
    img = np.full((40, 40, 3), 7, dtype=np.uint8)  # 1600-px run
    enc = Q.encode_qoi(img)
    np.testing.assert_array_equal(Q.decode_qoi(enc)[0], img)
    # constant image: header + first-pixel op(s) + runs + end marker
    assert len(enc) < 14 + 4 + (1600 // 62 + 2) + 8


def test_qoi_index_diff_luma_paths():
    # alternating two colors exercises INDEX; small gradients DIFF and
    # LUMA; a big jump the RGB literal
    row = np.array(
        [[10, 10, 10], [11, 11, 12], [10, 10, 10], [200, 90, 14],
         [205, 95, 19], [10, 10, 10]],
        dtype=np.uint8,
    )
    img = np.tile(row[None, :, :], (3, 1, 1))
    np.testing.assert_array_equal(Q.decode_qoi(Q.encode_qoi(img))[0], img)


def test_qoi_alpha_transitions():
    img = np.zeros((2, 4, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[1, 2] = (5, 6, 7, 128)  # alpha change forces RGBA literal
    np.testing.assert_array_equal(Q.decode_qoi(Q.encode_qoi(img))[0], img)


def test_qoi_corruption_raises():
    enc = Q.encode_qoi(_rng(2).integers(0, 256, (8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="QOI"):
        Q.decode_qoi(b"nope" + enc[4:])
    with pytest.raises(ValueError):
        Q.decode_qoi(enc[:-9])  # missing end marker / truncated
    with pytest.raises(ValueError, match="uint8"):
        Q.encode_qoi(np.zeros((4, 4), dtype=np.uint16))


def test_qoi_probe():
    p = probe_media(Q.encode_qoi(_rng(3).integers(0, 256, (6, 9, 4),
                                                  dtype=np.uint8)))
    assert (p["format"], p["width"], p["height"], p["channels"]) == (
        "qoi", 9, 6, 4)


# ---------------------------------------------------------------------------
# PNM


@pytest.mark.parametrize("wide", [False, True])
def test_pnm_gray_and_rgb_round_trip(wide):
    rng = _rng(4)
    dt = np.uint16 if wide else np.uint8
    top = 65536 if wide else 256
    g = rng.integers(0, top, (11, 7), dtype=dt)
    rgb = rng.integers(0, top, (5, 6, 3), dtype=dt)
    for arr in (g, rgb):
        d, m = P.decode_pnm(P.encode_pnm(arr))
        np.testing.assert_array_equal(d, arr)
        assert m["maxval"] == (65535 if wide else 255)


def test_pbm_bool_round_trip_and_polarity():
    mask = _rng(5).integers(0, 2, (9, 17)).astype(bool)
    enc = P.encode_pnm(mask)
    assert enc[:2] == b"P4"
    d, m = P.decode_pnm(enc)
    np.testing.assert_array_equal(d.astype(bool), mask)
    assert m["maxval"] == 1
    # spec polarity: a PBM 1 bit is BLACK (sample 0 after decode)
    one_black = P.decode_pnm(b"P4\n1 1\n" + bytes([0x80]))[0]
    assert one_black[0, 0] == 0


def test_pnm_ascii_forms_decode():
    p2 = b"P2\n# a note\n3 2\n255\n0 50 100\n150 200 255\n"
    d, m = P.decode_pnm(p2)
    np.testing.assert_array_equal(
        d, [[0, 50, 100], [150, 200, 255]]
    )
    assert m["comments"] == ["a note"]
    p3 = b"P3\n2 1\n7\n1 2 3 4 5 6\n"
    np.testing.assert_array_equal(
        P.decode_pnm(p3)[0], [[[1, 2, 3], [4, 5, 6]]]
    )
    p1 = b"P1\n5 1\n10110\n"  # packed digits, 1 = black
    np.testing.assert_array_equal(
        P.decode_pnm(p1)[0], [[0, 1, 0, 0, 1]]
    )


def test_pnm_errors():
    with pytest.raises(ValueError, match="PNM"):
        P.decode_pnm(b"P9\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        P.decode_pnm(b"P5\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        P.decode_pnm(b"P2\n1 1\n5\n9\n")
    with pytest.raises(ValueError, match="newlines"):
        P.encode_pnm(np.zeros((2, 2), np.uint8), comments=["a\nb"])


def test_pnm_comment_tags_round_trip():
    g = _rng(6).integers(0, 256, (4, 8), dtype=np.uint8)
    raw = P.encode_pnm(g)
    assert extract_image_tags(raw) == {}
    tagged = embed_image_tags(raw, {"comment": "two\nlines"})
    assert extract_image_tags(tagged) == {"comment": "two\nlines"}
    np.testing.assert_array_equal(P.decode_pnm(tagged)[0], g)
    replaced = embed_image_tags(tagged, {"comment": "v2"})
    assert extract_image_tags(replaced) == {"comment": "v2"}
    with pytest.raises(ValueError, match="PNM"):
        embed_image_tags(raw, {"title": "no"})


def test_pnm_probe():
    p = probe_media(P.encode_pnm(
        _rng(7).integers(0, 65536, (3, 5, 3), dtype=np.uint16)))
    assert (p["format"], p["width"], p["height"], p["channels"],
            p["bits"]) == ("pnm", 5, 3, 3, 16)


# ---------------------------------------------------------------------------
# property sweeps (hypothesis)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 31),
    st.sampled_from([1, 3, 4]),
)
def test_qoi_property_round_trip(h, w, seed, ch):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = Q.decode_qoi(Q.encode_qoi(img))[0]
    ref = np.repeat(img[:, :, None], 3, 2) if ch == 1 else img
    np.testing.assert_array_equal(dec, ref)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 31),
    st.sampled_from(["bool", "u8", "u16", "rgb8", "rgb16"]),
)
def test_pnm_property_round_trip(h, w, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "bool":
        arr = rng.integers(0, 2, (h, w)).astype(bool)
    elif kind == "u8":
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    elif kind == "u16":
        arr = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    elif kind == "rgb8":
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    else:
        arr = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    dec = P.decode_pnm(P.encode_pnm(arr))[0]
    if kind == "bool":
        np.testing.assert_array_equal(dec.astype(bool), arr)
    else:
        np.testing.assert_array_equal(dec, arr)


# ---------------------------------------------------------------------------
# multimodal dispatch


def test_resize_keeps_qoi_and_pnm_formats(spark):
    from physicsnemo_curator_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rng = _rng(8)
    qoi_p = Q.encode_qoi(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    pnm_p = P.encode_pnm(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(qoi_p), 16, 16, None),
            (1, "image", bytearray(pnm_p), 16, 16, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(df, width=8, height=8, strict=True).collect()
    }
    assert Q.is_qoi(rows[0])
    assert Q.decode_qoi(rows[0])[0].shape == (8, 8, 3)
    assert P.is_pnm(rows[1])
    assert P.decode_pnm(rows[1])[0].shape == (8, 8)


# ---------------------------------------------------------------------------
# review-pass regressions


def test_qoi_run_updates_index_like_reference_decoder():
    """qoi.h indexes px after EVERY chunk including RUN — an INDEX op
    may reference the initial (0,0,0,255) pixel seen only via RUN."""
    import struct

    stream = (
        b"qoif" + struct.pack(">IIBB", 3, 1, 4, 0)
        + bytes([0xC0 | 0])              # RUN 1: (0,0,0,255)
        + bytes([0xFF, 1, 2, 3, 4])      # RGBA literal
        + bytes([53])                    # INDEX hash(0,0,0,255)=53
        + b"\x00" * 7 + b"\x01"
    )
    px, _ = Q.decode_qoi(stream)
    np.testing.assert_array_equal(
        px[0], [[0, 0, 0, 255], [1, 2, 3, 4], [0, 0, 0, 255]]
    )


def test_pnm_maxval_override_and_p4_for_01_uint8():
    ones = np.array([[0, 1, 1, 0]], dtype=np.uint8)
    enc = P.encode_pnm(ones, maxval=1)
    assert enc[:2] == b"P4"
    d, m = P.decode_pnm(enc)
    np.testing.assert_array_equal(d, ones)
    low = np.array([[0, 7, 15]], dtype=np.uint8)
    enc15 = P.encode_pnm(low, maxval=15)
    d, m = P.decode_pnm(enc15)
    assert m["maxval"] == 15
    np.testing.assert_array_equal(d, low)
    with pytest.raises(ValueError, match="maxval"):
        P.encode_pnm(np.array([[16]], dtype=np.uint8), maxval=15)


def test_resize_preserves_pnm_maxval(spark):
    from physicsnemo_curator_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    mask = _rng(9).integers(0, 2, (16, 16)).astype(bool)
    p4 = P.encode_pnm(mask)
    p2 = b"P2\n4 4\n15\n" + b" ".join(
        str(v).encode() for v in _rng(10).integers(0, 16, 16)
    )
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(p4), 16, 16, None),
            (1, "image", bytearray(p2), 4, 4, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(df, width=8, height=8,
                               strict=True).collect()
    }
    assert rows[0][:2] == b"P4"  # bitmap stays a bitmap
    d0, m0 = P.decode_pnm(rows[0])
    assert m0["maxval"] == 1
    np.testing.assert_array_equal(d0.astype(bool), mask[::2, ::2])
    d1, m1 = P.decode_pnm(rows[1])
    assert m1["maxval"] == 15  # low-depth graymap keeps its scale


def test_probe_truncated_qoi_raises_valueerror():
    from physicsnemo_curator_spark.sources.probe import probe_media

    with pytest.raises(ValueError, match="QOI"):
        probe_media(b"qoif\x00\x00")
