"""Image metadata tags (sources/imagetags.py): embed/extract across
PNG tEXt/iTXt, JPEG EXIF+COM, TIFF first-IFD ASCII tags and the GIF
Comment Extension.

Same contract as the audio-tag tests: tag-dict round-trip, pixel
identity after the splice, family replacement, loud refusal of
unsupported keys/containers.  The TIFF embed is append-only (new IFD
at EOF, header repointed) so it must survive compressed and
multi-page inputs byte-for-byte on the image data.
"""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import imagetags as IT
from physicsnemo_curator_spark.sources.exif import embed_exif, extract_exif
from physicsnemo_curator_spark.sources.gif import decode_gif, encode_gif
from physicsnemo_curator_spark.sources.jpeg import decode_jpeg, encode_jpeg
from physicsnemo_curator_spark.sources.png import decode_png, encode_png
from physicsnemo_curator_spark.sources.tiff import (
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
    encode_tiff_multi,
)

TAGS = {
    "title": "Gradient Study",
    "author": "Curator",
    "description": "synthetic fixture",
    "software": "pcs",
    "date": "2026:08:15 12:00:00",
    "comment": "odd-length!",
}


def _img(h=16, w=24, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# PNG


def test_png_tags_round_trip():
    raw = encode_png(_img())
    assert IT.extract_image_tags(raw) == {}
    tagged = IT.embed_image_tags(raw, TAGS)
    assert IT.extract_image_tags(tagged) == TAGS
    a, _ = decode_png(raw)
    b, _ = decode_png(tagged)
    np.testing.assert_array_equal(a, b)


def test_png_tags_replace_family():
    raw = encode_png(_img())
    once = IT.embed_image_tags(raw, TAGS)
    twice = IT.embed_image_tags(once, {"comment": "v2"})
    assert IT.extract_image_tags(twice) == {"comment": "v2"}


def test_png_non_latin1_goes_itxt():
    raw = encode_png(_img())
    tagged = IT.embed_image_tags(raw, {"title": "smiley ☺"})
    assert b"iTXt" in tagged
    assert IT.extract_image_tags(tagged) == {"title": "smiley ☺"}
    a, _ = decode_png(tagged)
    np.testing.assert_array_equal(a, decode_png(raw)[0])


# ---------------------------------------------------------------------------
# JPEG


def test_jpeg_tags_round_trip_preserves_orientation():
    raw = embed_exif(encode_jpeg(_img(), quality=90), {"orientation": 6})
    tags = {k: v for k, v in TAGS.items() if k != "title"}
    tagged = IT.embed_image_tags(raw, tags)
    assert IT.extract_image_tags(tagged) == tags
    exif = extract_exif(tagged)
    assert exif["orientation"] == 6  # unmanaged tag survives
    a, _ = decode_jpeg(raw)
    b, _ = decode_jpeg(tagged)
    np.testing.assert_array_equal(a, b)


def test_jpeg_comment_only_leaves_exif_alone():
    raw = embed_exif(
        encode_jpeg(_img(), quality=85),
        {"orientation": 3, "description": "keep me"},
    )
    tagged = IT.embed_image_tags(raw, {"comment": "just a note"})
    got = IT.extract_image_tags(tagged)
    assert got["comment"] == "just a note"
    assert got["description"] == "keep me"
    assert extract_exif(tagged)["orientation"] == 3


def test_jpeg_exif_family_replaced():
    raw = encode_jpeg(_img(), quality=90)
    once = IT.embed_image_tags(raw, {"author": "a1", "software": "s1"})
    twice = IT.embed_image_tags(once, {"author": "a2"})
    got = IT.extract_image_tags(twice)
    assert got.get("author") == "a2"
    assert "software" not in got  # managed family fully replaced


def test_jpeg_title_refused():
    raw = encode_jpeg(_img(), quality=90)
    with pytest.raises(ValueError, match="JPEG"):
        IT.embed_image_tags(raw, {"title": "nope"})


# ---------------------------------------------------------------------------
# TIFF


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
def test_tiff_tags_round_trip_all_compressions(compression):
    raw = encode_tiff(_img(), compression=compression)
    tags = {k: v for k, v in TAGS.items() if k != "comment"}
    tagged = IT.embed_image_tags(raw, tags)
    assert IT.extract_image_tags(tagged) == tags
    a, _ = decode_tiff(raw)
    b, _ = decode_tiff(tagged)
    np.testing.assert_array_equal(a, b)


def test_tiff_embed_preserves_multipage_chain():
    pages = [_img(seed=1), _img(seed=2), _img(seed=3)]
    raw = encode_tiff_multi(pages, compression="lzw")
    tagged = IT.embed_image_tags(raw, {"title": "p", "author": "q"})
    got = decode_tiff_pages(tagged)
    assert len(got) == 3
    for (px, _), ref in zip(got, pages):
        np.testing.assert_array_equal(px, ref)
    assert IT.extract_image_tags(tagged) == {"title": "p", "author": "q"}


def test_tiff_tags_replace_family():
    raw = encode_tiff(_img())
    once = IT.embed_image_tags(raw, {"title": "t1", "software": "s1"})
    twice = IT.embed_image_tags(once, {"date": "2026:01:01 00:00:00"})
    assert IT.extract_image_tags(twice) == {"date": "2026:01:01 00:00:00"}
    a, _ = decode_tiff(twice)
    np.testing.assert_array_equal(a, decode_tiff(raw)[0])


def test_tiff_comment_refused():
    raw = encode_tiff(_img())
    with pytest.raises(ValueError, match="TIFF"):
        IT.embed_image_tags(raw, {"comment": "nope"})


def test_tiff_inline_short_value():
    # values <= 4 bytes (incl. NUL) stay inline in the IFD entry
    raw = encode_tiff(_img())
    tagged = IT.embed_image_tags(raw, {"title": "abc"})
    assert IT.extract_image_tags(tagged) == {"title": "abc"}


# ---------------------------------------------------------------------------
# GIF


def test_gif_comment_round_trip_static():
    raw = encode_gif([_img()])
    tagged = IT.embed_image_tags(raw, {"comment": "a gif note"})
    assert IT.extract_image_tags(tagged) == {"comment": "a gif note"}
    a, _ = decode_gif(raw)
    b, _ = decode_gif(tagged)
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)


def test_gif_comment_animation_and_replace():
    frames = [_img(seed=s) for s in range(3)]
    raw = encode_gif(frames, delay_cs=5)
    once = IT.embed_image_tags(raw, {"comment": "v1"})
    twice = IT.embed_image_tags(once, {"comment": "v2" * 200})  # multi-block
    assert IT.extract_image_tags(twice) == {"comment": "v2" * 200}
    a, _ = decode_gif(raw)
    b, _ = decode_gif(twice)
    assert len(b) == 3
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)


def test_gif_non_comment_refused():
    raw = encode_gif([_img()])
    with pytest.raises(ValueError, match="GIF"):
        IT.embed_image_tags(raw, {"title": "nope"})


def test_unknown_container_raises():
    with pytest.raises(ValueError, match="container"):
        IT.extract_image_tags(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="container"):
        IT.embed_image_tags(b"garbage", {"title": "x"})


# ---------------------------------------------------------------------------
# Spark operators (sources/multimodal.py)


def _media_df(spark):
    from physicsnemo_curator_spark.sources.aiff import encode_aiff
    from physicsnemo_curator_spark.sources.bmp import encode_bmp
    from physicsnemo_curator_spark.sources.multimodal import MEDIA_SCHEMA
    from physicsnemo_curator_spark.sources.wav import encode_wav

    sig = np.zeros(40)
    rows = [
        (0, "image", bytearray(encode_png(_img())), 24, 16, None),
        (1, "image", bytearray(encode_jpeg(_img(), quality=90)), 24, 16, None),
        (2, "image", bytearray(encode_tiff(_img())), 24, 16, None),
        (3, "video", bytearray(encode_gif([_img()] * 2)), 24, 16, None),
        (4, "audio", bytearray(encode_wav(sig, 8000)), None, None, None),
        (5, "audio", bytearray(encode_aiff(sig, 8000)), None, None, None),
        (6, "image", bytearray(encode_bmp(_img())), 24, 16, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_stamp_and_extract_media_tags_spark(spark):
    from physicsnemo_curator_spark.sources.multimodal import (
        stamp_media_tags,
        with_media_tags,
    )

    tags = {"title": "T", "author": "A", "comment": "C", "software": "S"}
    stamped = stamp_media_tags(_media_df(spark), tags)
    got = {
        r["media_id"]: r
        for r in with_media_tags(stamped).orderBy("media_id").collect()
    }
    # PNG carries everything
    assert [got[0][f"tag_{k}"] for k in ("title", "author", "comment",
                                          "software")] == ["T", "A", "C", "S"]
    # JPEG: no title home
    assert got[1]["tag_title"] is None
    assert (got[1]["tag_author"], got[1]["tag_comment"],
            got[1]["tag_software"]) == ("A", "C", "S")
    # TIFF: no comment home
    assert got[2]["tag_comment"] is None
    assert (got[2]["tag_title"], got[2]["tag_author"],
            got[2]["tag_software"]) == ("T", "A", "S")
    # GIF: comment only
    assert got[3]["tag_comment"] == "C"
    assert got[3]["tag_title"] is None
    # WAV: full set, author rides IART
    assert (got[4]["tag_title"], got[4]["tag_author"],
            got[4]["tag_comment"], got[4]["tag_software"]) == (
        "T", "A", "C", "S")
    # AIFF: title/author/comment only
    assert got[5]["tag_software"] is None
    assert (got[5]["tag_title"], got[5]["tag_author"],
            got[5]["tag_comment"]) == ("T", "A", "C")
    # BMP: no metadata structure — payload untouched, all tags null
    assert all(got[6][f"tag_{k}"] is None for k in (
        "title", "author", "comment", "software"))


def test_stamp_media_tags_preserves_decodes(spark):
    from physicsnemo_curator_spark.sources.bmp import decode_bmp
    from physicsnemo_curator_spark.sources.multimodal import stamp_media_tags
    from physicsnemo_curator_spark.sources.wav import decode_wav

    stamped = stamp_media_tags(
        _media_df(spark), {"comment": "prov", "software": "pcs"}
    )
    rows = {r["media_id"]: bytes(r["payload"])
            for r in stamped.collect()}
    np.testing.assert_array_equal(decode_png(rows[0])[0], _img())
    np.testing.assert_array_equal(decode_tiff(rows[2])[0], _img())
    np.testing.assert_array_equal(
        decode_wav(rows[4])[0], decode_wav(rows[4])[0]
    )
    # BMP untouched byte-for-byte
    from physicsnemo_curator_spark.sources.bmp import encode_bmp

    assert rows[6] == encode_bmp(_img())
    np.testing.assert_array_equal(decode_bmp(rows[6])[0], _img())


# ---------------------------------------------------------------------------
# review-pass regressions


def test_jpeg_non_ascii_tags_round_trip():
    # exif ASCII-typed entries carry UTF-8 bytes (exiftool behavior);
    # a non-ASCII author used to crash build_exif mid-stamp
    raw = encode_jpeg(_img(), quality=90)
    tagged = IT.embed_image_tags(
        raw, {"author": "José", "comment": "naïve café"}
    )
    got = IT.extract_image_tags(tagged)
    assert got["author"] == "José"
    assert got["comment"] == "naïve café"


def test_stamp_strict_surfaces_real_image_diagnostic(spark):
    from physicsnemo_curator_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        stamp_media_tags,
    )

    from physicsnemo_curator_spark.sources.imagetags import _gif_data_start

    raw = bytearray(encode_gif([_img()]))
    raw[_gif_data_start(raw)] = 0x99  # valid signature, bad block id
    df = spark.createDataFrame(
        [(0, "image", bytes(raw), 24, 16, None)], MEDIA_SCHEMA
    )
    # the real GIF diagnostic must surface, not a misrouted
    # "not a supported audio container"
    with pytest.raises(Exception, match="unknown GIF block"):
        stamp_media_tags(df, {"comment": "x"}, strict=True).collect()


def test_stamp_non_strict_passes_corrupt_through(spark):
    from physicsnemo_curator_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        stamp_media_tags,
    )

    from physicsnemo_curator_spark.sources.imagetags import _gif_data_start

    raw = bytearray(encode_gif([_img()]))
    raw[_gif_data_start(raw)] = 0x99
    corrupt = bytes(raw)
    df = spark.createDataFrame(
        [(0, "image", corrupt, 24, 16, None)], MEDIA_SCHEMA
    )
    (row,) = stamp_media_tags(df, {"comment": "x"}).collect()
    assert bytes(row["payload"]) == corrupt
