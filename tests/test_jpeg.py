"""Baseline JPEG codec (ITU T.81): round-trips across subsampling and
restart-marker configurations, exactness on flat images, spec-level
marker assertions, honest raises for the unsupported surface, and the
multimodal integration (resize end-to-end on encoded JPEGs)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import jpeg


def _smooth_rgb(h=29, w=37):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 3) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_flat_images_roundtrip_exactly():
    """DCT of a constant block is a lone DC coefficient — flat images
    survive bit-exactly whenever the DC quant step resolves the
    offset (base tables: any quality >= 50), and mid-gray (DC = 0)
    survives at ANY quality."""
    for q in (50, 75, 95):
        flat = np.full((16, 24), 130, dtype=np.uint8)
        out, meta = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=q))
        assert meta == {"width": 24, "height": 16, "channels": 1}
        assert np.abs(out.astype(int) - 130).max() == 0
    gray128 = np.full((8, 8), 128, dtype=np.uint8)
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(gray128, quality=5))
    assert np.abs(out.astype(int) - 128).max() == 0
    rgb = np.zeros((20, 22, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 50, 90
    for sub in ("444", "420"):
        out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, subsampling=sub))
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("rst", [0, 2])
def test_smooth_image_roundtrip_quality(sub, rst):
    img = _smooth_rgb()
    out, meta = jpeg.decode_jpeg(
        jpeg.encode_jpeg(
            img, quality=92, subsampling=sub, restart_interval=rst
        )
    )
    assert (meta["height"], meta["width"]) == img.shape[:2]
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < (1.0 if sub == "444" else 2.5)


def test_grayscale_gradient_high_quality():
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    grad = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(grad, quality=95))
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 0.5


def test_non_multiple_of_mcu_dimensions():
    """17x19 (444) and 29x37 (420, 16-pixel MCUs) both need edge
    padding that must not leak into the cropped output dims."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    out, meta = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == (17, 19, 3)
    out, meta = jpeg.decode_jpeg(
        jpeg.encode_jpeg(_smooth_rgb(29, 37), subsampling="420")
    )
    assert out.shape == (29, 37, 3)


def test_marker_structure():
    data = jpeg.encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # SOF0 present with 8-bit precision and our dims
    i = data.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack_from(">BHHB", data, i + 4)
    assert (prec, h, w, nc) == (8, 8, 8, 1)
    # DRI emitted only when requested
    assert b"\xff\xdd" not in data
    data2 = jpeg.encode_jpeg(
        np.zeros((32, 32), dtype=np.uint8), restart_interval=2
    )
    i = data2.index(b"\xff\xdd")
    assert struct.unpack_from(">H", data2, i + 4)[0] == 2
    assert b"\xff\xd0" in data2  # first restart marker present


def test_byte_stuffing_roundtrip():
    """Entropy bytes equal to 0xFF must be stuffed with 0x00 and
    unstuffed on decode — exercised by many random images."""
    rng = np.random.default_rng(3)
    for seed in range(4):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=30))
        assert out.shape == (16, 16)  # decodes despite heavy quant


def test_unsupported_raises_loudly():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG not a jpeg")
    data = bytearray(jpeg.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC9  # pretend arithmetic-coded sequential
    with pytest.raises(NotImplementedError, match="SOF9"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="shape"):
        jpeg.encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_resize_images_on_encoded_jpeg(spark):
    """resize_images decodes a baseline JPEG, resizes, and re-encodes
    as JPEG through the real Spark kernel (strict=True)."""
    from physicsnemo_curator_spark.sources import multimodal

    img = _smooth_rgb(16, 12)
    rows = [(1, "image", bytearray(jpeg.encode_jpeg(img, quality=95)),
             12, 16, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(
        media, width=6, height=8, strict=True
    ).collect()
    assert out[0].width == 6 and out[0].height == 8
    pixels, meta = jpeg.decode_jpeg(bytes(out[0].payload))
    assert meta == {"width": 6, "height": 8, "channels": 3}
    # content parity within JPEG quantization error
    ys = (np.arange(8) * 2).astype(np.int64)
    xs = (np.arange(6) * 2).astype(np.int64)
    expect = img[np.ix_(ys, xs)]
    assert np.abs(pixels.astype(int) - expect.astype(int)).mean() < 6


def test_extract_features_real_jpeg_stats(spark):
    from physicsnemo_curator_spark.sources import multimodal

    img = np.full((8, 10, 3), 128, dtype=np.uint8)
    rows = [(7, "image", bytearray(jpeg.encode_jpeg(img)), 10, 8, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_features(media, dim=8, strict=True).collect()[0]
    assert feat.feature[:3] == [10.0, 8.0, 3.0]
    assert abs(feat.feature[3] - 128 / 255) < 0.01


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker — real encoders emit them; the parser must skip them."""
    img = np.full((8, 8), 128, dtype=np.uint8)
    data = jpeg.encode_jpeg(img)
    i = data.index(b"\xff\xc0")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    out, meta = jpeg.decode_jpeg(padded)
    assert meta["width"] == 8 and np.abs(out.astype(int) - 128).max() == 0


def test_large_image_decode_is_linear_time():
    """The bit reader must mask consumed bits — unmasked, bitbuf grows
    into a huge int and decode goes quadratic (4.5 s at 256x256 before
    the fix; ~0.3 s after).  Generous bound to stay CI-safe."""
    import time

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=75)
    t0 = time.perf_counter()
    out, _ = jpeg.decode_jpeg(data)
    assert out.shape == (256, 256)
    assert time.perf_counter() - t0 < 2.5


def test_raw_plane_with_jpeg_signature_bytes(spark):
    """A raw grayscale plane whose first two bytes happen to be
    0xFF 0xD8 must still take the raw-plane gather (metadata wins over
    the 2-byte JPEG signature sniff)."""
    from physicsnemo_curator_spark.sources import multimodal

    plane = np.arange(256, dtype=np.uint8).reshape(16, 16)
    plane[0, 0], plane[0, 1] = 0xFF, 0xD8
    rows = [(1, "image", bytearray(plane.tobytes()), 16, 16, 256)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(
        media, width=4, height=4, strict=True
    ).collect()[0]
    got = np.frombuffer(bytes(out.payload), dtype=np.uint8).reshape(4, 4)
    ys = (np.arange(4) * 4).astype(np.int64)
    np.testing.assert_array_equal(got, plane[np.ix_(ys, ys)])


# --- progressive (SOF2) codec ----------------------------------------------


def _fixture_images():
    """Gradient / noise / sparse-impulse / flat images — sparse ones
    exercise long EOB runs (every other block all-zero AC), noise
    exercises dense refinement scans with interleaved correction
    bits, gradients exercise ZRL spans."""
    rng = np.random.default_rng(41)
    yy, xx = np.mgrid[0:24, 0:40]
    grad = ((xx * 255 / 39 + yy * 128 / 23) % 256).astype(np.uint8)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    sparse = np.zeros((24, 40), dtype=np.uint8)
    for _ in range(6):
        sparse[rng.integers(0, 24), rng.integers(0, 40)] = 255
    flat = np.full((24, 40), 77, dtype=np.uint8)
    return {"grad": grad, "noise": noise, "sparse": sparse, "flat": flat}


@pytest.mark.parametrize("quality", [25, 50, 75, 90, 95])
@pytest.mark.parametrize("kind", ["grad", "noise", "sparse", "flat"])
def test_progressive_matches_baseline_gray(kind, quality):
    """Progressive and baseline encodes share quant tables and
    coefficient math, so their decodes must be PIXEL-IDENTICAL.
    This is the test that would have caught both r08 encoder bugs:
    EOBn symbols absent from the Annex-K tables (sparse/flat images
    with >=2 consecutive all-zero-AC blocks) and the refinement-scan
    correction-bit/ZRL desync (noise images)."""
    img = _fixture_images()[kind]
    b, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
    p, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(img, quality=quality)
    )
    np.testing.assert_array_equal(b, p)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("kind", ["grad", "noise", "sparse"])
def test_progressive_matches_baseline_rgb(kind, sub):
    g = _fixture_images()[kind]
    img = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=2)
    b, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=85, subsampling=sub)
    )
    p, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(img, quality=85, subsampling=sub)
    )
    np.testing.assert_array_equal(b, p)


def test_progressive_odd_dimensions_and_tiny():
    """Non-MCU-multiple sizes and single-block images."""
    rng = np.random.default_rng(5)
    for shape in [(17, 31), (8, 8), (9, 9, 3), (64, 48, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b, mb = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=60))
        p, mp = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=60)
        )
        assert mb == mp
        np.testing.assert_array_equal(b, p)


def test_progressive_emits_sof2_and_parses_scan_script():
    """Marker-level pins: SOF2 frame, interleaved DC first scan at
    Al=1, DC refinement, then per-component AC first + refinement
    scans (6 SOS segments for a 3-component image)."""
    img = _smooth_rgb()
    data = jpeg.encode_jpeg_progressive(img, quality=80)
    assert data[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data[:200]
    # walk marker segments (entropy data can contain stuffed FF DA)
    sos_params = []
    pos = 2
    while pos < len(data) - 4:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m in (0x00, 0xFF) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if m == 0xDA:
            seg = data[pos + 4 : pos + 2 + ln]
            ns = seg[0]
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            sos_params.append((ns, ss, se, ahal >> 4, ahal & 0x0F))
            # skip entropy data to the next marker
            pos += 2 + ln
            while pos < len(data) - 1:
                if data[pos] == 0xFF and data[pos + 1] not in (0x00,) and not (
                    0xD0 <= data[pos + 1] <= 0xD7
                ):
                    break
                pos += 1
            continue
        pos += 2 + ln
    # 2 DC scans (first interleaved at Al=1, refine) + per-component
    # AC first + AC refine = 8 scans total
    assert sos_params[0] == (3, 0, 0, 0, 1)
    assert sos_params[1] == (3, 0, 0, 1, 0)
    assert sos_params[2:5] == [(1, 1, 63, 0, 1)] * 3
    assert sos_params[5:8] == [(1, 1, 63, 1, 0)] * 3
    assert len(sos_params) == 8


def test_external_progressive_jpeg_decodes():
    """Decode a REAL progressive JPEG produced by an external encoder
    (libjpeg-family tool; image is the openly-licensed `f3.jpg`
    board photo from the Rust Embedded Book assets).  This validates
    the SOF2 decode path — spectral selection, EOB runs, DC/AC
    refinement — against a bitstream the in-repo encoder did not
    produce.  Pixel stats are pinned from the first verified decode."""
    import pathlib

    path = pathlib.Path(__file__).parent / "data" / "progressive_external.jpg"
    px, meta = jpeg.decode_jpeg(path.read_bytes())
    assert meta == {"width": 720, "height": 477, "channels": 3}
    assert px.shape == (477, 720, 3) and px.dtype == np.uint8
    assert abs(float(px.mean()) - 107.86) < 0.02
    assert int(px[::100, ::100].sum()) == 16532


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("kind", ["grad", "noise", "sparse", "flat"])
def test_sequential_separate_scans_match_interleaved(kind, sub):
    """T.81 B.2.3 also allows a baseline frame whose components arrive
    in SEPARATE non-interleaved scans (Ns = 1 each).  Quant tables and
    coefficient math are shared with the interleaved script, so the
    decodes must be PIXEL-IDENTICAL, and each non-interleaved scan
    must cover the component's TRUE block grid (A.2.2), not the
    MCU-padded one — the distinction only 420 subsampling exercises."""
    g = _fixture_images()[kind]
    img = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=2)
    i, mi = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=80, subsampling=sub)
    )
    s, ms = jpeg.decode_jpeg(
        jpeg.encode_jpeg(
            img, quality=80, subsampling=sub, scan_script="separate"
        )
    )
    assert mi == ms
    np.testing.assert_array_equal(i, s)


def test_sequential_separate_scans_gray_restart_and_markers():
    """Grayscale separate == interleaved trivially (one component) but
    must still round-trip; with restart markers the per-scan restart
    numbering resets at 0.  Marker pin: 3 SOS segments with Ns=1 for
    an RGB separate encode, SOF0 frame."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 19), dtype=np.uint8)
    for rst in (0, 2):
        a, _ = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=70, restart_interval=rst)
        )
        b, _ = jpeg.decode_jpeg(
            jpeg.encode_jpeg(
                img, quality=70, restart_interval=rst,
                scan_script="separate",
            )
        )
        np.testing.assert_array_equal(a, b)

    rgb = _smooth_rgb(18, 26)
    data = jpeg.encode_jpeg(
        rgb, quality=85, subsampling="420", restart_interval=3,
        scan_script="separate",
    )
    sos_ns, sof = [], None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker == 0xC0:
            sof = 0xC0
        if marker == 0xC2:
            sof = 0xC2
        if marker == 0xDA:
            sos_ns.append(data[pos + 4])
            # skip entropy data to the next marker
            pos += 2 + seglen
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF
                and data[pos + 1] not in (0x00,)
                and not (0xD0 <= data[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += 2 + seglen
    assert sof == 0xC0 and sos_ns == [1, 1, 1]
    out, meta = jpeg.decode_jpeg(data)
    assert meta == {"width": 26, "height": 18, "channels": 3}


def test_12bit_flat_and_midgray_exact():
    """SOF1 12-bit: mid-range (2048) survives at ANY quality (DC of
    the level-shifted constant is 0) and other flat values at
    q >= 50, mirroring the 8-bit guarantees at 16x the range."""
    flat = np.full((16, 24), 2048, dtype=np.uint16)
    out, meta = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=5,
                                                  precision=12))
    assert meta == {"width": 24, "height": 16, "channels": 1, "bits": 12}
    assert out.dtype == np.uint16
    assert np.abs(out.astype(int) - 2048).max() == 0
    for v in (100, 3000, 4095):
        f = np.full((8, 8), v, dtype=np.uint16)
        o, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(f, quality=75,
                                                 precision=12))
        assert np.abs(o.astype(int) - v).max() <= 8  # DC step 16*16/8


def test_12bit_error_scales_with_8bit():
    """The x16-scaled quant tables must keep 12-bit quantization
    error proportionate to the 8-bit path: for the SAME image content
    the 12-bit max error stays within 1.5x of (8-bit error x 16)."""
    yy, xx = np.mgrid[0:24, 0:40]
    grad = ((xx * 4095 / 39 + yy * 2000 / 23) % 4096).astype(np.uint16)
    for q in (50, 75, 90):
        o12, _ = jpeg.decode_jpeg(
            jpeg.encode_jpeg(grad, quality=q, precision=12)
        )
        g8 = (grad // 16).astype(np.uint8)
        o8, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(g8, quality=q))
        e12 = np.abs(o12.astype(int) - grad.astype(int)).max()
        e8 = np.abs(o8.astype(int) - g8.astype(int)).max()
        assert e12 <= 1.5 * 16 * max(e8, 1)


def test_12bit_rgb_subsampling_and_scan_scripts():
    """12-bit RGB through 444/420, separate scans, and restart
    markers — the whole sequential feature matrix at the wider
    depth; separate and interleaved scripts stay pixel-identical."""
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4096, (24, 40), dtype=np.uint16)
    img = np.stack([g, np.roll(g, 3, axis=1), 4095 - g], axis=2)
    for sub in ("444", "420"):
        out, meta = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=85, subsampling=sub,
                             precision=12)
        )
        assert meta["bits"] == 12 and out.dtype == np.uint16
        assert out.shape == (24, 40, 3)
    a, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85,
                                             precision=12))
    b, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=85, precision=12,
                         scan_script="separate", restart_interval=2)
    )
    np.testing.assert_array_equal(a, b)


def test_12bit_marker_pins():
    """Spec pins: SOF1 (0xC1) with precision byte 12, DQT with Pq=1
    (16-bit entries, x16 Annex-K luma table), DHT DC table covering
    categories up to 15."""
    img = np.full((8, 8), 1000, dtype=np.uint16)
    data = jpeg.encode_jpeg(img, quality=50, precision=12)
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data
    i = data.index(b"\xff\xc1")
    assert data[i + 4] == 12  # precision
    i = data.index(b"\xff\xdb")
    assert data[i + 4] == 0x10  # Pq=1, Tq=0
    first_q = struct.unpack_from(">H", data, i + 5)[0]
    assert first_q == 16 * 16  # Annex-K luma [0]=16, x16, quality 50
    # 12-bit input rejected on the 8-bit path
    with pytest.raises(ValueError, match="4095"):
        jpeg.encode_jpeg(np.full((8, 8), 9000, dtype=np.uint16),
                         precision=12)


def test_sof1_with_8bit_samples_decodes():
    """SOF1 also carries 8-bit samples (T.81 Table B.2): patching a
    baseline file's SOF0 marker to SOF1 must decode identically."""
    img = _smooth_rgb(16, 20)
    data = bytearray(jpeg.encode_jpeg(img, quality=80))
    ref, _ = jpeg.decode_jpeg(bytes(data))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC1
    out, meta = jpeg.decode_jpeg(bytes(data))
    assert "bits" not in meta
    np.testing.assert_array_equal(ref, out)


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_lossless_roundtrip_all_predictors(predictor):
    """SOF3 lossless: decode(encode(x)) is BIT-EXACT for every T.81
    Table H.1 predictor, gray and RGB, 8- and 16-bit."""
    rng = np.random.default_rng(predictor)
    g8 = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    out, meta = jpeg.decode_jpeg(
        jpeg.encode_jpeg_lossless(g8, predictor=predictor)
    )
    assert meta == {"width": 17, "height": 13, "channels": 1}
    np.testing.assert_array_equal(out, g8)
    rgb16 = rng.integers(0, 65536, (6, 20, 3)).astype(np.uint16)
    out, meta = jpeg.decode_jpeg(
        jpeg.encode_jpeg_lossless(rgb16, predictor=predictor)
    )
    assert meta["bits"] == 16 and out.dtype == np.uint16
    np.testing.assert_array_equal(out, rgb16)


def test_lossless_markers_and_compression():
    """Marker pins: SOF3 frame, one DHT with 17 difference
    categories, one Ns=1 SOS per component carrying the predictor in
    Ss; a linear gradient (predictor-4 residuals all zero after the
    first samples) must compress far below raw size.  Worst-case
    modulo wraps (alternating 0 / 65535) survive via category 16."""
    yy, xx = np.mgrid[0:64, 0:64]
    grad = (xx * 3 + yy * 2).astype(np.uint16)
    data = jpeg.encode_jpeg_lossless(grad, predictor=4)
    assert b"\xff\xc3" in data
    i = data.index(b"\xff\xc3")
    assert data[i + 4] == 16  # precision
    i = data.index(b"\xff\xda")
    assert data[i + 4] == 1 and data[i + 7] == 4  # Ns=1, Ss=predictor
    assert len(data) < grad.nbytes // 4
    wrap = np.zeros((4, 9), dtype=np.uint16)
    wrap[:, 1::2] = 65535
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(wrap, predictor=1))
    np.testing.assert_array_equal(out, wrap)
    edge = np.array([[7]], dtype=np.uint8)  # 1x1: default prediction only
    out, meta = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(edge))
    assert out.shape == (1, 1) and out[0, 0] == 7


def test_lossless_rejects_out_of_range():
    with pytest.raises(ValueError, match="range"):
        jpeg.encode_jpeg_lossless(
            np.full((4, 4), 300, dtype=np.uint16), precision=8
        )
    with pytest.raises(ValueError, match="integer"):
        jpeg.encode_jpeg_lossless(np.zeros((4, 4)))


def test_cmyk_roundtrip_and_markers():
    """4-component (CMYK) baseline: Adobe APP14 transform-0 emitted,
    all components on the luma tables, round-trip within quant error,
    flat images exact, 12-bit and separate-scan variants included."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (13, 17, 4), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=95)
    i = data.index(b"Adobe")
    assert data[i + 11] == 0  # transform 0: stored directly
    out, meta = jpeg.decode_jpeg(data)
    assert meta == {"width": 17, "height": 13, "channels": 4}
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    flat = np.full((16, 8, 4), 128, dtype=np.uint8)
    o2, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=50))
    np.testing.assert_array_equal(o2, flat)

    c12 = rng.integers(0, 4096, (9, 9, 4), dtype=np.uint16)
    o3, m3 = jpeg.decode_jpeg(
        jpeg.encode_jpeg(c12, quality=90, precision=12)
    )
    assert m3["channels"] == 4 and m3["bits"] == 12

    a, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    b, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=95, scan_script="separate")
    )
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="444"):
        jpeg.encode_jpeg(img, subsampling="420")


def test_ycck_transform_via_patched_app14():
    """Adobe transform 2 (YCCK): patching the APP14 byte on a
    transform-0 stream must run the YCbCr math + inversion on the
    decoded planes — pinned against applying the same arithmetic to
    the transform-0 decode.  Unknown transforms raise."""
    rng = np.random.default_rng(5)
    # mid-range samples: the transform-0 reference decode must not
    # clip, or reconstructing the YCCK math from its rounded planes
    # diverges past one count
    img = rng.integers(96, 160, (8, 8, 4), dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg(img, quality=95))
    raw, _ = jpeg.decode_jpeg(bytes(data))  # (Y, Cb, Cr, K) as stored
    i = data.index(b"Adobe")
    data[i + 11] = 2
    out, _ = jpeg.decode_jpeg(bytes(data))
    y = raw[:, :, 0].astype(float)
    cb = raw[:, :, 1].astype(float) - 128.0
    cr = raw[:, :, 2].astype(float) - 128.0
    exp_c = 255.0 - (y + 1.402 * cr)
    exp_m = 255.0 - (y - 0.344136 * cb - 0.714136 * cr)
    exp_y = 255.0 - (y + 1.772 * cb)
    exp = np.clip(
        np.round(np.stack([exp_c, exp_m, exp_y,
                           raw[:, :, 3].astype(float)], axis=2)),
        0, 255,
    )
    # the pipeline transforms BEFORE the single rounding; applying the
    # math to already-rounded planes can differ by one count
    assert np.abs(out.astype(float) - exp).max() <= 1.0
    data[i + 11] = 3
    with pytest.raises(NotImplementedError, match="transform 3"):
        jpeg.decode_jpeg(bytes(data))


def test_lossless_subsampled_components_raise():
    """A SOF3 frame declaring subsampled components must raise the
    module's loud honest-subset error even for Ns=1 scans — decoding
    at frame geometry would overrun the bitstream."""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg_lossless(img))
    i = data.index(b"\xff\xc3")
    # seg: marker(2) len(2) prec(1) h(2) w(2) nc(1) [id sf tq]
    data[i + 11] = 0x21  # component 1 sampling: 2x1
    with pytest.raises(NotImplementedError, match="1x1"):
        jpeg.decode_jpeg(bytes(data))


def test_adobe_transform0_rgb_stored_directly():
    """A 3-component frame tagged Adobe transform 0 stores RGB
    channels directly: decode must skip the YCbCr inverse.  Built by
    splicing an APP14 segment into an in-repo encode and comparing
    against the YCbCr interpretation of the same stream."""
    rng = np.random.default_rng(6)
    img = rng.integers(96, 160, (8, 8, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=95)
    ycc, _ = jpeg.decode_jpeg(data)  # normal YCbCr interpretation
    app14 = (
        b"\xff\xee" + struct.pack(">H", 2 + 12)
        + b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0)
    )
    tagged = data[:2] + app14 + data[2:]
    raw, meta = jpeg.decode_jpeg(tagged)
    assert meta["channels"] == 3
    assert not np.array_equal(raw, ycc)  # transform actually skipped
    # the stored planes ARE our encoder's YCbCr of img: re-apply the
    # inverse manually and land near the normal decode (mid-range
    # samples -> no clipping; rounding differs by <= 1)
    y = raw[:, :, 0].astype(float)
    cb = raw[:, :, 1].astype(float) - 128.0
    cr = raw[:, :, 2].astype(float) - 128.0
    manual = np.clip(np.round(np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb], axis=2)), 0, 255)
    assert np.abs(manual - ycc.astype(float)).max() <= 1.0


def test_8bit_encode_rejects_wide_samples_and_resize_keeps_depth(spark):
    """encode_jpeg at precision 8 must refuse uint16 samples above 255
    (np.asarray(dtype=uint8) would wrap them mod 256 — silent
    corruption), and resize_images must re-encode a 12-bit payload at
    12-bit depth."""
    from physicsnemo_curator_spark.sources import multimodal

    with pytest.raises(ValueError, match="uint8"):
        jpeg.encode_jpeg(np.full((8, 8), 3000, dtype=np.uint16))
    # in-range wider dtypes still encode (explicit range check passes)
    out, _ = jpeg.decode_jpeg(
        jpeg.encode_jpeg(np.full((8, 8), 77, dtype=np.int64), quality=75)
    )
    assert np.abs(out.astype(int) - 77).max() == 0

    img12 = np.linspace(0, 4095, 16 * 16).reshape(16, 16).astype(np.uint16)
    payload = jpeg.encode_jpeg(img12, quality=95, precision=12)
    rows = [(1, "image", bytearray(payload), 16, 16, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out_row = multimodal.resize_images(
        media, width=8, height=8, strict=True
    ).collect()[0]
    px, meta = jpeg.decode_jpeg(bytes(out_row.payload))
    assert meta["bits"] == 12 and px.dtype == np.uint16
    assert int(px.max()) > 255  # depth survived the resize hop


def test_resize_wide_lossless_payload_keeps_depth(spark):
    """A 16-bit lossless JPEG payload through resize_images: samples
    above 4095 cannot take the 12-bit lossy re-encode — the kernel
    re-encodes LOSSLESSLY at 16-bit instead of crashing the task
    (and the result round-trips bit-exactly)."""
    from physicsnemo_curator_spark.sources import multimodal

    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (16, 16)).astype(np.uint16)
    payload = jpeg.encode_jpeg_lossless(img, precision=16)
    rows = [(1, "image", bytearray(payload), 16, 16, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(
        media, width=8, height=8, strict=True
    ).collect()[0]
    px, meta = jpeg.decode_jpeg(bytes(out.payload))
    assert meta["bits"] == 16 and px.dtype == np.uint16
    ys = (np.arange(8) * 2).astype(np.int64)
    xs = (np.arange(8) * 2).astype(np.int64)
    np.testing.assert_array_equal(px, img[np.ix_(ys, xs)])
    # negative integer samples rejected on the 8-bit path (would
    # silently wrap to near-white before the guard)
    with pytest.raises(ValueError, match="uint8"):
        jpeg.encode_jpeg(np.full((8, 8), -5, dtype=np.int16))


def test_hierarchical_lossless_roundtrip_and_structure():
    """Annex J lossless pyramid: DHP + SOF3 first frame + EXP/SOF7
    refinements, bit-exact at every precision; marker pins verify the
    pyramid really is hierarchical (one SOF3, levels SOF7s, levels
    EXPs, one DHP)."""
    import struct

    rng = np.random.default_rng(21)
    for shape, dtype, prec, levels in [
        ((13, 17), np.uint8, None, 2),
        ((13, 17, 3), np.uint8, None, 2),
        ((1, 1), np.uint8, None, 1),
        ((9, 4), np.uint16, 12, 2),
        ((6, 5, 3), np.uint16, 16, 3),
    ]:
        hi = 256 if dtype == np.uint8 else (1 << (prec or 16))
        px = rng.integers(0, hi, shape).astype(dtype)
        d = jpeg.encode_jpeg_hierarchical(px, levels=levels, precision=prec)
        out, meta = jpeg.decode_jpeg(d)
        np.testing.assert_array_equal(out, px)
        assert out.dtype == px.dtype

    px = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    d = jpeg.encode_jpeg_hierarchical(px, levels=2)
    markers = []
    pos = 2
    while pos + 4 <= len(d):
        assert d[pos] == 0xFF
        m = d[pos + 1]
        markers.append(m)
        if m == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", d, pos + 2)
        pos += 2 + seglen
        if m == 0xDA:  # skip entropy data to the next marker
            while pos + 1 < len(d) and not (
                d[pos] == 0xFF and d[pos + 1] != 0x00
            ):
                pos += 1
    assert markers.count(0xDE) == 1  # DHP
    assert markers.count(0xC3) == 1  # non-differential first frame
    assert markers.count(0xC7) == 2  # one differential frame per level
    assert markers.count(0xDF) == 2  # one EXP per refinement
    # DHP declares the FULL geometry, the first SOF3 the decimated one
    dhp_at = d.index(b"\xff\xde")
    _p, fh, fw, _n = struct.unpack_from(">BHHB", d, dhp_at + 4)
    assert (fh, fw) == (16, 16)
    sof3_at = d.index(b"\xff\xc3")
    _p, sh, sw, _n = struct.unpack_from(">BHHB", d, sof3_at + 4)
    assert (sh, sw) == (4, 4)


def test_hierarchical_honest_gates():
    """SOF7 without DHP, EXP without DHP, and differential DCT frames
    all raise loudly."""
    import struct

    px = np.zeros((8, 8), dtype=np.uint8)
    d = bytearray(jpeg.encode_jpeg_hierarchical(px, levels=1))
    # strip the DHP segment -> the SOF7 must complain
    at = bytes(d).index(b"\xff\xde")
    (seglen,) = struct.unpack_from(">H", d, at + 2)
    del d[at : at + 2 + seglen]
    with pytest.raises(ValueError, match="hierarchical"):
        jpeg.decode_jpeg(bytes(d))
    # differential DCT (SOF5) is codec-gated
    d2 = bytearray(jpeg.encode_jpeg_hierarchical(px, levels=1))
    at = bytes(d2).index(b"\xff\xc7")
    d2[at + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="SOF5"):
        jpeg.decode_jpeg(bytes(d2))


def test_hierarchical_expand_filter():
    """The Annex J interpolation: even outputs copy the reference,
    odd outputs are (a + b + 1) >> 1 with edge replication."""
    from physicsnemo_curator_spark.sources.jpeg import _hier_expand

    r = np.array([[0, 10], [20, 30]], dtype=np.int64)
    out = _hier_expand(r, 1, 1, 4, 4)
    exp = np.array(
        [
            [0, 5, 10, 10],
            [10, 15, 20, 20],
            [20, 25, 30, 30],
            [20, 25, 30, 30],
        ],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(out, exp)
    # crop to odd target dims
    np.testing.assert_array_equal(
        _hier_expand(r, 1, 1, 3, 3), exp[:3, :3]
    )


def test_hierarchical_dct_first_frame_is_gated():
    """Code-review regression: DHP followed by a DCT frame must raise
    rather than silently returning only the decimated stage."""
    import struct

    px = np.zeros((8, 8), dtype=np.uint8)
    d = bytearray(jpeg.encode_jpeg_hierarchical(px, levels=1))
    at = bytes(d).index(b"\xff\xc3")
    d[at + 1] = 0xC0  # rewrite the first frame to baseline SOF0
    with pytest.raises(NotImplementedError, match="hierarchical DCT"):
        jpeg.decode_jpeg(bytes(d))


def test_lossless_encoders_reject_negative_samples():
    neg = np.full((4, 4), -5, dtype=np.int16)
    with pytest.raises(ValueError, match="range"):
        jpeg.encode_jpeg_lossless(neg, precision=16)
    with pytest.raises(ValueError, match="range"):
        jpeg.encode_jpeg_hierarchical(neg, levels=1, precision=16)
