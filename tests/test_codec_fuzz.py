"""Opt-in codec fuzz soak: the full configuration matrix over every
pure-Python codec — the fuzzing class that catches encoder/decoder
desyncs the targeted unit tests miss (r08's progressive-JPEG EOB-run
and refinement-scan bugs were found exactly this way).

Gated behind ``SPARK_GRAFT_CODEC_FUZZ=1`` (~3400 configs, ~2 min):

    SPARK_GRAFT_CODEC_FUZZ=1 python -m pytest tests/test_codec_fuzz.py -q

Matrix: JPEG {noise, flat, sparse, gradient} x {1x1 .. 32x24} x
{gray, RGB, CMYK} x quality x subsampling x restart x scan script,
for 8-bit, 12-bit, progressive (pixel-identity vs baseline),
lossless (bit-exact, all 7 predictors x 8/12/16-bit), and the
hierarchical lossless pyramid (bit-exact, 1-3 levels x
8/12/16-bit); audio
{sine, noise, clip, silence, impulse} x block-boundary lengths
(504/505/506) x mono/stereo for IMA/MS-ADPCM, G.711 u/a-law, FLAC
and Ogg-FLAC (lossless paths must be bit-exact); AVI raw+MJPEG, MP4
raw+MJPEG (exact raw round-trips through the ISO BMFF sample
tables + 4 audio-track codecs x lengths x channels x rates), and
Matroska MJPEG lossy+lossless (bit-exact archival mode + 4
audio codec ids) x frame counts x geometries with every_n sampling
index checks; BMP gray+RGB, TIFF {4 compressions} x {2 predictors}
x {8/16-bit} x {gray,RGB,RGBA} + multi-page stacks, GIF gray frames
x interlace x animation lengths + LZW across all min code sizes —
every still-image path asserted bit-exact.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import avi, flac, jpeg, wav

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CODEC_FUZZ") != "1",
    reason="codec fuzz soak is opt-in (SPARK_GRAFT_CODEC_FUZZ=1)",
)

_RNG = np.random.default_rng(42)


def _image(kind, h, w, c):
    shape = (h, w) if c == 1 else (h, w, c)
    if kind == "noise":
        return _RNG.integers(0, 256, shape, dtype=np.uint8)
    if kind == "flat":
        return np.full(shape, 128, dtype=np.uint8)
    if kind == "sparse":
        return np.where(_RNG.random(shape) < 0.02, 255, 0).astype(np.uint8)
    g = (np.indices((h, w)).sum(0) % 256).astype(np.uint8)
    if c == 1:
        return g
    return np.stack([(g.astype(int) * k % 256) for k in range(1, c + 1)],
                    axis=2).astype(np.uint8)


_KINDS = ("noise", "flat", "sparse", "grad")
_GEOMS = ((1, 1), (8, 8), (7, 9), (16, 16), (17, 31), (32, 24))


def test_jpeg_8bit_matrix():
    for kind, (h, w), c, q, sub, rst, script in itertools.product(
        _KINDS, _GEOMS, (1, 3, 4), (10, 50, 90), ("444", "420"),
        (0, 2), ("interleaved", "separate"),
    ):
        if c == 4 and sub == "420":
            continue
        img = _image(kind, h, w, c)
        d = jpeg.encode_jpeg(
            img, quality=q, subsampling=sub, restart_interval=rst,
            scan_script=script,
        )
        out, _ = jpeg.decode_jpeg(d)
        assert out.shape == img.shape, (kind, h, w, c, q, sub, rst, script)


def test_jpeg_12bit_matrix():
    for kind, (h, w), c in itertools.product(_KINDS, _GEOMS, (1, 3, 4)):
        img8 = _image(kind, h, w, c)
        img = (
            img8.astype(np.uint16) * 16
            + _RNG.integers(0, 16, img8.shape)
        ).astype(np.uint16)
        for script in ("interleaved", "separate"):
            d = jpeg.encode_jpeg(
                img, quality=90, precision=12, scan_script=script
            )
            out, _ = jpeg.decode_jpeg(d)
            assert out.shape == img.shape and out.dtype == np.uint16


def test_jpeg_progressive_pixel_identity_matrix():
    for kind, (h, w), c, q, sub in itertools.product(
        _KINDS, _GEOMS, (1, 3), (25, 75, 95), ("444", "420")
    ):
        img = _image(kind, h, w, c)
        b, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q,
                                                 subsampling=sub))
        p, _ = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=q, subsampling=sub)
        )
        np.testing.assert_array_equal(b, p, err_msg=f"{kind} {h}x{w}")


def test_jpeg_lossless_bit_exact_matrix():
    for kind, (h, w), c, pred, prec in itertools.product(
        _KINDS, _GEOMS, (1, 3), range(1, 8), (8, 12, 16)
    ):
        img8 = _image(kind, h, w, c)
        if prec == 8:
            img = img8
        else:
            img = (
                (img8.astype(np.uint16) << (prec - 8))
                + _RNG.integers(0, 1 << (prec - 8), img8.shape)
            ).astype(np.uint16)
        d = jpeg.encode_jpeg_lossless(img, predictor=pred, precision=prec)
        out, _ = jpeg.decode_jpeg(d)
        np.testing.assert_array_equal(
            out.astype(np.int64), img.astype(np.int64),
            err_msg=f"{kind} {h}x{w}x{c} p{pred} {prec}",
        )


def _signal(kind, n):
    if kind == "sine":
        return 0.7 * np.sin(np.arange(n) / 7.0)
    if kind == "noise":
        return _RNG.uniform(-1, 1, n)
    if kind == "clip":
        return np.where(_RNG.random(n) < 0.5, 1.5, -1.5)
    if kind == "silence":
        return np.zeros(n)
    return np.where(_RNG.random(n) < 0.01, 1.0, 0.0)


def test_audio_codec_matrix():
    codecs = [
        ("ima", lambda s: wav.encode_wav(s, 8000, bits=4), wav.decode_wav,
         False),
        ("ms", lambda s: wav.encode_wav(s, 8000, codec="ms_adpcm"),
         wav.decode_wav, False),
        ("ulaw", lambda s: wav.encode_wav(s, 8000, codec="ulaw"),
         wav.decode_wav, False),
        ("alaw", lambda s: wav.encode_wav(s, 8000, codec="alaw"),
         wav.decode_wav, False),
        ("flac", lambda s: flac.encode_flac(s, 8000, block_size=512),
         flac.decode_flac, True),
        ("ogg", lambda s: flac.encode_ogg_flac(s, 8000, block_size=512),
         flac.decode_ogg_flac, True),
    ]
    for kind, n, ch in itertools.product(
        ("sine", "noise", "clip", "silence", "impulse"),
        (1, 5, 504, 505, 506, 2000),
        (1, 2),
    ):
        base = _signal(kind, n)
        sig = base if ch == 1 else np.stack([base, -base], axis=1)
        for tag, enc, dec, lossless in codecs:
            out, meta = dec(enc(sig))
            assert meta["n_frames"] == n, (tag, kind, n, ch)
            got_ch = 1 if out.ndim == 1 else out.shape[1]
            assert got_ch == ch, (tag, kind, n, ch)
            if lossless:
                q = np.round(np.clip(sig, -1, 1) * 32767) / 32768
                np.testing.assert_array_equal(
                    out.reshape(n, ch), q.reshape(n, ch),
                    err_msg=f"{tag} {kind} n{n} ch{ch}",
                )


def test_aiff_matrix():
    from physicsnemo_curator_spark.sources import aiff

    for kind, n, ch, rate in itertools.product(
        ("sine", "noise", "clip", "silence"),
        (1, 63, 64, 65, 2000),
        (1, 2),
        (8000, 44100),
    ):
        base = _signal(kind, n)
        sig = base if ch == 1 else np.stack([base, -base], axis=1)
        out, meta = aiff.decode_aiff(aiff.encode_aiff(sig, rate))
        assert meta["n_frames"] == n and meta["sample_rate"] == rate
        q = np.round(np.clip(sig, -1, 1) * 32767) / 32768
        np.testing.assert_array_equal(
            out.reshape(n, ch), q.reshape(n, ch),
            err_msg=f"{kind} n{n} ch{ch}",
        )


def test_avi_matrix():
    for codec, nf, (h, w), c in itertools.product(
        ("raw", "mjpeg"), (1, 3, 7),
        ((1, 1), (6, 4), (16, 16), (5, 13)), (1, 3),
    ):
        frames = [
            _RNG.integers(
                0, 256, (h, w) if c == 1 else (h, w, c), dtype=np.uint8
            )
            for _ in range(nf)
        ]
        d = avi.encode_avi(frames, fps=10, codec=codec)
        out, _ = avi.decode_avi(d)
        assert len(out) == nf
        for en in (1, 2, 3):
            idxs = [i for i, _ in avi.iter_avi_frames(d, every_n=en)]
            assert idxs == list(range(0, nf, en))


def test_mp4_matrix():
    from physicsnemo_curator_spark.sources import mp4

    for codec, nf, (h, w), c in itertools.product(
        ("raw", "mjpeg"), (1, 3, 7),
        ((1, 1), (6, 4), (16, 16), (5, 13)), (1, 3),
    ):
        frames = [
            _RNG.integers(
                0, 256, (h, w) if c == 1 else (h, w, c), dtype=np.uint8
            )
            for _ in range(nf)
        ]
        d = mp4.encode_mp4(frames, fps=10, codec=codec)
        out, _ = mp4.decode_mp4(d)
        assert len(out) == nf
        if codec == "raw":
            for a, b in zip(frames, out):
                exp = np.stack([a] * 3, axis=2) if c == 1 else a
                np.testing.assert_array_equal(exp, b)
        for en in (1, 2, 3):
            idxs = [i for i, _ in mp4.iter_mp4_frames(d, every_n=en)]
            assert idxs == list(range(0, nf, en))


def test_mp4_audio_matrix():
    from physicsnemo_curator_spark.sources import mp4

    frames = [np.zeros((4, 4), dtype=np.uint8)] * 2
    for ac, n, ch, rate in itertools.product(
        ("sowt", "twos", "ulaw", "alaw"), (1, 100, 4001), (1, 2),
        (8000, 44100),
    ):
        sig = np.sin(np.arange(n) / 7.0) * 0.6
        audio = sig if ch == 1 else np.stack([sig, -sig], axis=1)
        d = mp4.encode_mp4_with_audio(
            frames, audio, rate, codec="raw", audio_codec=ac
        )
        out, meta = mp4.extract_mp4_audio(d)
        assert meta["n_frames"] == n and meta["channels"] == ch
        assert meta["sample_rate"] == rate
        tol = 1e-12 if ac in ("sowt", "twos") else 0.05
        exp = np.round(np.clip(audio, -1, 1) * 32767) / 32768
        ref = exp if ac in ("sowt", "twos") else audio
        assert np.abs(out.reshape(-1) - np.asarray(ref).reshape(-1)).max() <= tol + 1e-9


def test_mkv_matrix():
    from physicsnemo_curator_spark.sources import mkv

    for codec, nf, (h, w), c in itertools.product(
        ("mjpeg", "mjpeg_lossless"), (1, 3, 7),
        ((1, 1), (6, 4), (16, 16), (5, 13)), (1, 3),
    ):
        if codec == "mjpeg_lossless" and c == 3:
            frames = [
                _RNG.integers(0, 256, (h, w), dtype=np.uint8)
                for _ in range(nf)
            ]
        else:
            frames = [
                _RNG.integers(
                    0, 256, (h, w) if c == 1 else (h, w, c),
                    dtype=np.uint8,
                )
                for _ in range(nf)
            ]
        d = mkv.encode_mkv(frames, fps=10, codec=codec)
        out, _ = mkv.decode_mkv(d)
        assert len(out) == nf
        if codec == "mjpeg_lossless":
            for a, b in zip(frames, out):
                np.testing.assert_array_equal(a, b)
        for en in (1, 2, 3):
            idxs = [i for i, _ in mkv.iter_mkv_frames(d, every_n=en)]
            assert idxs == list(range(0, nf, en))


def test_mkv_audio_matrix():
    from physicsnemo_curator_spark.sources import mkv

    frames = [np.zeros((4, 4), dtype=np.uint8)] * 2
    for ac, n, ch in itertools.product(
        ("pcm", "pcm_be", "ulaw", "alaw"), (1, 100, 4001), (1, 2)
    ):
        sig = np.sin(np.arange(n) / 7.0) * 0.6
        audio = sig if ch == 1 else np.stack([sig, -sig], axis=1)
        d = mkv.encode_mkv(
            frames, audio=audio, sample_rate=8000, audio_codec=ac
        )
        out, meta = mkv.extract_mkv_audio(d)
        assert meta["n_frames"] == n and meta["channels"] == ch
        tol = 1e-12 if ac.startswith("pcm") else 0.05
        exp = np.round(np.clip(audio, -1, 1) * 32767) / 32768
        ref = exp if ac.startswith("pcm") else audio
        assert np.abs(out.reshape(-1) - np.asarray(ref).reshape(-1)).max() <= tol + 1e-9


def test_mkv_lacing_matrix():
    from physicsnemo_curator_spark.sources import mkv

    frames = [np.zeros((4, 4), dtype=np.uint8)] * 2
    for lacing, ac, n, ch, lf in itertools.product(
        ("xiph", "ebml", "fixed"),
        ("pcm", "ulaw"),
        (2, 97, 960, 4001),
        (1, 2),
        (2, 7, 64),
    ):
        if lacing == "fixed" and n % min(lf, n):
            continue  # fixed lacing requires an even split
        sig = np.sin(np.arange(n) / 7.0) * 0.6
        audio = sig if ch == 1 else np.stack([sig, -sig], axis=1)
        d = mkv.encode_mkv(
            frames, audio=audio, sample_rate=8000, audio_codec=ac,
            audio_lacing=lacing, lace_frames=lf,
        )
        out, meta = mkv.extract_mkv_audio(d)
        assert meta["n_frames"] == n and meta["channels"] == ch, (
            lacing, ac, n, ch, lf,
        )
        exp = np.round(np.clip(audio, -1, 1) * 32767) / 32768
        ref = exp if ac == "pcm" else audio
        tol = 1e-12 if ac == "pcm" else 0.05
        assert (
            np.abs(out.reshape(-1) - np.asarray(ref).reshape(-1)).max()
            <= tol + 1e-9
        ), (lacing, ac, n, ch, lf)
        frames_out, _ = mkv.decode_mkv(d)
        assert len(frames_out) == 2  # laced audio never leaks


def test_bmp_matrix():
    from physicsnemo_curator_spark.sources import bmp

    for kind, (h, w), c in itertools.product(
        _KINDS, _GEOMS, (1, 3)
    ):
        px = _image(kind, h, w, c)
        out, _ = bmp.decode_bmp(bmp.encode_bmp(px))
        np.testing.assert_array_equal(out, px)


def test_tiff_matrix():
    from physicsnemo_curator_spark.sources import tiff

    for kind, (h, w), c, comp, pred, wide in itertools.product(
        _KINDS, _GEOMS, (1, 3, 4), ("none", "lzw", "deflate", "packbits"),
        (1, 2), (False, True),
    ):
        px = _image(kind, h, w, c)
        if wide:
            px = (
                px.astype(np.uint16) * 256
                + _RNG.integers(0, 256, px.shape)
            ).astype(np.uint16)
            if c == 4:
                continue  # 16-bit RGBA out of matrix scope
        d = tiff.encode_tiff(px, compression=comp, predictor=pred)
        out, _ = tiff.decode_tiff(d)
        np.testing.assert_array_equal(out, px)
        dt = tiff.encode_tiff(
            px, compression=comp, predictor=pred, tile=(16, 16)
        )
        out, _ = tiff.decode_tiff(dt)
        np.testing.assert_array_equal(out, px)


def test_tiff_multipage_matrix():
    from physicsnemo_curator_spark.sources import tiff

    for n_pages, comp in itertools.product(
        (1, 2, 5), ("none", "lzw", "deflate")
    ):
        pages = [
            _RNG.integers(0, 256, (7, 9), dtype=np.uint8)
            for _ in range(n_pages)
        ]
        d = tiff.encode_tiff_multi(pages, compression=comp)
        decoded = tiff.decode_tiff_pages(d)
        assert len(decoded) == n_pages
        for a, (b, _m) in zip(pages, decoded):
            np.testing.assert_array_equal(a, b)


def test_gif_matrix():
    from physicsnemo_curator_spark.sources import gif

    for kind, (h, w), nf, interlace in itertools.product(
        _KINDS, _GEOMS, (1, 3, 7), (False, True)
    ):
        frames = [_image(kind, h, w, 1) for _ in range(nf)]
        d = gif.encode_gif(frames, interlace=interlace, delay_cs=3)
        out, meta = gif.decode_gif(d)
        assert meta["n_frames"] == nf
        for a, b in zip(frames, out):
            np.testing.assert_array_equal(a, b)
        for en in (1, 2, 3):
            idxs = [i for i, _ in gif.iter_gif_frames(d, every_n=en)]
            assert idxs == list(range(0, nf, en))


def test_gif_lzw_min_code_sizes():
    from physicsnemo_curator_spark.sources import gif

    for mcs in range(2, 9):
        lim = 1 << mcs
        for n in (1, 700, 9000):
            raw = _RNG.integers(0, lim, n).astype(np.uint8).tobytes()
            enc = gif._gif_lzw_encode(raw, mcs)
            assert gif._gif_lzw_decode(enc, mcs) == raw, (mcs, n)


def test_jpeg_hierarchical_matrix():
    for kind, (h, w), c, levels, prec in itertools.product(
        _KINDS, _GEOMS, (1, 3), (1, 2, 3), (8, 12, 16)
    ):
        img8 = _image(kind, h, w, c)
        if prec == 8:
            img = img8
        else:
            img = (
                (img8.astype(np.uint16) << (prec - 8))
                + _RNG.integers(0, 1 << (prec - 8), img8.shape)
            ).astype(np.uint16)
        d = jpeg.encode_jpeg_hierarchical(
            img, levels=levels, precision=prec
        )
        out, _ = jpeg.decode_jpeg(d)
        np.testing.assert_array_equal(
            out.astype(np.int64), img.astype(np.int64),
            err_msg=f"{kind} {h}x{w}x{c} L{levels} {prec}b",
        )


def test_qoi_matrix():
    from physicsnemo_curator_spark.sources import qoi

    for kind, (h, w), c in itertools.product(_KINDS, _GEOMS, (1, 3, 4)):
        px = _image(kind, h, w, c)
        out, _ = qoi.decode_qoi(qoi.encode_qoi(px))
        ref = np.repeat(px[:, :, None], 3, 2) if c == 1 else px
        np.testing.assert_array_equal(out, ref, err_msg=f"{kind} {h}x{w}x{c}")


def test_pnm_matrix():
    from physicsnemo_curator_spark.sources import pnm

    for kind, (h, w), c, wide in itertools.product(
        _KINDS, _GEOMS, (1, 3), (False, True)
    ):
        px = _image(kind, h, w, c)
        if wide:
            px = (
                px.astype(np.uint16) * 256
                + _RNG.integers(0, 256, px.shape)
            ).astype(np.uint16)
        out, _ = pnm.decode_pnm(pnm.encode_pnm(px))
        np.testing.assert_array_equal(out, px)
    for kind, (h, w) in itertools.product(_KINDS, _GEOMS):
        mask = _image(kind, h, w, 1) > 127
        out, _ = pnm.decode_pnm(pnm.encode_pnm(mask))
        np.testing.assert_array_equal(out.astype(bool), mask)


def test_bigtiff_matrix():
    from physicsnemo_curator_spark.sources import tiff

    for kind, (h, w), c, comp in itertools.product(
        _KINDS, _GEOMS, (1, 3), ("none", "lzw", "deflate", "packbits")
    ):
        px = _image(kind, h, w, c)
        d = tiff.encode_tiff(px, compression=comp, bigtiff=True)
        out, meta = tiff.decode_tiff(d)
        assert meta["bigtiff"] is True
        np.testing.assert_array_equal(out, px)


def test_flac_lpc_matrix():
    from physicsnemo_curator_spark.sources import flac

    t = np.arange(3000)
    signals = {
        "sine": np.sin(2 * np.pi * 440 * t / 8000) * 0.5,
        "sweep": np.sin(2 * np.pi * (100 + t * 0.2) * t / 8000) * 0.4,
        "noise": _RNG.normal(0, 0.2, len(t)).clip(-1, 1),
        "steps": np.repeat(_RNG.normal(0, 0.4, 30).clip(-1, 1), 100),
        "silence": np.zeros(len(t)),
    }
    for name, sig in signals.items():
        for mode in ("fixed", "lpc", "auto"):
            for bs in (256, 1024, 4096):
                enc = flac.encode_flac(sig, 8000, block_size=bs,
                                       predictor=mode)
                out, _ = flac.decode_flac(enc)  # md5 verified inside
                ref = np.round(np.clip(sig, -1, 1) * 32767) / 32768
                np.testing.assert_array_equal(
                    out.reshape(-1), ref, err_msg=f"{name} {mode} {bs}"
                )


def test_ico_matrix():
    from physicsnemo_curator_spark.sources import ico

    for kind, (h, w), c in itertools.product(_KINDS, _GEOMS, (1, 3)):
        px = _image(kind, h, w, c)
        for as_png in (False, True):
            entries = ico.decode_ico(ico.encode_ico([px], as_png=as_png))
            # DIB entries are always 24-bit (gray promotes to RGB);
            # PNG entries keep the source color type
            ref = (
                px
                if (as_png or c == 3)
                else np.repeat(px[:, :, None], 3, 2)
            )
            np.testing.assert_array_equal(entries[0][0], ref)


def test_tga_matrix():
    from physicsnemo_curator_spark.sources import tga

    for kind, (h, w), c in itertools.product(_KINDS, _GEOMS, (1, 3, 4)):
        px = _image(kind, h, w, c)
        for rle in (False, True):
            out, _ = tga.decode_tga(tga.encode_tga(px, rle=rle))
            np.testing.assert_array_equal(
                out, px, err_msg=f"{kind} {h}x{w}x{c} rle={rle}"
            )


def test_fmp4_matrix():
    """Fragmented MP4 over codec × frame-count × fragment-size ×
    audio: every sample must decode identically to the progressive
    encoding of the same frames, and truncating anywhere inside the
    stream must raise ValueError (never IndexError)."""
    from physicsnemo_curator_spark.sources import mp4

    for codec, nf, spf, with_audio in itertools.product(
        ("raw", "mjpeg"), (1, 3, 7), (1, 2, 5), (False, True)
    ):
        frames = [
            _RNG.integers(0, 256, (6, 4, 3), dtype=np.uint8)
            for _ in range(nf)
        ]
        kw = {}
        if with_audio:
            kw = dict(
                audio=np.sin(np.arange(300) / 5.0) * 0.5,
                sample_rate=8000,
                audio_codec="sowt",
            )
        d = mp4.encode_fmp4(
            frames, fps=10, codec=codec, samples_per_fragment=spf, **kw
        )
        out, meta = mp4.decode_mp4(d)
        ref, _ = mp4.decode_mp4(mp4.encode_mp4(frames, fps=10, codec=codec))
        assert meta["fragmented"] and len(out) == nf
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(a, b)
        if with_audio:
            sig, am = mp4.extract_mp4_audio(d)
            assert am["n_frames"] == 300 and am["sample_rate"] == 8000

    # truncation sweep: ValueError or silently-shorter parse, never
    # IndexError/struct.error (the codec's malformed-input contract)
    d = mp4.encode_fmp4(
        [_RNG.integers(0, 256, (6, 4, 3), dtype=np.uint8) for _ in range(4)],
        fps=10, codec="raw", samples_per_fragment=2,
        audio=np.ones(64) * 0.1, sample_rate=8000, audio_codec="sowt",
    )
    for cut in range(12, len(d), 7):
        try:
            mp4.parse_mp4(d[:cut])
        except (ValueError, NotImplementedError):
            pass
