"""Perceptual image hashing (aHash/dHash/pHash) and the banded image
near-dup operator: kernel exactness vs scalar reference, codec-path
parity (an encoded PNG hashes identically to its raw plane), the
pigeonhole completeness guarantee, plan shape (no all-pairs), and
strict/plumbing policy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import imagehash as ih
from physicsnemo_curator_spark.sources import multimodal as mm
from physicsnemo_curator_spark.sources import png

_RNG = np.random.default_rng(17)


def test_dhash_kernel_matches_scalar_reference():
    px = _RNG.integers(0, 256, (8, 9), dtype=np.uint8)
    h, bits = ih.dhash_kernel(px)
    exp = "".join(
        "1" if px[r, c + 1] > px[r, c] else "0"
        for r in range(8)
        for c in range(8)
    )
    assert bits == exp
    assert (h & 0xFFFFFFFFFFFFFFFF) == int(bits, 2)


def test_ahash_kernel_matches_scalar_reference():
    px = _RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    _h, bits = ih.ahash_kernel(px)
    m = px.mean()
    exp = "".join(
        "1" if px[r, c] > m else "0" for r in range(8) for c in range(8)
    )
    assert bits == exp


def test_phash_properties():
    """Deterministic, 64 bits, invariant under lossless re-encode,
    sensitive to heavy content change."""
    px = _RNG.integers(0, 256, (64, 48), dtype=np.uint8)
    h1, bits = ih.phash_kernel(px)
    assert len(bits) == 64
    assert ih.phash_kernel(px.copy()) == (h1, bits)
    # constant-shift robustness: dHash unchanged under +10 brightness
    shifted = np.clip(px.astype(int) + 10, 0, 255).astype(np.uint8)
    assert ih.dhash_kernel(shifted) == ih.dhash_kernel(px)
    # a very different image yields a distant pHash
    other = _RNG.integers(0, 256, (64, 48), dtype=np.uint8)
    d = bin(
        (ih.phash_kernel(px)[0] ^ ih.phash_kernel(other)[0])
        & 0xFFFFFFFFFFFFFFFF
    ).count("1")
    assert d > 10


def test_encoded_png_hashes_like_its_raw_plane(spark):
    """The codec decode path and the raw-plane path must agree —
    PNG is lossless, so the decoded pixels are the plane."""
    plane = _RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(plane.tobytes()), 16, 16, 256),
        (2, "image", bytearray(png.encode_png(plane)), None, None, 0),
        (3, "audio", bytearray(b"xx"), None, None, 2),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r.media_id: (r.hash, r.bits)
        for r in ih.with_image_hashes(df, method="phash").collect()
    }
    assert set(got) == {1, 2}  # audio row dropped
    assert got[1] == got[2]


def test_near_duplicates_pigeonhole_completeness(spark):
    """Every pair within max_hamming <= n_bands-1 MUST be found; a
    1-bit perturbation of a raw plane flips at most 2 dHash bits."""
    rows = []
    planes = {}
    for i in range(30):
        plane = _RNG.integers(0, 256, (8, 9), dtype=np.uint8)
        pert = plane.copy()
        pert[i % 8, i % 9] = (int(pert[i % 8, i % 9]) + 1) % 256
        planes[2 * i] = plane
        planes[2 * i + 1] = pert
        rows.append((2 * i, "image", bytearray(plane.tobytes()), 9, 8, 72))
        rows.append(
            (2 * i + 1, "image", bytearray(pert.tobytes()), 9, 8, 72)
        )
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r.a, r.b): r.hamming
        for r in ih.image_near_duplicates(
            df, method="dhash", max_hamming=3, n_bands=4
        ).collect()
    }
    for i in range(30):
        a, b = 2 * i, 2 * i + 1
        exp = bin(
            (ih.dhash_kernel(planes[a])[0] ^ ih.dhash_kernel(planes[b])[0])
            & 0xFFFFFFFFFFFFFFFF
        ).count("1")
        if exp <= 3:
            assert (a, b) in pairs and pairs[(a, b)] == exp
    with pytest.raises(ValueError, match="pigeonhole"):
        ih.image_near_duplicates(df, max_hamming=8, n_bands=4)


def test_near_duplicates_plan_never_all_pairs(spark):
    """The candidate join must be an equi-join on (band, block) —
    no CartesianProduct / BroadcastNestedLoopJoin in the plan."""
    rows = [
        (i, "image", bytearray(_RNG.integers(0, 256, 72, dtype=np.uint8).tobytes()), 9, 8, 72)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    plan = (
        ih.image_near_duplicates(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_strict_policy(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"NOTANIMAGE!"), 4, 4, 11)],
        mm.MEDIA_SCHEMA,
    )
    assert ih.with_image_hashes(df).count() == 0
    with pytest.raises(Exception):
        ih.with_image_hashes(df, strict=True).collect()


def test_gray_alpha_and_rgba_channel_policy():
    """Code-review regression: 2-channel arrays hash on channel 0
    only (alpha ignored) and 4-channel arrays on their RGB part —
    identical luma with different alpha must hash identically."""
    gray = _RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    a1 = np.dstack([gray, np.zeros_like(gray)])
    a2 = np.dstack([gray, _RNG.integers(0, 256, (16, 16), dtype=np.uint8)])
    assert ih.phash_kernel(a1) == ih.phash_kernel(a2) == ih.phash_kernel(gray)
    rgb = _RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    r1 = np.dstack([rgb, np.zeros((16, 16), dtype=np.uint8)])
    r2 = np.dstack([rgb, np.full((16, 16), 255, dtype=np.uint8)])
    assert ih.dhash_kernel(r1) == ih.dhash_kernel(r2) == ih.dhash_kernel(rgb)


def test_recall_heuristic_regime_opt_out(spark):
    """banded_hamming_pairs guards completeness by default but allows
    the SimHash-style max_hamming > n_bands-1 heuristic on request."""
    sig = spark.createDataFrame(
        [(1, 0), (2, 3)], ["media_id", "hash"]
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        ih.banded_hamming_pairs(sig, max_hamming=8, n_bands=4)
    rows = ih.banded_hamming_pairs(
        sig, max_hamming=8, n_bands=4, require_complete=False
    ).collect()
    assert [(r.a, r.b, r.hamming) for r in rows] == [(1, 2, 2)]


def test_video_fingerprint_majority_consensus(spark):
    """The video signature is the per-bit majority of sampled frame
    hashes — identical across the raw-concatenation, AVI and animated
    GIF paths of the same frames."""
    from physicsnemo_curator_spark.sources import avi, gif

    planes = [
        _RNG.integers(0, 256, (8, 9), dtype=np.uint8) for _ in range(4)
    ]
    payload = b"".join(p.tobytes() for p in planes)
    davi = avi.encode_avi(planes, fps=10, codec="raw")
    dgif = gif.encode_gif(planes, delay_cs=5)
    rows = [
        (1, "video", bytearray(payload), 9, 8, len(payload)),
        (2, "video", bytearray(davi), None, None, len(davi)),
        (3, "video", bytearray(dgif), None, None, len(dgif)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    fp = {
        r.media_id: (r.bits, r.hash, r.n_frames_hashed)
        for r in ih.with_video_fingerprints(df).collect()
    }
    per = [ih.dhash_kernel(p)[1] for p in planes]

    def vote(k):
        s = sum(b[k] == "1" for b in per)
        if 2 * s > 4:
            return "1"
        if 2 * s == 4:
            return per[0][k]  # ties resolve to frame 0's bit
        return "0"

    maj = "".join(vote(k) for k in range(64))
    assert fp[1][0] == fp[2][0] == fp[3][0] == maj
    assert all(fp[i][2] == 4 for i in (1, 2, 3))
    # signed-long pack matches the bit string
    assert (fp[1][1] & 0xFFFFFFFFFFFFFFFF) == int(maj, 2)
    pairs = {
        (r.a, r.b): r.hamming
        for r in ih.video_near_duplicates(df, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 0, (1, 3): 0, (2, 3): 0}


def test_video_fingerprint_changed_frame_tolerance(spark):
    """Majority voting keeps the signature stable when ONE of five
    frames changes completely."""
    planes = [
        _RNG.integers(0, 256, (8, 9), dtype=np.uint8) for _ in range(5)
    ]
    # make the consensus strong: all frames identical
    planes = [planes[0]] * 5
    altered = list(planes)
    altered[2] = _RNG.integers(0, 256, (8, 9), dtype=np.uint8)
    rows = [
        (1, "video", bytearray(b"".join(p.tobytes() for p in planes)), 9, 8, 5 * 72),
        (2, "video", bytearray(b"".join(p.tobytes() for p in altered)), 9, 8, 5 * 72),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = ih.video_near_duplicates(df, max_hamming=0).collect()
    assert [(r.a, r.b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_max_bucket_pruning(spark):
    """Oversubscribed (band, block) buckets are droppable: identical
    hashes beyond the cap produce no pairs, distinct near-dups
    elsewhere are unaffected."""
    rows = [(i, 0) for i in range(10)]  # 10 identical hashes
    far = (0x2BCDEF12 << 32) | 0x345678F7  # many bits from 0
    rows += [(100, far), (101, far ^ 0b011)]  # hamming-2 pair
    sig = spark.createDataFrame(rows, ["media_id", "hash"])
    full = ih.banded_hamming_pairs(sig, max_hamming=3, n_bands=4).collect()
    assert len(full) == 45 + 1  # all identical pairs + the (100,101)
    pruned = ih.banded_hamming_pairs(
        sig, max_hamming=3, n_bands=4, max_bucket=5
    ).collect()
    assert [(r.a, r.b) for r in pruned] == [(100, 101)]


def test_video_tie_break_uses_frame_zero(spark):
    """Code-review regression: two-frame videos [img, 255-img] tie on
    every bit position; the tie resolves to frame 0's bit, so
    DIFFERENT-content videos must NOT collapse onto one shared
    signature (the old strict-majority rule voted every tie to 0)."""
    vids = []
    for i in range(6):
        img = _RNG.integers(0, 256, (8, 9), dtype=np.uint8)
        pair = img.tobytes() + (255 - img).tobytes()
        vids.append((i, "video", bytearray(pair), 9, 8, 144, img))
    df = spark.createDataFrame(
        [v[:6] for v in vids], mm.MEDIA_SCHEMA
    )
    fp = {
        r.media_id: r.bits
        for r in ih.with_video_fingerprints(df).collect()
    }
    # every bit ties 1-1 -> fingerprint == frame 0's dhash
    for i, *_rest, img in vids:
        assert fp[i] == ih.dhash_kernel(img)[1]
    assert len(set(fp.values())) == 6  # no collapse
    assert ih.video_near_duplicates(df, max_hamming=3).count() == 0


def test_exif_orientation_aware_hashing(spark):
    """A camera-rotated JPEG (rotated pixels + compensating EXIF
    orientation) hashes like its upright twin when honor_orientation
    is on, and differently with it off."""
    from physicsnemo_curator_spark.sources import exif as sexif
    from physicsnemo_curator_spark.sources import jpeg as sjpeg

    up = np.full((16, 12), 0, dtype=np.uint8)
    up[:8] = 200  # bright top half: orientation-sensitive content
    rotated = np.rot90(up, 1)  # stored rotated; needs orientation 6
    j_up = sjpeg.encode_jpeg(up, quality=95)
    j_rot = sexif.embed_exif(
        sjpeg.encode_jpeg(rotated, quality=95), {"orientation": 6}
    )
    rows = [
        (1, "image", bytearray(j_up), None, None, 0),
        (2, "image", bytearray(j_rot), None, None, 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    on = {
        r.media_id: r.bits
        for r in ih.with_image_hashes(df, method="ahash").collect()
    }
    assert on[1] == on[2]
    off = {
        r.media_id: r.bits
        for r in ih.with_image_hashes(
            df, method="ahash", honor_orientation=False
        ).collect()
    }
    assert off[1] != off[2]
