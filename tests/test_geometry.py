"""Point-in-polygon kernel: exact containment on known shapes."""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.functions.geometry import filter_points_in_polygon


def test_point_in_polygon_square_and_lshape(spark):
    pts = spark.createDataFrame(
        [
            (0, 0.5, 0.5),   # inside square
            (1, 1.5, 0.5),   # outside
            (2, -0.1, 0.0),  # outside (left)
            (3, 0.99, 0.99), # inside corner-ish
        ],
        ["pid", "x", "y"],
    )
    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    got = {r["pid"] for r in filter_points_in_polygon(pts, square).collect()}
    assert got == {0, 3}

    # concave L-shape: the notch must be excluded
    lshape = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    pts2 = spark.createDataFrame(
        [(0, 0.5, 0.5), (1, 1.5, 1.5), (2, 0.5, 1.5), (3, 1.5, 0.5)],
        ["pid", "x", "y"],
    )
    got2 = {r["pid"] for r in filter_points_in_polygon(pts2, lshape).collect()}
    assert got2 == {0, 2, 3}  # (1.5, 1.5) is in the notch → out


def test_point_in_polygon_scales_batches(spark):
    from physicsnemo_curator_spark.sources.synthetic import random_mesh

    points, _, _ = random_mesh(spark, n_meshes=1, n_points=5000, n_cells=10)
    half = [(0.0, 0.0), (0.5, 0.0), (0.5, 1.0), (0.0, 1.0)]
    kept = filter_points_in_polygon(points, half).count()
    # uniform points: about half in x<0.5; loose bound
    assert 0.4 * 5000 < kept < 0.6 * 5000


# -- constrained Delaunay ----------------------------------------------------

import numpy as np

from physicsnemo_curator_spark.functions.geometry import (
    _orient,
    constrained_delaunay,
    delaunay,
)
from physicsnemo_curator_spark.operators import mesh


def _area(pts, tris):
    return sum(abs(_orient(pts[a], pts[b], pts[c])) / 2 for a, b, c in tris)


def _shoelace(pts):
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def test_delaunay_empty_circumcircle_property():
    rng = np.random.default_rng(7)
    pts = rng.random((30, 2))
    tris = delaunay(pts)
    # every triangle's circumcircle is empty of other points
    from physicsnemo_curator_spark.functions.geometry import _in_circumcircle

    for t in tris:
        for i in range(len(pts)):
            if i in t:
                continue
            assert not _in_circumcircle(pts[t[0]], pts[t[1]], pts[t[2]], pts[i])


@pytest.mark.parametrize(
    "poly",
    [
        [[0, 0], [1, 0], [1, 1], [0, 1]],  # square
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]],  # concave L
        # 10-point star (concave at every other vertex)
        [
            [np.cos(a) * r, np.sin(a) * r]
            for a, r in zip(
                np.linspace(0, 2 * np.pi, 10, endpoint=False),
                [1.0, 0.4] * 5,
            )
        ],
    ],
)
def test_constrained_delaunay_covers_polygon(poly):
    pts = np.asarray(poly, dtype=float)
    tris = constrained_delaunay(pts)
    n = len(pts)
    # area partition: triangles tile the polygon exactly
    assert _area(pts, tris) == pytest.approx(_shoelace(pts), rel=1e-12)
    # every boundary edge is an edge of some triangle
    tri_edges = {
        (min(a, b), max(a, b))
        for t in tris
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))
    }
    for i in range(n):
        e = (min(i, (i + 1) % n), max(i, (i + 1) % n))
        assert e in tri_edges, f"boundary edge {e} missing"
    # interior edges are shared by exactly 2 triangles (watertight patch)
    from collections import Counter

    counts = Counter(
        (min(a, b), max(a, b))
        for t in tris
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))
    )
    for e, c in counts.items():
        is_boundary = (e[1] - e[0]) % n in (1, n - 1)
        assert c == (1 if is_boundary else 2)


def test_constrained_delaunay_rejects_degenerate():
    line = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    with pytest.raises(ValueError):
        constrained_delaunay(line)


def test_triangulate_loops_operator(spark):
    rows = []
    # two loops with non-contiguous seq ids (mesh point ids)
    sq = [(10, 0.0, 0.0), (11, 1.0, 0.0), (12, 1.0, 1.0), (13, 0.0, 1.0)]
    L = [
        (20, 0.0, 0.0),
        (21, 2.0, 0.0),
        (22, 2.0, 1.0),
        (23, 1.0, 1.0),
        (24, 1.0, 2.0),
        (25, 0.0, 2.0),
    ]
    for s, x, y in sq:
        rows.append(("sq", s, x, y))
    for s, x, y in L:
        rows.append(("L", s, x, y))
    df = spark.createDataFrame(rows, "loop_id string, seq long, x double, y double")
    out = mesh.triangulate_loops(df).collect()
    by_loop = {}
    for r in out:
        by_loop.setdefault(r["loop_id"], []).append(r["vs"])
    assert len(by_loop["sq"]) == 2
    assert len(by_loop["L"]) == 4
    # vertex ids are the original seq values
    assert {v for t in by_loop["sq"] for v in t} == {10, 11, 12, 13}
    assert {v for t in by_loop["L"] for v in t} <= {20, 21, 22, 23, 24, 25}
    # areas tile each polygon
    coords = {s: (x, y) for _, s, x, y in [("", *p) for p in sq + L]}
    for name, tris, want in (("sq", by_loop["sq"], 1.0), ("L", by_loop["L"], 3.0)):
        area = 0.0
        for a, b, c in tris:
            (xa, ya), (xb, yb), (xc, yc) = coords[a], coords[b], coords[c]
            area += abs((xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)) / 2
        assert area == pytest.approx(want)


def test_constrained_delaunay_random_star_polygons():
    """Randomized robustness: star-shaped polygons (sorted random angles,
    random radii, every angular gap < 180°) are always simple, so every
    one must triangulate to an exact area tiling with all boundary edges
    present.  (A gap ≥ 180° lets the chord pass on the far side of the
    center and the polygon can self-intersect — those are rejected, as
    the kernel documents simple input.)"""
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(4, 24))
        angles = np.sort(rng.uniform(0, 2 * np.pi, size=n))
        gaps = np.diff(angles, append=angles[0] + 2 * np.pi)
        # reject slivers and >180-degree gaps (self-intersection risk)
        if np.min(gaps) < 1e-3 or np.max(gaps) >= np.pi - 1e-6:
            continue
        radii = rng.uniform(0.2, 1.0, size=n)
        poly = np.c_[radii * np.cos(angles), radii * np.sin(angles)]
        tris = constrained_delaunay(poly)
        assert _area(poly, tris) == pytest.approx(_shoelace(poly), rel=1e-9), trial
        tri_edges = {
            (min(a, b), max(a, b))
            for t in tris
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))
        }
        for i in range(n):
            e = (min(i, (i + 1) % n), max(i, (i + 1) % n))
            assert e in tri_edges, (trial, e)
