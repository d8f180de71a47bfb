"""Point-in-polygon kernel: exact containment on known shapes."""

from __future__ import annotations

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
