"""Mesh-topology operator tests on seeded synthetic meshes.

Mirrors the reference's per-operator unit tests with exact checks
(reference test_wall_node.py, test_random_permutation.py,
test_pipeline.py mean correctness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mesh
from physicsnemo_curator_spark.sources.synthetic import random_mesh


def test_point_data_to_cell_data_exact(spark):
    points = spark.createDataFrame(
        [(0, 0, 0.0, 0.0, 0.0), (0, 1, 1.0, 0.0, 0.0), (0, 2, 0.0, 1.0, 0.0)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame([(0, 0, [0, 1, 2])], ["mesh_id", "cell_id", "vs"])
    pdata = spark.createDataFrame(
        [(0, 0, "temp", 1.0), (0, 1, "temp", 2.0), (0, 2, "temp", 6.0)],
        ["mesh_id", "point_id", "field", "value"],
    )
    out = mesh.point_data_to_cell_data(cells, pdata).collect()
    assert len(out) == 1 and abs(out[0]["value"] - 3.0) < 1e-12

    cent = mesh.cell_centroids(cells, points).collect()[0]
    assert abs(cent["cx"] - 1 / 3) < 1e-12 and abs(cent["cy"] - 1 / 3) < 1e-12


def test_unique_edges_triangle_pair(spark):
    # two triangles sharing edge (1,2) -> 5 unique edges
    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [1, 2, 3])], ["mesh_id", "cell_id", "vs"]
    )
    edges = {(r["a"], r["b"]) for r in mesh.unique_edges(cells).collect()}
    assert edges == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}


def test_drop_unused_points_and_dedup_cells(spark):
    points = spark.createDataFrame(
        [(0, i, float(i), 0.0, 0.0) for i in range(5)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [2, 1, 0])], ["mesh_id", "cell_id", "vs"]
    )
    kept = mesh.drop_unused_points(points, cells)
    assert {r["point_id"] for r in kept.collect()} == {0, 1, 2}
    assert mesh.dedup_cells(cells).count() == 1  # same vertex set


def test_merge_duplicate_points_grid_snap(spark):
    points = spark.createDataFrame(
        [
            (0, 0, 0.0, 0.0, 0.0),
            (0, 1, 1e-9, 0.0, 0.0),  # duplicate of 0 within tol
            (0, 2, 5.0, 5.0, 5.0),
        ],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    kept, remap = mesh.merge_duplicate_points(points, tol=1e-6)
    assert kept.count() == 2
    m = {(r["point_id"]): r["new_point_id"] for r in remap.collect()}
    assert m[1] == 0 and m[0] == 0 and m[2] == 2


def test_wall_node_drop_and_remap(spark):
    # node 0 static (wall), nodes 1..3 move over time
    rows = []
    for t in range(3):
        rows.append((0, 0, t, 0.0, 0.0, 0.0))
        for p in (1, 2, 3):
            rows.append((0, p, t, 0.1 * t * p, 0.0, 0.0))
    disp = spark.createDataFrame(
        rows, ["mesh_id", "point_id", "t", "dx", "dy", "dz"]
    )
    points = spark.createDataFrame(
        [(0, i, float(i), 0.0, 0.0) for i in range(4)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [1, 2, 3])], ["mesh_id", "cell_id", "vs"]
    )
    mask = mesh.wall_node_mask(disp, threshold=0.05)
    walls = {r["point_id"] for r in mask.filter("is_wall").collect()}
    assert walls == {0}

    new_points, new_cells = mesh.drop_wall_nodes(points, cells, mask)
    assert new_points.count() == 3
    # cell 0 touched the wall node -> dropped; cell 1 remapped to dense ids
    out = new_cells.collect()
    assert len(out) == 1
    assert sorted(out[0]["vs"]) == [0, 1, 2]  # old 1,2,3 -> dense 0,1,2


def test_random_permutation_preserves_topology(spark):
    points, cells, _ = random_mesh(spark, n_meshes=1, n_points=30, n_cells=40)
    new_points, new_cells = mesh.random_permutation(points, cells, seed=7)
    # same cardinalities
    assert new_points.count() == 30
    assert new_cells.count() == cells.count()
    # edge multiset is permutation-invariant after inverse mapping: compare
    # degree histogram (topology invariant)
    def degree_hist(c):
        return sorted(
            r["cnt"]
            for r in c.select(F.explode("vs").alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )

    assert degree_hist(new_cells) == degree_hist(cells)
    # deterministic: same seed twice -> identical mapping
    again_points, _ = mesh.random_permutation(points, cells, seed=7)
    a = {(r["mesh_id"], r["x"]): r["point_id"] for r in new_points.collect()}
    b = {(r["mesh_id"], r["x"]): r["point_id"] for r in again_points.collect()}
    assert a == b


def test_scatter_mean_exact(spark):
    cells = spark.createDataFrame(
        [(0, [0, 1], 2.0), (0, [1, 2], 4.0)], ["mesh_id", "vs", "value"]
    )
    out = {r["point_id"]: r["value"] for r in mesh.scatter_mean(cells).collect()}
    assert out == {0: 2.0, 1: 3.0, 2: 4.0}


def test_mixed_cells_padded_encoding_wall_remap(spark):
    """Mirror of the reference's −1-padded mixed-cell remap cases
    (reference wall_node.py:127-151): tri(0,1,2) + quad(1,2,3,4) +
    line(4,5) padded to arity 4; dropping node 3 must kill only the
    quad, keep padding semantics, and remap survivors densely."""
    padded = spark.createDataFrame(
        [
            (0, 0, [0, 1, 2, -1], 5),
            (0, 1, [1, 2, 3, 4], 9),
            (0, 2, [4, 5, -1, -1], 3),
        ],
        ["mesh_id", "cell_id", "vs", "cell_type"],
    )
    points = spark.createDataFrame(
        [(0, i, float(i), 0.0, 0.0) for i in range(6)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    mask = spark.createDataFrame(
        [(0, i, i == 3) for i in range(6)], ["mesh_id", "point_id", "is_wall"]
    )

    cells = mesh.cells_from_padded(padded)
    new_points, new_cells = mesh.drop_wall_nodes(points, cells, mask)

    # keep_indices=[0,1,2,4,5] → old_to_new {0:0,1:1,2:2,4:3,5:4}
    got = {
        r["cell_id"]: (list(r["vs"]), r["cell_type"])
        for r in new_cells.join(
            padded.select("mesh_id", "cell_id", "cell_type"),
            ["mesh_id", "cell_id"],
        ).collect()
    }
    assert got == {0: ([0, 1, 2], 5), 2: ([3, 4], 3)}
    assert new_points.count() == 5

    # re-padding reproduces the reference's padded output tensor
    repadded = {
        r["cell_id"]: list(r["vs"])
        for r in mesh.cells_to_padded(new_cells, 4).collect()
    }
    assert repadded == {0: [0, 1, 2, -1], 2: [3, 4, -1, -1]}


def test_mixed_cells_flat_encoding_roundtrip_and_remap(spark):
    """Mirror of the reference's flat mixed_connectivity/offsets/
    cell_types remap (reference wall_node.py:157-227): same mesh as the
    padded case in its flat encoding; after dropping node 3 the rebuilt
    flat stream must be [0,1,2, 3,4] with offsets [0,3,5] and the
    quad's cell_type gone."""
    flat = spark.createDataFrame(
        [(0, p, v) for p, v in enumerate([0, 1, 2, 1, 2, 3, 4, 4, 5])],
        ["mesh_id", "pos", "point_id"],
    )
    offsets = spark.createDataFrame(
        [(0, 0, 0, 3, 5), (0, 1, 3, 7, 9), (0, 2, 7, 9, 3)],
        ["mesh_id", "cell_id", "start", "end", "cell_type"],
    )
    points = spark.createDataFrame(
        [(0, i, float(i), 0.0, 0.0) for i in range(6)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    mask = spark.createDataFrame(
        [(0, i, i == 3) for i in range(6)], ["mesh_id", "point_id", "is_wall"]
    )

    cells = mesh.cells_from_flat(flat, offsets)
    assert {
        r["cell_id"]: list(r["vs"]) for r in cells.collect()
    } == {0: [0, 1, 2], 1: [1, 2, 3, 4], 2: [4, 5]}

    _, new_cells = mesh.drop_wall_nodes(points, cells, mask)
    # cell_type rides the surviving cell ids (the reference applies the
    # same cell_valid mask to its cell_types vector)
    new_cells = new_cells.join(
        cells.select("mesh_id", "cell_id", "cell_type"), ["mesh_id", "cell_id"]
    )
    new_flat, new_offs = mesh.cells_to_flat(new_cells)

    stream = [
        r["point_id"] for r in new_flat.orderBy("pos").collect()
    ]
    assert stream == [0, 1, 2, 3, 4]
    offs = {
        r["cell_id"]: (r["start"], r["end"], r["cell_type"])
        for r in new_offs.collect()
    }
    assert offs == {0: (0, 3, 5), 2: (3, 5, 3)}


def test_cells_from_flat_zero_arity_cell(spark):
    """A start==end offset row is a zero-arity cell: it must come back
    as an empty vs array, never a fabricated 2-slot cell (Spark's
    sequence() auto-steps -1 when start > stop)."""
    flat = spark.createDataFrame(
        [(0, 0, 7), (0, 1, 8)], ["mesh_id", "pos", "point_id"]
    )
    offsets = spark.createDataFrame(
        [(0, 0, 0, 2, 5), (0, 1, 2, 2, 1)],
        ["mesh_id", "cell_id", "start", "end", "cell_type"],
    )
    got = {
        r["cell_id"]: list(r["vs"])
        for r in mesh.cells_from_flat(flat, offsets).collect()
    }
    assert got == {0: [7, 8], 1: []}


def test_cells_to_padded_over_arity_raises(spark):
    """A cell wider than the target arity cannot fit the fixed-arity
    tensor: the padder must raise, not silently emit over-length rows."""
    import pytest

    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2, 3, 4])], ["mesh_id", "cell_id", "vs"]
    )
    with pytest.raises(Exception) as exc_info:
        mesh.cells_to_padded(cells, 4).collect()
    assert "exceeds target arity" in str(exc_info.value)
