"""mesh_info, timestep stacking, boundary injection."""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mesh
from physicsnemo_curator_spark.sources.synthetic import random_mesh


def test_mesh_info_record(spark):
    points, cells, _ = random_mesh(spark, n_meshes=2, n_points=50, n_cells=70)
    pdata = points.select(
        "mesh_id", "point_id", F.lit("temp").alias("field"), F.col("x").alias("value")
    )
    info = {r["mesh_id"]: r for r in mesh.mesh_info(points, cells, pdata).collect()}
    assert info[0]["n_points"] == 50 and info[0]["n_cells"] == 70
    assert info[0]["n_corners"] == 70 * 4
    assert info[0]["fields"] == ["temp"] and info[0]["n_fields"] == 1
    assert info[0]["points_nbytes"] == 50 * 24


def test_stack_timesteps_ordered(spark):
    rows = []
    for t in (2, 0, 1):  # deliberately out of order
        rows.append((0, 0, t, float(t), 0.0, 0.0))
    disp = spark.createDataFrame(rows, ["mesh_id", "point_id", "t", "dx", "dy", "dz"])
    out = mesh.stack_timesteps(disp).collect()[0]
    assert out["n_timesteps"] == 3
    assert [v[0] for v in out["trajectory"]] == [0.0, 1.0, 2.0]  # sorted by t


def test_tessellate_fan(spark):
    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [10, 11, 12, 13, 14])],  # tri + pentagon
        ["mesh_id", "cell_id", "vs"],
    )
    out = mesh.tessellate_fan(cells).collect()
    tri_pass = [r for r in out if r["cell_id"] == 0]
    fans = sorted(
        (r["fan_idx"], r["vs"]) for r in out if r["cell_id"] == 1
    )
    assert tri_pass[0]["vs"] == [0, 1, 2]
    assert fans == [
        (0, [10, 11, 12]),
        (1, [10, 12, 13]),
        (2, [10, 13, 14]),
    ]
    assert all(len(r["vs"]) == 3 for r in out)


def test_dense_renumber_strategies_agree(spark):
    points, cells, _ = random_mesh(spark, n_meshes=3, n_points=40, n_cells=10)
    # drop a third of the points to make ids sparse
    kept = points.filter("point_id % 3 != 0").select("mesh_id", "point_id")
    a = {
        (r["mesh_id"], r["point_id"]): r["new_point_id"]
        for r in mesh.dense_renumber(kept, strategy="window").collect()
    }
    b = {
        (r["mesh_id"], r["point_id"]): r["new_point_id"]
        for r in mesh.dense_renumber(kept, strategy="distributed").collect()
    }
    assert a == b
    per_mesh = {}
    for (m, _), nid in a.items():
        per_mesh.setdefault(m, []).append(nid)
    for ids in per_mesh.values():
        assert sorted(ids) == list(range(len(ids)))  # dense 0..n-1


def test_tet_quality_regular_tet(spark):
    import math as _m

    v = [(1.0, 1.0, 1.0), (1.0, -1.0, -1.0), (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0)]
    points = spark.createDataFrame(
        [(0, i, *p) for i, p in enumerate(v)], ["mesh_id", "point_id", "x", "y", "z"]
    )
    cells = spark.createDataFrame([(0, 0, [0, 1, 2, 3])], ["mesh_id", "cell_id", "vs"])
    from physicsnemo_curator_spark.operators import quality

    q = quality.tet_quality(points, cells).collect()[0]
    # regular tet, edge 2*sqrt(2): volume = edge^3/(6*sqrt(2)) = 8/3
    assert abs(abs(q["volume"]) - 8.0 / 3.0) < 1e-9
    assert abs(q["aspect_ratio"] - 1.0) < 1e-9
    want = _m.acos(1.0 / 3.0)
    assert abs(q["dihedral_min"] - want) < 1e-9
    assert abs(q["dihedral_max"] - want) < 1e-9
    assert not q["degenerate"]

    # degenerate (coplanar) tet flagged
    flat = spark.createDataFrame(
        [(0, i, float(i), float(i * i), 0.0) for i in range(4)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    qd = quality.tet_quality(flat, cells).collect()[0]
    assert qd["degenerate"]


def test_inject_hemisphere_boundary(spark):
    import math as _m

    points = spark.createDataFrame(
        [(0, 0, 0.0, 0.0, 0.0), (0, 1, 2.0, 0.0, 0.0), (0, 2, 1.0, 2.0, 0.5)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame([(0, 0, [0, 1, 2])], ["mesh_id", "cell_id", "vs"])
    rings, segs = 4, 8
    ap, ac = mesh.inject_hemisphere_boundary(
        points, cells, rings=rings, segments=segs, margin=0.1
    )
    dome_p = ap.filter("region = 'boundary.hemisphere'")
    dome_c = ac.filter("region = 'boundary.hemisphere'")
    assert dome_p.count() == rings * segs + 1
    assert dome_c.count() == (rings - 1) * segs * 2 + segs
    # every dome point lies on the sphere around the bbox center; the
    # radius covers the FULL 3-D half-diagonal (a mesh taller than its
    # footprint must not poke through the dome)
    cx, cy, zb = 1.0, 1.0, 0.0
    r = _m.sqrt(2.0**2 + 2.0**2 + 0.5**2) / 2 + 0.1
    for row in dome_p.collect():
        d = _m.sqrt((row["x"] - cx) ** 2 + (row["y"] - cy) ** 2 + (row["z"] - zb) ** 2)
        assert abs(d - r) < 1e-9
    # triangles only, and every referenced vertex exists
    assert all(len(row["vs"]) == 3 for row in dome_c.collect())
    pids = {row["point_id"] for row in ap.collect()}
    refs = {v for row in dome_c.collect() for v in row["vs"]}
    assert refs <= pids
    # quality report runs on the dome (no degenerate triangles)
    from physicsnemo_curator_spark.operators import quality

    rep = quality.mesh_quality_report(
        dome_p.drop("region"), dome_c.drop("region")
    ).collect()[0]
    assert rep["n_degenerate"] == 0


def test_inject_box_boundary(spark):
    points = spark.createDataFrame(
        [(0, 0, 0.0, 0.0, 0.0), (0, 1, 2.0, 1.0, 1.0), (0, 2, 1.0, 0.5, 0.5)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame([(0, 0, [0, 1, 2])], ["mesh_id", "cell_id", "vs"])
    ap, ac = mesh.inject_box_boundary(points, cells, margin=0.5)
    assert ap.count() == 3 + 8
    assert ac.count() == 1 + 6
    regions = {r["region"] for r in ap.select("region").distinct().collect()}
    assert regions == {"interior", "boundary.box"}
    # corners span the margin-extended bbox
    bp = ap.filter("region = 'boundary.box'")
    ext = bp.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    assert list(ext) == [-0.5, 2.5, -0.5, 1.5]
    # boundary cells reference only boundary points, ids are fresh
    bcell_vs = {v for r in ac.filter("region = 'boundary.box'").collect() for v in r["vs"]}
    assert bcell_vs == {3, 4, 5, 6, 7, 8, 9, 10}
    # every face is a quad
    assert all(len(r["vs"]) == 4 for r in ac.filter("region='boundary.box'").collect())
