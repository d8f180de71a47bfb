"""VTK source: write→read round-trip, field pushdown, operator handoff."""

from __future__ import annotations

import math

import pytest

from physicsnemo_curator_spark.operators import quality, stats
from physicsnemo_curator_spark.sources import vtk


@pytest.fixture()
def vtk_dir(tmp_path):
    # two files → two meshes, one task each
    for m in range(2):
        pts = [(0.0, 0.0, 0.0), (1.0 + m, 0.0, 0.0), (0.5, math.sqrt(3) / 2, 0.0)]
        cells = [[0, 1, 2]]
        pdata = {"temp": [1.0, 2.0, 3.0 + m], "junk": [9.0, 9.0, 9.0]}
        vtk.write_vtk(pts, cells, pdata, str(tmp_path / f"mesh{m}.vtk"))
    return str(tmp_path)


def test_round_trip(spark, vtk_dir):
    tables = vtk.read_vtk(spark, vtk_dir)
    pts = tables["points"]
    assert pts.count() == 6
    assert {r["mesh_id"] for r in pts.select("mesh_id").distinct().collect()} == {
        "mesh0",
        "mesh1",
    }
    cells = tables["cells"].collect()
    assert all(r["vs"] == [0, 1, 2] for r in cells)
    pd_rows = tables["point_data"]
    assert pd_rows.filter("field = 'temp'").count() == 6


def test_field_pushdown_include_exclude(spark, vtk_dir):
    inc = vtk.read_vtk(spark, vtk_dir, include_fields=["temp"])["point_data"]
    assert {r["field"] for r in inc.select("field").distinct().collect()} == {"temp"}
    exc = vtk.read_vtk(spark, vtk_dir, exclude_fields=["junk"])["point_data"]
    assert {r["field"] for r in exc.select("field").distinct().collect()} == {"temp"}
    with pytest.raises(ValueError):
        vtk.read_vtk(spark, vtk_dir, include_fields=["a"], exclude_fields=["b"])


def test_per_path_rules_longest_wins(spark, vtk_dir):
    # global exclude junk; mesh1 gets a more specific include-only rule
    pd_rows = vtk.read_vtk(
        spark,
        vtk_dir,
        exclude_fields=["junk"],
        path_rules={"mesh1*": {"include": ["junk"]}, "mesh*": {"exclude": ["junk"]}},
    )["point_data"]
    got = {
        (r["mesh_id"], r["field"])
        for r in pd_rows.select("mesh_id", "field").distinct().collect()
    }
    assert got == {("mesh0", "temp"), ("mesh1", "junk")}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vtk.read_vtk(spark, vtk_dir, path_rules={"*": {"include": ["a"], "exclude": ["b"]}})


def test_structured_points_round_trip(spark, tmp_path):
    # 2x3x2 grid, values = flat index (x-fastest)
    nx, ny, nz = 2, 3, 2
    vals = [float(i) for i in range(nx * ny * nz)]
    vtk.write_structured_points(
        (nx, ny, nz), {"temp": vals}, str(tmp_path / "g0.vtk"),
        origin=(1.0, 2.0, 3.0), spacing=(0.5, 0.5, 0.5),
    )
    t = vtk.read_structured_points(spark, str(tmp_path))
    grid = t["grid"].collect()
    assert len(grid) == nx * ny * nz
    # x-fastest unflattening: value == ix + nx*iy + nx*ny*iz
    for r in grid:
        assert r["value"] == r["ix"] + nx * r["iy"] + nx * ny * r["iz"]
    meta = t["meta"].collect()[0]
    assert (meta["nx"], meta["ny"], meta["nz"]) == (nx, ny, nz)
    assert (meta["ox"], meta["sy"]) == (1.0, 0.5)
    # grid operators consume it directly
    from physicsnemo_curator_spark.operators import stats

    st = stats.elementwise_stats(
        t["grid"].withColumnRenamed("field", "variable"), ["variable"], "value"
    ).collect()[0]
    assert st["n"] == nx * ny * nz and st["min_v"] == 0.0


def test_vtk_feeds_operator_pack(spark, vtk_dir):
    tables = vtk.read_vtk(spark, vtk_dir)
    # quality over parsed geometry: equilateral-ish triangles
    rep = quality.mesh_quality_report(tables["points"], tables["cells"]).collect()
    assert len(rep) == 2 and all(r["n_degenerate"] == 0 for r in rep)
    # stats over parsed point data (the reference's Source→Stats pipeline)
    st = stats.moment_stats(
        tables["point_data"].filter("field = 'temp'"), ["mesh_id"], "value"
    ).collect()
    means = {r["mesh_id"]: r["mean"] for r in st}
    assert abs(means["mesh0"] - 2.0) < 1e-12 and abs(means["mesh1"] - 7 / 3) < 1e-12


def test_read_vtk_domain_pairs_by_parent_dir(spark, tmp_path):
    """Domain-mesh mode (reference VTKSource volume_pattern/
    boundary_pattern, vtk.py:295-338): volume+boundary files pair by
    parent directory; a volume with no boundary falls back to a
    standalone mesh, as do unmatched files; paired sub-meshes share
    one domain_id with region tags."""
    import os

    pts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    cells = [[0, 1, 2]]
    for case in ("case1", "case2"):
        os.makedirs(tmp_path / case)
        vtk.write_vtk(
            pts, cells, {"p": [1.0, 2.0, 3.0]},
            str(tmp_path / case / "volume_x.vtk"),
        )
    vtk.write_vtk(pts, cells, None, str(tmp_path / "case1" / "boundary_x.vtk"))
    vtk.write_vtk(pts, cells, None, str(tmp_path / "lonely.vtk"))

    t = vtk.read_vtk_domain(
        spark,
        str(tmp_path),
        volume_pattern="volume_*",
        boundary_pattern="boundary_*",
        glob="*.vtk",
    )
    got = {
        (r.domain_id, r.region)
        for r in t["points"].select("domain_id", "region").distinct().collect()
    }
    # singles carry their path RELATIVE to the scan root as domain_id
    # (same-named stems in different subtrees must stay distinct)
    assert got == {
        ("case1", "volume"),
        ("case1", "vehicle"),
        ("case2/volume_x", "single"),
        ("lonely", "single"),
    }
    # every scanned file survived the mapping join (the join is how
    # region tags attach — a path-format drift would silently drop all)
    assert t["points"].select("mesh_id").distinct().count() == 4
    # point_data flows through with the tags
    pd_rows = t["point_data"].select("domain_id", "region").distinct().collect()
    assert {(r.domain_id, r.region) for r in pd_rows} == {
        ("case1", "volume"),
        ("case2/volume_x", "single"),
    }


def test_read_vtk_domain_extra_matches_and_collisions(spark, tmp_path):
    """An EXTRA volume match in a directory degrades to a standalone
    mesh instead of being silently dropped (a deliberate deviation
    from the reference's dict overwrite, which loses the file); two
    files whose path-keyed mesh ids collide (same stem, different
    extension) raise loudly instead of doubling every row through the
    mapping join."""
    import os

    import pytest

    pts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    cells = [[0, 1, 2]]
    os.makedirs(tmp_path / "c")
    vtk.write_vtk(pts, cells, None, str(tmp_path / "c" / "volume_a.vtk"))
    vtk.write_vtk(pts, cells, None, str(tmp_path / "c" / "volume_b.vtk"))
    vtk.write_vtk(pts, cells, None, str(tmp_path / "c" / "boundary_x.vtk"))
    t = vtk.read_vtk_domain(
        spark,
        str(tmp_path),
        volume_pattern="volume_*",
        boundary_pattern="boundary_*",
        glob="*.vtk",
    )
    got = {
        (r.domain_id, r.region)
        for r in t["points"].select("domain_id", "region").distinct().collect()
    }
    # sorted-first volume pairs; the extra becomes a single — 3 meshes out
    assert got == {
        ("c", "volume"),
        ("c", "vehicle"),
        ("c/volume_b", "single"),
    }

    os.makedirs(tmp_path / "d")
    vtk.write_vtk(pts, cells, None, str(tmp_path / "d" / "part.vtk"))
    with open(tmp_path / "d" / "part.stl", "w") as f:
        f.write(
            "solid s\nfacet normal 0 0 1\nouter loop\n"
            "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
            "endloop\nendfacet\nendsolid s\n"
        )
    with pytest.raises(ValueError, match="collide"):
        vtk.read_vtk_domain(
            spark,
            str(tmp_path / "d"),
            volume_pattern="volume_*",
            boundary_pattern="boundary_*",
        )


def test_read_vtk_domain_guard_survives_column_pruning(spark, tmp_path):
    """The path-drift guard must be attached to EVERY mapped column:
    a consumer selecting only domain_id (region pruned by Catalyst)
    must still get real values — and the guard expression must keep
    the mapping join alive in the pruned plan."""
    import os

    pts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    cells = [[0, 1, 2]]
    os.makedirs(tmp_path / "case1")
    vtk.write_vtk(
        pts, cells, {"p": [1.0, 2.0, 3.0]},
        str(tmp_path / "case1" / "volume_x.vtk"),
    )
    vtk.write_vtk(pts, cells, None, str(tmp_path / "case1" / "boundary_x.vtk"))
    t = vtk.read_vtk_domain(
        spark,
        str(tmp_path),
        volume_pattern="volume_*",
        boundary_pattern="boundary_*",
        glob="*.vtk",
    )
    only_dom = t["points"].select("domain_id").distinct().collect()
    assert {r.domain_id for r in only_dom} == {"case1"}
    assert all(r.domain_id is not None for r in only_dom)
    # the guard (raise_error on a failed match) is present in the
    # domain_id-only plan, so drift errors loudly even after pruning
    plan = t["points"].select("domain_id")._jdf.queryExecution().toString()
    assert "raise_error" in plan
