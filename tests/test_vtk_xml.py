"""VTK XML (.vtu/.vtp) ingestion: encoding round-trips, legacy/XML
parity on an identical mesh, cell data, and DataSource pushdown."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.sources import mesh_datasource, vtk, vtk_xml

PTS = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.25, 1.5, 2.75)]
CELLS = [[0, 1, 2], [1, 3, 2]]
PDATA = {"temp": [1.0, 2.5, 3.25, 4.0], "junk": [0.0, 0.0, 0.0, 0.0]}
CDATA = {"area": [0.5, 0.75]}


@pytest.mark.parametrize("fmt", ["ascii", "binary", "appended", "appended-raw"])
def test_vtu_encoding_roundtrip(fmt, tmp_path):
    p = tmp_path / "m.vtu"
    vtk_xml.write_vtu(PTS, CELLS, [5, 5], PDATA, str(p), cell_data=CDATA, fmt=fmt)
    pts, cells, ctypes, pdata, cdata, _ = vtk_xml.parse_vtk_xml(p.read_bytes())
    assert pts == PTS and cells == CELLS and ctypes == [5, 5]
    assert pdata == PDATA and cdata == CDATA


def test_multiblock_zlib_roundtrip(tmp_path):
    # 48 kB of point floats spans multiple 32768-byte zlib blocks
    rng = np.random.default_rng(11)
    pts = [tuple(map(float, r)) for r in rng.normal(size=(2000, 3))]
    cells = [[i, (i + 1) % 2000, (i + 2) % 2000] for i in range(1500)]
    pdata = {"f": [float(x) for x in rng.normal(size=2000)]}
    p = tmp_path / "big.vtu"
    vtk_xml.write_vtu(pts, cells, None, pdata, str(p), fmt="appended")
    got_pts, got_cells, _, got_pdata, _, _ = vtk_xml.parse_vtk_xml(p.read_bytes())
    assert got_pts == pts and got_cells == cells and got_pdata == pdata


def test_multicomponent_point_data(tmp_path):
    p = tmp_path / "v.vtu"
    vtk_xml.write_vtu(PTS, CELLS, None, None, str(p), fmt="binary")
    # hand-add a 3-component velocity array to the document
    doc = p.read_bytes().decode()
    vel = " ".join(str(float(i)) for i in range(12))
    doc = doc.replace(
        "</Cells>",
        "</Cells>\n<PointData>"
        f'<DataArray type="Float64" Name="vel" NumberOfComponents="3" format="ascii">{vel}</DataArray>'
        "</PointData>",
    )
    _, _, _, pdata, _, _ = vtk_xml.parse_vtk_xml(doc.encode())
    assert pdata["vel_0"] == [0.0, 3.0, 6.0, 9.0]
    assert pdata["vel_2"] == [2.0, 5.0, 8.0, 11.0]


def test_read_vtk_xml_tables_match_legacy(spark, tmp_path):
    """The same mesh through the legacy writer and the XML writer must
    produce identical Spark tables (the format-parity contract)."""
    legacy_dir, xml_dir = tmp_path / "legacy", tmp_path / "xml"
    legacy_dir.mkdir(), xml_dir.mkdir()
    vtk.write_vtk(PTS, CELLS, PDATA, str(legacy_dir / "m.vtk"))
    vtk_xml.write_vtu(PTS, CELLS, None, PDATA, str(xml_dir / "m.vtu"), fmt="appended")
    vtk_xml.write_vtp(PTS, CELLS, PDATA, str(xml_dir / "m.vtp"), fmt="binary")

    legacy = vtk.read_vtk(spark, str(legacy_dir))
    for glob in ("*.vtu", "*.vtp"):
        x = vtk.read_vtk(spark, str(xml_dir), glob=glob)
        for t in ("points", "point_data"):
            a = sorted(map(tuple, legacy[t].drop("mesh_id").collect()))
            b = sorted(map(tuple, x[t].drop("mesh_id").collect()))
            assert a == b, (glob, t)
        a = sorted((r["cell_id"], tuple(r["vs"])) for r in legacy["cells"].collect())
        b = sorted((r["cell_id"], tuple(r["vs"])) for r in x["cells"].collect())
        assert a == b, glob


def test_read_vtk_cell_data_and_types(spark, tmp_path):
    vtk_xml.write_vtu(
        PTS, CELLS, [5, 5], PDATA, str(tmp_path / "m.vtu"),
        cell_data=CDATA, fmt="appended-raw",
    )
    tables = vtk.read_vtk(spark, str(tmp_path), glob="*.vtu")
    cd = {(r["cell_id"], r["field"]): r["value"] for r in tables["cell_data"].collect()}
    assert cd == {(0, "area"): 0.5, (1, "area"): 0.75}
    assert [r["ctype"] for r in tables["cells"].orderBy("cell_id").collect()] == [5, 5]


def test_datasource_reads_vtu_with_pushdown(spark, tmp_path):
    mesh_datasource.register(spark)
    vtk_xml.write_vtu(PTS, CELLS, None, PDATA, str(tmp_path / "m.vtu"), fmt="appended")
    df = (
        spark.read.format("vtk_mesh")
        .option("table", "point_data")
        .option("glob", "*.vtu")
        .load(str(tmp_path))
        .filter(F.col("field") == "temp")
    )
    rows = df.collect()
    assert {r["field"] for r in rows} == {"temp"}
    assert sorted(r["value"] for r in rows) == sorted(PDATA["temp"])
    # the field predicate is consumed by the reader, not re-filtered
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" not in plan or "field" not in plan.split("Filter")[1].split("\n")[0]


def test_include_exclude_applies_to_xml(spark, tmp_path):
    vtk_xml.write_vtu(PTS, CELLS, None, PDATA, str(tmp_path / "m.vtu"), fmt="binary")
    inc = vtk.read_vtk(spark, str(tmp_path), glob="*.vtu", include_fields=["temp"])
    fields = {r["field"] for r in inc["point_data"].collect()}
    assert fields == {"temp"}


def test_vts_structured_grid(spark, tmp_path):
    """A 3x2x2 curvilinear grid: 12 explicit points, 2 implicit
    hexahedra, grid dimensions in meta."""
    nx, ny, nz = 3, 2, 2
    pts = [
        (float(i) + 0.1 * k, float(j), float(k))
        for k in range(nz) for j in range(ny) for i in range(nx)
    ]
    pdata = {"temp": [float(n) for n in range(12)]}
    p = tmp_path / "g.vts"
    vtk_xml.write_vts((nx, ny, nz), pts, pdata, str(p), fmt="appended")
    got_pts, cells, ctypes, got_pd, _, meta = vtk_xml.parse_vtk_xml(p.read_bytes())
    assert got_pts == pts and got_pd == pdata
    assert meta["dimensions"] == (nx, ny, nz)
    assert ctypes == [12, 12]  # two hexahedra
    assert cells[0] == [0, 1, 4, 3, 6, 7, 10, 9]
    # through the Spark scan path
    tables = vtk.read_vtk(spark, str(tmp_path), glob="*.vts")
    assert tables["points"].count() == 12
    assert [r["ctype"] for r in tables["cells"].collect()] == [12, 12]


def test_vtm_multiblock_scan(spark, tmp_path):
    """A .vtm index referencing a .vtu and a .vtp block: one task per
    block file, all blocks landing in the same tables."""
    vtk_xml.write_vtu(PTS, CELLS, None, PDATA, str(tmp_path / "b0.vtu"), fmt="binary")
    vtk_xml.write_vtp(PTS, CELLS, PDATA, str(tmp_path / "b1.vtp"), fmt="ascii")
    vtk_xml.write_vtm(["b0.vtu", "b1.vtp"], str(tmp_path / "scene.vtm"))
    tables = vtk.read_vtm(spark, str(tmp_path / "scene.vtm"))
    assert tables["points"].count() == 2 * len(PTS)
    assert sorted({r["mesh_id"] for r in tables["cells"].collect()}) == ["b0", "b1"]
    inc = vtk.read_vtm(
        spark, str(tmp_path / "scene.vtm"), include_fields=["temp"]
    )["point_data"]
    assert {r["field"] for r in inc.collect()} == {"temp"}


def test_lattice_cells_planar_orientations():
    """x-z and y-z slice grids triangulate as quads over the extended
    dims (they used to degenerate to a line chain / zero cells)."""
    from physicsnemo_curator_spark.sources.vtk_xml import _lattice_cells

    cells, types = _lattice_cells(5, 1, 4)  # x-z plane
    assert len(cells) == 4 * 3 and all(len(c) == 4 for c in cells)
    assert {v for c in cells for v in c} == set(range(20))
    cells, types = _lattice_cells(1, 5, 4)  # y-z plane
    assert len(cells) == 4 * 3 and all(len(c) == 4 for c in cells)
    cells, types = _lattice_cells(1, 1, 6)  # z line
    assert cells == [[i, i + 1] for i in range(5)]


def test_appended_raw_payload_containing_terminator(tmp_path):
    """A raw payload that embeds the literal closing-tag bytes must not
    truncate the appended block."""
    import numpy as np

    from physicsnemo_curator_spark.sources import vtk_xml

    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    cells = [[0, 1, 2]]
    # craft a point field whose float64 bytes contain '</AppendedData>'
    evil = np.frombuffer(b"</AppendedData>\x00" * 3, dtype="<f8")[:3]
    path = str(tmp_path / "evil.vtu")
    vtk_xml.write_vtu(
        [tuple(p_) for p_ in pts.tolist()],
        cells,
        None,
        {"f": evil.tolist()},
        path,
        fmt="appended-raw",
    )
    with open(path, "rb") as fh:
        parsed = vtk_xml.parse_vtk_xml(fh.read())
    got = np.asarray(parsed[3]["f"])
    np.testing.assert_array_equal(got.view("<u8"), evil.view("<u8"))


def test_multi_piece_sparse_fields_aligned(tmp_path):
    """A field present only in the second piece attaches to the second
    piece's point ids, with NaN padding elsewhere."""
    import numpy as np

    from physicsnemo_curator_spark.sources import vtk_xml

    p1 = """<Piece NumberOfPoints="2" NumberOfCells="1">
      <Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">0 0 0 1 0 0</DataArray></Points>
      <Cells>
        <DataArray type="Int64" Name="connectivity" format="ascii">0 1</DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii">2</DataArray>
        <DataArray type="UInt8" Name="types" format="ascii">3</DataArray>
      </Cells>
      <PointData></PointData>
    </Piece>"""
    p2 = """<Piece NumberOfPoints="2" NumberOfCells="1">
      <Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">0 1 0 1 1 0</DataArray></Points>
      <Cells>
        <DataArray type="Int64" Name="connectivity" format="ascii">0 1</DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii">2</DataArray>
        <DataArray type="UInt8" Name="types" format="ascii">3</DataArray>
      </Cells>
      <PointData><DataArray type="Float64" Name="p" format="ascii">7 8</DataArray></PointData>
    </Piece>"""
    doc = (
        '<VTKFile type="UnstructuredGrid" version="1.0" byte_order="LittleEndian">'
        f"<UnstructuredGrid>{p1}{p2}</UnstructuredGrid></VTKFile>"
    )
    pts, cells, ctypes, pdata, cdata, meta = vtk_xml.parse_vtk_xml(
        doc.encode()
    )
    vals = pdata["p"]
    assert len(vals) == 4
    assert np.isnan(vals[0]) and np.isnan(vals[1])
    assert vals[2:] == [7.0, 8.0]


@pytest.mark.parametrize("fmt", ["ascii", "binary", "appended", "appended-raw"])
def test_vti_encoding_roundtrip(fmt, tmp_path):
    """ImageData round-trip across all four encodings: dense fields,
    dimensions, origin, spacing (reference vti.py:86-145)."""
    dims = (3, 2, 2)
    pdat = {"temp": [float(i) for i in range(12)]}
    cdat = {"rho": [5.0, 6.0]}
    p = tmp_path / "g.vti"
    vtk_xml.write_vti(
        dims, pdat, str(p), cell_data=cdat,
        origin=(1.0, 2.0, 3.0), spacing=(0.5, 0.25, 2.0), fmt=fmt,
    )
    g = vtk_xml.parse_vti(p.read_bytes())
    assert g["dimensions"] == dims
    assert g["origin"] == (1.0, 2.0, 3.0)
    assert g["spacing"] == (0.5, 0.25, 2.0)
    assert g["direction"] == (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    assert g["point_data"] == pdat and g["cell_data"] == cdat


def test_vti_x_fastest_reshape_parity(tmp_path):
    """The flat field order is x-fastest (reference _reshape_field:
    C-order reshape to (nz, ny, nx) recovers [z, y, x] indexing) —
    pin it by checking a hand-computed (iz, iy, ix) -> value map."""
    nx, ny, nz = 4, 3, 2
    vals = [float(iz * 100 + iy * 10 + ix)
            for iz in range(nz) for iy in range(ny) for ix in range(nx)]
    p = tmp_path / "g.vti"
    vtk_xml.write_vti((nx, ny, nz), {"f": vals}, str(p), fmt="binary")
    g = vtk_xml.parse_vti(p.read_bytes())
    got = np.asarray(g["point_data"]["f"]).reshape(nz, ny, nx)
    assert got[1, 2, 3] == 123.0 and got[0, 1, 2] == 12.0


def test_vti_mesh_view_synthesizes_lattice(tmp_path):
    """parse_vtk_xml on a .vti synthesizes the implicit uniform-lattice
    points (origin + spacing * ijk) and hexahedral cells, so the mesh
    operator pack applies unchanged."""
    p = tmp_path / "g.vti"
    vtk_xml.write_vti(
        (2, 2, 2), {"t": [float(i) for i in range(8)]}, str(p),
        origin=(10.0, 0.0, 0.0), spacing=(1.0, 2.0, 3.0), fmt="ascii",
    )
    pts, cells, ctypes, pdata, cdata, meta = vtk_xml.parse_vtk_xml(p.read_bytes())
    assert len(pts) == 8 and pts[0] == (10.0, 0.0, 0.0)
    assert pts[1] == (11.0, 0.0, 0.0)      # x fastest
    assert pts[2] == (10.0, 2.0, 0.0)      # then y (spacing 2)
    assert pts[4] == (10.0, 0.0, 3.0)      # then z (spacing 3)
    assert cells == [[0, 1, 3, 2, 4, 5, 7, 6]] and ctypes == [12]
    assert pdata == {"t": [float(i) for i in range(8)]}
    assert meta["dimensions"] == (2, 2, 2)
    assert meta["origin"] == (10.0, 0.0, 0.0)


def test_vti_direction_matrix_applied(tmp_path):
    """A non-identity Direction matrix rotates the synthesized lattice
    (p = origin + D @ (spacing * ijk)) and lands in grid_meta."""
    p = tmp_path / "g.vti"
    vtk_xml.write_vti((2, 1, 1), {"t": [0.0, 1.0]}, str(p), fmt="ascii")
    doc = p.read_bytes().decode()
    # swap x into y: D = [[0,-1,0],[1,0,0],[0,0,1]]
    doc = doc.replace(
        "<ImageData ",
        '<ImageData Direction="0 -1 0 1 0 0 0 0 1" ', 1,
    )
    pts, _, _, _, _, meta = vtk_xml.parse_vtk_xml(doc.encode())
    assert pts[1] == (0.0, 1.0, 0.0)
    g = vtk_xml.parse_vti(doc.encode())
    assert g["direction"] == (0.0, -1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0)


def test_vti_multi_piece_scatter(tmp_path):
    """Two pieces tiling the whole extent scatter into one dense
    whole-extent array by their GLOBAL extent offsets; uncovered
    lattice sites stay NaN (loud, never silently zero)."""
    # whole extent 0..3 in x (nx=4), pieces cover x 0..1 and x 2..3
    doc = """<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt32">
<ImageData WholeExtent="0 3 0 0 0 0" Origin="0 0 0" Spacing="1 1 1">
<Piece Extent="0 1 0 0 0 0">
<PointData><DataArray type="Float64" Name="f" format="ascii">10 11</DataArray></PointData>
</Piece>
<Piece Extent="2 3 0 0 0 0">
<PointData><DataArray type="Float64" Name="f" format="ascii">12 13</DataArray></PointData>
</Piece>
</ImageData>
</VTKFile>"""
    g = vtk_xml.parse_vti(doc.encode())
    assert g["point_data"]["f"] == [10.0, 11.0, 12.0, 13.0]
    # a field present in only ONE piece NaN-pads the rest
    doc2 = doc.replace(
        '<DataArray type="Float64" Name="f" format="ascii">12 13</DataArray>',
        "",
    )
    g2 = vtk_xml.parse_vti(doc2.encode())
    f = g2["point_data"]["f"]
    assert f[:2] == [10.0, 11.0] and all(np.isnan(v) for v in f[2:])


def test_read_image_data_mixed_formats(spark, tmp_path):
    """read_image_data scans XML .vti and legacy STRUCTURED_POINTS in
    one pass (content sniff per file) into identical long tables."""
    vals = [float(i) for i in range(12)]
    vtk_xml.write_vti(
        (3, 2, 2), {"t": vals}, str(tmp_path / "a.vti"),
        origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0), fmt="appended",
    )
    vtk.write_structured_points((3, 2, 2), {"t": vals}, str(tmp_path / "b.vtk"))
    t = vtk.read_image_data(spark, str(tmp_path), glob="*.vt[ik]")
    rows = t["grid"].collect()
    assert len(rows) == 24
    byg = {}
    for r in rows:
        byg.setdefault(r.grid_id, {})[(r.iz, r.iy, r.ix)] = r.value
    assert byg["a"] == byg["b"]
    assert byg["a"][(1, 1, 2)] == 11.0  # x-fastest flat index 11
    meta = {r.grid_id: r for r in t["meta"].collect()}
    assert (meta["a"].nx, meta["a"].ny, meta["a"].nz) == (3, 2, 2)
    assert meta["a"].d00 == 1.0 and meta["a"].d01 == 0.0


def test_read_image_data_cell_grid(spark, tmp_path):
    vtk_xml.write_vti(
        (3, 2, 2), None, str(tmp_path / "c.vti"),
        cell_data={"rho": [7.0, 8.0]}, fmt="binary",
    )
    t = vtk.read_image_data(spark, str(tmp_path))
    rows = t["cell_grid"].collect()
    assert {(r.iz, r.iy, r.ix, r.value) for r in rows} == {
        (0, 0, 0, 7.0), (0, 0, 1, 8.0)
    }
