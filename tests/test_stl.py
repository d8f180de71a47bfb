"""STL ingest: ASCII/binary round-trip, vertex welding, normals, and
the read_vtk scan path."""

from __future__ import annotations

from physicsnemo_curator_spark.sources import stl, vtk

# a unit square as two triangles sharing an edge (4 welded points)
TRIS = [
    [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
    [(1.0, 0.0, 0.0), (1.0, 1.0, 0.0), (0.0, 1.0, 0.0)],
]


def _check(points, cells, ctypes, cdata):
    assert len(points) == 4  # 6 facet vertices weld to 4
    assert len(cells) == 2 and all(len(c) == 3 for c in cells)
    assert ctypes == [5, 5]
    # both facets face +z
    assert cdata["normal_z"] == [1.0, 1.0]
    # connectivity references welded points with the original coords
    for tri, cell in zip(TRIS, cells):
        assert [points[i] for i in cell] == tri


def test_ascii_roundtrip(tmp_path):
    p = tmp_path / "m.stl"
    stl.write_stl_ascii(TRIS, str(p))
    points, cells, ctypes, pdata, cdata = stl.parse_stl(p.read_bytes())
    _check(points, cells, ctypes, cdata)


def test_binary_roundtrip(tmp_path):
    p = tmp_path / "m.stl"
    stl.write_stl_binary(TRIS, str(p))
    points, cells, ctypes, pdata, cdata = stl.parse_stl(p.read_bytes())
    _check(points, cells, ctypes, cdata)


def test_binary_detection_with_solid_header(tmp_path):
    """Binary files whose 80-byte header begins with 'solid' must still
    parse as binary (the classic STL detection trap)."""
    p = tmp_path / "m.stl"
    stl.write_stl_binary(TRIS, str(p))
    data = bytearray(p.read_bytes())
    data[:5] = b"solid"
    points, cells, ctypes, _, cdata = stl.parse_stl(bytes(data))
    _check(points, cells, ctypes, cdata)


def test_read_vtk_scans_stl(spark, tmp_path):
    stl.write_stl_ascii(TRIS, str(tmp_path / "a.stl"))
    stl.write_stl_binary(TRIS, str(tmp_path / "b.stl"))
    tables = vtk.read_vtk(spark, str(tmp_path), glob="*.stl")
    pts = tables["points"].collect()
    assert len(pts) == 8  # 4 welded points per mesh
    cells = tables["cells"].collect()
    assert len(cells) == 4 and all(r["ctype"] == 5 for r in cells)
    nz = tables["cell_data"].filter("field = 'normal_z'").collect()
    assert [r["value"] for r in nz] == [1.0] * 4
