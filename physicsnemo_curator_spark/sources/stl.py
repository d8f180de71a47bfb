"""STL (ASCII + binary) triangle-mesh ingest.

STL is in the reference's recognized extension set
(``domains/mesh/sources/vtk.py:59``).  Both public layouts:

- ASCII: ``solid`` / ``facet normal`` / ``outer loop`` / 3 × ``vertex``;
- binary: 80-byte header, uint32 facet count, then 50 bytes per facet
  (normal + 3 vertices as little-endian float32, uint16 attribute).

STL repeats vertices per facet, so the parser welds exact-duplicate
coordinates into shared point ids (the standard STL → indexed-mesh
step; tolerance-based welding is a separate op —
``operators.mesh.clean``).  Facet normals land in cell_data as
``normal_x/y/z``; every cell is VTK type 5 (triangle), so the result
drops straight into the mesh operator pack.
"""

from __future__ import annotations

import struct

import numpy as np


def _weld(tri_vertices: list[tuple[float, float, float]]):
    """Exact-coordinate vertex welding: triples of vertices → points +
    index triples."""
    index: dict[tuple[float, float, float], int] = {}
    points: list[tuple[float, float, float]] = []
    ids: list[int] = []
    for v in tri_vertices:
        i = index.get(v)
        if i is None:
            i = len(points)
            index[v] = i
            points.append(v)
        ids.append(i)
    cells = [ids[k : k + 3] for k in range(0, len(ids), 3)]
    return points, cells


def parse_stl(data: bytes):
    """Parse one STL document (auto-detects ASCII vs binary).

    Returns ``(points, cells, cell_types, point_data, cell_data)`` in
    the same shape as :func:`vtk_xml.parse_vtk_xml` — cell_data carries
    the facet normals (``normal_x/y/z``).
    """
    if _is_binary(data):
        n = struct.unpack("<I", data[80:84])[0]
        rec = np.frombuffer(data[84 : 84 + 50 * n], dtype=np.uint8).reshape(n, 50)
        floats = rec[:, :48].copy().view("<f4").reshape(n, 12).astype(np.float64)
        normals = floats[:, 0:3]
        verts = floats[:, 3:12].reshape(n * 3, 3)
    else:
        text = data.decode(errors="replace")
        norm_rows, vert_rows = [], []
        for line in text.splitlines():
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "facet" and len(parts) >= 5:
                norm_rows.append([float(t) for t in parts[2:5]])
            elif parts[0] == "vertex":
                vert_rows.append([float(t) for t in parts[1:4]])
        normals = np.asarray(norm_rows, dtype=np.float64).reshape(-1, 3)
        verts = np.asarray(vert_rows, dtype=np.float64).reshape(-1, 3)

    tri_vertices = [tuple(map(float, v)) for v in verts]
    points, cells = _weld(tri_vertices)
    cell_types = [5] * len(cells)  # VTK_TRIANGLE
    cell_data = {
        "normal_x": [float(v) for v in normals[:, 0]],
        "normal_y": [float(v) for v in normals[:, 1]],
        "normal_z": [float(v) for v in normals[:, 2]],
    }
    return points, cells, cell_types, {}, cell_data


def _is_binary(data: bytes) -> bool:
    """Binary iff the declared facet count matches the byte length —
    the robust test, since binary headers may also start with 'solid'."""
    if len(data) >= 84:
        n = struct.unpack("<I", data[80:84])[0]
        if len(data) == 84 + 50 * n:
            return True
    head = data[:512].lstrip()
    return not head.startswith(b"solid")


def write_stl_ascii(
    triangles: list[list[tuple[float, float, float]]],
    path: str,
    *,
    name: str = "mesh",
) -> None:
    """Emit one ASCII STL file; normals recomputed from winding."""
    with open(path, "w") as f:
        f.write(f"solid {name}\n")
        for tri in triangles:
            n = _normal(tri)
            f.write(f"  facet normal {n[0]} {n[1]} {n[2]}\n    outer loop\n")
            for v in tri:
                f.write(f"      vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("    endloop\n  endfacet\n")
        f.write(f"endsolid {name}\n")


def write_stl_binary(
    triangles: list[list[tuple[float, float, float]]], path: str
) -> None:
    """Emit one binary STL file."""
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(triangles)))
        for tri in triangles:
            n = _normal(tri)
            f.write(struct.pack("<3f", *n))
            for v in tri:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


def _normal(tri) -> tuple[float, float, float]:
    a, b, c = (np.asarray(v, dtype=np.float64) for v in tri)
    n = np.cross(b - a, c - a)
    ln = float(np.linalg.norm(n))
    if ln == 0.0:
        return (0.0, 0.0, 0.0)
    return tuple(float(x) for x in n / ln)
