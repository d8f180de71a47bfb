"""VTK XML mesh formats (``.vtu`` / ``.vtp``) — pure-Python parser + writer.

Parity target: the reference's primary mesh ingest path (Rust XML parser,
reference ``src/rust/src/vtk/parser.rs:303``; extension set
``domains/mesh/sources/vtk.py:59``) — DrivAerML/AhmedML-style datasets
ship XML VTK, not legacy ASCII.  Implemented from the public VTK file
format specification with stdlib ``xml.etree`` + ``base64`` + ``zlib``
and numpy ``frombuffer`` — no native dependency, so it runs inside any
executor task.

Supported surface:

- ``UnstructuredGrid`` (.vtu): Points, Cells (connectivity/offsets/
  types), PointData, CellData.
- ``PolyData`` (.vtp): Points, Verts/Lines/Polys/Strips (emitted in
  that order with the standard VTK cell types), PointData, CellData.
- ``StructuredGrid`` (.vts): explicit (curvilinear) points over a
  WholeExtent lattice; the implicit cell lattice materializes as
  hexahedra (VTK type 12) so the mesh operator pack applies unchanged;
  extent dimensions land in grid_meta.
- ``ImageData`` (.vti): uniform rectilinear grid fully determined by
  WholeExtent/Origin/Spacing (+ optional Direction matrix) — no
  explicit point list (reference ``domains/mesh/sources/vti.py:
  60-145``, ``imagedata_to_griddict`` / ``_reshape_field`` x-fastest
  order).  Two views: :func:`parse_vtk_xml` synthesizes the lattice
  points + implicit cells so the mesh table path applies unchanged,
  and :func:`parse_vti` returns the dense-grid view (whole-extent
  x-fastest flat fields + grid metadata) that feeds the
  ``(grid_id, iz, iy, ix, field, value)`` long schema.
- ``vtkMultiBlockDataSet`` (.vtm): an XML index of nested files —
  :func:`parse_vtm_index` returns the referenced paths for the scan
  layer to load (one task per referenced file).
- DataArray ``format="ascii"``, ``format="binary"`` (inline base64),
  and ``format="appended"`` with ``encoding="base64"`` or
  ``encoding="raw"`` (offset-addressed block after the ``_`` marker).
- ``compressor="vtkZLibDataCompressor"`` block compression with
  ``header_type`` UInt32 or UInt64 (the [nblocks, blocksize,
  last_block_size, compressed sizes...] header layout).
- All VTK scalar types (Int8..Int64, UInt8..UInt64, Float32/64),
  little-endian; multi-component arrays emit one field per component
  as ``name_<c>`` (a lone component keeps the bare name).

The writer emits the same layouts (used for round-trip tests and as the
MeshVTUSink encoder kernel — reference ``domains/mesh/sinks/vtu.py``).
"""

from __future__ import annotations

import base64
import math
import re
import zlib
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {
    "Int8": "<i1",
    "UInt8": "<u1",
    "Int16": "<i2",
    "UInt16": "<u2",
    "Int32": "<i4",
    "UInt32": "<u4",
    "Int64": "<i8",
    "UInt64": "<u8",
    "Float32": "<f4",
    "Float64": "<f8",
}

# VTK cell types for the PolyData sections (public VTK enum values)
_VERT, _POLY_VERTEX = 1, 2
_LINE, _POLY_LINE = 3, 4
_TRIANGLE, _TRIANGLE_STRIP, _POLYGON = 5, 6, 7


def _b64_len(nbytes: int) -> int:
    return 4 * ((nbytes + 2) // 3)


class _Decoder:
    """Per-file decode context: byte order, header type, compressor,
    and the appended-data block."""

    def __init__(self, root: ET.Element, appended: bytes | None):
        if root.get("byte_order", "LittleEndian") != "LittleEndian":
            raise ValueError("only LittleEndian VTK XML is supported")
        comp = root.get("compressor", "")
        if comp not in ("", "vtkZLibDataCompressor"):
            raise ValueError(f"unsupported compressor {comp!r}")
        self.compressed = comp == "vtkZLibDataCompressor"
        self.hdt = np.dtype(_DTYPES[root.get("header_type", "UInt32")])
        self.appended = appended  # bytes after '_' (base64 text or raw)
        self.appended_encoding = None
        app = root.find("AppendedData")
        if app is not None:
            self.appended_encoding = app.get("encoding", "base64")

    # -- block decoders ------------------------------------------------
    def _decode_uncompressed_b64(self, text: str) -> bytes:
        h = self.hdt.itemsize
        head = base64.b64decode(text[: _b64_len(h)])
        nbytes = int(np.frombuffer(head[:h], self.hdt)[0])
        raw = base64.b64decode(text[: _b64_len(h + nbytes)])
        return raw[h : h + nbytes]

    def _decode_compressed_b64(self, text: str) -> bytes:
        h = self.hdt.itemsize
        # peek the 3-int prefix to learn the block count, then re-read
        # the full [3 + nblocks] header (VTK encodes the header as its
        # own base64 stream, the blocks as another)
        prefix = base64.b64decode(text[: _b64_len(3 * h)])
        nblocks = int(np.frombuffer(prefix, self.hdt, count=1)[0])
        header_nbytes = (3 + nblocks) * h
        header = np.frombuffer(
            base64.b64decode(text[: _b64_len(header_nbytes)]), self.hdt
        )
        sizes = header[3:].astype(np.int64)
        blob = base64.b64decode(text[_b64_len(header_nbytes) :])
        return self._inflate(blob, sizes)

    def _decode_raw(self, blob: bytes) -> bytes:
        h = self.hdt.itemsize
        if not self.compressed:
            nbytes = int(np.frombuffer(blob[:h], self.hdt)[0])
            return blob[h : h + nbytes]
        nblocks = int(np.frombuffer(blob[:h], self.hdt)[0])
        header_nbytes = (3 + nblocks) * h
        header = np.frombuffer(blob[:header_nbytes], self.hdt)
        sizes = header[3:].astype(np.int64)
        return self._inflate(blob[header_nbytes:], sizes)

    @staticmethod
    def _inflate(blob: bytes, sizes: np.ndarray) -> bytes:
        out, pos = [], 0
        for s in sizes:
            out.append(zlib.decompress(blob[pos : pos + int(s)]))
            pos += int(s)
        return b"".join(out)

    # -- DataArray → numpy --------------------------------------------
    def array(self, da: ET.Element) -> np.ndarray:
        dtype = np.dtype(_DTYPES[da.get("type", "Float64")])
        fmt = da.get("format", "ascii")
        if fmt == "ascii":
            text = da.text or ""
            return np.array(text.split(), dtype=dtype)
        if fmt == "binary":
            text = re.sub(r"\s+", "", da.text or "")
            raw = (
                self._decode_compressed_b64(text)
                if self.compressed
                else self._decode_uncompressed_b64(text)
            )
            return np.frombuffer(raw, dtype=dtype)
        if fmt == "appended":
            if self.appended is None:
                raise ValueError("appended DataArray but no <AppendedData>")
            off = int(da.get("offset", "0"))
            if self.appended_encoding == "raw":
                raw = self._decode_raw(self.appended[off:])
            else:
                text = re.sub(r"\s+", "", self.appended[off:].decode("ascii"))
                raw = (
                    self._decode_compressed_b64(text)
                    if self.compressed
                    else self._decode_uncompressed_b64(text)
                )
            return np.frombuffer(raw, dtype=dtype)
        raise ValueError(f"unsupported DataArray format {fmt!r}")


def _split_appended_raw(data: bytes) -> tuple[bytes, bytes | None]:
    """Raw appended payloads are not well-formed XML — excise the bytes
    between the '_' marker and </AppendedData> before parsing, and
    return them separately."""
    m = re.search(rb'<AppendedData[^>]*encoding="raw"[^>]*>', data)
    if m is None:
        return data, None
    start = data.index(b"_", m.end()) + 1
    # search from the TAIL: compressed payloads can legally contain the
    # literal closing-tag bytes, and the first match would truncate the
    # block and splice binary into the XML
    end = data.rindex(b"</AppendedData>")
    xml_ok = data[: m.end()] + b"</AppendedData>" + data[end + len(b"</AppendedData>") :]
    return xml_ok, data[start:end]


def _named_arrays(section: ET.Element | None, dec: _Decoder, n: int) -> dict[str, list[float]]:
    """PointData/CellData → {field: values}; C-component arrays emit
    ``name_<c>`` per component."""
    out: dict[str, list[float]] = {}
    if section is None:
        return out
    for da in section.findall("DataArray"):
        name = da.get("Name", "unnamed")
        comps = int(da.get("NumberOfComponents", "1"))
        vals = dec.array(da).astype(np.float64)
        if comps == 1:
            out[name] = vals[:n].tolist()
        else:
            vals = vals.reshape(-1, comps)
            for c in range(comps):
                out[f"{name}_{c}"] = vals[:n, c].tolist()
    return out


_HEXAHEDRON, _QUAD = 12, 9


def _extent_dims(piece: ET.Element) -> tuple[int, int, int]:
    e = [int(t) for t in (piece.get("Extent") or "0 0 0 0 0 0").split()]
    return e[1] - e[0] + 1, e[3] - e[2] + 1, e[5] - e[4] + 1


def _extent_bounds(
    el: ET.Element, attr: str = "Extent"
) -> tuple[tuple[int, int, int], tuple[int, int, int]]:
    """(starts, dims) of an extent attribute — ImageData pieces are
    addressed by GLOBAL lattice indices, so the start offsets matter
    for point positions and multi-piece assembly."""
    e = [int(t) for t in (el.get(attr) or "0 0 0 0 0 0").split()]
    return (e[0], e[2], e[4]), (
        e[1] - e[0] + 1,
        e[3] - e[2] + 1,
        e[5] - e[4] + 1,
    )


def _image_geometry(grid: ET.Element):
    """Origin/Spacing/Direction of an <ImageData> element (VTK
    defaults: zero origin, unit spacing, identity direction)."""
    origin = np.array(
        [float(t) for t in (grid.get("Origin") or "0 0 0").split()]
    )
    spacing = np.array(
        [float(t) for t in (grid.get("Spacing") or "1 1 1").split()]
    )
    d = grid.get("Direction")
    direction = (
        np.array([float(t) for t in d.split()]).reshape(3, 3)
        if d
        else np.eye(3)
    )
    return origin, spacing, direction


def _image_points(
    origin: np.ndarray,
    spacing: np.ndarray,
    direction: np.ndarray,
    starts: tuple[int, int, int],
    dims: tuple[int, int, int],
) -> np.ndarray:
    """Synthesize the implicit ImageData lattice points in x-fastest
    order: p(i,j,k) = origin + direction @ (spacing * [i, j, k]) with
    GLOBAL indices (piece extent offsets included)."""
    (x0, y0, z0), (nx, ny, nz) = starts, dims
    kk, jj, ii = np.meshgrid(
        np.arange(z0, z0 + nz),
        np.arange(y0, y0 + ny),
        np.arange(x0, x0 + nx),
        indexing="ij",
    )
    ijk = np.stack(
        [ii.ravel(), jj.ravel(), kk.ravel()], axis=1
    ).astype(np.float64)
    return origin + (ijk * spacing) @ direction.T


def _lattice_cells(nx: int, ny: int, nz: int):
    """Implicit structured-grid cells: hexahedra (3D), quads (2D), or
    lines (1D) over an x-fastest point lattice, standard VTK corner
    order."""
    cells: list[list[int]] = []
    dims = [nx, ny, nz]
    n_extended = sum(1 for d in dims if d > 1)
    if n_extended == 3:
        nxy = nx * ny
        for k in range(nz - 1):
            for j in range(ny - 1):
                for i in range(nx - 1):
                    b = k * nxy + j * nx + i
                    cells.append(
                        [b, b + 1, b + nx + 1, b + nx,
                         b + nxy, b + nxy + 1, b + nxy + nx + 1, b + nxy + nx]
                    )
        return cells, [_HEXAHEDRON] * len(cells)
    if n_extended == 2:
        # planar grid in ANY orientation: quads over the two extended
        # dims (an x-z or y-z slice .vts used to degenerate into a line
        # chain / zero cells because only the x-y case was handled)
        strides = [1, nx, nx * ny]
        (da, sa), (db, sb) = [
            (d, strd) for d, strd in zip(dims, strides) if d > 1
        ]
        for jb in range(db - 1):
            for ia in range(da - 1):
                b = jb * sb + ia * sa
                cells.append([b, b + sa, b + sa + sb, b + sb])
        return cells, [_QUAD] * len(cells)
    # 1-D (or single-point) lattice: a line chain along the one
    # extended dim, whatever its orientation
    strides = [1, nx, nx * ny]
    dl, sl = next(
        ((d, strd) for d, strd in zip(dims, strides) if d > 1), (1, 1)
    )
    cells = [[i * sl, (i + 1) * sl] for i in range(dl - 1)]
    return cells, [_LINE] * len(cells)


def parse_vtm_index(data: bytes) -> list[str]:
    """Parse a ``.vtm`` multiblock index: the ordered list of referenced
    ``DataSet file=`` paths (relative to the .vtm's directory)."""
    root = ET.fromstring(data)
    if root.tag != "VTKFile" or root.get("type") != "vtkMultiBlockDataSet":
        raise ValueError("not a vtkMultiBlockDataSet index")
    return [
        ds.get("file")
        for ds in root.iter("DataSet")
        if ds.get("file")
    ]


def parse_vtk_xml(data: bytes):
    """Parse one ``.vtu`` / ``.vtp`` / ``.vts`` / ``.vti`` document.
    ImageData (.vti) synthesizes its implicit uniform-lattice points
    (origin + direction @ (spacing * ijk), global piece indices) so
    the mesh-table view applies unchanged; its grid_meta carries
    dimensions/origin/spacing/direction for the dense-grid view.

    Returns ``(points, cells, cell_types, point_data, cell_data,
    grid_meta)``: points ``[(x, y, z)]``, cells ``[[vertex ids]]``,
    cell_types ``[int]`` (VTK enum), point_data / cell_data
    ``{field: [float]}``, grid_meta ``{'dimensions': (nx, ny, nz)}``
    for structured grids (empty otherwise).  Multiple ``<Piece>``
    elements concatenate with vertex ids offset by the preceding
    pieces' point counts (the standard piece merge).
    """
    xml_bytes, raw_appended = _split_appended_raw(data)
    root = ET.fromstring(xml_bytes)
    if root.tag != "VTKFile":
        raise ValueError(f"not a VTK XML file (root {root.tag!r})")
    kind = root.get("type")
    if kind not in ("UnstructuredGrid", "PolyData", "StructuredGrid", "ImageData"):
        raise ValueError(f"unsupported VTK XML type {kind!r}")

    appended: bytes | None = raw_appended
    if appended is None:
        app = root.find("AppendedData")
        if app is not None:
            txt = app.text or ""
            appended = txt[txt.index("_") + 1 :].encode("ascii")
    dec = _Decoder(root, appended)

    grid = root.find(kind)
    points: list[tuple[float, float, float]] = []
    cells: list[list[int]] = []
    cell_types: list[int] = []
    point_data: dict[str, list[float]] = {}
    cell_data: dict[str, list[float]] = {}
    grid_meta: dict = {}

    if kind == "ImageData":
        img_origin, img_spacing, img_direction = _image_geometry(grid)
        _, wdims = _extent_bounds(grid, "WholeExtent")
        grid_meta["dimensions"] = wdims
        grid_meta["origin"] = tuple(float(v) for v in img_origin)
        grid_meta["spacing"] = tuple(float(v) for v in img_spacing)
        grid_meta["direction"] = tuple(
            float(v) for v in img_direction.ravel()
        )

    for piece in grid.findall("Piece"):
        base = len(points)
        if kind == "StructuredGrid":
            nx, ny, nz = _extent_dims(piece)
            n_pts = nx * ny * nz
            grid_meta["dimensions"] = (nx, ny, nz)
            pts = dec.array(piece.find("Points/DataArray")).astype(np.float64)
            pts = pts.reshape(-1, 3)[:n_pts]
        elif kind == "ImageData":
            # no explicit point list: synthesize the uniform lattice
            starts, (nx, ny, nz) = _extent_bounds(piece)
            n_pts = nx * ny * nz
            pts = _image_points(
                img_origin, img_spacing, img_direction, starts, (nx, ny, nz)
            )
        else:
            n_pts = int(piece.get("NumberOfPoints", "0"))
            pts = dec.array(piece.find("Points/DataArray")).astype(np.float64)
            pts = pts.reshape(-1, 3)[:n_pts]
        points.extend((float(x), float(y), float(z)) for x, y, z in pts)

        piece_cells: list[list[int]] = []
        piece_types: list[int] = []
        if kind == "UnstructuredGrid":
            sec = piece.find("Cells")
            conn, offs, typs = _connectivity(sec, dec)
            piece_cells = _split_cells(conn, offs)
            piece_types = typs if typs else [0] * len(piece_cells)
        elif kind in ("StructuredGrid", "ImageData"):
            piece_cells, piece_types = _lattice_cells(nx, ny, nz)
        else:  # PolyData: fixed section order, standard cell types
            for sec_name, one_t, many_t in (
                ("Verts", _VERT, _POLY_VERTEX),
                ("Lines", _LINE, _POLY_LINE),
                ("Polys", _TRIANGLE, _POLYGON),
                ("Strips", _TRIANGLE_STRIP, _TRIANGLE_STRIP),
            ):
                sec = piece.find(sec_name)
                if sec is None:
                    continue
                conn, offs, _ = _connectivity(sec, dec)
                for c in _split_cells(conn, offs):
                    piece_cells.append(c)
                    if sec_name == "Polys":
                        piece_types.append(_TRIANGLE if len(c) == 3 else _POLYGON)
                    else:
                        piece_types.append(one_t if len(c) <= 2 else many_t)

        cells.extend([v + base for v in c] for c in piece_cells)
        cell_types.extend(piece_types)

        # a field present in SOME pieces only must pad to this piece's
        # base offset before extending — blind extend() attached later
        # pieces' values to earlier pieces' point/cell ids
        cell_base = len(cells) - len(piece_cells)
        for name, vals in _named_arrays(piece.find("PointData"), dec, n_pts).items():
            cur = point_data.setdefault(name, [])
            if len(cur) < base:
                cur.extend([math.nan] * (base - len(cur)))
            cur.extend(vals)
        for name, vals in _named_arrays(
            piece.find("CellData"), dec, len(piece_cells)
        ).items():
            cur = cell_data.setdefault(name, [])
            if len(cur) < cell_base:
                cur.extend([math.nan] * (cell_base - len(cur)))
            cur.extend(vals)

    # tail-pad fields absent from the final pieces
    for d, total in ((point_data, len(points)), (cell_data, len(cells))):
        for vals in d.values():
            if len(vals) < total:
                vals.extend([math.nan] * (total - len(vals)))

    return points, cells, cell_types, point_data, cell_data, grid_meta


def _connectivity(sec: ET.Element | None, dec: _Decoder):
    conn: list[int] = []
    offs: list[int] = []
    typs: list[int] = []
    if sec is None:
        return conn, offs, typs
    for da in sec.findall("DataArray"):
        name = da.get("Name", "")
        vals = dec.array(da).astype(np.int64).tolist()
        if name == "connectivity":
            conn = vals
        elif name == "offsets":
            offs = vals
        elif name == "types":
            typs = [int(v) for v in vals]
    return conn, offs, typs


def _split_cells(conn: list[int], offs: list[int]) -> list[list[int]]:
    out, prev = [], 0
    for o in offs:
        out.append([int(v) for v in conn[prev:o]])
        prev = o
    return out


# ---------------------------------------------------------------------------
# Writer (fixtures + sink encoder kernel)
# ---------------------------------------------------------------------------


def _encode_inline(payload: bytes, hdt: np.dtype, compressed: bool) -> str:
    if not compressed:
        header = np.array([len(payload)], dtype=hdt).tobytes()
        return base64.b64encode(header + payload).decode("ascii")
    block = 32768
    chunks = [payload[i : i + block] for i in range(0, max(len(payload), 1), block)]
    comp = [zlib.compress(c) for c in chunks]
    header = np.array(
        [len(chunks), block, len(chunks[-1]), *[len(c) for c in comp]], dtype=hdt
    ).tobytes()
    return (
        base64.b64encode(header).decode("ascii")
        + base64.b64encode(b"".join(comp)).decode("ascii")
    )


def _encode_raw(payload: bytes, hdt: np.dtype, compressed: bool) -> bytes:
    if not compressed:
        return np.array([len(payload)], dtype=hdt).tobytes() + payload
    block = 32768
    chunks = [payload[i : i + block] for i in range(0, max(len(payload), 1), block)]
    comp = [zlib.compress(c) for c in chunks]
    header = np.array(
        [len(chunks), block, len(chunks[-1]), *[len(c) for c in comp]], dtype=hdt
    ).tobytes()
    return header + b"".join(comp)


class _VtuWriter:
    """Shared emit logic for write_vtu / write_vtp."""

    def __init__(self, fmt: str):
        if fmt not in ("ascii", "binary", "appended", "appended-raw"):
            raise ValueError(f"unknown fmt {fmt!r}")
        self.fmt = fmt
        self.compressed = fmt != "ascii"
        self.hdt = np.dtype("<u4")
        self.appended: list[bytes | str] = []
        self.offset = 0

    def data_array(self, name: str | None, arr: np.ndarray, vtk_type: str, comps: int = 1) -> str:
        nm = f' Name="{name}"' if name else ""
        nc = f' NumberOfComponents="{comps}"' if comps != 1 else ""
        if self.fmt == "ascii":
            body = " ".join(
                repr(float(v)) if vtk_type.startswith("Float") else str(int(v))
                for v in arr.ravel()
            )
            return f'<DataArray type="{vtk_type}"{nm}{nc} format="ascii">{body}</DataArray>'
        payload = arr.astype(_DTYPES[vtk_type]).tobytes()
        if self.fmt == "binary":
            body = _encode_inline(payload, self.hdt, self.compressed)
            return f'<DataArray type="{vtk_type}"{nm}{nc} format="binary">{body}</DataArray>'
        # appended (base64 or raw)
        if self.fmt == "appended":
            block = _encode_inline(payload, self.hdt, self.compressed)
            tag = (
                f'<DataArray type="{vtk_type}"{nm}{nc} format="appended"'
                f' offset="{self.offset}"/>'
            )
            self.appended.append(block)
            self.offset += len(block)
            return tag
        block_b = _encode_raw(payload, self.hdt, self.compressed)
        tag = (
            f'<DataArray type="{vtk_type}"{nm}{nc} format="appended"'
            f' offset="{self.offset}"/>'
        )
        self.appended.append(block_b)
        self.offset += len(block_b)
        return tag

    def document(self, kind: str, piece_attrs: str, body: list[str]) -> bytes:
        comp = ' compressor="vtkZLibDataCompressor"' if self.compressed else ""
        parts = [
            f'<VTKFile type="{kind}" version="1.0" byte_order="LittleEndian"'
            f' header_type="UInt32"{comp}>',
            f"<{kind}>",
            f"<Piece {piece_attrs}>",
            *body,
            "</Piece>",
            f"</{kind}>",
        ]
        if self.fmt == "appended":
            parts.append('<AppendedData encoding="base64">_' + "".join(self.appended) + "</AppendedData>")
            parts.append("</VTKFile>")
            return "\n".join(parts).encode("ascii")
        if self.fmt == "appended-raw":
            head = "\n".join(parts).encode("ascii")
            return (
                head
                + b'\n<AppendedData encoding="raw">_'
                + b"".join(self.appended)
                + b"</AppendedData>\n</VTKFile>"
            )
        parts.append("</VTKFile>")
        return "\n".join(parts).encode("ascii")


def _data_section(w: _VtuWriter, tag: str, data: dict[str, list[float]] | None) -> list[str]:
    if not data:
        return []
    body = [f"<{tag}>"]
    for name, vals in data.items():
        body.append(w.data_array(name, np.asarray(vals, dtype=np.float64), "Float64"))
    body.append(f"</{tag}>")
    return body


def write_vtu(
    points: list[tuple[float, float, float]],
    cells: list[list[int]],
    cell_types: list[int] | None,
    point_data: dict[str, list[float]] | None,
    path: str,
    *,
    cell_data: dict[str, list[float]] | None = None,
    fmt: str = "appended",
) -> None:
    """Emit one .vtu UnstructuredGrid file.  fmt: 'ascii' (uncompressed
    text), 'binary' (inline base64+zlib), 'appended' (base64+zlib
    appended block), 'appended-raw' (raw bytes appended block)."""
    w = _VtuWriter(fmt)
    if cell_types is None:
        cell_types = [_TRIANGLE if len(c) == 3 else _POLYGON for c in cells]
    conn = np.array([v for c in cells for v in c], dtype=np.int64)
    offs = np.cumsum([len(c) for c in cells]).astype(np.int64)
    body = [
        "<Points>",
        w.data_array(None, np.asarray(points, dtype=np.float64), "Float64", comps=3),
        "</Points>",
        "<Cells>",
        w.data_array("connectivity", conn, "Int64"),
        w.data_array("offsets", offs, "Int64"),
        w.data_array("types", np.asarray(cell_types, dtype=np.uint8), "UInt8"),
        "</Cells>",
        *_data_section(w, "PointData", point_data),
        *_data_section(w, "CellData", cell_data),
    ]
    doc = w.document(
        "UnstructuredGrid",
        f'NumberOfPoints="{len(points)}" NumberOfCells="{len(cells)}"',
        body,
    )
    with open(path, "wb") as f:
        f.write(doc)


def write_vts(
    dims: tuple[int, int, int],
    points: list[tuple[float, float, float]],
    point_data: dict[str, list[float]] | None,
    path: str,
    *,
    fmt: str = "appended",
) -> None:
    """Emit one .vts StructuredGrid file: explicit x-fastest points over
    the (nx, ny, nz) lattice."""
    nx, ny, nz = dims
    if len(points) != nx * ny * nz:
        raise ValueError(f"{len(points)} points != {nx}*{ny}*{nz}")
    w = _VtuWriter(fmt)
    ext = f"0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"
    body = [
        "<Points>",
        w.data_array(None, np.asarray(points, dtype=np.float64), "Float64", comps=3),
        "</Points>",
        *_data_section(w, "PointData", point_data),
    ]
    doc = w.document("StructuredGrid", f'Extent="{ext}"', body)
    doc = doc.replace(
        b"<StructuredGrid>", f'<StructuredGrid WholeExtent="{ext}">'.encode()
    )
    with open(path, "wb") as f:
        f.write(doc)


def parse_vti_header(data: bytes) -> dict:
    """Geometry metadata of a ``.vti`` document WITHOUT decoding any
    DataArray payloads — the cheap parse for meta-only consumers (the
    full :func:`parse_vti` base64/zlib-decodes every field)."""
    xml_bytes, _ = _split_appended_raw(data)
    root = ET.fromstring(xml_bytes)
    if root.tag != "VTKFile" or root.get("type") != "ImageData":
        raise ValueError(
            f"not a VTK ImageData XML file (type {root.get('type')!r})"
        )
    grid = root.find("ImageData")
    origin, spacing, direction = _image_geometry(grid)
    _, dims = _extent_bounds(grid, "WholeExtent")
    return {
        "dimensions": dims,
        "origin": tuple(float(v) for v in origin),
        "spacing": tuple(float(v) for v in spacing),
        "direction": tuple(float(v) for v in direction.ravel()),
    }


def parse_vti(data: bytes) -> dict:
    """Dense-grid view of one ``.vti`` ImageData document (reference
    ``domains/mesh/sources/vti.py:86-145`` ``imagedata_to_griddict``):
    whole-extent x-fastest FLAT field lists plus grid metadata, the
    shape that feeds the ``(grid_id, iz, iy, ix, field, value)`` long
    schema (``sources/vtk.py::read_image_data``).

    Returns ``{'dimensions': (nx, ny, nz), 'origin': (3,),
    'spacing': (3,), 'direction': (9,), 'point_data': {field: [float]},
    'cell_data': {field: [float]}}``.  Multi-piece files scatter each
    piece into the whole-extent array by its global extent offsets;
    lattice sites no piece covers stay NaN (loud in any downstream
    NaN-count check, never silently zero).
    """
    xml_bytes, raw_appended = _split_appended_raw(data)
    root = ET.fromstring(xml_bytes)
    if root.tag != "VTKFile" or root.get("type") != "ImageData":
        raise ValueError(
            f"not a VTK ImageData XML file (type {root.get('type')!r})"
        )
    appended: bytes | None = raw_appended
    if appended is None:
        app = root.find("AppendedData")
        if app is not None:
            txt = app.text or ""
            appended = txt[txt.index("_") + 1 :].encode("ascii")
    dec = _Decoder(root, appended)
    grid = root.find("ImageData")
    origin, spacing, direction = _image_geometry(grid)
    (wx0, wy0, wz0), (wnx, wny, wnz) = _extent_bounds(grid, "WholeExtent")
    cdims = (max(wnx - 1, 1), max(wny - 1, 1), max(wnz - 1, 1))

    point_data: dict[str, np.ndarray] = {}
    cell_data: dict[str, np.ndarray] = {}

    def _scatter(
        dest: dict[str, np.ndarray],
        section: ET.Element | None,
        whole: tuple[int, int, int],
        starts: tuple[int, int, int],
        dims: tuple[int, int, int],
    ) -> None:
        n = dims[0] * dims[1] * dims[2]
        for name, vals in _named_arrays(section, dec, n).items():
            if name not in dest:
                dest[name] = np.full(whole[0] * whole[1] * whole[2], np.nan)
            flat = dest[name].reshape(whole[2], whole[1], whole[0])
            sub = np.asarray(vals).reshape(dims[2], dims[1], dims[0])
            x0, y0, z0 = starts
            flat[
                z0 : z0 + dims[2], y0 : y0 + dims[1], x0 : x0 + dims[0]
            ] = sub

    for piece in grid.findall("Piece"):
        (px0, py0, pz0), pdims = _extent_bounds(piece)
        _scatter(
            point_data,
            piece.find("PointData"),
            (wnx, wny, wnz),
            (px0 - wx0, py0 - wy0, pz0 - wz0),
            pdims,
        )
        pcdims = tuple(max(d - 1, 1) for d in pdims)
        _scatter(
            cell_data,
            piece.find("CellData"),
            cdims,
            (px0 - wx0, py0 - wy0, pz0 - wz0),
            pcdims,
        )

    return {
        "dimensions": (wnx, wny, wnz),
        "origin": tuple(float(v) for v in origin),
        "spacing": tuple(float(v) for v in spacing),
        "direction": tuple(float(v) for v in direction.ravel()),
        "point_data": {k: v.tolist() for k, v in point_data.items()},
        "cell_data": {k: v.tolist() for k, v in cell_data.items()},
    }


def write_vti(
    dims: tuple[int, int, int],
    point_data: dict[str, list[float]] | None,
    path: str,
    *,
    cell_data: dict[str, list[float]] | None = None,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    spacing: tuple[float, float, float] = (1.0, 1.0, 1.0),
    fmt: str = "appended",
) -> None:
    """Emit one .vti ImageData file: no point list — the grid is
    implied by WholeExtent/Origin/Spacing; fields are x-fastest flat
    arrays over the point (or cell) lattice.  Same four encodings as
    :func:`write_vtu`."""
    nx, ny, nz = dims
    n_cells = max(nx - 1, 1) * max(ny - 1, 1) * max(nz - 1, 1)
    for name, vals in (point_data or {}).items():
        if len(vals) != nx * ny * nz:
            raise ValueError(
                f"point field {name!r}: {len(vals)} values != {nx}*{ny}*{nz}"
            )
    for name, vals in (cell_data or {}).items():
        if len(vals) != n_cells:
            raise ValueError(
                f"cell field {name!r}: {len(vals)} values != {n_cells} cells"
            )
    w = _VtuWriter(fmt)
    ext = f"0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"
    body = [
        *_data_section(w, "PointData", point_data),
        *_data_section(w, "CellData", cell_data),
    ]
    doc = w.document("ImageData", f'Extent="{ext}"', body)
    ox, oy, oz = origin
    sx, sy, sz = spacing
    doc = doc.replace(
        b"<ImageData>",
        (
            f'<ImageData WholeExtent="{ext}" Origin="{ox} {oy} {oz}"'
            f' Spacing="{sx} {sy} {sz}">'
        ).encode(),
    )
    with open(path, "wb") as f:
        f.write(doc)


def write_vtm(files: list[str], path: str) -> None:
    """Emit one .vtm multiblock index referencing ``files`` (paths
    relative to the .vtm location)."""
    blocks = "\n".join(
        f'    <DataSet index="{i}" file="{f}"/>' for i, f in enumerate(files)
    )
    doc = (
        '<VTKFile type="vtkMultiBlockDataSet" version="1.0"'
        ' byte_order="LittleEndian">\n'
        "  <vtkMultiBlockDataSet>\n"
        f"{blocks}\n"
        "  </vtkMultiBlockDataSet>\n"
        "</VTKFile>\n"
    )
    with open(path, "w") as f:
        f.write(doc)


def write_vtp(
    points: list[tuple[float, float, float]],
    polys: list[list[int]],
    point_data: dict[str, list[float]] | None,
    path: str,
    *,
    cell_data: dict[str, list[float]] | None = None,
    fmt: str = "appended",
) -> None:
    """Emit one .vtp PolyData file (Polys section only)."""
    w = _VtuWriter(fmt)
    conn = np.array([v for c in polys for v in c], dtype=np.int64)
    offs = np.cumsum([len(c) for c in polys]).astype(np.int64)
    body = [
        "<Points>",
        w.data_array(None, np.asarray(points, dtype=np.float64), "Float64", comps=3),
        "</Points>",
        "<Polys>",
        w.data_array("connectivity", conn, "Int64"),
        w.data_array("offsets", offs, "Int64"),
        "</Polys>",
        *_data_section(w, "PointData", point_data),
        *_data_section(w, "CellData", cell_data),
    ]
    doc = w.document(
        "PolyData",
        f'NumberOfPoints="{len(points)}" NumberOfPolys="{len(polys)}"',
        body,
    )
    with open(path, "wb") as f:
        f.write(doc)
