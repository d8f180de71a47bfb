"""Pure-Python NetCDF-3 *classic* (CDF-1) writer + reader.

The container has no ``netCDF4``/HDF5, but the classic NetCDF format is
a small, fully public on-disk spec (the CDF-1 layout documented in the
NetCDF users' guide), so the per-(variable, year) sink encodes it with
stdlib ``struct`` + numpy only.  Files written here open with any
netCDF reader (``netCDF4``, ``scipy.io.netcdf_file``, ``xarray``).

Honest subset vs the reference's ``NetCDF4Sink`` (``domains/da/sinks/
netcdf_writer.py:75-435``): classic format — no HDF5 groups and no
zlib chunk compression (those require the netCDF4/HDF5 C stack); the
reference's *routing* semantics (one file per (variable, year), time as
the record dimension) are fully reproduced.  Each file is written by
one Spark task in a single shot, so the "unlimited dimension append"
degenerates to writing ``numrecs`` known up front — append-across-jobs
is done by writing new files per partition, Spark-style, not by
mutating existing ones.

Supported types: f8/f4/i4/i2/i1 and char attributes.
"""

from __future__ import annotations

import os
import struct
from typing import Any

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPE_TO_NC = {
    "int8": (NC_BYTE, 1, ">i1"),
    "int16": (NC_SHORT, 2, ">i2"),
    "int32": (NC_INT, 4, ">i4"),
    "float32": (NC_FLOAT, 4, ">f4"),
    "float64": (NC_DOUBLE, 8, ">f8"),
}
_NC_TO_DTYPE = {
    NC_BYTE: ">i1",
    NC_CHAR: "S1",
    NC_SHORT: ">i2",
    NC_INT: ">i4",
    NC_FLOAT: ">f4",
    NC_DOUBLE: ">f8",
}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _att_values(value: Any) -> tuple[int, bytes]:
    """Encode one attribute value (str or numeric scalar/list)."""
    if isinstance(value, str):
        raw = value.encode()
        return NC_CHAR, struct.pack(">i", len(raw)) + _pad4(raw)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i":
        arr = arr.astype(">i4")
        nc_type = NC_INT
    else:
        arr = arr.astype(">f8")
        nc_type = NC_DOUBLE
    return nc_type, struct.pack(">i", arr.size) + _pad4(arr.tobytes())


def _att_list(attrs: dict[str, Any] | None) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        nc_type, payload = _att_values(v)
        out += _name(k) + struct.pack(">i", nc_type) + payload
    return out


def write_netcdf3(
    path: str,
    *,
    dims: dict[str, int | None],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    global_attrs: dict[str, Any] | None = None,
    var_attrs: dict[str, dict[str, Any]] | None = None,
) -> None:
    """Write one classic NetCDF file.

    ``dims``: name → size (``None`` = the record/unlimited dimension;
    at most one, and it must be the first dim of any variable using it).
    ``variables``: name → (dim names, array).  Record-variable arrays
    carry the record count as their first axis.
    """
    var_attrs = var_attrs or {}
    rec_dims = [d for d, s in dims.items() if s is None]
    if len(rec_dims) > 1:
        raise ValueError("at most one unlimited dimension")
    rec_dim = rec_dims[0] if rec_dims else None

    numrecs = 0
    for _, ((vdims, arr)) in variables.items():
        if rec_dim and vdims and vdims[0] == rec_dim:
            numrecs = max(numrecs, arr.shape[0])

    dim_names = list(dims)
    dim_id = {d: i for i, d in enumerate(dim_names)}

    # --- variable metadata pass
    fixed: list[str] = []
    record: list[str] = []
    meta: dict[str, dict[str, Any]] = {}
    for vname, (vdims, arr) in variables.items():
        is_rec = bool(rec_dim and vdims and vdims[0] == rec_dim)
        if rec_dim and rec_dim in vdims and not is_rec:
            # the classic format only supports the record dim as the
            # FIRST axis; writing it elsewhere would emit a fixed
            # variable referencing the zero-length dim — a corrupt
            # file every reader decodes as empty
            raise ValueError(
                f"{vname}: record dimension {rec_dim!r} must be the "
                f"first dim, got {tuple(vdims)}"
            )
        base = str(arr.dtype)
        if base not in _DTYPE_TO_NC:
            raise ValueError(f"unsupported dtype {base} for {vname}")
        nc_type, tsize, be = _DTYPE_TO_NC[base]
        shape = [
            numrecs if (rec_dim and d == rec_dim) else dims[d] for d in vdims
        ]
        if list(arr.shape) != shape:
            raise ValueError(
                f"{vname}: array shape {arr.shape} != dims {shape}"
            )
        per_rec = int(np.prod(shape[1:], dtype=np.int64)) if is_rec else 1
        n_fixed = int(np.prod(shape, dtype=np.int64)) if not is_rec else 0
        raw_size = (per_rec if is_rec else n_fixed) * tsize
        vsize = raw_size + (-raw_size % 4)
        meta[vname] = {
            "dims": vdims, "nc_type": nc_type, "tsize": tsize, "be": be,
            "is_rec": is_rec, "vsize": vsize, "raw_size": raw_size,
        }
        (record if is_rec else fixed).append(vname)

    # --- header bytes (begin offsets need header length: two passes)
    def _header(offsets: dict[str, int]) -> bytes:
        h = b"CDF\x01" + struct.pack(">i", numrecs)
        if dims:
            h += struct.pack(">ii", _NC_DIMENSION, len(dims))
            for d in dim_names:
                h += _name(d) + struct.pack(">i", dims[d] or 0)
        else:
            h += struct.pack(">ii", 0, 0)
        h += _att_list(global_attrs)
        vnames = fixed + record
        if vnames:
            h += struct.pack(">ii", _NC_VARIABLE, len(vnames))
            for v in vnames:
                m = meta[v]
                h += _name(v)
                h += struct.pack(">i", len(m["dims"]))
                for d in m["dims"]:
                    h += struct.pack(">i", dim_id[d])
                h += _att_list(var_attrs.get(v))
                h += struct.pack(
                    ">iii", m["nc_type"], m["vsize"], offsets.get(v, 0)
                )
        else:
            h += struct.pack(">ii", 0, 0)
        return h

    hlen = len(_header({}))
    offsets: dict[str, int] = {}
    pos = hlen
    for v in fixed:
        offsets[v] = pos
        pos += meta[v]["vsize"]
    rec_start = pos
    # single-record-variable exception: no per-record padding
    if len(record) == 1:
        meta[record[0]]["vsize"] = meta[record[0]]["raw_size"]
    for v in record:
        offsets[v] = pos
        pos += meta[v]["vsize"]
    recsize = pos - rec_start

    # tmp + atomic rename: sink tasks rewrite destination files in
    # place on re-runs, and a concurrent reader (binaryFile scan, a
    # parallel process sharing the fixture dir) must never observe a
    # torn file
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(_header(offsets))
        for v in fixed:
            m = meta[v]
            raw = variables[v][1].astype(m["be"]).tobytes()
            f.write(_pad4(raw))
        for r in range(numrecs):
            for v in record:
                m = meta[v]
                # np.asarray: a scalar (1-D record var) would silently
                # drop the big-endian byte order in astype
                raw = np.asarray(variables[v][1][r]).astype(m["be"]).tobytes()
                f.write(raw + b"\x00" * (m["vsize"] - len(raw)))
    os.replace(tmp, path)
    # recsize computed for spec fidelity of the layout; nothing to store
    del recsize


def read_netcdf3(path: str) -> dict[str, Any]:
    """Parse one classic NetCDF file → {dims, variables, attrs,
    var_attrs}.  Verification/round-trip path."""
    with open(path, "rb") as f:
        return read_netcdf3_bytes(f.read())


def read_netcdf3_bytes(buf: bytes) -> dict[str, Any]:
    """Parse classic NetCDF bytes — the executor-side decode kernel for
    a ``binaryFile`` scan of sink output (q_netcdf3_roundtrip)."""
    if buf[:4] != b"CDF\x01":
        raise ValueError("not a CDF-1 classic NetCDF file")
    pos = 4
    (numrecs,) = struct.unpack_from(">i", buf, pos)
    pos += 4

    def _read_name() -> str:
        nonlocal pos
        (n,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        s = buf[pos : pos + n].decode()
        pos += n + (-n % 4)
        return s

    def _read_atts() -> dict[str, Any]:
        nonlocal pos
        _tag, n = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out: dict[str, Any] = {}
        for _ in range(n):
            k = _read_name()
            nc_type, nelems = struct.unpack_from(">ii", buf, pos)
            pos += 8
            if nc_type == NC_CHAR:
                out[k] = buf[pos : pos + nelems].decode()
                pos += nelems + (-nelems % 4)
            else:
                dt = np.dtype(_NC_TO_DTYPE[nc_type])
                raw = nelems * dt.itemsize
                out[k] = np.frombuffer(
                    buf, dt, count=nelems, offset=pos
                ).tolist()
                pos += raw + (-raw % 4)
        return out

    _tag, ndims = struct.unpack_from(">ii", buf, pos)
    pos += 8
    dims: list[tuple[str, int]] = []
    for _ in range(ndims):
        dname = _read_name()
        (sz,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        dims.append((dname, sz))
    global_attrs = _read_atts()

    _tag, nvars = struct.unpack_from(">ii", buf, pos)
    pos += 8
    variables: dict[str, np.ndarray] = {}
    var_attrs: dict[str, dict[str, Any]] = {}
    var_dims: dict[str, tuple[str, ...]] = {}
    rec_vars: list[tuple[str, list[int], int, int, int]] = []
    for _ in range(nvars):
        vname = _read_name()
        (vnd,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        dimids = list(struct.unpack_from(f">{vnd}i", buf, pos)) if vnd else []
        pos += 4 * vnd
        var_attrs[vname] = _read_atts()
        nc_type, vsize, begin = struct.unpack_from(">iii", buf, pos)
        pos += 12
        vdims = tuple(dims[i][0] for i in dimids)
        var_dims[vname] = vdims
        shape = [dims[i][1] for i in dimids]
        dt = np.dtype(_NC_TO_DTYPE[nc_type])
        if shape and shape[0] == 0:  # record variable
            rec_vars.append((vname, shape, dt.itemsize, vsize, begin))
            per_rec_shape = shape[1:]
            n_per = int(np.prod(per_rec_shape, dtype=np.int64))
            # materialized after the loop — the record stride needs the
            # full record-variable inventory
            variables[vname] = (dt, per_rec_shape, n_per, begin)  # type: ignore
        else:
            n = int(np.prod(shape, dtype=np.int64))
            variables[vname] = np.frombuffer(
                buf, dt, count=n, offset=begin
            ).reshape(shape)

    if rec_vars:
        recsize = sum(v[3] for v in rec_vars)
        if len(rec_vars) == 1:
            recsize = rec_vars[0][3]
        for vname, shape, itemsize, vsize, begin in rec_vars:
            dt, per_rec_shape, n_per, _ = variables[vname]  # type: ignore
            recs = [
                np.frombuffer(
                    buf, dt, count=n_per, offset=begin + r * recsize
                ).reshape(per_rec_shape)
                for r in range(numrecs)
            ]
            variables[vname] = (
                np.stack(recs) if recs
                else np.empty((0, *per_rec_shape), dt)
            )

    return {
        "numrecs": numrecs,
        "dims": dict(dims),
        "dim_order": {v: d for v, d in var_dims.items()},
        "variables": variables,
        "attrs": global_attrs,
        "var_attrs": var_attrs,
    }
