"""Pure-Python HDF5 codec: round-trips over the supported subset
(contiguous + deflate-chunked layouts, nested groups, attributes),
spec-level byte assertions (superblock, signatures, chunk B-tree keys),
honest raises for the unsupported surface, and an h5py cross-check that
runs wherever h5py IS installed (absent here — the gate documents it)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from physicsnemo_curator_spark.sinks import hdf5

try:  # pragma: no cover — not installed in this environment
    import h5py  # type: ignore

    HAS_H5PY = True
except ImportError:
    HAS_H5PY = False


def _write_default(path):
    rng = np.random.default_rng(11)
    data = {
        "temp": rng.normal(size=(7, 5)),
        "g1/counts": rng.integers(0, 9, size=(6, 4)).astype("<i8"),
        "g1/g2/small": rng.normal(size=(4,)).astype("<f4"),
        "plain": np.arange(10, dtype="<i4"),
    }
    hdf5.write_hdf5(
        str(path),
        data,
        chunks={"temp": (3, 2), "g1/counts": (2, 4)},
        deflate=6,
        attrs={
            "temp": {"units": "K", "scale": 2.5, "levels": np.array([1, 2])},
            "g1": {"kind": "nested"},
            "": {"title": "root"},
        },
    )
    return data


def test_roundtrip_all_layouts(tmp_path):
    p = tmp_path / "t.h5"
    data = _write_default(p)
    ds, at = hdf5.read_hdf5(str(p))
    assert sorted(ds) == sorted(data)
    for k in data:
        np.testing.assert_array_equal(ds[k], data[k])
        assert ds[k].dtype == data[k].dtype
    assert at["temp"]["units"] == "K" and at["temp"]["scale"] == 2.5
    assert list(at["temp"]["levels"]) == [1, 2]
    assert at["g1"]["kind"] == "nested" and at[""]["title"] == "root"


def test_edge_chunks_padded_and_compressed(tmp_path):
    """7x5 with 3x2 chunks exercises padded edge chunks; the stored
    chunk payloads must actually be zlib streams (spot-decompress one
    via the chunk B-tree, independent of read_hdf5)."""
    p = tmp_path / "c.h5"
    arr = np.arange(35, dtype="<f8").reshape(7, 5)
    hdf5.write_hdf5(str(p), {"v": arr}, chunks={"v": (3, 2)}, deflate=9)
    buf = open(p, "rb").read()
    # find the chunk B-tree (node type 1)
    i = buf.index(b"TREE")
    ntype, level, used = struct.unpack_from("<BBH", buf, i + 4)
    assert ntype == 1 and used == 9  # ceil(7/3)*ceil(5/2) = 3*3
    # first key: stored nbytes + offsets (0,0,0), then child address
    nbytes, mask = struct.unpack_from("<II", buf, i + 24)
    offs = struct.unpack_from("<QQQ", buf, i + 32)
    child = struct.unpack_from("<Q", buf, i + 56)[0]
    assert offs == (0, 0, 0)
    chunk = np.frombuffer(
        zlib.decompress(buf[child : child + nbytes]), "<f8"
    ).reshape(3, 2)
    np.testing.assert_array_equal(chunk, arr[0:3, 0:2])
    ds, _ = hdf5.read_hdf5(str(p))
    np.testing.assert_array_equal(ds["v"], arr)


def test_superblock_layout(tmp_path):
    p = tmp_path / "s.h5"
    _write_default(p)
    buf = open(p, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0  # superblock version 0
    assert buf[13] == 8 and buf[14] == 8  # offset/length sizes
    leaf_k, internal_k = struct.unpack_from("<HH", buf, 16)
    assert (leaf_k, internal_k) == (4, 16)
    eof = struct.unpack_from("<Q", buf, 40)[0]
    assert eof == len(buf)  # end-of-file address == actual size
    root_hdr = struct.unpack_from("<Q", buf, 64)[0]
    assert buf[root_hdr] == 1  # v1 object header


def test_many_links_split_into_snods(tmp_path):
    """>8 links per group spill into multiple symbol-table nodes under
    one B-tree leaf; order and content must survive."""
    p = tmp_path / "m.h5"
    data = {f"v{i:02d}": np.array([i], dtype="<i8") for i in range(20)}
    hdf5.write_hdf5(str(p), data, deflate=None)
    ds, _ = hdf5.read_hdf5(str(p))
    assert sorted(ds) == sorted(data)
    for k in data:
        assert ds[k][0] == data[k][0]


def test_unsupported_raises_loudly(tmp_path):
    with pytest.raises(ValueError, match="unsupported dtype"):
        hdf5.write_hdf5(
            str(tmp_path / "x.h5"), {"v": np.array(["a"], dtype=object)}
        )
    with pytest.raises(ValueError, match="deflate requires"):
        # contiguous + deflate is contradictory; chunks must be given
        hdf5._write_dataset(
            hdf5._Writer(), np.arange(4.0), None, 4, None
        )
    with pytest.raises(ValueError, match="unknown dataset"):
        hdf5.write_hdf5(
            str(tmp_path / "y.h5"),
            {"v": np.arange(4.0)},
            chunks={"w": (2,)},
        )


@pytest.mark.skipif(not HAS_H5PY, reason="h5py not installed here")
def test_h5py_cross_check(tmp_path):  # pragma: no cover
    """Where h5py exists, files written by this codec must open with
    the reference C implementation byte-for-byte."""
    p = tmp_path / "x.h5"
    data = _write_default(p)
    with h5py.File(str(p), "r") as f:
        for k in data:
            np.testing.assert_array_equal(f[k][...], data[k])
        assert f["temp"].attrs["units"] in (b"K", "K")


def test_hdf5_per_variable_year_sink(spark, tmp_path):
    """Distributed HDF5 sink: one chunked+deflate .h5 per (variable,
    year), values round-tripping exactly through the codec."""
    import os

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.sinks.scientific import (
        write_hdf5_per_variable_year,
    )
    from physicsnemo_curator_spark.sources.synthetic import random_grid

    grid = random_grid(spark, n_times=3, n_lat=2, n_lon=2).withColumnRenamed(
        "time_idx", "tidx"
    )
    grid = grid.withColumn(
        "time",
        F.expr(
            "timestamp'2023-01-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, tidx, 0, 0)"
        ),
    )
    out = str(tmp_path / "h5")
    n = write_hdf5_per_variable_year(grid, out, chunk_rows=2, deflate=6)
    assert n == 2 and len(os.listdir(out)) == 2
    name = sorted(os.listdir(out))[0]
    ds, at = hdf5.read_hdf5(os.path.join(out, name))
    var = name.rsplit("_", 1)[0]
    assert ds[f"data/{var}"].shape == (3, 2, 2)
    assert at[""]["Conventions"] == "CF-1.6"
    # exact value parity against the source table
    rows = grid.filter(F.col("variable") == var).collect()
    times = sorted({r["time"] for r in rows})
    lats = sorted({r["lat"] for r in rows})
    lons = sorted({r["lon"] for r in rows})
    for r in rows:
        got = ds[f"data/{var}"][
            times.index(r["time"]), lats.index(r["lat"]), lons.index(r["lon"])
        ]
        assert got == r["value"]


def test_full_size_btree_nodes_for_conforming_readers(tmp_path):
    """libhdf5 computes the FIXED v1 node size from the superblock K
    values (group node = 544 bytes at K=16) and reads that many bytes
    — every node must be written at full capacity or reads run past
    EOF.  Pin: the root group B-tree has >= 544 bytes before EOF, and
    a chunk B-tree node has its full computed size available."""
    p = tmp_path / "k.h5"
    hdf5.write_hdf5(
        str(p), {"v": np.arange(6.0)}, chunks={"v": (2,)}, deflate=1
    )
    buf = open(p, "rb").read()
    root_bt = struct.unpack_from("<Q", buf, 80)[0]  # superblock scratch
    assert root_bt + hdf5._GROUP_NODE_SIZE <= len(buf)
    # chunk node: rank 1 -> ndims 2 -> size 24 + 65*24 + 64*8 = 2096
    i = buf.index(b"TREE")
    assert struct.unpack_from("<B", buf, i + 4)[0] == 1  # chunk node
    assert i + hdf5._chunk_node_size(2) <= len(buf)


def test_chunk_btree_splits_past_64_chunks(tmp_path):
    """>64 chunks split into sibling-linked leaves under one internal
    node; every value must still round-trip."""
    p = tmp_path / "big.h5"
    arr = np.arange(300, dtype="<f8")
    hdf5.write_hdf5(str(p), {"v": arr}, chunks={"v": (2,)}, deflate=1)
    ds, _ = hdf5.read_hdf5(str(p))  # 150 chunks -> 3 leaves + 1 root
    np.testing.assert_array_equal(ds["v"], arr)
    buf = open(p, "rb").read()
    # find the internal node (type 1, level 1)
    found = False
    i = -1
    while True:
        i = buf.find(b"TREE", i + 1)
        if i < 0:
            break
        ntype, level = struct.unpack_from("<BB", buf, i + 4)
        if ntype == 1 and level == 1:
            found = True
    assert found


def test_attrs_for_unknown_path_raise(tmp_path):
    with pytest.raises(ValueError, match="unknown path"):
        hdf5.write_hdf5(
            str(tmp_path / "a.h5"),
            {"g/v": np.arange(3.0)},
            attrs={"g/v ": {"oops": 1}},
        )
    # dataset, implied group, and root keys are all legal
    hdf5.write_hdf5(
        str(tmp_path / "b.h5"),
        {"g/v": np.arange(3.0)},
        attrs={"g/v": {"a": 1}, "g": {"b": 2}, "": {"c": 3}},
    )


def test_epoch_is_utc_regardless_of_local_tz():
    """Naive timestamps from a UTC Spark session must encode as UTC
    epoch seconds even on a machine with a different local TZ."""
    import datetime as dtm
    import os
    import time as _time

    from physicsnemo_curator_spark.sinks.scientific import _epoch_utc

    old = os.environ.get("TZ")
    os.environ["TZ"] = "Asia/Tokyo"
    _time.tzset()
    try:
        t = dtm.datetime(2023, 1, 1, 0, 0, 0)  # naive, session-UTC
        assert _epoch_utc(t) == 1672531200.0
        aware = dtm.datetime(2023, 1, 1, tzinfo=dtm.timezone.utc)
        assert _epoch_utc(aware) == 1672531200.0
        assert _epoch_utc(5.0) == 5.0
    finally:
        if old is None:
            os.environ.pop("TZ")
        else:
            os.environ["TZ"] = old
        _time.tzset()


def test_empty_chunked_dataset(tmp_path):
    """A zero-length dimension has no chunks: the chunk B-tree must be
    an empty LEAF (level 0), not a childless internal node."""
    p = tmp_path / "e.h5"
    hdf5.write_hdf5(
        str(p), {"v": np.empty((0, 4))}, chunks={"v": (2, 4)}, deflate=1
    )
    ds, _ = hdf5.read_hdf5(str(p))
    assert ds["v"].shape == (0, 4)
    buf = open(p, "rb").read()
    i = buf.index(b"TREE")
    ntype, level, used = struct.unpack_from("<BBH", buf, i + 4)
    assert (ntype, level, used) == (1, 0, 0)


def _write_scaled(path):
    data = {
        "time": np.arange(4.0),
        "lat": np.arange(2.0),
        "lon": np.arange(3.0),
        "data/v": np.arange(24.0).reshape(4, 2, 3),
    }
    hdf5.write_hdf5(
        str(path),
        data,
        chunks={"data/v": (2, 2, 3)},
        deflate=6,
        dimensions={"data/v": ["time", "lat", "lon"]},
    )
    return data


def test_dimension_scales_roundtrip(tmp_path):
    """netCDF-4 wiring: scales carry CLASS/NAME/_Netcdf4Dimid, the data
    variable's DIMENSION_LIST resolves back to the scale paths."""
    p = tmp_path / "d.h5"
    data = _write_scaled(p)
    ds, at = hdf5.read_hdf5(str(p))
    for k in data:
        np.testing.assert_array_equal(ds[k], data[k])
    assert at["time"]["CLASS"] == "DIMENSION_SCALE"
    assert at["time"]["NAME"] == "time"
    assert (
        at["time"]["_Netcdf4Dimid"],
        at["lat"]["_Netcdf4Dimid"],
        at["lon"]["_Netcdf4Dimid"],
    ) == (0, 1, 2)
    assert at["data/v"]["DIMENSION_LIST"] == [["time"], ["lat"], ["lon"]]
    # the H5DS reverse map: each scale names every (dataset, dim) that
    # references it
    assert at["time"]["REFERENCE_LIST"] == [("data/v", 0)]
    assert at["lat"]["REFERENCE_LIST"] == [("data/v", 1)]
    assert at["lon"]["REFERENCE_LIST"] == [("data/v", 2)]


def test_reference_list_multi_dataset(tmp_path):
    """Two variables sharing scales: the reverse map accumulates one
    entry per (dataset, dim) in declaration order, and the backpatched
    references resolve to the right headers even though the data
    datasets are written after the scales."""
    p = str(tmp_path / "m.h5")
    t, y = np.arange(3.0), np.arange(4.0)
    a = np.arange(12.0).reshape(3, 4)
    b = a * 3
    hdf5.write_hdf5(
        p,
        {"t": t, "y": y, "a": a, "g/b": b},
        deflate=None,
        dimensions={"a": ["t", "y"], "g/b": ["t", "y"]},
    )
    ds, at = hdf5.read_hdf5(p)
    np.testing.assert_array_equal(ds["a"], a)
    np.testing.assert_array_equal(ds["g/b"], b)
    assert at["t"]["REFERENCE_LIST"] == [("a", 0), ("g/b", 0)]
    assert at["y"]["REFERENCE_LIST"] == [("a", 1), ("g/b", 1)]


def test_reference_list_bytes(tmp_path):
    """Spec-level pins: REFERENCE_LIST is a 1-D array of 12-byte
    compound elements — member ``dataset`` (class-7 object reference,
    size 8, offset 0) + member ``dimension`` (class-0 int32, offset 8)
    — the ds_list_t layout libhdf5's H5DS API writes, with no
    placeholder token left behind after backpatching."""
    p = tmp_path / "d.h5"
    _write_scaled(p)
    buf = open(p, "rb").read()
    i = buf.index(b"REFERENCE_LIST\x00")
    hdr = i - 8
    _ver, name_size, dt_size, ds_size = struct.unpack_from(
        "<BxHHH", buf, hdr
    )
    assert name_size == 15
    off = hdr + 8 + (name_size + 7) // 8 * 8
    dt = buf[off : off + dt_size]
    # compound v1, 2 members, size 12
    assert dt[0] == 0x16 and dt[1] == 2
    assert struct.unpack_from("<I", dt, 4)[0] == 12
    m1 = dt[8:]
    assert m1.startswith(b"dataset\x00")
    m1_fixed = m1[8:]  # name padded to 8
    assert struct.unpack_from("<I", m1_fixed, 0)[0] == 0  # offset 0
    m1_dt = m1_fixed[32:]
    assert m1_dt[0] == 0x17  # object reference
    assert struct.unpack_from("<I", m1_dt, 4)[0] == 8
    m2 = m1_dt[8:]
    assert m2.startswith(b"dimension\x00")
    m2_fixed = m2[16:]  # name padded to 16
    assert struct.unpack_from("<I", m2_fixed, 0)[0] == 8  # offset 8
    m2_dt = m2_fixed[32:]
    assert m2_dt[0] == 0x10  # fixed-point
    assert struct.unpack_from("<I", m2_dt, 4)[0] == 4
    # attribute data: one element whose reference points INSIDE the
    # file (backpatched) — no 0xA5C396E7 token residue anywhere
    off += (dt_size + 7) // 8 * 8 + (ds_size + 7) // 8 * 8
    ref, dim = struct.unpack_from("<QI", buf, off)
    assert 0 < ref < len(buf) and dim == 0
    assert struct.pack("<I", 0xA5C396E7)[::-1] not in buf


def test_dimension_list_bytes(tmp_path):
    """Spec-level pins: the DIMENSION_LIST attribute uses a class-9
    vlen of class-7 object references (disk size 16/8) and its elements
    live in a >= 4096-byte GCOL collection with an index-0 free-space
    tail."""
    p = tmp_path / "d.h5"
    _write_scaled(p)
    buf = open(p, "rb").read()
    i = buf.index(b"DIMENSION_LIST\x00")
    # attribute message body starts 8 bytes of header before the name
    hdr = i - 8
    _ver, name_size, dt_size, _ds_size = struct.unpack_from(
        "<BxHHH", buf, hdr
    )
    assert name_size == 15
    dt = buf[hdr + 8 + (name_size + 7) // 8 * 8 :][:dt_size]
    assert dt[0] == 0x19 and struct.unpack_from("<I", dt, 4)[0] == 16
    assert dt[8] == 0x17 and struct.unpack_from("<I", dt, 12)[0] == 8
    g = buf.index(b"GCOL")
    assert struct.unpack_from("<Q", buf, g + 8)[0] >= 4096
    # free-space object (index 0) exists after the three 8-byte refs
    off = g + 16
    for _ in range(3):
        idx, _rc, osize = struct.unpack_from("<HH4xQ", buf, off)
        assert idx > 0 and osize == 8
        off += 16 + 8
    idx0, _rc0, free = struct.unpack_from("<HH4xQ", buf, off)
    assert idx0 == 0 and free == (g + 4096) - off


def test_dimensions_validation(tmp_path):
    p = str(tmp_path / "bad.h5")
    with pytest.raises(ValueError, match="unknown dataset"):
        hdf5.write_hdf5(
            p, {"v": np.zeros(2)}, dimensions={"w": ["v"]}, deflate=None
        )
    with pytest.raises(ValueError, match="rank"):
        hdf5.write_hdf5(
            p,
            {"v": np.zeros((2, 2)), "t": np.zeros(2)},
            dimensions={"v": ["t"]},
            deflate=None,
        )
    with pytest.raises(ValueError, match="unknown dimension scale"):
        hdf5.write_hdf5(
            p, {"v": np.zeros(2)}, dimensions={"v": ["t"]}, deflate=None
        )
    with pytest.raises(ValueError, match="must be 1-D"):
        hdf5.write_hdf5(
            p,
            {"v": np.zeros(2), "t": np.zeros((2, 1))},
            dimensions={"v": ["t"]},
            deflate=None,
        )


@pytest.mark.skipif(not HAS_H5PY, reason="h5py not installed here")
def test_h5py_dimension_scales(tmp_path):  # pragma: no cover
    """Where h5py exists: scales register as real dimension scales and
    the data variable's dims resolve to them."""
    p = tmp_path / "d.h5"
    _write_scaled(p)
    with h5py.File(str(p), "r") as f:
        assert h5py.h5ds.is_scale(f["time"].id)
        for k, name in enumerate(("time", "lat", "lon")):
            assert f["data/v"].dims[k][0] == f[name]
            # REFERENCE_LIST reverse map resolves through h5py: the
            # scale's recorded (dataset, dim) pairs point back at the
            # data variable
            rl = f[name].attrs["REFERENCE_LIST"]
            assert len(rl) == 1
            ref, dim = rl[0]
            assert f[ref] == f["data/v"].id or f[ref].id == f["data/v"].id
            assert dim == k


try:  # pragma: no cover — not installed in this environment
    import netCDF4  # type: ignore

    HAS_NETCDF4 = True
except ImportError:
    HAS_NETCDF4 = False


@pytest.mark.skipif(not HAS_NETCDF4, reason="netCDF4 not installed here")
def test_netcdf4_cross_check(spark, tmp_path):  # pragma: no cover
    """Where the netCDF4 C stack exists, the per-(variable, year) sink
    output must open as a netCDF-4 dataset with (time, lat, lon)
    dimensions on the data variable."""
    import os

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.sinks.scientific import (
        write_hdf5_per_variable_year,
    )
    from physicsnemo_curator_spark.sources.synthetic import random_grid

    grid = random_grid(spark, n_times=3, n_lat=2, n_lon=2).withColumnRenamed(
        "time_idx", "tidx"
    )
    grid = grid.withColumn(
        "time",
        F.expr(
            "timestamp'2023-01-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, tidx, 0, 0)"
        ),
    )
    out = str(tmp_path / "h5")
    write_hdf5_per_variable_year(grid, out, chunk_rows=2, deflate=6)
    name = sorted(os.listdir(out))[0]
    var = name.rsplit("_", 1)[0]
    with netCDF4.Dataset(os.path.join(out, name)) as nc:
        v = nc.groups["data"].variables[var]
        assert v.dimensions == ("time", "lat", "lon")
        assert v.shape == (3, 2, 2)


def test_reference_list_token_collision_attr(tmp_path):
    """A numeric attribute on the SCALE whose int64 value equals the
    backpatch placeholder token must not confuse the patcher: the
    patch location is found structurally (object-header message walk),
    not by byte search, so the write succeeds and both the attribute
    and the reverse map come back intact."""
    p = str(tmp_path / "c.h5")
    evil = np.array([0xA5C396E700000000, 0xA5C396E700000001],
                    dtype=np.uint64).astype(np.int64)
    t = np.arange(3.0)
    a = np.arange(6.0).reshape(3, 2)
    y = np.arange(2.0)
    hdf5.write_hdf5(
        p,
        {"t": t, "y": y, "a": a},
        deflate=None,
        dimensions={"a": ["t", "y"]},
        attrs={"t": {"evil": evil}},
    )
    ds, at = hdf5.read_hdf5(p)
    np.testing.assert_array_equal(ds["a"], a)
    np.testing.assert_array_equal(np.asarray(at["t"]["evil"]), evil)
    assert at["t"]["REFERENCE_LIST"] == [("a", 0)]
    assert at["y"]["REFERENCE_LIST"] == [("a", 1)]
