"""NetCDF-3 classic (CDF-1) writer/reader round-trip + the per-
(variable, year) distributed sink producing real .nc files."""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import functions as F

from physicsnemo_curator_spark.sinks.netcdf3 import read_netcdf3, write_netcdf3
from physicsnemo_curator_spark.sinks.scientific import (
    write_netcdf_per_variable_year,
)
from physicsnemo_curator_spark.sources.synthetic import random_grid


def test_fixed_vars_roundtrip(tmp_path):
    path = str(tmp_path / "fixed.nc")
    lat = np.array([10.0, 20.0, 30.0])
    field = np.arange(12, dtype="float32").reshape(3, 4)
    write_netcdf3(
        path,
        dims={"lat": 3, "lon": 4},
        variables={"lat": (("lat",), lat), "t2m": (("lat", "lon"), field)},
        global_attrs={"title": "unit test", "version": 2},
        var_attrs={"t2m": {"units": "K", "scale": [1.0]}},
    )
    out = read_netcdf3(path)
    assert out["dims"] == {"lat": 3, "lon": 4}
    np.testing.assert_array_equal(out["variables"]["lat"], lat)
    np.testing.assert_array_equal(out["variables"]["t2m"], field)
    assert out["attrs"]["title"] == "unit test"
    assert out["attrs"]["version"] == [2]
    assert out["var_attrs"]["t2m"]["units"] == "K"


def test_record_dimension_roundtrip(tmp_path):
    """Unlimited time dim: record variables interleave per record; the
    single-record-var padding exception is honored."""
    path = str(tmp_path / "rec.nc")
    times = np.array([0.0, 3600.0, 7200.0])
    data = np.arange(3 * 2 * 2, dtype="float64").reshape(3, 2, 2)
    write_netcdf3(
        path,
        dims={"time": None, "lat": 2, "lon": 2},
        variables={
            "time": (("time",), times),
            "value": (("time", "lat", "lon"), data),
        },
    )
    out = read_netcdf3(path)
    assert out["numrecs"] == 3
    np.testing.assert_array_equal(out["variables"]["time"], times)
    np.testing.assert_array_equal(out["variables"]["value"], data)
    assert out["dim_order"]["value"] == ("time", "lat", "lon")


def test_header_is_big_endian_cdf1(tmp_path):
    path = str(tmp_path / "hdr.nc")
    write_netcdf3(
        path,
        dims={"x": 2},
        variables={"v": (("x",), np.array([1.0, 2.0]))},
    )
    raw = open(path, "rb").read()
    assert raw[:4] == b"CDF\x01"
    # int16 payload check: NC_DOUBLE value bytes are big-endian
    (first,) = struct.unpack_from(">d", raw, len(raw) - 16)
    assert first == 1.0


def test_netcdf_sink_writes_real_nc(spark, tmp_path):
    """One real classic-NetCDF file per (variable, year), written
    task-side, readable back with the pure-Python parser."""
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
    out = str(tmp_path / "nc")
    n = write_netcdf_per_variable_year(grid, out)
    files = sorted(os.listdir(out))
    assert n == 2 and files == ["t2m_2023.nc", "u10_2023.nc"]

    back = read_netcdf3(os.path.join(out, "t2m_2023.nc"))
    assert back["dims"]["lat"] == 2 and back["dims"]["lon"] == 2
    assert back["numrecs"] == 3
    arr = back["variables"]["t2m"]
    pdf = grid.filter(F.col("variable") == "t2m").toPandas()
    dense = np.full((3, 2, 2), np.nan)
    dense[pdf.tidx, pdf.lat, pdf.lon] = pdf.value
    np.testing.assert_allclose(arr, dense)
