"""Read-side grid-store sources: task-per-chunk Zarr scan and
task-per-file NetCDF-3 scan must invert the write-side encoders
exactly (reference reads ERA5 from Zarr the same chunk-parallel way,
era5.py:103-404)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from physicsnemo_curator_spark.sinks import zarr_store as zs
from physicsnemo_curator_spark.sinks.scientific import write_netcdf_per_variable_year
from physicsnemo_curator_spark.sources.grid_stores import (
    read_grid_zarr,
    read_netcdf3_grid,
)
from physicsnemo_curator_spark.sources.synthetic import random_grid


def _rows(df, time_name="time"):
    return sorted(
        (r["variable"], float(r[time_name]), float(r["lat"]), float(r["lon"]),
         round(float(r["value"]), 9))
        for r in df.collect()
    )


def test_zarr_grid_roundtrip(spark, tmp_path):
    store = str(tmp_path / "grid.zarr")
    grid = random_grid(spark, n_times=3, n_lat=4, n_lon=5)
    zs.write_grid_zarr(grid, store)

    back = read_grid_zarr(spark, store)
    assert _rows(back) == _rows(
        grid.select("variable", F.col("time_idx").cast("double").alias("time"),
                    "lat", "lon", "value")
    )


def test_zarr_grid_variable_pruning(spark, tmp_path):
    store = str(tmp_path / "grid.zarr")
    grid = random_grid(spark, n_times=2, n_lat=3, n_lon=3)
    zs.write_grid_zarr(grid, store)
    only = read_grid_zarr(spark, store, variables=["t2m"])
    assert set(r["variable"] for r in only.collect()) == {"t2m"}


def test_zarr_v3_sharded_roundtrip(spark, tmp_path):
    """Sharded v3 store (reference ZarrSink shards= mode): 7 time
    chunks pack into ceil(7/4)=2 shard files per variable, and the
    task-per-shard scan must invert the writer exactly — including the
    partial last shard whose index carries 2^64-1 missing sentinels."""
    store = str(tmp_path / "grid_v3.zarr")
    grid = random_grid(spark, n_times=7, n_lat=4, n_lon=5)
    out = zs.write_grid_zarr_v3(grid, store, shard_time=4)

    # shard files, not per-time chunks, are the on-disk unit
    for v in (k for k in out if not k.startswith("__")):
        cdir = os.path.join(store, v, "data", "c")
        shards = [d for d in os.listdir(cdir) if d.isdigit()]
        assert sorted(shards) == ["0", "1"]

    back = read_grid_zarr(spark, store)
    assert _rows(back) == _rows(
        grid.select("variable", F.col("time_idx").cast("double").alias("time"),
                    "lat", "lon", "value")
    )


def test_zarr_v3_driver_reader_matches(spark, tmp_path):
    """read_array_v3 (driver-side verification path) reassembles the
    sharded array to the same values the distributed scan returns."""
    import numpy as np

    store = str(tmp_path / "grid_v3b.zarr")
    grid = random_grid(spark, n_times=5, n_lat=3, n_lon=3)
    zs.write_grid_zarr_v3(grid, store, shard_time=2)
    v = sorted(
        d for d in os.listdir(store)
        if os.path.isdir(os.path.join(store, d, "data"))
    )[0]
    arr = zs.read_array_v3(os.path.join(store, v, "data"))
    assert arr.shape == (5, 3, 3)
    exp = {
        (int(r["time_idx"]), float(r["lat"]), float(r["lon"])): r["value"]
        for r in grid.filter(F.col("variable") == v).collect()
    }
    lats = sorted({k[1] for k in exp})
    lons = sorted({k[2] for k in exp})
    for (t, la, lo), val in exp.items():
        got = arr[t, lats.index(la), lons.index(lo)]
        assert np.isclose(got, val)


def test_v3_shard_codec_unit():
    """encode_shard/decode_shard invert, the crc32c matches the known
    check value for '123456789' (0xE3069283), and missing inner chunks
    round-trip as absent."""
    import numpy as np

    assert zs._crc32c(b"123456789") == 0xE3069283
    blocks = {0: np.arange(6.0).reshape(1, 2, 3), 2: np.full((1, 2, 3), 7.0)}
    blob = zs.encode_shard(blocks, 4, zs.V3_DEFAULT_CODEC)
    back = zs.decode_shard(blob, 4, (1, 2, 3), np.dtype("<f8"), zs.V3_DEFAULT_CODEC)
    assert set(back) == {0, 2}
    assert np.array_equal(back[0], blocks[0])
    assert np.array_equal(back[2], blocks[2])


def test_federated_grid_routing_and_failover(spark, tmp_path):
    """ERA5Source routing semantics (reference era5.py:103-404) against
    local stores: priority-ordered per-variable routing, failed-backend
    re-routing, unresolved-variable error, and the lat/lon alignment
    gate before merge."""
    import pytest

    from physicsnemo_curator_spark.sources.grid_stores import (
        read_grid_federated,
        resolve_grid_routing,
    )

    grid = random_grid(spark, n_times=2, n_lat=3, n_lon=4)
    variables = sorted(r["variable"] for r in grid.select("variable").distinct().collect())
    assert len(variables) >= 2
    v0, v1 = variables[0], variables[1]

    # primary serves only v0; secondary serves everything
    primary = str(tmp_path / "primary.zarr")
    secondary = str(tmp_path / "secondary.zarr")
    zs.write_grid_zarr(grid.filter(F.col("variable") == v0), primary)
    zs.write_grid_zarr(grid, secondary)

    # v0 routes to the higher-priority primary, the rest fall through
    routing = resolve_grid_routing(
        variables, [("primary", {v0}), ("secondary", set(variables))]
    )
    assert routing[v0] == "primary"
    assert all(routing[v] == "secondary" for v in variables[1:])

    out = read_grid_federated(
        spark, [("primary", primary), ("secondary", secondary)], variables
    )
    assert _rows(out) == _rows(
        grid.select("variable", F.col("time_idx").cast("double").alias("time"),
                    "lat", "lon", "value")
    )

    # failed backend (missing store) re-routes its variables
    with pytest.warns(UserWarning, match="failed to probe"):
        out2 = read_grid_federated(
            spark,
            [("gone", str(tmp_path / "nope")), ("secondary", secondary)],
            variables,
        )
    assert out2.count() == grid.count()

    # unresolved variable raises the reference's contract error
    with pytest.raises(ValueError, match="not found in any backend"):
        read_grid_federated(
            spark, [("secondary", secondary)], [*variables, "zz_missing"]
        )

    # misaligned grids are rejected before any merge
    shifted = str(tmp_path / "shifted.zarr")
    zs.write_grid_zarr(
        grid.filter(F.col("variable") == v1).withColumn(
            "lat", F.col("lat") + 0.5
        ),
        shifted,
    )
    with pytest.raises(ValueError, match="grid mismatch"):
        read_grid_federated(
            spark, [("primary", primary), ("shifted", shifted)], [v0, v1]
        )


def test_netcdf3_grid_roundtrip(spark, tmp_path):
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
    write_netcdf_per_variable_year(grid, out)

    back = read_netcdf3_grid(spark, out)
    exp = grid.select(
        "variable",
        F.unix_timestamp("time").cast("double").alias("time"),
        "lat", "lon", "value",
    )
    assert _rows(back) == _rows(exp)
    assert set(r["variable"] for r in
               read_netcdf3_grid(spark, out, variables=["u10"]).collect()) == {"u10"}
