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
