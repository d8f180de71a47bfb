"""Gridded-data (DataArray) operators over the long grid table.

Encoding (SURVEY §1.2b): ``grid(time, variable, lat, lon, value)``,
partitioned by time — one Spark partition per timestep mirrors the
reference's one-index-per-timestamp layout and its Zarr chunking
``{time:1, lat:*, lon:*}`` (reference ``domains/da/sinks/zarr_writer
.py:215``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import stats


def grid_stats_over_time(grid: DataFrame, time_col: str = "time_idx") -> DataFrame:
    """Element-wise running stats reduced over time
    (DataArrayStatsFilter, reference ``domains/da/filters/stats.py:
    47-483``): one hash-aggregate keyed on the kept dims."""
    return stats.elementwise_stats(grid, ["variable", "lat", "lon"], "value")


def coarsen(
    grid: DataFrame,
    factor: int,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    time_col: str = "time_idx",
) -> DataFrame:
    """Block-mean regrid: average ``factor×factor`` cells (the ERA5 →
    coarse-grid downsample; a pure groupBy, no windowing).

    Blocks use floor division: a long cast truncates toward zero, which
    merged a double-width block straddling zero for signed latitudes."""
    return (
        grid.withColumn("lat_c", F.floor(F.col(lat_col) / factor).cast("long"))
        .withColumn("lon_c", F.floor(F.col(lon_col) / factor).cast("long"))
        .groupBy(time_col, "variable", "lat_c", "lon_c")
        .agg(F.avg("value").alias("value"), F.count(F.lit(1)).alias("n_fine"))
    )


def climatology(grid: DataFrame) -> DataFrame:
    """Per-cell mean over all times — the reference's accumulated
    element-wise mean (Zarr stats store).  (The reduce is over every
    non-cell dim, so no time column name is needed.)"""
    return grid.groupBy("variable", "lat", "lon").agg(
        F.avg("value").alias("clim_mean")
    )


def anomaly(grid: DataFrame) -> DataFrame:
    """value − per-cell climatology.

    Join strategy: the climatology table has one row per grid cell
    (≙ 721×1440 ≈ 1 M rows for ERA5 — comfortably broadcastable), so
    the anomaly of a 100 TB time stack is a broadcast join against the
    scan, not a shuffle of the stack.
    """
    clim = climatology(grid)
    return grid.join(F.broadcast(clim), ["variable", "lat", "lon"]).withColumn(
        "anomaly", F.col("value") - F.col("clim_mean")
    )


def align_check(a: DataFrame, b: DataFrame) -> bool:
    """Coordinate-equality assertion before a multi-backend merge
    (reference ERA5 grid-alignment check + concat, ``era5.py:352-366``):
    both frames must cover the identical (lat, lon) set."""
    ka = a.select("lat", "lon").distinct()
    kb = b.select("lat", "lon").distinct()
    return ka.exceptAll(kb).isEmpty() and kb.exceptAll(ka).isEmpty()


def merge_variable_groups(parts: list[DataFrame]) -> DataFrame:
    """unionByName merge of per-backend variable groups (reference
    ``era5.py:352-366`` concat over the variable dim)."""
    if not parts:
        raise ValueError("merge_variable_groups needs at least one part")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
