#!/usr/bin/env python
"""GFS weather-analysis ETL: the reference's DA pipeline, Spark-first.

Mirrors reference ``examples/da/gfs/main.py`` (GFSSource →
DataArrayStatsFilter → ZarrSink) with this engine's operators:

local GRIB2 mirror (public AWS archive layout)
  → ``read_gfs`` task-per-file scan (pure-Python GRIB2 codec, lexicon
    validation, 6-hourly timestamp validation)
  → element-wise running stats over time per (variable, lat, lon)
    (one hash aggregate — the reference's online Welford update,
    expressed as partial+final combine)
  → grid Zarr sink (one group per variable, chunk (1, nlat, nlon)
    written task-side)
  → read-back verification through ``read_grid_zarr``.

The network fetch is environment-gated, so the mirror is built here
with the same GRIB2 *encoder* (complex packing + 2nd-order spatial
differencing — the layout NCEP ships); point ``--mirror`` at a real
downloaded archive directory and the rest of the pipeline is
unchanged.

Usage: python examples/da_gfs_stats.py [mirror_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators.grid import (  # noqa: E402
    grid_stats_over_time,
)
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sinks.zarr_store import write_grid_zarr  # noqa: E402
from physicsnemo_curator_spark.sources.grib2 import (  # noqa: E402
    gfs_path,
    read_gfs,
    variable_key,
    write_grib2,
)
from physicsnemo_curator_spark.sources.grid_stores import (  # noqa: E402
    read_grid_zarr,
)

# the reference example's variable-list shape (a small slice of it)
PRESSURE_LEVELS = [500, 850]
PRESSURE_LEVEL_VARS = ["t", "z"]
SURFACE_VARS = ["t2m", "u10m", "v10m"]
NI, NJ = 60, 31  # demo lattice; the real product is 1440 x 721


def build_variable_list() -> list[str]:
    out = [f"{v}{lv}" for lv in PRESSURE_LEVELS for v in PRESSURE_LEVEL_VARS]
    return out + SURFACE_VARS


def build_mirror(root: str, times: list[datetime]) -> None:
    """Synthesize the archive layout with deterministic fields."""
    grid = dict(
        type="latlon",
        ni=NI,
        nj=NJ,
        lat1=90.0,
        lon1=0.0,
        lat2=-90.0,
        lon2=360.0 - 360.0 / NI,
        di=360.0 / NI,
        dj=180.0 / (NJ - 1),
        scan=0,
    )
    jj, ii = np.meshgrid(np.arange(NJ), np.arange(NI), indexing="ij")
    for tidx, t in enumerate(times):
        path = gfs_path(root, t)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        msgs = []
        for vidx, var in enumerate(build_variable_list()):
            d, c, n, lt, lv = variable_key(var)
            vals = ((17 * jj + 5 * ii + 11 * tidx + 7 * vidx) % 360) / 4.0
            msgs.append(
                dict(
                    time=t,
                    discipline=d,
                    category=c,
                    number=n,
                    level_type=lt,
                    level=lv,
                    grid=grid,
                    values=vals,
                    decimals=2,
                    packing="complex_diff",
                    order=2,
                )
            )
        write_grib2(path, msgs)


def main() -> None:
    mirror = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gfs_mirror"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gfs_stats"

    spark = get_spark(app_name="da-gfs-stats")
    spark.sparkContext.setLogLevel("ERROR")

    start = datetime(2024, 1, 1, 0)
    times = [start + timedelta(hours=6 * i) for i in range(4)]
    variables = build_variable_list()
    if not os.path.exists(gfs_path(mirror, times[0])):
        build_mirror(mirror, times)

    fields = read_gfs(spark, mirror, times, variables)
    n_cells = fields.count()

    # element-wise stats over time, one partial+final hash aggregate
    stats = grid_stats_over_time(
        fields.withColumn("time_idx", F.col("time")), time_col="time_idx"
    )

    # stats land in a grid Zarr store: one group per derived variable
    long_stats = stats.select(
        F.concat(F.col("variable"), F.lit("_mean")).alias("variable"),
        F.lit(0).alias("time_idx"),
        "lat",
        "lon",
        F.col("mean").alias("value"),
    ).unionByName(
        stats.select(
            F.concat(F.col("variable"), F.lit("_var")).alias("variable"),
            F.lit(0).alias("time_idx"),
            "lat",
            "lon",
            F.col("var_pop_v").alias("value"),
        )
    )
    store = os.path.join(out_dir, "stats.zarr")
    shapes = write_grid_zarr(long_stats, store)
    n_arrays = sum(1 for k in shapes if not k.startswith("__"))

    # read-back verification through the store scan
    back = read_grid_zarr(spark, store)
    n_back = back.count()
    mean_of_means = (
        back.filter(F.col("variable").endswith("_mean"))
        .agg(F.avg("value"))
        .first()[0]
    )

    print(
        f"GFS ETL: {len(times)} analyses x {len(variables)} variables -> "
        f"{n_cells} grid cells scanned -> {n_arrays} stat arrays "
        f"({NJ}x{NI}) in {store} -> {n_back} cells re-read "
        f"(mean of means {mean_of_means:.3f})"
    )


if __name__ == "__main__":
    main()
