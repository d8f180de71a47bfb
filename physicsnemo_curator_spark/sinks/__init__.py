"""Writers: partitioned parquet layouts plus scientific-format sinks
(Zarr v2, NetCDF-3 classic, per-group routing) with pure-Python
encoders — no external format libraries required."""

from physicsnemo_curator_spark.sinks.grid_sidecar import (
    read_grid_sidecar,
    write_grid_sidecar,
)
from physicsnemo_curator_spark.sinks.partitioned import (
    write_chunk_aligned,
    write_partitioned,
)
from physicsnemo_curator_spark.sinks.scientific import (
    write_netcdf_per_variable_year,
    write_per_group_files,
)
from physicsnemo_curator_spark.sinks.zarr_store import (
    read_array,
    write_flat_zarr,
    write_grid_zarr,
    write_mesh_zarr,
)

__all__ = [
    "write_partitioned",
    "write_chunk_aligned",
    "write_per_group_files",
    "write_netcdf_per_variable_year",
    "write_grid_zarr",
    "write_flat_zarr",
    "write_mesh_zarr",
    "read_array",
    "write_grid_sidecar",
    "read_grid_sidecar",
]
