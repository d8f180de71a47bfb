"""Writers: partitioned parquet layouts plus scientific-format adapters
(NetCDF / Zarr / VTU) behind import-try gates."""

from physicsnemo_curator_spark.sinks.partitioned import (
    write_chunk_aligned,
    write_partitioned,
)

__all__ = ["write_partitioned", "write_chunk_aligned"]
