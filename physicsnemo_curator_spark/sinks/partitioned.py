"""Partition-layout writers.

The reference's sinks are mostly *naming/layout* machinery — one output
unit per pipeline index with templated paths (``MeshSink`` naming,
reference ``domains/mesh/sinks/mesh_writer.py:71-361``; ``NetCDF4Sink``
year splitting, ``netcdf_writer.py:54-71``; ``ZarrSink`` chunk-aligned
index partitioning, ``zarr_writer.py:471-511``).  In Spark all of that
is ``partitionBy`` + a repartition that aligns tasks with output units;
the task-isolated commit protocol replaces the reference's
pre-allocated region writes (its #1 concurrency hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> list[str]:
    """Hive-style partitioned write: one directory per partition value
    (≙ the reference's one-output-unit-per-index naming templates)."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    getattr(w, fmt)(path)
    return [path]


def write_chunk_aligned(
    df: DataFrame,
    path: str,
    range_col: str,
    num_chunks: int,
    *,
    mode: str = "overwrite",
) -> list[str]:
    """Chunk-aligned write: range-repartition on the chunk key so each
    task owns a contiguous key range and writes exactly its own files
    (reference ``zarr_writer.py:471-511`` hand-partitions indices to
    align with Zarr chunks; ``repartitionByRange`` is the declarative
    form and sorts within partitions for run-length locality)."""
    out = df.repartitionByRange(num_chunks, F.col(range_col)).sortWithinPartitions(
        range_col
    )
    out.write.mode(mode).parquet(path)
    return [path]


def split_key_year(df: DataFrame, time_col: str, out_col: str = "year") -> DataFrame:
    """NetCDF4Sink's year split key (reference ``netcdf_writer.py:54-71``)
    as a partition column."""
    return df.withColumn(out_col, F.year(time_col).cast("int"))


def write_sized(
    df: DataFrame,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression_ratio: float = 0.35,
    bytes_hint: int | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> int:
    """Compaction-aware write: pick the output file count so files land
    near ``target_file_bytes`` — the small-files guard every 100 TB
    pipeline needs (a 1000-task stage naively writes 1000 files per
    partition dir; object stores and downstream scans both want
    ~128 MB+ objects).

    Sizing uses Catalyst's optimized-plan ``sizeInBytes`` statistic
    (free — no extra scan; parquet sources report file bytes, synthetic
    sources report row-width × rows) scaled by ``compression_ratio``
    (in-memory/raw → encoded parquet; 0.35 is a conservative default
    for mixed columns).  Pass ``bytes_hint`` when the caller knows the
    real output volume (e.g. from a previous run's manifest) — it
    overrides the estimate.  Returns the file count used.

    With ``partition_cols`` the repartition hashes on those columns so
    each output dir is written by as few tasks as possible while
    keeping ``n_files`` tasks total.

    ``format='json'`` writes gzip JSONL shards instead of parquet —
    the training-loader handoff format (one JSON object per line; most
    loaders stream it directly).  JSONL compresses less than parquet,
    so pass a higher ``compression_ratio`` (~0.6) or a ``bytes_hint``
    when shard sizing matters.
    """
    import math

    if bytes_hint is not None:
        est_out = bytes_hint
    else:
        raw = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        est_out = int(raw * compression_ratio)
    n_files = max(1, math.ceil(est_out / max(1, target_file_bytes)))
    if partition_cols:
        out = df.repartition(n_files, *[F.col(c) for c in partition_cols])
        w = out.write.mode(mode).partitionBy(*partition_cols)
    else:
        out = df.repartition(n_files)
        w = out.write.mode(mode)
    if format == "json":
        w.option("compression", "gzip").json(path)
    elif format == "parquet":
        w.parquet(path)
    else:
        raise ValueError(f"unknown format {format!r}")
    return n_files
