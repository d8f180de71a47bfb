"""Distributed global ranking / prefix sums without a single-task window.

An unpartitioned ``Window.orderBy`` funnels the entire input through ONE
task — fine for a 30-row result, fatal for a web-scale vocabulary (10^8
tokens) or a billion-system offset table.  Both helpers here produce
results identical to the global-window formulation but keep every wide
stage partition-parallel (the same two-phase trick as
``mesh.dense_renumber(strategy='distributed')``, expressed purely in
DataFrame ops):

1. ``repartitionByRange`` on the order key — globally ordered partition
   ranges, ~equal sizes (range partitioner sampling).
2. Per-partition local rank/cumsum (window partitioned by
   ``spark_partition_id`` — P parallel groups, not 1).
3. Per-partition totals (P rows) cumulated and broadcast back.

Requires a *total* order (unique key combination) so ranks are
deterministic regardless of where range boundaries land — the range
partitioner co-locates equal keys, and local windows order by the full
key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"


def _parallelism(df: DataFrame) -> int:
    """Cluster parallelism without touching sparkContext (absent under
    Spark Connect): the shuffle-partition conf is the planner's own
    fan-out knob and the right default here."""
    try:
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    except Exception:
        return 32


def _range_parted(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    par = _parallelism(df)
    return df.repartitionByRange(par, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )


def _partition_offsets(parted: DataFrame, per_partition: Column) -> DataFrame:
    """Exclusive cumulative totals per range partition.

    The cumulation window is global but runs over at most
    ``defaultParallelism`` rows (one per partition) — a driver-sized
    table, broadcast back to the data.
    """
    totals = parted.groupBy(_PID).agg(per_partition.alias("_t"))
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(
        _PID, F.coalesce(F.sum("_t").over(w), F.lit(0)).alias("_off")
    )


def distributed_rank(
    df: DataFrame, order_cols: list[Column], name: str = "rank"
) -> DataFrame:
    """0-based dense global rank by ``order_cols`` (must be a total
    order), identical to ``row_number().over(Window.orderBy(...)) - 1``
    but with no single-partition exchange."""
    parted = _range_parted(df, order_cols)
    offsets = _partition_offsets(parted, F.count(F.lit(1)))
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), _PID)
        .withColumn(name, F.row_number().over(w) - 1 + F.col("_off"))
        .drop(_PID)
    )


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[Column],
    name: str = "prefix_sum",
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_cols`` order
    (total order required), identical to
    ``sum(value).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    -1))`` but with no single-partition exchange."""
    parted = _range_parted(df, order_cols)
    offsets = _partition_offsets(parted, F.sum(value_col))
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parted.join(F.broadcast(offsets), _PID)
        .withColumn(
            name, F.coalesce(F.sum(value_col).over(w), F.lit(0)) + F.col("_off")
        )
        .drop(_PID)
    )
