"""Molecular-data operators over the vertex/edge/system tables.

AtomicData encoding (SURVEY §1.2c): ``systems(system_id, natoms,
energy, ...)``, ``atoms(system_id, atom_id, z, pos, ...)``,
``bonds(system_id, src, dst, ...)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import stats


def pack_offsets(systems: DataFrame, count_col: str = "natoms") -> DataFrame:
    """Ragged-array packing offsets: start index of each system in a
    flat atoms array (reference AtomicDataZarrSink pre-allocation,
    ``domains/atm/sinks/zarr_writer.py:209+``) — an exclusive prefix
    sum over system order.

    Uses the two-phase distributed prefix sum
    (ranking.distributed_prefix_sum): a global window would funnel
    every system through one task; range-partitioned local cumsums +
    broadcast partition offsets give the identical result with all
    wide stages partition-parallel."""
    from physicsnemo_curator_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    out = distributed_prefix_sum(
        systems.select("system_id", count_col),
        count_col,
        [F.asc("system_id")],
        name="offset",
    )
    return out.select("system_id", count_col, "offset")


def atomic_level_stats(
    atoms: DataFrame,
    systems: DataFrame,
    *,
    atom_fields: Sequence[str] = ("z",),
    system_fields: Sequence[str] = ("energy",),
) -> DataFrame:
    """Level-keyed moment stats (AtomicStatsFilter, reference
    ``domains/atm/filters/stats.py:273-777``): one row per
    (level, field) with the Welford-class stats."""
    parts = []
    for f in atom_fields:
        part = stats.moment_stats(
            atoms.select(F.col(f).cast("double").alias("value")), [], "value"
        ).select(F.lit("node").alias("level"), F.lit(f).alias("field"), "*")
        parts.append(part)
    for f in system_fields:
        part = stats.moment_stats(
            systems.select(F.col(f).cast("double").alias("value")), [], "value"
        ).select(F.lit("system").alias("level"), F.lit(f).alias("field"), "*")
        parts.append(part)
    if not parts:
        raise ValueError("atomic_level_stats needs at least one field")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def atomic_info(systems: DataFrame, atoms: DataFrame) -> DataFrame:
    """Per-system metadata record (AtomicInfoFilter, reference
    ``domains/atm/filters/atomic_info.py:139-367``): atom counts and
    composition summary."""
    comp = atoms.groupBy("system_id").agg(
        F.count(F.lit(1)).alias("n_atoms"),
        F.countDistinct("z").alias("n_elements"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
    )
    # a system with zero atoms rows must report 0 counts, not NULLs
    # (NULL n_atoms makes threshold filters three-valued and count
    # aggregates skip the row) — z_min/z_max stay NULL: there is no
    # honest number for the extrema of an empty set
    return systems.join(comp, "system_id", "left").na.fill(
        {"n_atoms": 0, "n_elements": 0}
    )
