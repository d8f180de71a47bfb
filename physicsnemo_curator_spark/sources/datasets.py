"""Local-layout readers for the reference's hub datasets: DrivAerML,
AhmedML, NavierStokes-cylinder.

The reference streams these from the HuggingFace hub with fsspec
caching (``domains/mesh/sources/drivaerml.py:79-1366``, ``ahmedml.py:
81-936``, ``ns_cylinder.py:70-297``).  Network fetch stays out of this
environment; everything *after* the byte transfer — run discovery,
boundary/volume/slices layout, split-part volume reassembly, CSV
global-data attachment, shared-geometry snapshot join — is implemented
here over a local (or mounted/synced) copy of the same directory
layout, using the repo's own XML/STL mesh parsers.

Layouts reproduced (verbatim from the reference templates):

- DrivAerML / AhmedML: ``run_<i>/boundary_<i>.vtp``,
  ``run_<i>/volume_<i>.vtu`` (DrivAerML volumes may be split as
  ``volume_<i>.vtu.<NN>.part``, reassembled by byte concat,
  ``drivaerml.py:715``), ``run_<i>/slices/*.vtp``; AhmedML adds
  ``ahmed_<i>.stl`` and per-run CSVs ``force_mom_<i>.csv`` /
  ``force_mom_varref_<i>.csv`` / ``geo_parameters_<i>.csv``
  (``ahmedml.py:56-68``).
- NS-cylinder: ``{geometry,parameters,snapshots}/default-00000-of-
  00001.parquet`` — shared 1-row geometry, per-simulation viscosity,
  per-snapshot node fields (``ns_cylinder.py:67,236-299``).

Scale notes: runs are the unit of parallelism (one task per run file —
a DrivAerML volume is ~50 GB, exactly one task's worth of parse); the
CSV metadata and the shared geometry are broadcast, never shuffled.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from physicsnemo_curator_spark.sources.vtk import (
    parse_mesh_bytes,
    read_vtk,
)

_RUN_RE = re.compile(r"^run_(\d+)$")

MESH_TEMPLATES = {"boundary": "boundary_{i}.vtp", "volume": "volume_{i}.vtu"}
STL_TEMPLATE = "ahmed_{i}.stl"
CSV_TEMPLATES = {
    "force_mom": "force_mom_{i}.csv",
    "force_mom_varref": "force_mom_varref_{i}.csv",
    "geo_parameters": "geo_parameters_{i}.csv",
}
PARQUET_FILENAME = "default-00000-of-00001.parquet"


def discover_runs(base_dir: str) -> list[int]:
    """``run_<i>/`` directory discovery (reference ``drivaerml.py:
    275-295``); driver-side — the listing is metadata-scale."""
    runs = []
    for name in os.listdir(base_dir):
        m = _RUN_RE.match(name)
        if m and os.path.isdir(os.path.join(base_dir, name)):
            runs.append(int(m.group(1)))
    if not runs:
        raise FileNotFoundError(f"no run_<i>/ directories under {base_dir}")
    return sorted(runs)


def _run_paths(
    base_dir: str, runs: list[int], template: str
) -> list[str]:
    paths = []
    for i in runs:
        p = os.path.join(base_dir, f"run_{i}", template.format(i=i))
        if os.path.exists(p):
            paths.append(p)
    return paths


def _volume_parts(base_dir: str, run_id: int) -> list[str]:
    """Whole ``volume_<i>.vtu`` or its sorted ``.NN.part`` split
    (reference reassembly at ``drivaerml.py:715``)."""
    rdir = os.path.join(base_dir, f"run_{run_id}")
    whole = os.path.join(rdir, f"volume_{run_id}.vtu")
    if os.path.exists(whole):
        return [whole]
    # numeric sort: lexical ordering reassembles '.10.part' before
    # '.2.part' (garbage bytes) for unpadded or >=100-part splits
    parts = sorted(
        (
            f
            for f in os.listdir(rdir)
            if re.fullmatch(rf"volume_{run_id}\.vtu\.\d+\.part", f)
        ),
        key=lambda f: int(f.rsplit(".", 2)[-2]),
    )
    return [os.path.join(rdir, f) for f in parts]


def read_volume_meshes(
    spark: SparkSession,
    base_dir: str,
    runs: list[int] | None = None,
    *,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Split-part volume scan: one task per run opens its part files,
    concatenates bytes, and parses one ``.vtu``.  Paths must be
    visible to executors (local FS here; shared storage on a cluster —
    the same contract as the reference's fsspec cache dir)."""
    runs = runs if runs is not None else discover_runs(base_dir)
    rows = [
        (i, parts)
        for i in runs
        if (parts := _volume_parts(base_dir, i))
    ]
    if not rows:
        raise FileNotFoundError(f"no volume files under {base_dir}")
    # range partitioning guarantees ~one run per task — hash
    # repartition can collide two ~50 GB volumes into one task while
    # other executors idle
    fdf = spark.createDataFrame(
        rows, "run_id int, parts array<string>"
    ).repartitionByRange(len(rows), "run_id")

    def _load(run_id: int, parts: list[str]):
        blob = b"".join(open(p, "rb").read() for p in parts)
        # cut any ".NN.part" suffix so extension sniffing sees ".vtu"
        name = parts[0][: parts[0].index(".vtu") + 4]
        return f"volume_{run_id}", parse_mesh_bytes(name, blob)

    def points(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for run_id, parts in zip(pdf["run_id"], pdf["parts"]):
                mesh_id, mf = _load(int(run_id), list(parts))
                out += [
                    (mesh_id, pid, x, y, z)
                    for pid, (x, y, z) in enumerate(mf.points)
                ]
            yield pd.DataFrame(
                out, columns=["mesh_id", "point_id", "x", "y", "z"]
            )

    def cells(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for run_id, parts in zip(pdf["run_id"], pdf["parts"]):
                mesh_id, mf = _load(int(run_id), list(parts))
                out += [
                    (mesh_id, cid, vs, ct)
                    for cid, (vs, ct) in enumerate(
                        zip(mf.cells, mf.cell_types)
                    )
                ]
            yield pd.DataFrame(
                out, columns=["mesh_id", "cell_id", "vs", "ctype"]
            )

    def _data(attr: str, id_name: str):
        def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                out = []
                for run_id, parts in zip(pdf["run_id"], pdf["parts"]):
                    mesh_id, mf = _load(int(run_id), list(parts))
                    for name, values in getattr(mf, attr).items():
                        out += [
                            (mesh_id, rid, name, v)
                            for rid, v in enumerate(values)
                        ]
                yield pd.DataFrame(
                    out, columns=["mesh_id", id_name, "field", "value"]
                )

        return gen

    tables = {
        "points": fdf.mapInPandas(
            points, "mesh_id string, point_id long, x double, y double, z double"
        ),
        "cells": fdf.mapInPandas(
            cells,
            "mesh_id string, cell_id long, vs array<long>, ctype int",
        ),
        "point_data": fdf.mapInPandas(
            _data("point_data", "point_id"),
            "mesh_id string, point_id long, field string, value double",
        ),
        "cell_data": fdf.mapInPandas(
            _data("cell_data", "cell_id"),
            "mesh_id string, cell_id long, field string, value double",
        ),
    }
    # field filtering post-parse (the part-reassembly parse can't push
    # it into the decoder the way read_vtk does, but silently IGNORING
    # the caller's filter would defeat the whole point of it)
    if include_fields and exclude_fields:
        raise ValueError(
            "include_fields and exclude_fields are mutually exclusive"
        )
    if include_fields or exclude_fields:
        cond = (
            F.col("field").isin(include_fields)
            if include_fields
            else ~F.col("field").isin(exclude_fields)
        )
        tables["point_data"] = tables["point_data"].filter(cond)
        tables["cell_data"] = tables["cell_data"].filter(cond)
    return tables


def read_drivaerml(
    spark: SparkSession,
    base_dir: str,
    *,
    mesh_type: str = "boundary",
    runs: list[int] | None = None,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
) -> dict[str, DataFrame]:
    """DrivAerML local scan: boundary VTPs, reassembled volume VTUs, or
    slice planes — mesh tables keyed by ``boundary_<i>`` /
    ``volume_<i>`` / slice-file stems."""
    runs = runs if runs is not None else discover_runs(base_dir)
    if mesh_type == "volume":
        return read_volume_meshes(
            spark,
            base_dir,
            runs,
            include_fields=include_fields,
            exclude_fields=exclude_fields,
        )
    if mesh_type == "slices":
        paths = []
        for i in runs:
            sdir = os.path.join(base_dir, f"run_{i}", "slices")
            if os.path.isdir(sdir):
                paths += sorted(
                    os.path.join(sdir, f)
                    for f in os.listdir(sdir)
                    if f.endswith(".vtp")
                )
        if not paths:
            raise FileNotFoundError(f"no slices under {base_dir}")
    elif mesh_type == "boundary":
        paths = _run_paths(base_dir, runs, MESH_TEMPLATES["boundary"])
    else:
        raise ValueError(f"unknown mesh_type {mesh_type!r}")
    # slices: every run names its planes identically (slice_x.vtp per
    # run dir) — stem-keyed mesh ids would merge all runs into one mesh
    return read_vtk(
        spark,
        paths,
        include_fields=include_fields,
        exclude_fields=exclude_fields,
        mesh_id_from="path" if mesh_type == "slices" else "stem",
    )


def read_ahmedml(
    spark: SparkSession,
    base_dir: str,
    *,
    mesh_type: str = "boundary",
    runs: list[int] | None = None,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
) -> dict[str, DataFrame]:
    """AhmedML local scan: boundary/volume like DrivAerML plus the STL
    geometry variant."""
    runs = runs if runs is not None else discover_runs(base_dir)
    if mesh_type == "stl":
        paths = _run_paths(base_dir, runs, STL_TEMPLATE)
    elif mesh_type in MESH_TEMPLATES:
        paths = _run_paths(base_dir, runs, MESH_TEMPLATES[mesh_type])
    else:
        raise ValueError(f"unknown mesh_type {mesh_type!r}")
    if not paths:
        raise FileNotFoundError(f"no {mesh_type} files under {base_dir}")
    return read_vtk(
        spark,
        paths,
        include_fields=include_fields,
        exclude_fields=exclude_fields,
    )


def read_run_metadata(
    spark: SparkSession,
    base_dir: str,
    *,
    kind: str = "force_mom",
    runs: list[int] | None = None,
) -> DataFrame:
    """Per-run CSV global data (AhmedML force/moment coefficients and
    geometry parameters, reference ``ahmedml.py:65-70``) → one row per
    run_id, ready for broadcast."""
    if kind not in CSV_TEMPLATES:
        raise ValueError(f"unknown csv kind {kind!r}")
    runs = runs if runs is not None else discover_runs(base_dir)
    paths = _run_paths(base_dir, runs, CSV_TEMPLATES[kind])
    if not paths:
        raise FileNotFoundError(f"no {kind} CSVs under {base_dir}")
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(paths)
        .withColumn(
            "run_id",
            F.regexp_extract(
                F.input_file_name(), r"_(\d+)\.csv$", 1
            ).cast("int"),
        )
    )
    return df


def attach_global_data(
    mesh_df: DataFrame,
    meta: DataFrame,
    *,
    mesh_id_col: str = "mesh_id",
) -> DataFrame:
    """Broadcast-join per-run scalars onto mesh rows — the reference
    attaches CSV rows as ``global_data`` on every mesh
    (``ahmedml.py:65-70`` + usage); here it is the Q-J1 pattern:
    the metadata side is rows-per-run tiny, so it broadcasts."""
    keyed = mesh_df.withColumn(
        "run_id",
        F.regexp_extract(F.col(mesh_id_col), r"_(\d+)$", 1).cast("int"),
    )
    return keyed.join(F.broadcast(meta), "run_id", "left")


def read_ns_cylinder(
    spark: SparkSession, base_dir: str
) -> dict[str, DataFrame]:
    """NS-cylinder: shared geometry (1 row) × per-snapshot fields.

    Returns ``points`` / ``cells`` (shared geometry, long form) and
    ``fields`` — one row per (snapshot_id, point_id) with velocity_x/
    velocity_y/pressure plus the snapshot's viscosity; the geometry is
    joined in by broadcast (the reference reuses the loaded geometry
    for every item, ``ns_cylinder.py:175-177``)."""
    geom = spark.read.parquet(
        os.path.join(base_dir, "geometry", PARQUET_FILENAME)
    )
    params = spark.read.parquet(
        os.path.join(base_dir, "parameters", PARQUET_FILENAME)
    )
    snaps = spark.read.parquet(
        os.path.join(base_dir, "snapshots", PARQUET_FILENAME)
    )

    points = geom.select(
        F.posexplode(
            F.arrays_zip("node_coordinates_x", "node_coordinates_y")
        ).alias("point_id", "c")
    ).select(
        "point_id",
        F.col("c.node_coordinates_x").alias("x"),
        F.col("c.node_coordinates_y").alias("y"),
        F.lit(0.0).alias("z"),
    )
    cells = geom.select(
        F.posexplode("connectivity").alias("cell_id", "vs")
    ).select("cell_id", "vs")

    def _with_row_index(df: DataFrame) -> DataFrame:
        # parameters/snapshots align by row position (the reference
        # indexes both tables by snapshot index).  Both are per-run
        # metadata-small (500 rows for the published dataset), so a
        # single-task row_number over file order is fine here.
        from pyspark.sql import Window

        return df.withColumn(
            "snapshot_id",
            F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id())
            )
            - 1,
        )

    snaps_k = _with_row_index(snaps)
    params_k = _with_row_index(params).select("snapshot_id", "viscosity")
    fields = (
        snaps_k.select(
            "snapshot_id",
            F.posexplode(
                F.arrays_zip("velocity_x", "velocity_y", "pressure")
            ).alias("point_id", "f"),
        )
        .select(
            "snapshot_id",
            "point_id",
            F.col("f.velocity_x").alias("velocity_x"),
            F.col("f.velocity_y").alias("velocity_y"),
            F.col("f.pressure").alias("pressure"),
        )
        .join(F.broadcast(params_k), "snapshot_id")
        .join(F.broadcast(points), "point_id")
    )
    return {"points": points, "cells": cells, "fields": fields}
