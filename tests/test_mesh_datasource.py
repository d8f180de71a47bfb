"""Python DataSource (format 'vtk_mesh'): partition-per-file scan,
filter pushdown into the parser, parity with sources.vtk.read_vtk."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNotNull

from physicsnemo_curator_spark.sources import mesh_datasource, vtk


@pytest.fixture()
def vtk_dir(tmp_path):
    for m in range(3):
        pts = [(0.0, 0.0, 0.0), (1.0 + m, 0.0, 0.0), (0.5, math.sqrt(3) / 2, 0.0)]
        cells = [[0, 1, 2]]
        pdata = {"temp": [1.0, 2.0, 3.0 + m], "junk": [9.0, 9.0, 9.0]}
        vtk.write_vtk(pts, cells, pdata, str(tmp_path / f"mesh{m}.vtk"))
    return str(tmp_path)


@pytest.fixture()
def registered(spark):
    mesh_datasource.register(spark)
    return spark


def test_tables_match_mapinpandas_reader(registered, vtk_dir):
    spark = registered
    base = vtk.read_vtk(spark, vtk_dir)
    for table in ("points", "cells", "point_data"):
        via_ds = (
            spark.read.format("vtk_mesh").option("table", table).load(vtk_dir)
        )
        expected = sorted(map(tuple, base[table].collect()))
        got = sorted(map(tuple, via_ds.collect()))
        assert got == expected, table


def test_one_partition_per_file(registered, vtk_dir):
    df = registered.read.format("vtk_mesh").option("table", "points").load(vtk_dir)
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_consumes_field_equality(registered, vtk_dir):
    df = (
        registered.read.format("vtk_mesh")
        .option("table", "point_data")
        .load(vtk_dir)
        .filter(F.col("field") == "temp")
    )
    rows = df.collect()
    assert len(rows) == 9
    assert {r["field"] for r in rows} == {"temp"}
    # the equality predicate is consumed by the source, not re-checked by Spark
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "junk" not in plan


def test_pushdown_unit_semantics():
    r = mesh_datasource.VTKMeshReader({"path": "/tmp", "table": "point_data"})
    remaining = list(
        r.pushFilters(
            [
                EqualTo(("field",), "temp"),
                IsNotNull(("field",)),
                GreaterThan(("value",), 1.0),
            ]
        )
    )
    # value predicate stays with Spark; field predicates are consumed
    assert [type(f) for f in remaining] == [GreaterThan]
    assert r.pushed_fields == {"temp"}
    r2 = mesh_datasource.VTKMeshReader({"path": "/tmp", "table": "point_data"})
    list(r2.pushFilters([In(("field",), ("a", "b")), EqualTo(("field",), "a")]))
    assert r2.pushed_fields == {"a"}


def test_include_exclude_options(registered, vtk_dir):
    inc = (
        registered.read.format("vtk_mesh")
        .option("table", "point_data")
        .option("include_fields", "temp")
        .load(vtk_dir)
    )
    assert {r["field"] for r in inc.select("field").distinct().collect()} == {"temp"}
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            registered.read.format("vtk_mesh")
            .option("table", "point_data")
            .option("include_fields", "a")
            .option("exclude_fields", "b")
            .load(vtk_dir)
            .collect()
        )


def test_grid_tables(registered, tmp_path):
    vtk.write_structured_points(
        (2, 2, 1),
        {"p": [1.0, 2.0, 3.0, 4.0]},
        str(tmp_path / "g0.vtk"),
        origin=(0.5, 0.0, 0.0),
        spacing=(2.0, 1.0, 1.0),
    )
    grid = (
        registered.read.format("vtk_mesh").option("table", "grid").load(str(tmp_path))
    )
    rows = {(r["ix"], r["iy"], r["iz"]): r["value"] for r in grid.collect()}
    assert rows == {(0, 0, 0): 1.0, (1, 0, 0): 2.0, (0, 1, 0): 3.0, (1, 1, 0): 4.0}
    meta = (
        registered.read.format("vtk_mesh")
        .option("table", "grid_meta")
        .load(str(tmp_path))
        .collect()[0]
    )
    assert (meta["nx"], meta["ny"], meta["nz"]) == (2, 2, 1)
    assert meta["ox"] == 0.5 and meta["sx"] == 2.0
