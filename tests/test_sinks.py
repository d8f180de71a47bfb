"""Sink plumbing: partitioned layouts, chunk alignment, per-group files."""

from __future__ import annotations

import os

from physicsnemo_curator_spark.sinks.partitioned import (
    split_key_year,
    write_chunk_aligned,
    write_partitioned,
)
from physicsnemo_curator_spark.sinks.scientific import (
    write_netcdf_per_variable_year,
    write_per_group_files,
)
from physicsnemo_curator_spark.sources.synthetic import random_grid
from physicsnemo_curator_spark.sources.tables import load_table


def test_write_partitioned_layout(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_year")
    write_partitioned(split_key_year(orders, "o_orderdate"), out, ["year"])
    years = sorted(d for d in os.listdir(out) if d.startswith("year="))
    assert len(years) >= 2
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_chunk_aligned_write(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "chunked")
    write_chunk_aligned(li, out, "l_orderkey", num_chunks=4)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 5  # ranges may merge when key space is small
    assert spark.read.parquet(out).count() == li.count()


def test_per_group_files(spark, tmp_path):
    grid = random_grid(spark, n_times=2, n_lat=4, n_lon=4)
    out = str(tmp_path / "groups")
    n = write_per_group_files(grid, out, ["variable", "time_idx"])
    files = sorted(os.listdir(out))
    assert n == 4 and len(files) == 4
    assert any(f.startswith("t2m_") for f in files)
    # every row landed in exactly one file
    total = sum(
        sum(1 for _ in open(os.path.join(out, f))) for f in files
    )
    assert total == grid.count()


def test_netcdf_routing_without_codec(spark, tmp_path):
    grid = random_grid(spark, n_times=3, n_lat=2, n_lon=2).withColumnRenamed(
        "time_idx", "tidx"
    )
    from pyspark.sql import functions as F

    grid = grid.withColumn(
        "time", F.expr("timestamp'2023-01-01 00:00:00' + make_interval(0, 0, 0, 0, tidx, 0, 0)")
    )
    out = str(tmp_path / "nc")
    n = write_netcdf_per_variable_year(grid, out)
    assert n == 2  # 2 variables × 1 year
    assert len(os.listdir(out)) == 2


def test_grid_sidecar_roundtrip_and_layout(spark, tmp_path):
    """GridSidecar parity (reference grid_sidecar.py:50-208): one
    <stem>.grid dir per grid mirroring the source relpath, per-field
    memmap .npy files + meta.json, and the inverse scan reproduces the
    long-table encoding exactly."""
    import json
    import os

    from physicsnemo_curator_spark.sinks.grid_sidecar import (
        read_grid_sidecar,
        write_grid_sidecar,
    )

    cells = [
        (g, iz, iy, ix, f, float(hash((g, iz, iy, ix, f)) % 1000) / 10)
        for g in ("run_a", "run_b")
        for iz in range(2)
        for iy in range(3)
        for ix in range(4)
        for f in ("temp", "press")
    ]
    grid = spark.createDataFrame(
        cells, ["grid_id", "iz", "iy", "ix", "field", "value"]
    )
    meta = spark.createDataFrame(
        [
            ("run_a", 4, 3, 2, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, "case1/vti"),
            ("run_b", 4, 3, 2, 1.0, 2.0, 3.0, 0.5, 0.5, 0.5, None),
        ],
        ["grid_id", "nx", "ny", "nz", "ox", "oy", "oz", "sx", "sy", "sz", "relpath"],
    )

    out = str(tmp_path / "sidecars")
    written = {r["grid_id"]: r["path"] for r in write_grid_sidecar(grid, meta, out).collect()}

    # layout: relpath mirrored, suffix enforced, per-field npy + meta
    assert written["run_a"] == os.path.join(out, "case1/vti", "run_a.grid")
    assert written["run_b"] == os.path.join(out, "run_b.grid")
    assert sorted(os.listdir(written["run_a"])) == ["meta.json", "press.npy", "temp.npy"]
    with open(os.path.join(written["run_b"], "meta.json")) as f:
        m = json.load(f)
    assert m["dimensions"] == [4, 3, 2] and m["origin"] == [1.0, 2.0, 3.0]

    back = read_grid_sidecar(spark, out)
    key = lambda df: sorted(
        (r["grid_id"], r["iz"], r["iy"], r["ix"], r["field"], round(r["value"], 9))
        for r in df.collect()
    )
    assert key(back["grid"]) == key(grid)
    got_meta = {
        r["grid_id"]: (r["nx"], r["ny"], r["nz"], r["sx"])
        for r in back["meta"].collect()
    }
    assert got_meta == {"run_a": (4, 3, 2, 1.0), "run_b": (4, 3, 2, 0.5)}


def test_write_sized_targets_file_count(spark, tmp_path):
    from physicsnemo_curator_spark.sinks.partitioned import write_sized

    df = spark.range(200_000).selectExpr(
        "id", "repeat(uuid(), 4) AS payload"
    )
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    n_small = write_sized(df, small, target_file_bytes=512 * 1024)
    n_big = write_sized(df, big, target_file_bytes=64 * 1024 * 1024)

    def parts(d):
        return [
            f for f in os.listdir(d) if f.startswith("part-") and f.endswith(".parquet")
        ]

    # smaller target -> more, smaller files; file count matches the plan
    assert n_small > n_big
    assert len(parts(small)) == n_small
    assert len(parts(big)) == n_big
    # same data either way
    assert (
        spark.read.parquet(small).count()
        == spark.read.parquet(big).count()
        == 200_000
    )


def test_write_sized_bytes_hint_and_partitions(spark, tmp_path):
    from physicsnemo_curator_spark.sinks.partitioned import write_sized

    df = spark.range(1000).selectExpr("id", "id % 3 AS k")
    out = str(tmp_path / "byk")
    n = write_sized(
        df,
        out,
        bytes_hint=10 * 1024 * 1024,
        target_file_bytes=1024 * 1024,
        partition_cols=["k"],
    )
    assert n == 10
    dirs = sorted(d for d in os.listdir(out) if d.startswith("k="))
    assert dirs == ["k=0", "k=1", "k=2"]
    assert spark.read.parquet(out).count() == 1000


def test_write_sized_jsonl_shards(spark, tmp_path):
    """format='json' writes gzip JSONL readable back row-for-row."""
    import gzip
    import json as _json
    import os

    from physicsnemo_curator_spark.sinks.partitioned import write_sized

    df = spark.range(500).selectExpr(
        "id AS doc_id", "repeat('t', 50) AS text"
    )
    out = str(tmp_path / "jsonl")
    n = write_sized(
        df, out, target_file_bytes=8 * 1024, bytes_hint=500 * 60,
        format="json",
    )
    assert n >= 2
    rows = []
    for f in os.listdir(out):
        if f.endswith(".json.gz"):
            with gzip.open(os.path.join(out, f), "rt") as fh:
                rows += [_json.loads(line) for line in fh]
    assert len(rows) == 500
    assert {r["doc_id"] for r in rows} == set(range(500))
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown format"):
        write_sized(df, out, format="orc2")
