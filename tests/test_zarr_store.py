"""Zarr v2 store: metadata/codec round-trip + distributed chunk writers.

The store format is the public Zarr v2 spec (directory store, C-order
zlib chunks, numcodecs-style compressor metadata) implemented with
stdlib json/zlib + numpy — no zarr library needed on either side.
"""

from __future__ import annotations

import json
import math
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators.atomic import pack_offsets
from physicsnemo_curator_spark.sinks import zarr_store as zs
from physicsnemo_curator_spark.sources.synthetic import (
    random_atomic,
    random_grid,
    random_mesh,
)


def test_chunk_roundtrip_exact(tmp_path):
    store = str(tmp_path / "store")
    arr = np.arange(24, dtype="<f8").reshape(4, 6)
    adir = zs.init_array(
        store, "a", shape=(4, 6), chunks=(2, 3), dtype="<f8",
        compressor=zs.DEFAULT_COMPRESSOR,
    )
    for i in range(2):
        for j in range(2):
            zs.write_chunk(
                adir, (i, j), arr[2 * i : 2 * i + 2, 3 * j : 3 * j + 3],
                zs.DEFAULT_COMPRESSOR,
            )
    np.testing.assert_array_equal(zs.read_array(adir), arr)


def test_edge_chunk_padding_and_fill(tmp_path):
    """Edge chunks are stored full-size (v2 spec); missing chunks read
    back as fill_value."""
    store = str(tmp_path / "store")
    adir = zs.init_array(
        store, "a", shape=(5,), chunks=(3,), dtype="<f8",
        compressor=None, fill_value=math.nan,
    )
    zs.write_chunk(adir, (0,), np.array([1.0, 2.0, 3.0]), None)
    # chunk 1 (rows 3..4, padded to 3) deliberately missing
    out = zs.read_array(adir)
    np.testing.assert_array_equal(out[:3], [1.0, 2.0, 3.0])
    assert np.isnan(out[3:]).all()


def test_zarray_metadata_is_spec_shaped(tmp_path):
    store = str(tmp_path / "store")
    zs.init_group(store)
    adir = zs.init_array(
        store, "a", shape=(2, 2), chunks=(1, 2), dtype="<f4",
        compressor={"id": "zlib", "level": 5}, fill_value=0,
    )
    meta = json.load(open(os.path.join(adir, ".zarray")))
    assert meta == {
        "zarr_format": 2,
        "shape": [2, 2],
        "chunks": [1, 2],
        "dtype": "<f4",
        "compressor": {"id": "zlib", "level": 5},
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    assert json.load(open(os.path.join(store, ".zgroup"))) == {
        "zarr_format": 2
    }
    # chunk payload is plain zlib of C-order bytes — verifiable with
    # stdlib alone (what the real zarr library would produce)
    block = np.array([[1.5, -2.0]], dtype="<f4")
    zs.write_chunk(adir, (0, 0), block, {"id": "zlib", "level": 5})
    raw = zlib.decompress(open(os.path.join(adir, "0.0"), "rb").read())
    assert raw == block.tobytes()


def test_write_grid_zarr_distributed(spark, tmp_path):
    """Distributed (variable, time)-chunk write reproduces the dense
    (T, lat, lon) stack exactly."""
    store = str(tmp_path / "grid.zarr")
    grid = random_grid(spark, n_times=3, n_lat=4, n_lon=5)
    zs.write_grid_zarr(grid, store)

    pdf = grid.toPandas()
    for v in ("t2m", "u10"):
        arr = zs.read_array(os.path.join(store, v, "data"))
        assert arr.shape == (3, 4, 5)
        sub = pdf[pdf.variable == v]
        dense = np.full((3, 4, 5), math.nan)
        dense[sub.time_idx, sub.lat, sub.lon] = sub.value
        np.testing.assert_allclose(arr, dense)
        attrs = json.load(
            open(os.path.join(store, v, "data", ".zattrs"))
        )
        assert attrs["_ARRAY_DIMENSIONS"] == ["time", "lat", "lon"]
        # reference chunking {time:1, lat:*, lon:*} (zarr_writer.py:215)
        meta = zs.read_array_meta(os.path.join(store, v, "data"))
        assert meta["chunks"] == [1, 4, 5]


def test_write_flat_zarr_ragged_atoms(spark, tmp_path):
    """AtomicDataZarrSink pattern: ragged atoms → flat (N,3) positions
    + offsets, chunk ownership by global row index — systems straddling
    a chunk boundary land in both chunks correctly."""
    store = str(tmp_path / "atoms.zarr")
    zs.init_group(store)
    systems, atoms = random_atomic(spark, n_systems=6, max_atoms=9)
    offsets = pack_offsets(systems)
    flat = (
        atoms.join(offsets, "system_id")
        .select(
            (F.col("offset") + F.col("atom_id")).alias("idx"),
            F.col("pos")[0].alias("px"),
            F.col("pos")[1].alias("py"),
            F.col("pos")[2].alias("pz"),
            F.col("z").cast("double").alias("zn"),
        )
    )
    total = systems.agg(F.sum("natoms")).first()[0]
    zs.write_flat_zarr(
        flat, store, "positions",
        index_col="idx", value_cols=["px", "py", "pz"],
        chunk_rows=7, n_rows=total,
    )
    zs.write_flat_zarr(
        flat, store, "atomic_numbers",
        index_col="idx", value_cols=["zn"], chunk_rows=7, n_rows=total,
    )

    pos = zs.read_array(os.path.join(store, "positions"))
    zarr_z = zs.read_array(os.path.join(store, "atomic_numbers"))
    assert pos.shape == (total, 3)
    assert zarr_z.shape == (total,)

    expect = flat.orderBy("idx").toPandas()
    np.testing.assert_allclose(pos, expect[["px", "py", "pz"]].to_numpy())
    np.testing.assert_allclose(zarr_z, expect["zn"].to_numpy())


def test_write_mesh_zarr_positions(spark, tmp_path):
    """mesh_pos (T,N,3) = reference points + per-timestep displacement
    (MeshZarrSink reconstruction)."""
    store = str(tmp_path / "mesh.zarr")
    points, cells, disp = random_mesh(
        spark, n_meshes=2, n_points=15, n_cells=10, n_timesteps=3
    )
    shapes = zs.write_mesh_zarr(points, disp, store)
    assert shapes["0"] == (3, 15, 3)

    arr = zs.read_array(os.path.join(store, "mesh_0", "mesh_pos"))
    joined = (
        disp.filter(F.col("mesh_id") == 0)
        .join(points.filter(F.col("mesh_id") == 0), ["mesh_id", "point_id"])
        .select(
            "t", "point_id",
            (F.col("x") + F.col("dx")).alias("px"),
            (F.col("y") + F.col("dy")).alias("py"),
            (F.col("z") + F.col("dz")).alias("pz"),
        )
        .toPandas()
    )
    dense = np.zeros((3, 15, 3))
    dense[joined.t, joined.point_id, 0] = joined.px
    dense[joined.t, joined.point_id, 1] = joined.py
    dense[joined.t, joined.point_id, 2] = joined.pz
    np.testing.assert_allclose(arr, dense)


@pytest.mark.soak
def test_write_mesh_zarr_task_side_init_10k_meshes(spark, tmp_path):
    """Metadata creation is task-side first-writer-wins: 10⁴ mesh
    groups materialize without any per-mesh driver loop, and a sampled
    mesh round-trips exactly."""
    N_MESH, NPTS, NT = 10_000, 4, 2
    ids = spark.range(N_MESH).withColumnRenamed("id", "mesh_id")
    pts = ids.crossJoin(spark.range(NPTS).withColumnRenamed("id", "point_id")).select(
        "mesh_id", "point_id",
        (F.col("mesh_id") * 0.1).alias("x"),
        (F.col("point_id") * 1.0).alias("y"),
        F.lit(0.0).alias("z"),
    )
    disp = pts.crossJoin(spark.range(NT).withColumnRenamed("id", "t")).select(
        "mesh_id", "point_id", "t",
        (F.col("t") * 0.5).alias("dx"), F.lit(0.0).alias("dy"), F.lit(0.0).alias("dz"),
    )
    store = str(tmp_path / "mesh10k.zarr")
    out = zs.write_mesh_zarr(pts, disp, store, return_shapes=False)
    assert out == {}
    assert sum(1 for d in os.listdir(store) if d.startswith("mesh_")) == N_MESH
    arr = zs.read_array(os.path.join(store, "mesh_1234", "mesh_pos"))
    assert arr.shape == (NT, NPTS, 3)
    assert abs(arr[1, 3, 0] - (1234 * 0.1 + 0.5)) < 1e-12
    assert abs(arr[1, 3, 1] - 3.0) < 1e-12


def test_write_grid_zarr_v3_empty_input(spark, tmp_path):
    """Empty grid -> empty group, no crash (parity with the v2 twin)."""
    from physicsnemo_curator_spark.sinks.zarr_store import write_grid_zarr_v3

    empty = spark.createDataFrame(
        [],
        "variable string, time_idx long, lat double, lon double, value double",
    )
    store = str(tmp_path / "v3_empty")
    out = write_grid_zarr_v3(empty, store, time_col="time_idx")
    assert out == {}
    import os

    assert os.path.exists(os.path.join(store, "zarr.json"))
