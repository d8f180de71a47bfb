"""Local-layout dataset sources: DrivAerML/AhmedML run trees (split
volumes, slices, CSV global data) and the NS-cylinder shared-geometry
parquet triplet."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.sources.datasets import (
    attach_global_data,
    discover_runs,
    read_ahmedml,
    read_drivaerml,
    read_ns_cylinder,
    read_run_metadata,
)
from physicsnemo_curator_spark.sources.stl import write_stl_ascii
from physicsnemo_curator_spark.sources.vtk_xml import write_vtp, write_vtu

_TRI = [[0, 1, 2], [1, 2, 3]]
_PTS = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 0.0)]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("runs")
    for i in (1, 2):
        rdir = base / f"run_{i}"
        (rdir / "slices").mkdir(parents=True)
        pd_fields = {"pressure": [10.0 * i + k for k in range(4)]}
        write_vtp(_PTS, _TRI, pd_fields, str(rdir / f"boundary_{i}.vtp"))
        # volume: run_1 split into .part files, run_2 whole
        vol = str(rdir / f"volume_{i}.vtu")
        write_vtu(_PTS, _TRI, None, pd_fields, vol)
        if i == 1:
            blob = open(vol, "rb").read()
            os.remove(vol)
            half = len(blob) // 2
            open(str(rdir / "volume_1.vtu.00.part"), "wb").write(blob[:half])
            open(str(rdir / "volume_1.vtu.01.part"), "wb").write(blob[half:])
        write_vtp(
            _PTS, _TRI, pd_fields, str(rdir / "slices" / f"slice_x_{i}.vtp")
        )
        write_stl_ascii(
            [[_PTS[a], _PTS[b], _PTS[c]] for a, b, c in _TRI],
            str(rdir / f"ahmed_{i}.stl"),
        )
        (rdir / f"force_mom_{i}.csv").write_text(
            f"cd,cl\n{0.28 + i / 100},{0.1 * i}\n"
        )
    return str(base)


def test_discover_runs(dataset_dir):
    assert discover_runs(dataset_dir) == [1, 2]


def test_boundary_scan(spark, dataset_dir):
    tables = read_drivaerml(spark, dataset_dir, mesh_type="boundary")
    pts = tables["points"].toPandas()
    assert sorted(pts.mesh_id.unique()) == ["boundary_1", "boundary_2"]
    assert len(pts) == 8
    pdata = tables["point_data"].toPandas()
    assert set(pdata.field) == {"pressure"}
    assert (
        pdata[pdata.mesh_id == "boundary_2"].value.min() == 20.0
    )


def test_volume_split_part_reassembly(spark, dataset_dir):
    """run_1's byte-split .vtu.NN.part files parse identically to
    run_2's whole file."""
    tables = read_drivaerml(spark, dataset_dir, mesh_type="volume")
    pts = tables["points"].toPandas()
    assert sorted(pts.mesh_id.unique()) == ["volume_1", "volume_2"]
    v1 = pts[pts.mesh_id == "volume_1"].sort_values("point_id")
    v2 = pts[pts.mesh_id == "volume_2"].sort_values("point_id")
    np.testing.assert_array_equal(
        v1[["x", "y", "z"]].to_numpy(), v2[["x", "y", "z"]].to_numpy()
    )
    cells = tables["cells"].toPandas()
    assert len(cells) == 4  # 2 runs x 2 triangles


def test_slices_scan(spark, dataset_dir):
    tables = read_drivaerml(spark, dataset_dir, mesh_type="slices")
    pts = tables["points"].toPandas()
    # slice mesh ids are PATH-derived: per-run dirs routinely name
    # their planes identically (slice_x.vtp), so stem keys would merge
    # every run's slice into one mesh
    ids = sorted(pts.mesh_id.unique())
    assert len(ids) == 2
    assert any("run_1" in m for m in ids) and any("run_2" in m for m in ids)
    assert all(m.endswith(("slice_x_1", "slice_x_2")) for m in ids)


def test_ahmedml_stl_and_metadata_join(spark, dataset_dir):
    tables = read_ahmedml(spark, dataset_dir, mesh_type="stl")
    pts = tables["points"]
    assert pts.select("mesh_id").distinct().count() == 2

    meta = read_run_metadata(spark, dataset_dir, kind="force_mom")
    mpdf = meta.orderBy("run_id").toPandas()
    assert mpdf.run_id.tolist() == [1, 2]
    assert abs(mpdf.cd.iloc[0] - 0.29) < 1e-9

    joined = attach_global_data(pts, meta)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out = joined.toPandas()
    assert len(out) == pts.count()
    assert set(out.cd.round(2)) == {0.29, 0.30}


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("ns")
    n_pts, n_snap = 5, 3
    for sub in ("geometry", "parameters", "snapshots"):
        (base / sub).mkdir()
    pq.write_table(
        pa.table(
            {
                "node_coordinates_x": [list(np.arange(n_pts, dtype=float))],
                "node_coordinates_y": [list(np.arange(n_pts, dtype=float) * 2)],
                "connectivity": [[[0, 1, 2], [2, 3, 4]]],
            }
        ),
        str(base / "geometry" / "default-00000-of-00001.parquet"),
    )
    pq.write_table(
        pa.table({"viscosity": [0.01, 0.02, 0.03]}),
        str(base / "parameters" / "default-00000-of-00001.parquet"),
    )
    rng = np.random.default_rng(7)
    snaps = {
        "velocity_x": [list(rng.random(n_pts)) for _ in range(n_snap)],
        "velocity_y": [list(rng.random(n_pts)) for _ in range(n_snap)],
        "pressure": [list(100 + rng.random(n_pts)) for _ in range(n_snap)],
    }
    pq.write_table(
        pa.table(snaps),
        str(base / "snapshots" / "default-00000-of-00001.parquet"),
    )
    return str(base), snaps


def test_ns_cylinder_shared_geometry_join(spark, ns_dir):
    base, snaps = ns_dir
    out = read_ns_cylinder(spark, base)
    assert out["points"].count() == 5
    assert out["cells"].count() == 2

    fields = out["fields"]
    plan = fields._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    pdf = fields.orderBy("snapshot_id", "point_id").toPandas()
    assert len(pdf) == 15  # 3 snapshots x 5 points
    # viscosity rides along by snapshot index
    assert pdf.groupby("snapshot_id").viscosity.first().tolist() == [
        0.01, 0.02, 0.03,
    ]
    # field values land on the right (snapshot, point)
    np.testing.assert_allclose(
        pdf[pdf.snapshot_id == 1].velocity_x.to_numpy(),
        np.array(snaps["velocity_x"][1]),
    )
    # geometry coordinates joined onto every row
    np.testing.assert_allclose(
        pdf[pdf.snapshot_id == 2].y.to_numpy(), np.arange(5) * 2.0
    )
