"""d3plot binary walker: fixture round-trip, state stream, Spark scan,
and the handoff into the derived-physics operators."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import d3plot

COORDS = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 0.0],
     [2.0, 0.0, 0.0], [2.0, 1.0, 0.0]]
)
SHELLS = np.array([[0, 1, 2, 3], [1, 4, 5, 2]])
PARTS = np.array([1, 2])


def _states():
    return [
        (0.0, COORDS),
        (0.5, COORDS + [0.0, 0.0, 0.25]),
        (1.0, COORDS + [0.0, 0.0, 1.0]),
    ]


def test_roundtrip(tmp_path):
    p = tmp_path / "d3plot"
    d3plot.write_d3plot(COORDS, SHELLS, PARTS, _states(), str(p))
    d = d3plot.parse_d3plot(p.read_bytes())
    assert np.allclose(d.coords, COORDS)
    assert (d.shells == SHELLS).all()
    assert (d.shell_parts == PARTS).all()
    assert d.times.tolist() == [0.0, 0.5, 1.0]
    assert d.node_positions.shape == (3, 6, 3)
    assert np.allclose(d.node_positions[2, :, 2], COORDS[:, 2] + 1.0)


def test_double_precision_rejected(tmp_path):
    p = tmp_path / "d3plot"
    d3plot.write_d3plot(COORDS, SHELLS, PARTS, _states(), str(p))
    data = bytearray(p.read_bytes())
    # corrupt NUMNP into an implausible value (as a doubled-word layout would)
    data[(10 + 6) * 4 : (10 + 7) * 4] = (2**30).to_bytes(4, "little")
    with pytest.raises(ValueError, match="NUMNP"):
        d3plot.parse_d3plot(bytes(data))


def test_spark_scan_and_physics_handoff(spark, tmp_path):
    for run in ("d3plot_a", "d3plot_b"):
        d3plot.write_d3plot(COORDS, SHELLS, PARTS, _states(), str(tmp_path / run))
    tables = d3plot.read_d3plot(spark, str(tmp_path))
    assert tables["nodes"].count() == 2 * len(COORDS)
    shells = tables["shells"].filter("mesh_id = 'd3plot_a'").orderBy("elem_id").collect()
    assert [r["part_id"] for r in shells] == [1, 2]
    assert shells[0]["vs"] == [0, 1, 2, 3]

    states = tables["states"]
    assert states.count() == 2 * 3 * len(COORDS)
    # timestep stacking semantics: max z-displacement vs state 0 per node
    from pyspark.sql import functions as F

    s0 = states.filter("state_id = 0").select(
        "mesh_id", "node_id", F.col("z").alias("z0")
    )
    dev = (
        states.join(s0, ["mesh_id", "node_id"])
        .groupBy("mesh_id", "node_id")
        .agg(F.max(F.abs(F.col("z") - F.col("z0"))).alias("max_dz"))
    )
    assert {round(r["max_dz"], 6) for r in dev.collect()} == {1.0}


def test_k_file_thickness_mapping():
    text = """$ comment
*KEYWORD
*PART
front panel
         1         10
*PART
rear panel
         2,        20
*SECTION_SHELL
        10         2
       1.5       1.5       1.5       1.5
*SECTION_SHELL
        20         2
       2.25      2.25      2.25      2.25
*END
"""
    assert d3plot.parse_k_file(text) == {1: 1.5, 2: 2.25}


def test_k_file_thickness_scatter(spark, tmp_path):
    """part thickness → per-node scatter-mean over the shells table —
    the full reference D3PlotSource thickness pipeline."""
    d3plot.write_d3plot(COORDS, SHELLS, PARTS, _states(), str(tmp_path / "d3plot"))
    tables = d3plot.read_d3plot(spark, str(tmp_path))
    thick = {1: 1.5, 2: 2.25}
    from pyspark.sql import functions as F

    tdf = spark.createDataFrame(list(thick.items()), "part_id int, thickness double")
    node_thick = (
        tables["shells"]
        .join(F.broadcast(tdf), "part_id")
        .select(F.explode("vs").alias("node_id"), "thickness")
        .groupBy("node_id")
        .agg(F.avg("thickness").alias("t"))
    )
    got = {r["node_id"]: r["t"] for r in node_thick.collect()}
    # nodes 1 and 2 sit on both parts -> mean of 1.5 and 2.25
    assert got[0] == 1.5 and got[4] == 2.25 and got[1] == pytest.approx(1.875)


def test_scan_skips_tmp_residue(spark, tmp_path):
    """A crashed atomic write's *.tmp residue must not poison the
    extensionless d3plot* scan."""
    import numpy as np

    from physicsnemo_curator_spark.sources.d3plot import (
        read_d3plot,
        write_d3plot,
    )

    coords = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]])
    shells = np.array([[0, 1, 2, 2]])
    write_d3plot(coords, shells, np.array([1]), [], str(tmp_path / "d3plot"))
    (tmp_path / "d3plot.999.tmp").write_bytes(b"torn")
    t = read_d3plot(spark, str(tmp_path))
    assert t["nodes"].count() == 4
