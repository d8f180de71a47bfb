"""Quality metrics, as-of join, sessionize, atomic ops — exact checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import atomic, quality, timeseries
from physicsnemo_curator_spark.sources.synthetic import random_atomic


def test_triangle_quality_known_geometry(spark):
    # equilateral (area>0), right isoceles, and a degenerate sliver
    points = spark.createDataFrame(
        [
            (0, 0, 0.0, 0.0, 0.0),
            (0, 1, 1.0, 0.0, 0.0),
            (0, 2, 0.5, math.sqrt(3) / 2, 0.0),  # equilateral with 0,1
            (0, 3, 0.0, 1.0, 0.0),  # right triangle with 0,1
            (0, 4, 2.0, 0.0, 0.0),  # collinear with 0,1
        ],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [0, 1, 3]), (0, 2, [0, 1, 4])],
        ["mesh_id", "cell_id", "vs"],
    )
    q = {r["cell_id"]: r for r in quality.triangle_quality(points, cells).collect()}
    # equilateral: aspect 1, skew 0, all angles pi/3
    assert abs(q[0]["aspect_ratio"] - 1.0) < 1e-9
    assert q[0]["skewness"] < 1e-9
    assert abs(q[0]["theta_max"] - math.pi / 3) < 1e-9
    # right isoceles: max angle pi/2, aspect sqrt(2)
    assert abs(q[1]["theta_max"] - math.pi / 2) < 1e-9
    assert abs(q[1]["aspect_ratio"] - math.sqrt(2)) < 1e-9
    assert not q[1]["degenerate"]
    # collinear: degenerate
    assert q[2]["degenerate"]

    report = quality.mesh_quality_report(points, cells).collect()[0]
    assert report["n_cells"] == 3 and report["n_degenerate"] == 1


def test_quality_report_nan_tally(spark):
    points = spark.createDataFrame(
        [(0, i, float(i % 3), float(i // 3), 0.0) for i in range(4)],
        ["mesh_id", "point_id", "x", "y", "z"],
    )
    cells = spark.createDataFrame([(0, 0, [0, 1, 2])], ["mesh_id", "cell_id", "vs"])
    pdata = spark.createDataFrame(
        [
            (0, 0, "p", 1.0),
            (0, 1, "p", float("nan")),
            (0, 2, "p", float("inf")),
        ],
        ["mesh_id", "point_id", "field", "value"],
    )
    rep = quality.mesh_quality_report(points, cells, pdata).collect()[0]
    assert rep["n_nan"] == 1 and rep["n_inf"] == 1


def test_as_of_join_exact(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")], ["k", "t", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 50, 300.0)], ["k", "t", "v"]
    )
    out = timeseries.as_of_join(
        left, right, on=["k"], left_time="t", right_time="t", right_cols=["v"]
    )
    got = {r["tag"]: r["asof_v"] for r in out.collect()}
    assert got == {"l1": 100.0, "l2": 200.0, "l3": None}

    # boundary: at exactly equal time, <= matches; strict excludes
    left_eq = spark.createDataFrame([(1, 15, "x")], ["k", "t", "tag"])
    le = timeseries.as_of_join(
        left_eq, right, on=["k"], left_time="t", right_time="t", right_cols=["v"]
    ).collect()[0]
    assert le["asof_v"] == 200.0
    ls = timeseries.as_of_join(
        left_eq, right, on=["k"], left_time="t", right_time="t",
        right_cols=["v"], strict=True,
    ).collect()[0]
    assert ls["asof_v"] == 100.0


def test_sessionize_gap_boundaries(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (2, 1, base + dt.timedelta(seconds=100)),     # same session
        (3, 1, base + dt.timedelta(seconds=2000)),    # gap > 1800 → new
        (4, 2, base),                                  # other user
    ]
    events = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["event_id"]: r["session_id"] for r in
           timeseries.sessionize(events, gap_seconds=1800).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_atomic_offsets_and_stats(spark):
    systems, atoms = random_atomic(spark, n_systems=6)
    off = atomic.pack_offsets(systems).orderBy("system_id").collect()
    # exclusive prefix sum: offset[i] = sum(natoms[0..i-1])
    run = 0
    for r in off:
        assert r["offset"] == run
        run += r["natoms"]

    st = atomic.atomic_level_stats(atoms, systems)
    rows = {(r["level"], r["field"]): r for r in st.collect()}
    assert ("node", "z") in rows and ("system", "energy") in rows
    assert rows[("node", "z")]["n"] == atoms.count()

    info = atomic.atomic_info(systems, atoms)
    got = {r["system_id"]: r["n_atoms"] for r in info.collect()}
    want = {r["system_id"]: r["natoms"] for r in systems.collect()}
    assert got == want


def test_rollup_cascade_state_merge_exact(spark, sf_dir):
    """Daily stats derived from hourly state must equal direct daily
    aggregation of raw rows — state merging loses nothing."""
    from physicsnemo_curator_spark.operators.timeseries import (
        finalize_rollup,
        rollup_cascade,
    )
    from physicsnemo_curator_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    daily_from_state = {
        r["bucket"]: (r["n"], round(r["mean"], 9), round(r["var_pop_v"], 6),
                      r["vmin"], r["vmax"])
        for r in finalize_rollup(
            rollup_cascade(events, levels=("hour", "day"))["day"]
        ).collect()
    }
    direct = {
        r["bucket"]: (r["n"], round(r["mean"], 9), round(r["var"], 6),
                      r["vmin"], r["vmax"])
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("bucket")
        ).agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        ).collect()
    }
    assert daily_from_state == direct
