"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no property testing).

Invariants pinned:
- moment stats agree with numpy on arbitrary data (population semantics);
- Welford power-sum state merge is associative/order-insensitive:
  merge(A, B) finalizes identically to aggregating A∪B directly;
- seeded permutation is a bijection for any mesh size.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from physicsnemo_curator_spark.operators import mesh, stats
from physicsnemo_curator_spark.sources.synthetic import random_mesh

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=2,
    max_size=40,
)


@given(xs=values)
@_settings
def test_moment_stats_matches_numpy(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], ["v"])
    row = stats.moment_stats(df, [], "v").collect()[0]
    arr = np.asarray(xs, dtype=np.float64)
    assert row["n"] == len(xs)
    assert math.isclose(row["mean"], arr.mean(), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["min_v"], arr.min()) and math.isclose(row["max_v"], arr.max())
    assert math.isclose(
        row["var_pop_v"], arr.var(), rel_tol=1e-7, abs_tol=1e-7
    )  # population variance, reference semantics


@given(xs=values, ys=values)
@_settings
def test_welford_state_merge_associative(spark, xs, ys):
    mk = lambda vals: spark.createDataFrame(
        [("g", float(v)) for v in vals], ["k", "v"]
    )
    a = stats.welford_state(mk(xs), ["k"], "v")
    b = stats.welford_state(mk(ys), ["k"], "v")
    merged = stats.finalize_welford_state(
        stats.merge_welford_state(a, b, ["k"]), ["k"]
    ).collect()[0]
    direct = stats.finalize_welford_state(
        stats.welford_state(mk(list(xs) + list(ys)), ["k"], "v"), ["k"]
    ).collect()[0]
    assert merged["n"] == direct["n"]
    assert math.isclose(merged["mean"], direct["mean"], rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(
        merged["var_pop_v"], direct["var_pop_v"], rel_tol=1e-6, abs_tol=1e-6
    )


@given(seed=st.integers(min_value=0, max_value=2**31 - 1), n=st.integers(5, 40))
@_settings
def test_permutation_is_bijection(spark, seed, n):
    points, cells, _ = random_mesh(spark, n_meshes=1, n_points=n, n_cells=n)
    new_points, _ = mesh.random_permutation(points, cells, seed=seed)
    ids = sorted(r["point_id"] for r in new_points.collect())
    assert ids == list(range(n))
