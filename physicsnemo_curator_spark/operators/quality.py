"""Mesh-quality metrics: per-cell geometry + per-mesh report rows.

MeshQualityFilter semantics (reference ``domains/mesh/filters/quality.py``):
per-cell aspect ratio / equiangle skewness / interior angles /
degeneracy over triangle cells, aggregated to one report row per mesh
(min/max/mean + conditional counts, reference ``quality.py:434-836``).

Layout: cells join their 3 vertices once (3 joins on (mesh_id,
point_id) — co-located when tables are bucketed by mesh_id), then every
metric is pure column math inside one codegen stage; the report is one
hash-aggregate.  NaN/Inf field tallies (``quality.py:692-738``) are
``count_if`` over the long point_data table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from physicsnemo_curator_spark.functions import math as M

_EQUI_TRI = math.pi / 3.0  # equilateral triangle interior angle


def triangle_geometry(points: DataFrame, cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Per-triangle vertex coords + edge lengths + interior angles.

    Expects 3-vertex cells; vertices resolve through three aliased
    joins against the points table.
    """
    # arity guard: element_at past the array end raises
    # INVALID_ARRAY_INDEX under ANSI — non-triangle cells in a mixed
    # mesh must not abort the whole report
    c = cells.filter(F.size(vs_col) >= 3).select(
        "mesh_id",
        "cell_id",
        F.element_at(vs_col, 1).alias("v0"),
        F.element_at(vs_col, 2).alias("v1"),
        F.element_at(vs_col, 3).alias("v2"),
    )
    for i in range(3):
        p = points.select(
            F.col("mesh_id"),
            F.col("point_id").alias(f"v{i}"),
            F.col("x").alias(f"x{i}"),
            F.col("y").alias(f"y{i}"),
            F.col("z").alias(f"z{i}"),
        )
        c = c.join(p, ["mesh_id", f"v{i}"])

    def edge(a: int, b: int):
        return M.l2_norm(
            F.col(f"x{b}") - F.col(f"x{a}"),
            F.col(f"y{b}") - F.col(f"y{a}"),
            F.col(f"z{b}") - F.col(f"z{a}"),
        )

    # e0 = |v0v1|, e1 = |v1v2|, e2 = |v2v0|
    g = c.select(
        "mesh_id",
        "cell_id",
        edge(0, 1).alias("e0"),
        edge(1, 2).alias("e1"),
        edge(2, 0).alias("e2"),
    )
    # law of cosines: angle at the vertex opposite each edge
    def angle(opp: str, a: str, b: str):
        cos = (F.col(a) ** 2 + F.col(b) ** 2 - F.col(opp) ** 2) / (
            2.0 * F.col(a) * F.col(b)
        )
        return M.interior_angle(cos)

    return g.select(
        "mesh_id",
        "cell_id",
        "e0",
        "e1",
        "e2",
        angle("e1", "e0", "e2").alias("a0"),  # at v0
        angle("e2", "e0", "e1").alias("a1"),  # at v1
        angle("e0", "e1", "e2").alias("a2"),  # at v2
    )


def triangle_quality(points: DataFrame, cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Per-cell quality metrics (reference ``quality.py:147-355``)."""
    g = triangle_geometry(points, cells, vs_col)
    theta_max = F.greatest("a0", "a1", "a2")
    theta_min = F.least("a0", "a1", "a2")
    return g.select(
        "mesh_id",
        "cell_id",
        M.aspect_ratio(F.col("e0"), F.col("e1"), F.col("e2")).alias("aspect_ratio"),
        M.equiangle_skewness(theta_max, theta_min, _EQUI_TRI).alias("skewness"),
        theta_max.alias("theta_max"),
        theta_min.alias("theta_min"),
        # degenerate: collinear/zero-area (an angle ~0 or ~pi)
        (
            (theta_min < F.lit(1e-9)) | (theta_max > F.lit(math.pi - 1e-9))
        ).alias("degenerate"),
    )


def tet_geometry(points: DataFrame, cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Per-tetrahedron vertex coords via four co-located joins."""
    c = cells.filter(F.size(vs_col) >= 4).select(
        "mesh_id",
        "cell_id",
        *[F.element_at(vs_col, i + 1).alias(f"v{i}") for i in range(4)],
    )
    for i in range(4):
        p = points.select(
            F.col("mesh_id"),
            F.col("point_id").alias(f"v{i}"),
            F.col("x").alias(f"x{i}"),
            F.col("y").alias(f"y{i}"),
            F.col("z").alias(f"z{i}"),
        )
        c = c.join(p, ["mesh_id", f"v{i}"])
    return c


def tet_quality(points: DataFrame, cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Per-tet signed volume, aspect ratio, min/max dihedral angles.

    Reference kernels: tet dihedral angles (6 per cell,
    ``quality.py:180-257``), aspect ratio (``quality.py:260-297``),
    scaled-Jacobian-style degeneracy via the triple product
    (``quality.py:358-426``).  All pure column math in one codegen
    stage after the vertex joins.
    """
    g = tet_geometry(points, cells, vs_col)

    def e(a: int, b: int):
        return (
            F.col(f"x{b}") - F.col(f"x{a}"),
            F.col(f"y{b}") - F.col(f"y{a}"),
            F.col(f"z{b}") - F.col(f"z{a}"),
        )

    # signed volume = dot(e01, cross(e02, e03)) / 6
    a = e(0, 1)
    b = e(0, 2)
    c3 = e(0, 3)
    cx, cy, cz = M.cross3(*b, *c3)
    volume = (a[0] * cx + a[1] * cy + a[2] * cz) / 6.0

    # edge lengths (all 6)
    edges = [M.l2_norm(*e(i, j)) for i, j in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))]

    # dihedral along each edge (a,b) with opposite vertices (c,d):
    # angle between cross(ab, ac) and cross(ab, ad) IS the dihedral
    # (both normals share the first factor, so orientation is
    # consistent; verified = acos(1/3) on the regular tet)
    import itertools

    def norm_len(n):
        return F.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])

    dihedrals = []
    for (va, vb) in itertools.combinations(range(4), 2):
        vc, vd = (k for k in range(4) if k not in (va, vb))
        ab = e(va, vb)
        ac = e(va, vc)
        ad = e(va, vd)
        n1 = M.cross3(*ab, *ac)
        n2 = M.cross3(*ab, *ad)
        cos = (n1[0] * n2[0] + n1[1] * n2[1] + n1[2] * n2[2]) / (
            norm_len(n1) * norm_len(n2)
        )
        dihedrals.append(M.interior_angle(cos))

    return g.select(
        "mesh_id",
        "cell_id",
        volume.alias("volume"),
        (F.greatest(*edges) / F.least(*edges)).alias("aspect_ratio"),
        F.least(*dihedrals).alias("dihedral_min"),
        F.greatest(*dihedrals).alias("dihedral_max"),
        # scale-invariant degeneracy: raw |volume| < 1e-12 flagged
        # EVERY cell of a fine mesh in meter units and passed huge flat
        # slivers; normalize by the longest edge cubed (scaled-Jacobian
        # style)
        (
            F.abs(volume)
            < F.lit(1e-9) * F.pow(F.greatest(*edges), F.lit(3.0))
        ).alias("degenerate"),
    )


def mesh_quality_report(
    points: DataFrame,
    cells: DataFrame,
    point_data: DataFrame | None = None,
    *,
    vs_col: str = "vs",
    aspect_threshold: float = 10.0,
    skew_threshold: float = 0.9,
) -> DataFrame:
    """One report row per mesh (reference ``quality.py:434-836``):
    geometry min/max/mean + degenerate/poor-cell counts, plus NaN/Inf
    field tallies when a point_data table is supplied."""
    q = triangle_quality(points, cells, vs_col)
    n_input = cells.groupBy("mesh_id").agg(
        F.count(F.lit(1)).alias("_n_input")
    )
    report = q.groupBy("mesh_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("aspect_ratio").alias("aspect_min"),
        F.max("aspect_ratio").alias("aspect_max"),
        F.avg("aspect_ratio").alias("aspect_mean"),
        F.min("skewness").alias("skew_min"),
        F.max("skewness").alias("skew_max"),
        F.avg("skewness").alias("skew_mean"),
        F.count_if(F.col("degenerate")).alias("n_degenerate"),
        F.count_if(F.col("aspect_ratio") > aspect_threshold).alias("n_poor_aspect"),
        F.count_if(F.col("skewness") > skew_threshold).alias("n_poor_skew"),
    )
    # cells that failed to resolve (non-triangle arity, or vertices
    # referencing missing point ids through the inner joins) would
    # otherwise vanish from the audit — the corrupt cells are exactly
    # the ones a quality report exists to surface
    report = (
        n_input.join(report, "mesh_id", "left")
        .withColumn(
            "n_unresolved", F.col("_n_input") - F.coalesce("n_cells", F.lit(0))
        )
        .drop("_n_input")
        .na.fill({"n_cells": 0, "n_degenerate": 0, "n_poor_aspect": 0, "n_poor_skew": 0})
    )
    if point_data is not None:
        nan_inf = point_data.groupBy("mesh_id").agg(
            M.nan_count(F.col("value")).alias("n_nan"),
            M.inf_count(F.col("value")).alias("n_inf"),
        )
        report = report.join(nan_inf, "mesh_id", "left").na.fill(
            {"n_nan": 0, "n_inf": 0}
        )
    return report
