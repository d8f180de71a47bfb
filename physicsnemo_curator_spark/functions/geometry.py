"""Computational-geometry kernels that don't fit column expressions.

Reference ``boundaries/_geometry.py:356-601`` (point-in-polygon,
silhouette loops, constrained Delaunay).  These are the pandas-UDF tier
(SURVEY §2.4): vectorized numpy per Arrow batch, no per-row Python.
Implemented: ray-casting point-in-polygon, and a dependency-free
constrained Delaunay (Bowyer–Watson insertion + Sloan edge-flip
constraint recovery + exterior-triangle removal) for triangulating
silhouette loops — the piece the reference delegates to
scipy/triangle.  Each loop is small (a boundary patch), so the kernels
run per-loop inside grouped pandas UDFs; scale comes from many loops in
parallel, not from one huge triangulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _even_odd_inside(
    xs: np.ndarray,
    ys: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
) -> np.ndarray:
    """Vectorized ray-casting even-odd test: (n,) points against a
    closed polygon given as parallel vertex arrays.  The ONE kernel
    behind both point_in_polygon_udf and constrained_delaunay's
    exterior-triangle filter."""
    px_next, py_next = np.roll(px, -1), np.roll(py, -1)
    xs = np.atleast_1d(np.asarray(xs, dtype=np.float64))[:, None]
    ys = np.atleast_1d(np.asarray(ys, dtype=np.float64))[:, None]
    straddle = (py <= ys) != (py_next <= ys)
    denom = np.where(py_next != py, py_next - py, 1.0)
    x_int = px + (ys - py) * (px_next - px) / denom
    return (np.sum(straddle & (xs < x_int), axis=1) % 2).astype(bool)


def point_in_polygon_udf(polygon: list[tuple[float, float]]):
    """Build a vectorized (x, y) -> bool UDF testing containment in a
    fixed polygon (ray casting, even-odd rule).

    The polygon is closed implicitly (last→first edge) and ships to
    executors as two small broadcast-closure arrays; each Arrow batch
    is one numpy pass over all edges (O(edges) vector ops, not
    O(rows×edges) Python).
    """
    px = np.asarray([p[0] for p in polygon], dtype=np.float64)
    py = np.asarray([p[1] for p in polygon], dtype=np.float64)

    @pandas_udf("boolean")
    def _inside(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            _even_odd_inside(
                x.to_numpy(dtype=np.float64),
                y.to_numpy(dtype=np.float64),
                px,
                py,
            )
        )

    return _inside


def filter_points_in_polygon(
    df, polygon: list[tuple[float, float]], x_col: str = "x", y_col: str = "y"
):
    """Keep rows whose (x, y) lies inside the polygon — the spatial
    filter used when clipping a mesh/grid to a region of interest."""
    inside = point_in_polygon_udf(polygon)
    return df.filter(inside(F.col(x_col), F.col(y_col)))


# ---------------------------------------------------------------------------
# Constrained Delaunay triangulation (numpy, no scipy/triangle)
# Reference boundaries/_geometry.py:356-601 triangulates silhouette
# loops with a constrained Delaunay; this is the same capability built
# from first principles: Bowyer–Watson incremental insertion, Sloan
# edge-flip recovery of constraint edges, even-odd removal of exterior
# triangles.
# ---------------------------------------------------------------------------


def _orient(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Signed twice-area of triangle abc (>0 counter-clockwise)."""
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _in_circumcircle(a, b, c, p) -> bool:
    """p strictly inside the circumcircle of ccw triangle abc."""
    if _orient(a, b, c) < 0:
        a, b = b, a
    m = np.array(
        [
            [a[0] - p[0], a[1] - p[1], (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1], (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1], (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2],
        ]
    )
    return float(np.linalg.det(m)) > 1e-12


def _segments_cross(p1, p2, q1, q2) -> bool:
    """Proper intersection of open segments p1p2 and q1q2 (shared
    endpoints do NOT count as crossing)."""
    d1 = _orient(q1, q2, p1)
    d2 = _orient(q1, q2, p2)
    d3 = _orient(p1, p2, q1)
    d4 = _orient(p1, p2, q2)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and all(
        abs(d) > 1e-12 for d in (d1, d2, d3, d4)
    )


def _unit_scale(pts: np.ndarray) -> np.ndarray:
    """Rescale to a unit bounding box: the predicate epsilons
    (circumcircle determinant ~ length^4, crossing areas ~ length^2)
    are ABSOLUTE, so mm-scale loops in meter units fell below them and
    silently produced garbage triangulations.  All outputs are index
    arrays, so no back-transform is needed."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0:
        return pts
    cmin, cmax = pts.min(axis=0), pts.max(axis=0)
    scale = float(np.max(cmax - cmin))
    if scale <= 0:
        return pts - cmin
    return (pts - (cmin + cmax) / 2.0) / scale


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer–Watson Delaunay triangulation of (n, 2) points.

    Returns an (m, 3) int array of vertex indices.  O(n²) incremental —
    intended for per-patch loops (hundreds of points), parallelism
    comes from running one patch per group in Spark.  Coordinates are
    unit-rescaled internally (see :func:`_unit_scale`), so any input
    scale triangulates identically.
    """
    pts = _unit_scale(points)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    cmin, cmax = pts.min(axis=0), pts.max(axis=0)
    center = (cmin + cmax) / 2.0
    span = float(np.max(cmax - cmin)) * 10.0 + 1.0
    allp = np.vstack(
        [
            pts,
            [
                (center[0] - 3 * span, center[1] - span),
                (center[0] + 3 * span, center[1] - span),
                (center[0], center[1] + 3 * span),
            ],
        ]
    )
    tris: set[tuple[int, int, int]] = {(n, n + 1, n + 2)}
    for i in range(n):
        p = allp[i]
        bad = [
            t
            for t in tris
            if _in_circumcircle(allp[t[0]], allp[t[1]], allp[t[2]], p)
        ]
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris.difference_update(bad)
        for (a, b), cnt in edge_count.items():
            if cnt == 1 and _orient(allp[a], allp[b], p) != 0.0:
                tris.add((a, b, i))
    return np.array(
        sorted(t for t in tris if max(t) < n), dtype=np.int64
    ).reshape(-1, 3)


def _edge_map(tris: list[tuple[int, int, int]]):
    edges: dict[tuple[int, int], list[int]] = {}
    for ti, t in enumerate(tris):
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.setdefault((min(e), max(e)), []).append(ti)
    return edges


def constrained_delaunay(
    polygon: np.ndarray, *, max_flips: int = 10_000
) -> np.ndarray:
    """Triangulate a simple polygon (no self-intersections, no repeated
    vertices): Delaunay of its vertices, flip-recover every boundary
    edge (Sloan's algorithm), drop triangles outside the polygon.

    Returns (m, 3) indices into ``polygon``; triangle areas sum to the
    polygon area (asserted by tests, not here — keep the kernel pure).
    """
    from collections import deque

    pts = _unit_scale(polygon)
    n = len(pts)
    tris = [tuple(t) for t in delaunay(pts)]
    constraints = [(i, (i + 1) % n) for i in range(n)]

    def _crosses_constraint(e, a, b):
        return (
            a not in e
            and b not in e
            and _segments_cross(pts[e[0]], pts[e[1]], pts[a], pts[b])
        )

    for a, b in constraints:
        # Sloan's recovery: queue every edge crossing the constraint;
        # flip convex quads (re-queueing new diagonals that still
        # cross), defer non-convex quads to the back — the deferred edge
        # becomes flippable after its neighborhood changes.  The greedy
        # variant (always flip the first flippable edge, recompute from
        # scratch) can ping-pong between two states forever.
        edges = _edge_map(tris)
        if (min(a, b), max(a, b)) in edges:
            continue
        queue = deque(e for e in edges if _crosses_constraint(e, a, b))
        if not queue:
            raise ValueError(
                f"cannot recover constraint edge ({a},{b}); "
                "polygon may be degenerate or self-intersecting"
            )
        flips = 0
        deferred = 0  # consecutive pops without a flip
        while queue:
            e = queue.popleft()
            edges = _edge_map(tris)
            if e not in edges or len(edges[e]) != 2:
                continue  # edge no longer exists / became boundary
            if not _crosses_constraint(e, a, b):
                continue  # a previous flip resolved it
            c, d = e
            t1, t2 = edges[e]
            u = next(x for x in tris[t1] if x not in (c, d))
            v = next(x for x in tris[t2] if x not in (c, d))
            if not _segments_cross(pts[u], pts[v], pts[c], pts[d]):
                queue.append(e)  # non-convex quad — retry later
                deferred += 1
                if deferred > len(queue) + 1:
                    raise ValueError(
                        f"edge recovery stalled for constraint ({a},{b})"
                    )
                continue
            deferred = 0
            tris[t1] = (u, v, c)
            tris[t2] = (u, v, d)
            new = (min(u, v), max(u, v))
            if _crosses_constraint(new, a, b):
                queue.append(new)
            flips += 1
            if flips > max_flips:
                raise ValueError(
                    f"edge recovery exceeded {max_flips} flips for ({a},{b})"
                )

    # drop exterior triangles: centroid even-odd test against the loop
    px, py = pts[:, 0], pts[:, 1]

    def _inside(x: float, y: float) -> bool:
        return bool(_even_odd_inside(x, y, px, py)[0])

    kept = [
        t
        for t in tris
        if _inside(
            float(pts[list(t), 0].mean()), float(pts[list(t), 1].mean())
        )
    ]
    return np.array(sorted(kept), dtype=np.int64).reshape(-1, 3)
