"""Computational-geometry kernels that don't fit column expressions.

Reference ``boundaries/_geometry.py:356-601`` (point-in-polygon,
silhouette loops, constrained Delaunay).  These are the pandas-UDF tier
(SURVEY §2.4): vectorized numpy per Arrow batch, no per-row Python.
Implemented: ray-casting point-in-polygon (the piece the boundary
generators and spatial filters actually need); Delaunay stays a gap
(needs scipy/triangle, not in this container).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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
    px_next = np.roll(px, -1)
    py_next = np.roll(py, -1)

    @pandas_udf("boolean")
    def _inside(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(dtype=np.float64)[:, None]  # (rows, 1)
        ys = y.to_numpy(dtype=np.float64)[:, None]
        # edge straddles the horizontal ray through y?
        straddle = (py <= ys) != (py_next <= ys)  # (rows, edges)
        # x coordinate of the edge/ray intersection
        denom = np.where(py_next != py, py_next - py, 1.0)
        x_int = px + (ys - py) * (px_next - px) / denom
        crossings = np.sum(straddle & (xs < x_int), axis=1)
        return pd.Series(crossings % 2 == 1)

    return _inside


def filter_points_in_polygon(
    df, polygon: list[tuple[float, float]], x_col: str = "x", y_col: str = "y"
):
    """Keep rows whose (x, y) lies inside the polygon — the spatial
    filter used when clipping a mesh/grid to a region of interest."""
    inside = point_in_polygon_udf(polygon)
    return df.filter(inside(F.col(x_col), F.col(y_col)))
