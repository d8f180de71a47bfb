#!/usr/bin/env python
"""End-to-end mesh curation example: the CAE/CFD pipeline.

VTK directory → normalized long tables (via the vtk_mesh Python
DataSource) → clean (merge duplicate points, drop unused) → quality
report → per-field moment stats → partitioned parquet.  The same
Source → Filter* → Sink shape as the reference's mesh examples
(``examples/`` and ``domains/mesh/``), expressed as Spark tables and
operators.

Usage: python examples/curate_meshes.py [vtk_dir] [out_dir]
(With no vtk_dir, writes a small synthetic VTK directory first.)
"""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators import mesh, quality, stats  # noqa: E402
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sinks.partitioned import write_partitioned  # noqa: E402
from physicsnemo_curator_spark.sources import mesh_datasource, vtk  # noqa: E402


def _write_synthetic_vtk(path: str, n_meshes: int = 4) -> None:
    """A few triangle fans per file — enough to exercise every stage."""
    for m in range(n_meshes):
        pts = [(0.0, 0.0, 0.0)]
        for s in range(6):
            a = s * math.pi / 3
            pts.append((math.cos(a) + 0.1 * m, math.sin(a), 0.0))
        pts.append(pts[1])  # duplicate point → exercises clean
        cells = [[0, 1 + s, 1 + (s + 1) % 6] for s in range(6)]
        pdata = {"temp": [float(i + m) for i in range(len(pts))]}
        vtk.write_vtk(pts, cells, pdata, os.path.join(path, f"mesh{m}.vtk"))


def main() -> None:
    vtk_dir = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_meshes"

    spark = get_spark(app_name="curate-meshes")
    spark.sparkContext.setLogLevel("ERROR")

    if vtk_dir is None:
        vtk_dir = tempfile.mkdtemp(prefix="vtk_demo_")
        _write_synthetic_vtk(vtk_dir)

    # 1. scan: one task per file, field pushdown at the source
    mesh_datasource.register(spark)
    points = spark.read.format("vtk_mesh").option("table", "points").load(vtk_dir)
    cells = spark.read.format("vtk_mesh").option("table", "cells").load(vtk_dir)
    pdata = (
        spark.read.format("vtk_mesh")
        .option("table", "point_data")
        .load(vtk_dir)
        .filter(F.col("field") == "temp")  # consumed by pushFilters
    )

    # 2. clean: snap-merge duplicate points, remap connectivity
    cpoints, remap = mesh.merge_duplicate_points(points, tol=1e-9)
    ccells = mesh.remap_connectivity(cells, remap)
    n_dropped = points.count() - cpoints.count()

    # 3. per-mesh quality report (triangle geometry → report row)
    report = quality.mesh_quality_report(cpoints, ccells)

    # 4. per-field moment stats across all meshes
    field_stats = stats.moment_stats(pdata, ["field"], "value")

    # 5. sink: one directory per mesh, quality + stats alongside
    write_partitioned(cpoints, os.path.join(out_dir, "points"), ["mesh_id"])
    write_partitioned(ccells, os.path.join(out_dir, "cells"), ["mesh_id"])
    report.write.mode("overwrite").parquet(os.path.join(out_dir, "quality"))
    field_stats.write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    print(f"meshes:          {report.count()}")
    print(f"points merged:   {n_dropped}")
    print(f"quality sample:  {report.limit(1).collect()}")
    print(f"stats:           {field_stats.collect()}")
    print(f"outputs under:   {out_dir}")


if __name__ == "__main__":
    main()
