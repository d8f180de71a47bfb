"""Mesh-topology operators on the normalized long-table encoding.

Tables (SURVEY.md §1.2a):
    points(mesh_id, point_id, x, y, z)
    cells(mesh_id, cell_id, vs ARRAY<BIGINT>)          -- connectivity
    point_data(mesh_id, point_id, field, value)
    cell_data(mesh_id, cell_id, field, value)

The reference does all of this with per-mesh numpy index math inside
one worker; here every operator is a join/agg keyed on
``(mesh_id, ...)`` so a single mesh can itself be billions of rows
spread over many tasks.  Joins between points and cells of the same
mesh co-locate when both sides are hash-partitioned on mesh_id
(bucketing at write time makes them shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_cells(cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """cells(mesh_id, cell_id, vs) -> one row per (cell, slot, point_id)."""
    return cells.select(
        "mesh_id",
        "cell_id",
        F.posexplode(vs_col).alias("slot", "point_id"),
    )


def point_data_to_cell_data(
    cells: DataFrame,
    point_data: DataFrame,
    vs_col: str = "vs",
) -> DataFrame:
    """Average vertex fields onto cells.

    PointDataToCellDataFilter semantics (reference
    ``domains/mesh/filters/point_data_to_cell.py:39-226``): cell value =
    mean of its vertices' values, per field.  One join + one groupBy;
    both shuffles key on (mesh_id, point_id)/(mesh_id, cell_id).
    """
    incidence = explode_cells(cells, vs_col)
    joined = incidence.join(point_data, ["mesh_id", "point_id"])
    return joined.groupBy("mesh_id", "cell_id", "field").agg(
        F.avg("value").alias("value")
    )


def cell_centroids(cells: DataFrame, points: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Per-cell centroid = avg of vertex coords (reference
    ``domains/mesh/sources/_vtk_convert.py:176-227``)."""
    incidence = explode_cells(cells, vs_col)
    joined = incidence.join(points, ["mesh_id", "point_id"])
    return joined.groupBy("mesh_id", "cell_id").agg(
        F.avg("x").alias("cx"), F.avg("y").alias("cy"), F.avg("z").alias("cz")
    )


def scatter_mean(
    cells_with_value: DataFrame,
    vs_col: str = "vs",
    value_col: str = "value",
) -> DataFrame:
    """Scatter a per-cell value to nodes, averaging over incidence.

    Node-thickness semantics (reference ``domains/mesh/sources/
    d3plot.py:230-280``, Rust ``d3plot/thickness.rs``): each node gets
    the mean of the values of cells touching it.
    """
    exploded = cells_with_value.select(
        "mesh_id", F.explode(vs_col).alias("point_id"), F.col(value_col)
    )
    return exploded.groupBy("mesh_id", "point_id").agg(
        F.avg(value_col).alias(value_col)
    )


def unique_edges(cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Derive the unique undirected edge list from connectivity.

    EdgeComputeFilter semantics (reference ``domains/mesh/filters/
    edge_compute.py:40-136``): explode consecutive vertex pairs (a ring
    per cell), normalize (least, greatest), distinct.  The distinct is
    the only shuffle; it keys on (mesh_id, a, b).
    """
    n = F.size(vs_col)
    # cells with < 2 nodes have no edges; without the filter,
    # sequence(0, -1) auto-steps DESCENDING and getItem on the empty
    # array raises INVALID_ARRAY_INDEX under ANSI
    pairs = cells.filter(n >= 2).select(
        "mesh_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("i"),
        F.col(vs_col).alias("_vs"),
    ).select(
        "mesh_id",
        F.col("_vs").getItem(F.col("i")).alias("u"),
        F.col("_vs").getItem((F.col("i") + 1) % F.size("_vs")).alias("w"),
    )
    return (
        pairs.filter(F.col("u") != F.col("w"))
        .select(
            "mesh_id",
            F.least("u", "w").alias("a"),
            F.greatest("u", "w").alias("b"),
        )
        .distinct()
    )


def drop_unused_points(points: DataFrame, cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Remove points referenced by no cell — left-semi join
    (CleanFilter, reference ``domains/mesh/filters/clean.py:39-187``)."""
    used = cells.select("mesh_id", F.explode(vs_col).alias("point_id")).distinct()
    return points.join(used, ["mesh_id", "point_id"], "left_semi")


def dedup_cells(cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Remove duplicate cells (identical vertex sets regardless of
    order) — dropDuplicates on the sorted vertex array (CleanFilter)."""
    with_key = cells.withColumn("_sorted_vs", F.array_sort(F.col(vs_col)))
    return with_key.dropDuplicates(["mesh_id", "_sorted_vs"]).drop("_sorted_vs")


def merge_duplicate_points(
    points: DataFrame,
    tol: float,
    coord_cols: tuple[str, str, str] = ("x", "y", "z"),
) -> tuple[DataFrame, DataFrame]:
    """Merge points within an L2-ish tolerance (CleanFilter).

    Grid-snap approach: quantize coords to a tol-sized grid, keep the
    min-id representative per occupied voxel, and return
    ``(kept_points, remap)`` where remap(mesh_id, point_id ->
    new_point_id) rewrites connectivity.  Approximation of the
    reference's pairwise L2 merge that stays a pure hash-aggregate
    (exact pairwise at 100 TB would be a quadratic cross join).
    """
    x, y, z = (F.col(c) for c in coord_cols)
    q = [
        F.round(x / F.lit(tol)).alias("_qx"),
        F.round(y / F.lit(tol)).alias("_qy"),
        F.round(z / F.lit(tol)).alias("_qz"),
    ]
    keyed = points.select("*", *q)
    rep = keyed.groupBy("mesh_id", "_qx", "_qy", "_qz").agg(
        F.min("point_id").alias("new_point_id")
    )
    remap = keyed.join(rep, ["mesh_id", "_qx", "_qy", "_qz"]).select(
        "mesh_id", "point_id", "new_point_id"
    )
    kept = points.join(
        remap.filter(F.col("point_id") == F.col("new_point_id")).select(
            "mesh_id", "point_id"
        ),
        ["mesh_id", "point_id"],
        "left_semi",
    )
    return kept, remap


def remap_connectivity(cells: DataFrame, remap: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Rewrite cell connectivity through an (old -> new) point-id map,
    dropping cells that reference any unmapped (deleted) point.

    WallNodeFilter connectivity remap (reference ``domains/mesh/
    filters/wall_node.py:103-154``): explode → join node map (inner:
    cells touching a dropped node lose rows) → keep only cells whose
    full arity survived (the anti-join of cells touching dropped
    nodes) → re-assemble the array in slot order.
    """
    arity = cells.select("mesh_id", "cell_id", F.size(vs_col).alias("_arity"))
    exploded = explode_cells(cells, vs_col)
    mapped = exploded.join(remap, ["mesh_id", "point_id"])
    rebuilt = mapped.groupBy("mesh_id", "cell_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("slot"), F.col("new_point_id")))
            ),
            lambda s: s.getField("new_point_id"),
        ).alias(vs_col),
        F.count(F.lit(1)).alias("_n"),
    )
    survived = rebuilt.join(arity, ["mesh_id", "cell_id"]).filter(
        F.col("_n") == F.col("_arity")
    )
    # zero-arity cells emit no exploded rows, so the join above never
    # sees them — but "every real node survives" is VACUOUSLY true for
    # an empty cell (the padded/flat codecs' contract), and a pure
    # reordering like random_permutation must not delete cells
    empties = cells.filter(F.size(vs_col) == 0).select(
        "mesh_id", "cell_id", F.col(vs_col)
    )
    return survived.select("mesh_id", "cell_id", vs_col).unionByName(empties)


def wall_node_mask(
    displacements: DataFrame,
    threshold: float,
) -> DataFrame:
    """Classify nodes as wall (max |displacement - displacement_t0|
    over time < threshold).

    WallNodeFilter classification (reference ``wall_node.py:93-99``):
    input is long-format displacements(mesh_id, point_id, t, dx, dy,
    dz); delta vs the t0 sample uses a first_value window, then a
    per-node max — exactly the Q-W3 lag/first_value pattern.
    Returns (mesh_id, point_id, is_wall).
    """
    w = Window.partitionBy("mesh_id", "point_id").orderBy("t")
    delta = displacements.select(
        "mesh_id",
        "point_id",
        F.greatest(
            F.abs(F.col("dx") - F.first("dx").over(w)),
            F.abs(F.col("dy") - F.first("dy").over(w)),
            F.abs(F.col("dz") - F.first("dz").over(w)),
        ).alias("_dev"),
    )
    return delta.groupBy("mesh_id", "point_id").agg(
        (F.max("_dev") < F.lit(threshold)).alias("is_wall")
    )


def dense_renumber(
    keyed: DataFrame,
    *,
    strategy: str = "window",
) -> DataFrame:
    """(mesh_id, point_id) → dense 0..n-1 ids per mesh.

    strategy='window' uses ``row_number`` over a per-mesh window —
    correct everywhere, but Spark puts a whole mesh in one task (fine
    for millions of points per mesh).  strategy='distributed' does a
    distributed sort + ``zipWithIndex`` + per-mesh offset subtraction,
    so a single billion-point mesh spreads over the cluster (the
    SURVEY §7 'connectivity remap at scale' concern).  Both produce
    identical ids.
    """
    if strategy == "window":
        w = Window.partitionBy("mesh_id").orderBy("point_id")
        return keyed.select(
            "mesh_id", "point_id", (F.row_number().over(w) - 1).alias("new_point_id")
        )
    if strategy != "distributed":
        raise ValueError(f"unknown strategy {strategy!r}")
    ordered = keyed.select("mesh_id", "point_id").orderBy("mesh_id", "point_id")
    spark = keyed.sparkSession
    indexed = spark.createDataFrame(
        ordered.rdd.zipWithIndex().map(
            lambda r: (r[0]["mesh_id"], r[0]["point_id"], r[1])
        ),
        "mesh_id long, point_id long, _gidx long",
    )
    offsets = indexed.groupBy("mesh_id").agg(F.min("_gidx").alias("_off"))
    return indexed.join(F.broadcast(offsets), "mesh_id").select(
        "mesh_id",
        "point_id",
        (F.col("_gidx") - F.col("_off")).alias("new_point_id"),
    )


def drop_wall_nodes(
    points: DataFrame,
    cells: DataFrame,
    mask: DataFrame,
    vs_col: str = "vs",
    *,
    renumber_strategy: str = "window",
) -> tuple[DataFrame, DataFrame]:
    """Drop wall nodes, renumber survivors densely, remap connectivity.

    Dense renumbering = row_number over kept nodes ordered by old id
    (reference ``wall_node.py:137-138`` builds the same index map with
    ``np.cumsum``).  Returns (new_points, new_cells).
    """
    kept = points.join(
        mask.filter(~F.col("is_wall")).select("mesh_id", "point_id"),
        ["mesh_id", "point_id"],
        "left_semi",
    )
    remap = dense_renumber(
        kept.select("mesh_id", "point_id"), strategy=renumber_strategy
    )
    new_points = (
        kept.join(remap, ["mesh_id", "point_id"])
        .drop("point_id")
        .withColumnRenamed("new_point_id", "point_id")
    )
    new_cells = remap_connectivity(cells, remap, vs_col)
    return new_points, new_cells


def cells_from_padded(cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """−1-padded fixed-arity connectivity → native variable-arity ``vs``.

    The reference stores mixed-type cells as an (E, max_arity) tensor
    padded with −1 sentinels (reference ``domains/mesh/filters/
    wall_node.py:127-151``); this engine's native encoding is a
    variable-length array, so ingesting a padded table just strips the
    sentinels.  Remap/drop semantics then coincide with the reference's
    "a cell is valid iff every *real* node survives" rule for free —
    padding entries never join the node map.
    """
    return cells.withColumn(vs_col, F.filter(F.col(vs_col), lambda v: v >= 0))


def cells_to_padded(cells: DataFrame, arity: int, vs_col: str = "vs") -> DataFrame:
    """Native ``vs`` arrays → −1-padded fixed-arity encoding (the exact
    inverse of :func:`cells_from_padded`, for writing back to consumers
    of the reference's padded tensor layout).

    A cell whose arity exceeds the target cannot be represented in the
    fixed-arity tensor; emitting it over-length would silently break the
    (E, max_arity) contract downstream, so it raises at evaluation time.
    """
    vs_sz = F.size(vs_col)
    pad = F.array_repeat(F.lit(-1).cast("long"), arity - vs_sz)
    guard = F.assert_true(
        vs_sz <= F.lit(arity),
        F.format_string(
            "cells_to_padded: cell arity %s exceeds target arity "
            + str(arity),
            vs_sz.cast("string"),
        ),
    )
    return cells.withColumn(
        vs_col, F.when(guard.isNull(), F.concat(F.col(vs_col), pad))
    )


def cells_from_flat(flat: DataFrame, offsets: DataFrame) -> DataFrame:
    """Flat mixed connectivity → native ``vs`` arrays.

    The reference's second mixed encoding (``wall_node.py:157-227``)
    keeps one flat node-id stream plus per-cell [start, end) offsets
    and a cell-type vector.  Tabular form here:
    ``flat(mesh_id, pos, point_id)`` and ``offsets(mesh_id, cell_id,
    start, end, cell_type)``.  Each offset row explodes to its
    positions (linear, no range join) and re-assembles slot-ordered
    arrays — one shuffle keyed on (mesh_id, pos).
    """
    # sequence(start, end-1) on a zero-arity cell (start == end) would
    # auto-step -1 and fabricate a bogus 2-slot span, so degenerate
    # offsets are excluded from the explode and re-attached as empty
    # cells afterwards (preserving cells_to_flat round-trips).
    span = offsets.where(F.col("end") > F.col("start")).select(
        "mesh_id",
        "cell_id",
        "cell_type",
        F.posexplode(F.sequence(F.col("start"), F.col("end") - 1)).alias(
            "slot", "pos"
        ),
    )
    pid_type = flat.schema["point_id"].dataType.simpleString()
    assembled = span.join(flat, ["mesh_id", "pos"]).groupBy(
        "mesh_id", "cell_id", "cell_type"
    ).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("slot"), F.col("point_id")))
            ),
            lambda s: s.getField("point_id"),
        ).alias("vs")
    )
    empties = offsets.where(F.col("end") <= F.col("start")).select(
        "mesh_id",
        "cell_id",
        "cell_type",
        F.expr(f"cast(array() as array<{pid_type}>)").alias("vs"),
    )
    return assembled.unionByName(empties)


def cells_to_flat(cells: DataFrame, vs_col: str = "vs") -> tuple[DataFrame, DataFrame]:
    """Native ``vs`` arrays → (flat, offsets) mixed encoding.

    Offsets are the running sum of cell arities in cell-id order
    (reference rebuilds them the same way after a drop,
    ``wall_node.py:195-210``); positions are start + slot.  The window
    runs per mesh — fine for millions of cells per mesh; use the
    distributed prefix-sum (operators.ranking) to flatten a single
    billion-cell mesh.
    """
    w = (
        Window.partitionBy("mesh_id")
        .orderBy("cell_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs = cells.select(
        "mesh_id",
        "cell_id",
        *(["cell_type"] if "cell_type" in cells.columns else []),
        (F.sum(F.size(vs_col)).over(w) - F.size(vs_col)).alias("start"),
        F.sum(F.size(vs_col)).over(w).alias("end"),
    )
    flat = (
        cells.select("mesh_id", "cell_id", F.posexplode(vs_col).alias("slot", "point_id"))
        .join(offs.select("mesh_id", "cell_id", "start"), ["mesh_id", "cell_id"])
        .select("mesh_id", (F.col("start") + F.col("slot")).alias("pos"), "point_id")
    )
    return flat, offs


def tessellate_fan(cells: DataFrame, vs_col: str = "vs") -> DataFrame:
    """Fan-tessellate polygons into triangles.

    Reference ``_vtk_convert.py:228-309``: an n-gon (v0..v_{n-1})
    becomes n-2 triangles (v0, v_i, v_{i+1}); triangles pass through.
    One generator (posexplode of the fan index), no shuffle; new cell
    ids are (cell_id, fan_index) re-keyed densely per mesh only if the
    caller needs density (keep the composite key at scale).
    """
    n = F.size(vs_col)
    # extra columns (region tags from boundary injection, cell_type
    # from the flat codec, field payloads) ride along untouched —
    # tessellation must not strip metadata
    extra = [c for c in cells.columns if c not in ("mesh_id", "cell_id", vs_col)]
    tris = cells.filter(n > 3).select(
        "mesh_id",
        "cell_id",
        *extra,
        F.col(vs_col).alias("_vs"),
        F.posexplode(F.sequence(F.lit(1), F.size(vs_col) - 2)).alias("fan_idx", "_i"),
    ).select(
        "mesh_id",
        "cell_id",
        *extra,
        "fan_idx",
        F.array(
            F.element_at("_vs", 1),
            F.element_at("_vs", F.col("_i") + 1),
            F.element_at("_vs", F.col("_i") + 2),
        ).alias(vs_col),
    )
    passthrough = cells.filter(n <= 3).select(
        "mesh_id", "cell_id", *extra, F.lit(0).alias("fan_idx"), F.col(vs_col)
    )
    return passthrough.unionByName(tris)


def mesh_info(
    points: DataFrame,
    cells: DataFrame,
    point_data: DataFrame | None = None,
    vs_col: str = "vs",
) -> DataFrame:
    """Per-mesh metadata record (MeshInfoFilter, reference
    ``domains/mesh/filters/mesh_info.py:94-382``): counts, field
    inventory, approximate byte sizes — one row per mesh, three
    hash-aggregates joined on mesh_id."""
    p = points.groupBy("mesh_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.count(F.lit(1)) * 3 * 8).alias("points_nbytes"),
    )
    c = cells.groupBy("mesh_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.size(vs_col)).alias("n_corners"),
        F.min(F.size(vs_col)).alias("arity_min"),
        F.max(F.size(vs_col)).alias("arity_max"),
    )
    out = p.join(c, "mesh_id", "full")
    if point_data is not None:
        f = point_data.groupBy("mesh_id").agg(
            F.array_sort(F.collect_set("field")).alias("fields"),
            F.countDistinct("field").alias("n_fields"),
            (F.count(F.lit(1)) * 8).alias("point_data_nbytes"),
        )
        out = out.join(f, "mesh_id", "left")
    return out


def stack_timesteps(
    displacements: DataFrame,
    value_cols: tuple[str, str, str] = ("dx", "dy", "dz"),
) -> DataFrame:
    """Stack per-timestep displacement rows into one ordered trajectory
    array per point — the MeshZarrSink ``mesh_pos (T,N,3)``
    reconstruction (reference ``domains/mesh/sinks/mesh_zarr.py:
    105-381``) in long→array form.  Order is guaranteed by sorting the
    collected (t, vec) structs, not by input row order (which a shuffle
    may permute)."""
    dx, dy, dz = (F.col(c) for c in value_cols)
    return displacements.groupBy("mesh_id", "point_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.array(dx, dy, dz).alias("v")))
            ),
            lambda s: s.getField("v"),
        ).alias("trajectory"),
        F.count(F.lit(1)).alias("n_timesteps"),
    )


def inject_box_boundary(
    points: DataFrame,
    cells: DataFrame,
    *,
    margin: float = 0.0,
    vs_col: str = "vs",
) -> tuple[DataFrame, DataFrame]:
    """Synthesize a box-tunnel outer boundary around each mesh and merge
    it in with a ``region`` tag.

    BoundaryInjectionFilter semantics (reference ``domains/mesh/
    filters/boundary_injection.py:44-163``, box generator at
    ``boundaries/generators.py:44-188``): per-mesh bounding box → 8
    corner points + 6 quad faces, appended by unionByName with
    region='boundary.box' while interior rows get region='interior'
    (the reference's own field-key prefixes, ``stats.py:474-496``).
    The bbox is one aggregate; the generated geometry is 8 rows per
    mesh — driver math never touches the big tables.
    """
    bbox = points.groupBy("mesh_id").agg(
        (F.min("x") - margin).alias("x0"),
        (F.max("x") + margin).alias("x1"),
        (F.min("y") - margin).alias("y0"),
        (F.max("y") + margin).alias("y1"),
        (F.min("z") - margin).alias("z0"),
        (F.max("z") + margin).alias("z1"),
        (F.max("point_id") + 1).alias("_base"),
    )
    # 8 corners: point_id = base + corner index (bit pattern zyx)
    corner = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k")
    corners = bbox.select("mesh_id", "x0", "x1", "y0", "y1", "z0", "z1", "_base", corner)
    k = F.col("k")
    boundary_points = corners.select(
        "mesh_id",
        (F.col("_base") + k).alias("point_id"),
        F.when(k.bitwiseAND(1) == 0, F.col("x0")).otherwise(F.col("x1")).alias("x"),
        F.when(k.bitwiseAND(2) == 0, F.col("y0")).otherwise(F.col("y1")).alias("y"),
        F.when(k.bitwiseAND(4) == 0, F.col("z0")).otherwise(F.col("z1")).alias("z"),
        F.lit("boundary.box").alias("region"),
    )
    # 6 quad faces in corner-index space (zyx bit pattern)
    faces = [
        [0, 2, 6, 4],  # x = x0
        [1, 3, 7, 5],  # x = x1
        [0, 1, 5, 4],  # y = y0
        [2, 3, 7, 6],  # y = y1
        [0, 1, 3, 2],  # z = z0
        [4, 5, 7, 6],  # z = z1
    ]
    base_cells = cells.groupBy("mesh_id").agg((F.max("cell_id") + 1).alias("_cbase"))
    face_arrays = F.array(*[F.array(*[F.lit(v) for v in face]) for face in faces])
    boundary_cells = (
        bbox.select("mesh_id", "_base")
        # left + coalesce: a mesh with zero cells (point cloud) must
        # still get its boundary faces, starting at cell id 0
        .join(base_cells, "mesh_id", "left")
        .withColumn("_cbase", F.coalesce("_cbase", F.lit(0)))
        .select(
            "mesh_id", "_base", "_cbase", F.posexplode(face_arrays).alias("_fidx", "face")
        )
        .select(
            "mesh_id",
            (F.col("_cbase") + F.col("_fidx")).alias("cell_id"),
            F.transform(F.col("face"), lambda v: v + F.col("_base")).alias(vs_col),
            F.lit("boundary.box").alias("region"),
        )
    )
    all_points = points.withColumn("region", F.lit("interior")).unionByName(
        boundary_points
    )
    all_cells = cells.withColumn("region", F.lit("interior")).unionByName(
        boundary_cells
    )
    return all_points, all_cells


def inject_hemisphere_boundary(
    points: DataFrame,
    cells: DataFrame,
    *,
    rings: int = 6,
    segments: int = 16,
    margin: float = 0.0,
    vs_col: str = "vs",
) -> tuple[DataFrame, DataFrame]:
    """Synthesize a triangulated hemisphere dome over each mesh and
    merge it in with a ``region`` tag.

    The hemisphere generator of BoundaryInjectionFilter (reference
    ``boundaries/generators.py:44-188``): dome centered on the bbox
    footprint, radius covering the bbox diagonal + margin.  Geometry is
    parametric — ``rings × segments`` lat/lon points + a pole, two
    triangles per quad strip and a pole fan — generated entirely as
    column math from one per-mesh bbox aggregate (tiny), then
    unionByName'd with region='boundary.hemisphere'.
    """
    # radius covers the full 3-D bbox half-diagonal: footprint-only
    # sizing let any mesh taller than wide poke through the dome
    half = F.sqrt(
        (F.col("x1") - F.col("x0")) ** 2
        + (F.col("y1") - F.col("y0")) ** 2
        + (F.col("z1") - F.col("zb")) ** 2
    ) / 2.0
    bbox = points.groupBy("mesh_id").agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
        F.min("z").alias("zb"),
        F.max("z").alias("z1"),
        (F.max("point_id") + 1).alias("_base"),
    ).select(
        "mesh_id",
        ((F.col("x0") + F.col("x1")) / 2).alias("cx"),
        ((F.col("y0") + F.col("y1")) / 2).alias("cy"),
        F.col("zb"),
        (half + F.lit(margin)).alias("r"),
        "_base",
    )

    import math as _math

    # points: ring r ∈ [0, rings): polar θ = (π/2)·(1 − r/rings); seg s ∈ [0, segments)
    rs = bbox.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(rings * segments - 1))).alias("k"),
    )
    ring = (F.col("k") / segments).cast("long")
    seg = F.col("k") % segments
    theta = F.lit(_math.pi / 2) * (1.0 - ring.cast("double") / rings)
    phi = F.lit(2 * _math.pi) * seg.cast("double") / segments
    dome_points = rs.select(
        "mesh_id",
        (F.col("_base") + F.col("k")).alias("point_id"),
        (F.col("cx") + F.col("r") * F.sin(theta) * F.cos(phi)).alias("x"),
        (F.col("cy") + F.col("r") * F.sin(theta) * F.sin(phi)).alias("y"),
        (F.col("zb") + F.col("r") * F.cos(theta)).alias("z"),
        F.lit("boundary.hemisphere").alias("region"),
    )
    pole = bbox.select(
        "mesh_id",
        (F.col("_base") + rings * segments).alias("point_id"),
        F.col("cx").alias("x"),
        F.col("cy").alias("y"),
        (F.col("zb") + F.col("r")).alias("z"),
        F.lit("boundary.hemisphere").alias("region"),
    )

    # cells: strip quads split into two triangles + pole fan
    base_cells = cells.groupBy("mesh_id").agg((F.max("cell_id") + 1).alias("_cbase"))
    n_strip = (rings - 1) * segments
    geom = bbox.join(base_cells, "mesh_id", "left").withColumn(
        "_cbase", F.coalesce("_cbase", F.lit(0))
    ).select(
        "mesh_id",
        "_base",
        "_cbase",
        F.explode(F.sequence(F.lit(0), F.lit(n_strip * 2 + segments - 1))).alias("t"),
    )
    t = F.col("t")
    is_fan = t >= n_strip * 2
    quad = (t / 2).cast("long")
    q_ring = (quad / segments).cast("long")
    q_seg = quad % segments
    nxt = (q_seg + 1) % segments

    def pid(r, s):
        return F.col("_base") + r * segments + s

    pole_id = F.col("_base") + rings * segments
    fan_seg = t - n_strip * 2
    fan_nxt = (fan_seg + 1) % segments
    tri_even = F.array(pid(q_ring, q_seg), pid(q_ring, nxt), pid(q_ring + 1, q_seg))
    tri_odd = F.array(pid(q_ring, nxt), pid(q_ring + 1, nxt), pid(q_ring + 1, q_seg))
    tri_fan = F.array(pid(F.lit(rings - 1), fan_seg), pid(F.lit(rings - 1), fan_nxt), pole_id)
    dome_cells = geom.select(
        "mesh_id",
        (F.col("_cbase") + t).alias("cell_id"),
        F.when(is_fan, tri_fan)
        .when(t % 2 == 0, tri_even)
        .otherwise(tri_odd)
        .alias(vs_col),
        F.lit("boundary.hemisphere").alias("region"),
    )

    all_points = (
        points.withColumn("region", F.lit("interior"))
        .unionByName(dome_points)
        .unionByName(pole)
    )
    all_cells = cells.withColumn("region", F.lit("interior")).unionByName(dome_cells)
    return all_points, all_cells


def random_permutation(
    points: DataFrame,
    cells: DataFrame,
    seed: int,
    vs_col: str = "vs",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic seeded shuffle of point order + consistent
    connectivity remap.

    RandomPermutationFilter semantics (reference ``domains/mesh/
    filters/random_permutation.py:141-275``).  Determinism under
    partitioning: the permutation keys on ``xxhash64(point_id, seed)``
    — a pure function of stable row identity, never partition-local
    ``rand()`` (SURVEY.md §7 "what's hard").
    """
    w = Window.partitionBy("mesh_id").orderBy(
        F.xxhash64(F.col("point_id"), F.lit(seed)), F.col("point_id")
    )
    remap = points.select(
        "mesh_id", "point_id", (F.row_number().over(w) - 1).alias("new_point_id")
    )
    new_points = (
        points.join(remap, ["mesh_id", "point_id"])
        .drop("point_id")
        .withColumnRenamed("new_point_id", "point_id")
    )
    new_cells = remap_connectivity(cells, remap, vs_col)
    return new_points, new_cells


def triangulate_loops(
    loops: DataFrame,
    *,
    loop_col: str = "loop_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Constrained-Delaunay triangulate each closed 2-D loop into cells.

    The silhouette-loop patch triangulation of BoundaryInjectionFilter
    (reference ``boundaries/_geometry.py:356-601``, which delegates to a
    constrained Delaunay): input is a long table of ordered loop
    vertices ``(loop_id, seq, x, y)``; output is ``(loop_id, cell_id,
    vs)`` triangles whose vertex ids are the input ``seq`` values, so
    they remap directly onto the mesh's point ids.

    Execution: grouped ``applyInPandas`` — one numpy CDT per loop, many
    loops in parallel.  Loops are boundary patches (hundreds of
    vertices), so the O(n²) per-group kernel is bounded; scale comes
    from the number of patches, which Spark distributes.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    from ..functions.geometry import constrained_delaunay

    # mirror the input key's dtype (like cells_from_flat does): a
    # hardcoded string loop_id breaks the documented join back onto
    # numeric mesh keys
    loop_type = dict(loops.dtypes)[loop_col]
    schema = f"{loop_col} {loop_type}, cell_id long, vs array<long>"

    def _tri(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        poly = pdf[[x_col, y_col]].to_numpy(dtype=float)
        seqs = pdf[seq_col].to_numpy()
        tris = constrained_delaunay(poly)
        return pd.DataFrame(
            {
                loop_col: [pdf[loop_col].iloc[0]] * len(tris),
                "cell_id": range(len(tris)),
                "vs": [[int(seqs[i]) for i in t] for t in tris],
            }
        )

    return loops.groupBy(loop_col).applyInPandas(_tri, schema)
