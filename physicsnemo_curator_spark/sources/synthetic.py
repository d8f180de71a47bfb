"""Seeded synthetic sources (test fixtures).

Parity with the reference's random sources (``domains/mesh/sources/
random.py:39-160``, ``domains/da/sources/random.py``, ``domains/atm/
sources/random.py``): deterministic given a seed, sized by params.
Determinism under partitioning: every random value is a pure function
of stable row ids via ``xxhash64(id, seed)`` — never partition-local
``rand()`` (SURVEY §7 "what's hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u(col, seed: int, salt: int):
    """Uniform [0,1) from a stable id — hash-based, partition-invariant."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.abs(h) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def random_mesh(
    spark: SparkSession,
    *,
    n_meshes: int = 2,
    n_points: int = 100,
    n_cells: int = 150,
    n_timesteps: int = 0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Synthetic tet-ish meshes → (points, cells, displacements).

    points(mesh_id, point_id, x, y, z); cells(mesh_id, cell_id, vs);
    displacements(mesh_id, point_id, t, dx, dy, dz) when n_timesteps>0.
    """
    base = spark.range(n_meshes * n_points).select(
        (F.col("id") / n_points).cast("long").alias("mesh_id"),
        (F.col("id") % n_points).alias("point_id"),
        F.col("id").alias("_gid"),
    )
    points = base.select(
        "mesh_id",
        "point_id",
        _u(F.col("_gid"), seed, 1).alias("x"),
        _u(F.col("_gid"), seed, 2).alias("y"),
        _u(F.col("_gid"), seed, 3).alias("z"),
    )

    cbase = spark.range(n_meshes * n_cells).select(
        (F.col("id") / n_cells).cast("long").alias("mesh_id"),
        (F.col("id") % n_cells).alias("cell_id"),
        F.col("id").alias("_gid"),
    )
    vs = F.array(
        *[
            (F.abs(F.xxhash64(F.col("_gid"), F.lit(seed), F.lit(10 + k))) % n_points)
            for k in range(4)
        ]
    )
    cells = cbase.select("mesh_id", "cell_id", vs.alias("vs"))

    if n_timesteps <= 0:
        return points, cells, None

    disp = (
        base.crossJoin(spark.range(n_timesteps).select(F.col("id").alias("t")))
        .select(
            "mesh_id",
            "point_id",
            "t",
            # concat_ws: a bare concat collides ('1'+'12' == '11'+'2'),
            # correlating displacements across distinct (point, t) pairs
            (_u(F.concat_ws(":", "_gid", "t"), seed, 21) * F.col("t")).alias("dx"),
            (_u(F.concat_ws(":", "_gid", "t"), seed, 22) * F.col("t")).alias("dy"),
            (_u(F.concat_ws(":", "_gid", "t"), seed, 23) * F.col("t")).alias("dz"),
        )
    )
    return points, cells, disp


def random_grid(
    spark: SparkSession,
    *,
    n_times: int = 4,
    n_lat: int = 10,
    n_lon: int = 20,
    variables: tuple[str, ...] = ("t2m", "u10"),
    seed: int = 42,
) -> DataFrame:
    """Synthetic gridded table grid(time_idx, variable, lat, lon, value)
    — the long-table encoding of an (time, variable, lat, lon) DataArray
    (SURVEY §1.2b)."""
    cells = (
        spark.range(n_times)
        .select(F.col("id").alias("time_idx"))
        .crossJoin(spark.range(n_lat).select(F.col("id").alias("lat")))
        .crossJoin(spark.range(n_lon).select(F.col("id").alias("lon")))
        .crossJoin(
            spark.createDataFrame([(v,) for v in variables], ["variable"])
        )
    )
    gid = F.concat_ws(":", "time_idx", "variable", "lat", "lon")
    return cells.select(
        "time_idx", "variable", "lat", "lon", _u(gid, seed, 1).alias("value")
    )


def random_atomic(
    spark: SparkSession,
    *,
    n_systems: int = 5,
    max_atoms: int = 20,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Synthetic molecular systems → (systems, atoms) vertex tables
    (SURVEY §1.2c encoding)."""
    if max_atoms < 2:
        raise ValueError("max_atoms must be >= 2 (hash % (max_atoms-1))")
    systems = spark.range(n_systems).select(
        F.col("id").alias("system_id"),
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(1))) % (max_atoms - 1) + 2).alias(
            "natoms"
        ),
        (_u(F.col("id"), seed, 2) * -100.0).alias("energy"),
    )
    atoms = systems.select(
        "system_id", F.explode(F.sequence(F.lit(0), F.col("natoms") - 1)).alias("atom_id")
    )
    gid = F.concat_ws(":", "system_id", "atom_id")
    atoms = atoms.select(
        "system_id",
        "atom_id",
        (F.abs(F.xxhash64(gid, F.lit(seed), F.lit(3))) % 90 + 1).cast("int").alias("z"),
        F.array(
            _u(gid, seed, 4), _u(gid, seed, 5), _u(gid, seed, 6)
        ).alias("pos"),
    )
    return systems, atoms


def clustered_embeddings(
    spark: SparkSession,
    n: int,
    *,
    dim: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.2,
    seed: int = 7,
    decay: float = 0.0,
) -> DataFrame:
    """Mixture-of-Gaussians embeddings fixture — the CLUSTERED corpus
    geometry real embedding models produce (topical/visual clusters),
    as opposed to the driver's isotropic ``embeddings`` table whose
    pairwise cosines concentrate around 0 (the adversarial regime for
    every coarse quantizer — see RECALL.md).  Vector ``i`` belongs to
    cluster ``i % n_clusters``; its embedding is the cluster's unit-ish
    N(0,1) center plus per-dimension N(0, sigma²) noise.

    Every value derives from xxhash64 of (seed, cluster-or-row, dim,
    salt) via Box–Muller — partition-invariant and fully distributed
    (one codegen projection, no driver materialization), so the same
    fixture scales from the 500-row floor test to a soak corpus.
    ``decay > 0`` scales dimension ``j`` by ``(1+j)^-decay`` — the
    ANISOTROPIC (PCA-like) spectrum real embedding models produce
    after whitening-free training, where per-dimension variance falls
    off steeply.  This is the regime that breaks CONTIGUOUS PQ
    subspace slicing (the first subspace hoards all the variance) and
    that :func:`...operators.mllib_ann.subspace_permutation` exists
    for.  Output: ``(vec_id BIGINT, embedding ARRAY<FLOAT>)``, the
    similarity-family schema."""
    if n_clusters < 1 or dim < 1:
        raise ValueError("n_clusters and dim must be >= 1")

    def gauss(key, salt: int):
        # Box–Muller from two hash uniforms; u1 in (0,1] so ln() is
        # finite, u2 in [0,1)
        h1 = F.abs(F.xxhash64(key, F.lit(seed), F.lit(salt)))
        h2 = F.abs(F.xxhash64(key, F.lit(seed), F.lit(salt + 1)))
        u1 = (h1 % F.lit(1_000_000_007) + 1).cast("double") / 1_000_000_008.0
        u2 = (h2 % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0
        import math

        return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clusters).alias("_cl"),
    )
    # one codegen projection per row — no explode/groupBy shuffle
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pow(j + F.lit(1.0), F.lit(-float(decay)))
            * (
                gauss(F.concat_ws(":", F.col("_cl"), j), 1)
                + F.lit(float(sigma))
                * gauss(F.concat_ws(":", F.col("vec_id"), j), 3)
            )
        ).cast("float"),
    )
    return df.select("vec_id", emb.alias("embedding"))
