"""Similarity search over an embedding column (north star).

``embeddings(vec_id, embedding ARRAY<FLOAT>, label)``.

Two tiers:
- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the (huge) corpus; the dot product is a JVM-side
  higher-order function (``zip_with`` + ``aggregate``), no Python.
- ``lsh_topk`` — random-hyperplane LSH buckets shrink the candidate
  set first; exact cosine re-rank inside buckets.  The scale path:
  candidate-join shuffle keys on (band, bucket) instead of a cross
  join.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (JVM higher-order fns)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def l2(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2(a) * l2(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Broadcast-joins the query set (small) against the corpus (huge) —
    no corpus shuffle; the only wide op is the per-query top-k, done
    with a window over (query, score).  Deterministic tie-break on id.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-ish gaussian hyperplanes (driver-side, tiny)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signed_projection_bucket(vec: Column, plane: list[float]) -> Column:
    """Sign bit of <vec, plane> — one LSH bit."""
    expr = F.lit(0.0)
    for i, w_i in enumerate(plane):
        expr = expr + F.element_at(vec, i + 1).cast("double") * F.lit(w_i)
    return (expr >= 0).cast("int")


def lsh_buckets(
    df: DataFrame,
    dim: int,
    *,
    vec_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id (n_bits signs packed)."""
    planes = random_hyperplanes(dim, n_bits, seed)
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        bucket = bucket + signed_projection_bucket(F.col(vec_col), plane) * F.lit(1 << b)
    return df.withColumn("bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket, exact cosine
    re-rank inside the bucket.  Recall < 1 by construction; raise by
    lowering n_bits or probing neighboring buckets."""
    c = lsh_buckets(corpus, dim, vec_col=vec_col, n_bits=n_bits, seed=seed)
    q = lsh_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
        dim,
        vec_col="_qvec",
        n_bits=n_bits,
        seed=seed,
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def pairwise_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 6,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold).

    exact=True does the full self-join (test scale / oracle); the
    default buckets with LSH first so the self-join is bucket-local.
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    if not exact:
        dim_row = e.select(F.size("vec").alias("d")).first()
        e = lsh_buckets(e, dim_row["d"], vec_col="vec", n_bits=n_bits, seed=seed)
        join_cond = (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vec_id") < F.col("r.vec_id"))
    else:
        join_cond = F.col("l.vec_id") < F.col("r.vec_id")
    pairs = e.alias("l").join(e.alias("r"), join_cond).select(
        F.col("l.vec_id").alias("a"),
        F.col("r.vec_id").alias("b"),
        cosine(F.col("l.vec"), F.col("r.vec")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= F.lit(threshold))
