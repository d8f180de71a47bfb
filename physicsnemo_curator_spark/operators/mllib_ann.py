"""IVF-style approximate nearest neighbor via MLlib KMeans.

The coarse-quantizer path for similarity search at 100 TB (north star:
"DataFrame ops with MLlib for dataset preprocessing"): train KMeans on
a sample, assign every corpus vector to its nearest centroid (the IVF
cell), and answer queries by scoring only the ``n_probe`` closest
cells.  Complements the hyperplane-LSH path in
:mod:`physicsnemo_curator_spark.operators.similarity`:

- LSH: no training, recall from band amplification — best for
  streaming ingest and dedup.
- IVF: data-adaptive cells, tunable recall/cost via n_probe — best for
  repeated queries against a static corpus (cells persist as a
  bucketed table; each query touches n_probe/k of the data).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators.similarity import _vec_dim, cosine_unrolled


def train_ivf(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 20,
) -> KMeansModel:
    """Train the coarse quantizer.  At 100 TB, fit on a sample —
    centroid quality needs thousands of points per cell, not billions."""
    train = corpus
    if sample_fraction is not None:
        train = corpus.sample(fraction=sample_fraction, seed=seed)
    feats = train.select(array_to_vector(F.col(vec_col)).alias("features"))
    km = KMeans(k=k, seed=seed, featuresCol="features", maxIter=max_iter)
    return km.fit(feats)


def assign_cells(
    df: DataFrame, model: KMeansModel, *, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF cell id.  The prediction is a pure vector op; the
    result is the partitioning/bucketing key for the corpus table."""
    feats = df.withColumn("features", array_to_vector(F.col(vec_col)))
    out = model.transform(feats).withColumnRenamed("prediction", "cell")
    return out.drop("features")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    model: KMeansModel,
    k: int = 10,
    *,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in each query's n_probe
    nearest cells.

    The query→cell distance ranking happens on the (tiny) broadcast
    centroid table; the corpus-side join keys on cell, so the scan
    reads ~n_probe/k of the corpus per query batch (with the corpus
    stored partitioned by cell, that's partition pruning).
    """
    centers = model.clusterCenters()
    dim = _vec_dim(corpus, vec_col)
    centroids = queries.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        f"cell int, centroid array<double>",
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    # rank cells per query by cosine to centroid; keep n_probe
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "_qvec",
        "cell",
        cosine_unrolled(F.col("_qvec"), F.col("centroid"), dim).alias("_cc"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cc"), F.asc("cell"))
    probed = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "_qvec", "cell")
    )
    cells = assign_cells(corpus, model, vec_col=vec_col)
    scored = cells.join(F.broadcast(probed), "cell").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_unrolled(F.col(vec_col), F.col("_qvec"), dim).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
