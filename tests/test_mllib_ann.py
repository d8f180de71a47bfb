"""IVF (KMeans) ANN: self-retrieval, recall vs exact, probe scaling."""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mllib_ann, similarity
from physicsnemo_curator_spark.sources.tables import load_table


def test_ivf_topk_recall(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = mllib_ann.train_ivf(emb, k=8)
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.cosine_topk(emb, qs, k=10).collect()}

    lo = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, model, k=10, n_probe=2).collect()}
    hi = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, model, k=10, n_probe=8).collect()}

    # every query finds itself even at low probe count
    assert all((q, q) in lo for q in range(5))
    # probing all cells == exact
    assert hi == exact
    # recall grows with n_probe
    assert len(lo & exact) <= len(hi & exact)
    assert len(lo & exact) / len(exact) >= 0.4


def test_assign_cells_partitions_corpus(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    model = mllib_ann.train_ivf(emb, k=8, sample_fraction=0.5)
    cells = mllib_ann.assign_cells(emb, model)
    sizes = cells.groupBy("cell").count().collect()
    assert sum(r["count"] for r in sizes) == emb.count()
    assert len(sizes) == 8


def test_ivf_sample_trainer_recall(spark, sf_correctness_dir):
    """Driver-sample numpy trainer feeds the same ivf_topk; full-probe
    equals exact, and every query retrieves itself."""
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.train_ivf_sample(emb, k=8, seed=7, sample_rows=256, iters=8)
    assert len(centers) == 8 and len(centers[0]) == 64

    exact = {(r["query_id"], r["vec_id"])
             for r in similarity.cosine_topk(emb, qs, k=10).collect()}
    hi = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=8).collect()}
    lo = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=2).collect()}
    assert hi == exact
    assert all((q, q) in lo for q in range(5))
    assert len(lo & exact) / len(exact) >= 0.4


def test_ivf_trainer_determinism(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    a = mllib_ann.train_ivf_sample(emb, k=4, seed=3, sample_rows=128, iters=4)
    b = mllib_ann.train_ivf_sample(emb, k=4, seed=3, sample_rows=128, iters=4)
    assert a == b
