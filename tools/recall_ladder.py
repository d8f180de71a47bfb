"""Recall ladder: measure recall@k of every ANN strategy vs exact.

Pins the quality story of the similarity family (exact / LSH / IVF /
SQ8 / PQ / IVF-PQ, each with and without the exact re-rank tail) at
the gate parameters, so a quantization regression shows up as a recall
drop in RECALL.md — and fails loudly via the floors asserted in
tests/test_mllib_ann.py.

    python tools/recall_ladder.py [sf_dir ...]

Defaults to sf0.1.  Prints one markdown table row per strategy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mllib_ann, similarity
from physicsnemo_curator_spark.sources.tables import load_table

K = 10
NQ = 20


def strategies(emb, centers, cbs, cbs_lloyd):
    """name -> thunk returning the strategy's top-K frame (gate
    parameters: 8 md5-sample cells, n_probe=3, m=8, ks=16)."""

    def qs():
        return emb.filter(F.col("vec_id") < NQ).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    return {
        "lsh (8 bands x 4 bits)": lambda: similarity.lsh_topk(
            emb, qs(), 64, k=K
        ),
        "ivf (8 cells, n_probe=3)": lambda: mllib_ann.ivf_topk(
            emb, qs(), centers, k=K, n_probe=3
        ),
        "sq8": lambda: similarity.sq8_topk(emb, qs(), k=K, dim=64),
        "sq8 + rescore=2": lambda: similarity.sq8_topk(
            emb, qs(), k=K, dim=64, rescore=2
        ),
        "pq (m=8, ks=16)": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs
        ),
        "pq + rescore=2": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs, rescore=2
        ),
        "pq + rescore=5": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs, rescore=5
        ),
        "pq lloyd (m=8, ks=16)": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs_lloyd
        ),
        "pq lloyd + rescore=5": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs_lloyd, rescore=5
        ),
        "ivfpq (n_probe=3)": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs
        ),
        "ivfpq + rescore=2": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs, rescore=2
        ),
        "ivfpq + rescore=5": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs, rescore=5
        ),
    }


def recall_table(spark, sf_dir: str) -> dict[str, float]:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    cbs_lloyd = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64)
    exact = {}
    for r in similarity.cosine_topk(emb, qs, k=K, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    print(f"\n## {sf_dir} ({n} vectors, {len(exact)} queries, k={K})\n")
    print("| strategy | recall@10 | wall s |")
    print("|---|---|---|")
    out = {}
    for name, thunk in strategies(emb, centers, cbs, cbs_lloyd).items():
        t0 = time.perf_counter()
        got = {}
        for r in thunk().collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        wall = time.perf_counter() - t0
        rec = sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)
        out[name] = rec
        print(f"| {name} | {rec:.3f} | {wall:.2f} |")
    return out


if __name__ == "__main__":
    from physicsnemo_curator_spark.session import get_spark

    spark = get_spark(app_name="recall-ladder")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        recall_table(spark, sf_dir)
