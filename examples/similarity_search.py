#!/usr/bin/env python
"""Similarity-search family tour: one corpus, six strategies.

Runs the whole ANN ladder over the ``embeddings`` table and prints
per-strategy wall time and recall@10 against the exact baseline —
the decision table a pipeline owner actually needs:

  exact      brute-force cosine (the baseline; O(corpus) per query)
  lsh        random-hyperplane bands — no training, streaming-friendly
  ivf        coarse cells, n_probe/k_cells of the corpus per query
  sq8        8-bit scalar quantization — 4-8x smaller scan, same plan
  pq         product quantization — ~32x smaller codes, LUT scoring
  ivfpq      cells bound the scan AND codes bound the bytes (the
             billion-scale composition); exact re-rank on the short list

Usage: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators import mllib_ann, similarity  # noqa: E402
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="similarity-tour", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # offline artifacts a deployment would persist: IVF centroids,
    # PQ codebooks, SQ8 codebook — all deterministic here
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    sq8_cb = similarity.sq8_train(emb, dim=64)

    strategies = {
        "exact": lambda: similarity.cosine_topk(emb, qs, k=10, dim=64),
        "lsh": lambda: similarity.lsh_topk(emb, qs, dim=64, k=10),
        "ivf": lambda: mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=3),
        "sq8": lambda: similarity.sq8_topk(
            emb, qs, k=10, dim=64, codebook=sq8_cb, rescore=2
        ),
        "pq": lambda: mllib_ann.pq_topk(
            emb, qs, k=10, dim=64, codebooks=cbs, rescore=2
        ),
        "ivfpq": lambda: mllib_ann.ivfpq_topk(
            emb, qs, centers, k=10, n_probe=3, codebooks=cbs, rescore=2
        ),
    }

    baseline: set[tuple[int, int]] = set()
    print(f"corpus: {n} vectors, 10 queries, k=10\n")
    print(f"{'strategy':<10} {'wall_s':>7} {'recall@10':>10}")
    for name, fn in strategies.items():
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        got = {(r["query_id"], r["vec_id"]) for r in rows}
        if name == "exact":
            baseline = got
            recall = 1.0
        else:
            recall = len(got & baseline) / len(baseline)
        print(f"{name:<10} {dt:>7.2f} {recall:>10.2f}")

    # the maintenance story: persist the IVF-PQ index once, then serve
    # probes from the store (codes only, partition-pruned to the
    # probed cells) and APPEND new corpus batches between retrains —
    # the quantizers above stay fixed for the store's life
    import tempfile

    store = os.path.join(
        tempfile.mkdtemp(prefix="pcs_tour_"), "ivfpq_index"
    )
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    late = emb.filter(F.col("vec_id") % 2 == 1)
    mllib_ann.write_ivfpq_index(seed, centers, cbs, store)
    mllib_ann.save_quantizers(store, centers, cbs)  # codes are
    # unreadable without the exact quantizers they were encoded with
    mllib_ann.write_ivfpq_index(
        late, centers, cbs, store, mode="append", batch_id="batch-1"
    )
    # periodic maintenance: merge accumulated batch partitions into one
    # generation (latest-write-wins conflict resolution applied first;
    # committed by an atomic _CURRENT pointer flip, object-store style)
    mllib_ann.compact_ivfpq_index(spark, store)
    st = mllib_ann.ivfpq_index_stats(spark, store)
    print(
        f"index: gen={st['generation']} rows={st['n_rows']} "
        f"cells={st['n_cells']} pending={st['pending_superseded']}"
    )
    # with_perm=True also returns the subspace permutation when the
    # store was encoded with one (probing without it is silently
    # garbage, so the legacy 2-tuple call REFUSES transform-carrying
    # sidecars).  The consumer-side serving call loads quantizers AND
    # the stamped encode transform (perm or OPQ rotation) from the
    # store's own sidecar — no hand-carried config to get wrong.
    t0 = time.perf_counter()
    served = mllib_ann.ivfpq_index_search(
        spark, qs, store, k=10, n_probe=3, rescore=2, corpus=emb
    ).collect()
    dt = time.perf_counter() - t0
    got = {(r["query_id"], r["vec_id"]) for r in served}
    print(
        f"{'ivfpq-idx':<10} {dt:>7.2f} "
        f"{len(got & baseline) / len(baseline):>10.2f}"
        "   (persisted store: seed + appended batch)"
    )

    # post-retrieval shaping: RRF fuses rankers without score
    # calibration; MMR trades a little relevance for coverage
    exact20 = similarity.cosine_topk(emb, qs, k=20, dim=64)
    sq820 = similarity.sq8_topk(emb, qs, k=20, dim=64, codebook=sq8_cb)
    fused = similarity.rrf_fuse([exact20, sq820], k=10).collect()
    mmr = similarity.mmr_rerank(
        emb,
        qs,
        exact20.filter(F.col("vec_id") != F.col("query_id")).select(
            "query_id", "vec_id"
        ),
        k=10,
        lamb=0.5,
    ).collect()
    print(f"\nrrf fused rows: {len(fused)}; mmr diversified rows: {len(mmr)}")


if __name__ == "__main__":
    main()
