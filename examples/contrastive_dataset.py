#!/usr/bin/env python
"""Contrastive training-set construction — the r12 retrieval family
composed end to end:

  1. semantic dedup     drop near-duplicate embeddings (SemDeDup)
  2. cluster sampling   cap each region's contribution (coverage)
  3. hard negatives     per kept anchor, the top-k most-similar
                        DIFFERENT-label vectors (the DPR recipe)
  4. drift check        curated-vs-raw per-dimension distribution
                        shift — curation must not silently skew the
                        embedding distribution

Usage: python examples/contrastive_dataset.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators import mllib_ann, similarity  # noqa: E402
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="contrastive-dataset", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_raw = emb.count()
    centers = mllib_ann.md5_sample_centroids(emb, k=8)

    # 1. SemDeDup: drop vectors with a too-similar lower-id
    # cluster-mate (0.35 matches the q_semantic_dedup gate; this
    # synthetic corpus has no pairs above cosine ~0.6, so a production
    # 0.9 threshold would drop nothing here)
    keep = mllib_ann.semantic_dedup(emb, centers, threshold=0.35).filter(
        F.col("keep")
    )
    deduped = emb.join(keep.select("vec_id"), "vec_id")
    n_dedup = deduped.count()

    # 2. cluster-balanced sample: cap each cell's contribution
    per_cell = max(2, n_dedup // 16)
    picked = mllib_ann.cluster_balanced_sample(
        deduped, centers, n_per_cell=per_cell
    )
    anchors_base = deduped.join(picked.select("vec_id"), "vec_id")
    n_anchor = anchors_base.count()

    # 3. hard negatives: for each kept anchor, the 4 most-similar
    # vectors with a DIFFERENT label (mined from the FULL deduped
    # corpus, not just the sample)
    anchors = anchors_base.select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    negatives = similarity.hard_negatives(deduped, anchors, k=4, dim=64)
    n_neg = negatives.count()

    # 4. drift check: the curated subset must track the raw corpus
    drift = similarity.embedding_drift(emb, anchors_base)
    worst = drift.agg(
        F.max("mean_shift").alias("max_shift"),
        F.min("std_ratio").alias("min_ratio"),
        F.max("std_ratio").alias("max_ratio"),
    ).collect()[0]

    print(f"raw vectors:        {n_raw}")
    print(f"after SemDeDup:     {n_dedup}")
    print(f"anchors sampled:    {n_anchor} (<= {per_cell}/cell)")
    print(f"hard negatives:     {n_neg} (4 per anchor, label-disjoint)")
    print(
        "curated-vs-raw drift: "
        f"max mean_shift {worst['max_shift']:.3f}, "
        f"std_ratio in [{worst['min_ratio']:.3f}, {worst['max_ratio']:.3f}]"
    )


if __name__ == "__main__":
    main()
