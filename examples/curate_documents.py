#!/usr/bin/env python
"""End-to-end curation example: the LLM-training-data pipeline.

Raw documents → text features → quality gate → exact dedup →
near-dup removal (MinHash-LSH) → curated parquet + run ledger.
Mirrors the reference's Source → Filter* → Sink examples
(reference ``examples/``), expressed as this engine's operators.

Usage: python examples/curate_documents.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.core.metrics import MetricsStore  # noqa: E402
from physicsnemo_curator_spark.operators import dedup, textops  # noqa: E402
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_documents"

    spark = get_spark(app_name="curate-documents")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. features + quality gate (pure column math, runs in the scan stage)
    feats = textops.with_text_features(docs)
    gated = feats.filter(F.col("quality") >= 0.5)
    n1 = gated.count()

    # 2. exact dedup on the content fingerprint
    exact = dedup.dedup_exact(gated)
    n2 = exact.count()

    # 3. near-dup removal: MinHash-LSH pairs, drop the higher doc_id
    pairs = dedup.minhash_near_duplicates(exact, threshold=0.8)
    losers = pairs.select(F.col("b").alias("doc_id")).distinct()
    curated = exact.join(losers, "doc_id", "left_anti")
    n3 = curated.count()

    curated.write.mode("overwrite").parquet(os.path.join(out_dir, "documents"))

    print(
        f"documents: {n0} raw -> {n1} quality-gated -> {n2} exact-deduped "
        f"-> {n3} near-dedup curated -> {out_dir}/documents"
    )


if __name__ == "__main__":
    main()
