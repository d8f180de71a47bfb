#!/usr/bin/env python
"""End-to-end curation example: the LLM-training-data pipeline.

Raw documents
  → PII redaction (typed placeholders, scan-stage regex)
  → span-level boilerplate removal (repeated N-word spans deleted
    corpus-wide, C4/RefinedWeb style)
  → text features + quality gate (incl. Gopher-style repetition cap)
  → exact dedup (content fingerprint)
  → transitive near-dup removal (MinHash-LSH pairs → connected
    components → keep each group's representative)
  → domain-mixing cap (target language distribution → per-language
    rates → deterministic hash sampling)
  → train/val/test split assignment (append-stable hash ranges)
  → context-window chunking
  → curated parquet partitioned by split.

Mirrors the reference's Source → Filter* → Sink examples (reference
``examples/``), expressed as this engine's operators.  Every stage is
a Catalyst-planned DataFrame transform; the only Python-side loops are
in this driver script's accounting prints.

Usage: python examples/curate_documents.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators import (  # noqa: E402
    components,
    dedup,
    sampling,
    textops,
)
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_documents"

    spark = get_spark(app_name="curate-documents")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. PII scrub — replaces emails/SSNs/IPs/phones with typed tokens
    scrubbed = docs.withColumn("text", textops.redact_pii(F.col("text")))

    # 1b. span-level boilerplate removal: every 8-word span occurring
    #     in >= 3 distinct docs is deleted corpus-wide (headers,
    #     footers, license blocks); metadata rejoined by id
    despanned = textops.remove_duplicate_spans(
        scrubbed, span_words=8, min_df=3
    )
    scrubbed = despanned.filter(F.col("kept_spans") > 0).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    n0b = scrubbed.count()

    # 2. features + quality gate (pure column math, runs in the scan
    #    stage) + repetition cap (two doc-keyed aggregates)
    feats = textops.with_text_features(scrubbed)
    rep = textops.repetition_ratio(scrubbed, n=2)
    gated = (
        feats.join(rep.select("doc_id", "top_frac"), "doc_id", "left")
        .filter(F.col("quality") >= 0.5)
        .filter(F.coalesce(F.col("top_frac"), F.lit(0.0)) <= 0.2)
        .drop("top_frac")
    )
    n1 = gated.count()

    # 3. exact dedup on the content fingerprint
    exact = dedup.dedup_exact(gated)
    n2 = exact.count()

    # 4. transitive near-dup removal: LSH pairs → connected components;
    #    keep exactly one representative per similarity group
    pairs = dedup.minhash_near_duplicates(exact, threshold=0.8)
    groups = components.dedup_groups(pairs.select("a", "b"))
    losers = groups.filter(~F.col("keep")).select("doc_id")
    curated = exact.join(losers, "doc_id", "left_anti")
    n3 = curated.count()

    # 5. domain-mixing cap: per-language rates toward a target doc
    #    distribution (largest single-epoch-feasible budget), then the
    #    deterministic hash sampler applies them — same rows kept on
    #    any cluster
    weights = sampling.mixing_weights(
        curated,
        domain_col="lang",
        targets={"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15},
    )
    fractions = {
        r["domain"]: r["sample_rate"] for r in weights.collect()
    }
    capped = sampling.stratified_sample(
        curated, "lang", fractions, "doc_id", default_rate=0.0, seed=13
    )
    n4 = capped.count()

    # 6. append-stable split assignment + 7. context-window chunking
    split = sampling.assign_splits(
        capped, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=13
    )
    chunks = textops.chunk_documents(
        split, max_tokens=64, overlap=8
    ).join(split.select("doc_id", "split", "lang"), "doc_id")
    n5 = chunks.count()

    chunks.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "chunks")
    )

    # 8. pack chunks into fixed-budget training sequences
    from physicsnemo_curator_spark.operators.packing import pack_sequences

    chunk_rows = chunks.select(
        F.xxhash64("doc_id", "chunk_index").alias("chunk_uid"),
        F.col("n_tokens"),
    )
    packed = pack_sequences(
        chunk_rows, budget=256, id_col="chunk_uid", n_buckets=4
    )
    n_packs = packed.select("bucket", "pack_index").distinct().count()

    print(
        f"documents: {n0} raw -> {n0b} despanned -> "
        f"{n1} quality+repetition gated -> "
        f"{n2} exact-deduped -> {n3} group-deduped -> {n4} capped -> "
        f"{n5} chunks -> {n_packs} packed sequences (budget 256) -> "
        f"{out_dir}/chunks (partitioned by split)"
    )


if __name__ == "__main__":
    main()
