#!/usr/bin/env python
"""Incremental ingestion example: batch-over-batch curation state.

Simulates a corpus arriving in batches (slices of ``documents``) and
shows the engine's persisted-state operators doing steady-state work
proportional to each batch, not the corpus:

  per batch:
    → near-dup check against the MinHash store (corpus probe +
      within-batch pairs), drop duplicates
    → append survivors' signatures/bands to the store
    → append per-language HLL sketches (mergeable distinct-user counts
      across all batches, no re-scan)
    → assign leakage-free train/val/test splits through the PERSISTED
      split store (stored labels never move; new members of a known
      near-dup group inherit its split) and write the batch

Usage: python examples/incremental_ingest.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.core.metrics import MetricsStore  # noqa: E402
from physicsnemo_curator_spark.operators import components, dedup, sampling, sketches  # noqa: E402
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/incremental_ingest"
    shutil.rmtree(work, ignore_errors=True)
    mh_store = os.path.join(work, "minhash_store")
    hll_store = os.path.join(work, "hll_store")
    split_store = os.path.join(work, "split_store")
    out = os.path.join(work, "curated")

    spark = get_spark(app_name="incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    metrics = MetricsStore(os.path.join(work, "metrics"))

    # batch 0 seeds the store; later batches probe it
    n_batches = 3
    for b in range(n_batches):
        t_batch = _time.perf_counter()
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        n_in = batch.count()

        weights = {"train": 0.9, "val": 0.1}
        if not os.path.isdir(mh_store):
            dedup.write_minhash_store(batch, mh_store, batch_id=f"b{b}")
            survivors = batch
            n_dropped = 0
            # seed the split store: leakage-free assignment over the
            # seed corpus's own near-dup groups
            pairs0 = dedup.minhash_near_duplicates(batch, threshold=0.8)
            groups0 = components.dedup_groups(
                pairs0.select("a", "b")
            ).select("doc_id", "component")
            assigned = sampling.leakage_free_splits(
                survivors, groups0, weights, seed=7
            ).select("doc_id", "split", "component")
            sampling.write_split_store(assigned, split_store, batch_id=f"b{b}")
            split = survivors.join(
                assigned.select("doc_id", "split"), "doc_id"
            )
        else:
            pairs = dedup.incremental_near_duplicates(
                spark, batch, mh_store, threshold=0.8, update_store=False
            )
            # drop the batch doc of every match (corpus copy wins;
            # within-batch the higher id loses)
            losers = pairs.select(F.col("b").alias("doc_id")).distinct()
            survivors = batch.join(losers, "doc_id", "left_anti")
            n_dropped = n_in - survivors.count()
            dedup.write_minhash_store(
                survivors, mh_store, mode="append", batch_id=f"b{b}"
            )
            # split through the PERSISTED store: the pairs connect new
            # docs to stored corpus docs, so surviving near-copies land
            # on the SAME side of the train/val fence as their stored
            # group (stored labels frozen, merges quarantine to train)
            groups = components.dedup_groups(
                pairs.select("a", "b")
            ).select("doc_id", "component")
            assigned = sampling.assign_splits_incremental(
                spark, survivors, groups, weights, split_store,
                seed=7, update_store=True, batch_id=f"b{b}",
            )
            split = survivors.join(
                assigned.select("doc_id", "split"), "doc_id"
            )

        sketches.append_sketch_store(
            survivors, hll_store, ["lang"], "doc_id", batch_id=f"b{b}"
        )
        split.write.mode("append").partitionBy("split").parquet(out)
        metrics.record_index_results(
            spark,
            "ingest",
            [{
                "idx": b,
                "worker_id": "driver",
                "wall_time_s": _time.perf_counter() - t_batch,
            }],
        )
        print(f"batch {b}: {n_in} in, {n_dropped} near-dups dropped")

    totals = sketches.read_sketch_store(spark, hll_store, ["lang"])
    print("distinct docs per lang (merged sketches):")
    for r in totals.orderBy("lang").collect():
        print(f"  {r.lang}: ~{int(r.n_distinct)}")
    n_out = spark.read.parquet(out).count()
    print(f"curated rows written: {n_out} -> {out}")
    ss = sampling.split_store_stats(spark, split_store)
    print(
        f"split store: {ss['n_docs']} docs, splits={ss['splits']}, "
        f"reasons={ss['reasons']}, duplicates={ss['duplicate_docs']}"
    )
    # one-call run report over the recorded ledger (the reference
    # dashboard's data frames rendered as text — core/metrics.py)
    print(metrics.dashboard_report(spark, total=n_batches, run_id="ingest"))


if __name__ == "__main__":
    main()
