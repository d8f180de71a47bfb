"""Price assign_splits_incremental vs store size (VERDICT r13 task #2's
soak row): each incremental batch semi-joins the persisted assignment
store (corpus-sized) against the broadcast probe ids, so batch cost
must stay flat as the store grows.

    python tools/soak_split_store.py [small_n] [big_n] [batch_n]

Defaults 1_000_000 / 10_000_000 / 10_000.  The seed store is a bulk
assign_splits write; the appended batch carries a 1k-pair group frame
whose components half-overlap stored docs (exercising inherit AND
fresh paths) — the realistic steady-state ingest shape.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import sampling

W = {"train": 0.8, "val": 0.1, "test": 0.1}


def measure(spark, n: int, batch_n: int) -> dict[str, float]:
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    new = spark.range(n, n + batch_n).select(F.col("id").alias("doc_id"))
    # 1000 groups of 2: one stored member, one new member -> inherit;
    # plus 500 new-new pairs -> fresh shared components
    g_inherit = (
        spark.range(1000)
        .selectExpr(
            "id * 2 AS doc_id", "id * 2 AS component"
        )
        .unionByName(
            spark.range(1000).selectExpr(
                f"id + {n} AS doc_id", "id * 2 AS component"
            )
        )
    )
    g_fresh = spark.range(500).selectExpr(
        f"id + {n} + 2000 AS doc_id", f"id + {n} + 2000 AS component"
    )
    groups = g_inherit.unionByName(g_fresh)
    store = tempfile.mkdtemp(prefix=f"pcs_soak_split_{n}_")
    shutil.rmtree(store, ignore_errors=True)
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        seed = sampling.assign_splits(docs, "doc_id", W, seed=3).select(
            "doc_id", "split", F.lit(None).cast("long").alias("component")
        )
        sampling.write_split_store(seed, store)
        out["seed_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = sampling.assign_splits_incremental(
            spark, new, groups, W, store, seed=3,
            update_store=True, batch_id="b1",
        )
        res.count()
        out["append"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def main() -> None:
    from physicsnemo_curator_spark.session import get_spark

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark(app_name="soak-split-store")
    spark.sparkContext.setLogLevel("ERROR")
    measure(spark, 50_000, batch)  # discarded warm-up
    rows = {n: measure(spark, n, batch) for n in (small, big)}
    print(
        f"\n## split-store incremental assignment vs store size "
        f"(fixed batch {batch}, {big // small}x store)\n"
    )
    print("| store rows | seed build | incremental batch |")
    print("|---|---|---|")
    for n, r in rows.items():
        print(f"| {n:,} | {r['seed_build']:.2f} s | {r['append']:.2f} s |")
    ratio = rows[big]["append"] / rows[small]["append"]
    print(f"\nratio at {big // small}x store: {ratio:.2f}x (bar: ~1.5x)")


if __name__ == "__main__":
    main()
