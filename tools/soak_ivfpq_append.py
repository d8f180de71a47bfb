"""Price the IVF-PQ append's conflict scan vs store size (VERDICT r13
task #5): `write_ivfpq_index(mode='append')` reads the whole store's
(vec_id, _gen) columns to derive conflict tombstones, making append
cost a function of STORE size, not just batch size.  This measures a
FIXED batch appended to a 10×-grown store:

    python tools/soak_ivfpq_append.py [small_n] [big_n] [batch_n]

Defaults 100_000 / 1_000_000 / 1_000.  Prints one markdown row per
(store size × conflict profile): fresh-id appends (empty conflict set,
the scan still runs) and conflicting appends (batch ids overwrite
stored ones — tombstones written).  The corpus is the clustered
mixture fixture (sources/synthetic.clustered_embeddings), generated
distributed — no driver materialization at any size.
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

from physicsnemo_curator_spark.operators import mllib_ann
from physicsnemo_curator_spark.sources.synthetic import clustered_embeddings


def measure(spark, n: int, batch_n: int) -> dict[str, float]:
    emb = clustered_embeddings(
        spark, n + batch_n, dim=64, n_clusters=32, sigma=0.2, seed=7
    ).localCheckpoint()
    corpus = emb.filter(F.col("vec_id") < n)
    fresh = emb.filter(F.col("vec_id") >= n)
    conflict = emb.filter(F.col("vec_id") < batch_n)
    centers = mllib_ann.md5_sample_centroids(corpus, k=8)
    cbs = mllib_ann.pq_train(corpus, m=8, ks=16, dim=64)
    store = tempfile.mkdtemp(prefix=f"pcs_soak_append_{n}_")
    shutil.rmtree(store, ignore_errors=True)
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        mllib_ann.write_ivfpq_index(corpus, centers, cbs, store)
        out["seed_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mllib_ann.write_ivfpq_index(
            fresh, centers, cbs, store, mode="append", batch_id="fresh"
        )
        out["append_fresh"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mllib_ann.write_ivfpq_index(
            conflict, centers, cbs, store, mode="append", batch_id="confl"
        )
        out["append_conflict"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def main() -> None:
    from physicsnemo_curator_spark.session import get_spark

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    spark = get_spark(app_name="soak-ivfpq-append")
    spark.sparkContext.setLogLevel("ERROR")
    measure(spark, 5_000, batch)  # discarded warm-up (JIT/codegen/FS cache)
    rows = {n: measure(spark, n, batch) for n in (small, big)}
    print(
        f"\n## IVF-PQ append wall vs store size "
        f"(fixed batch {batch}, {big // small}x store)\n"
    )
    print("| store rows | seed build | append fresh ids | append conflicting ids |")
    print("|---|---|---|---|")
    for n, r in rows.items():
        print(
            f"| {n:,} | {r['seed_build']:.2f} s "
            f"| {r['append_fresh']:.2f} s | {r['append_conflict']:.2f} s |"
        )
    rf = rows[big]["append_fresh"] / rows[small]["append_fresh"]
    rc = rows[big]["append_conflict"] / rows[small]["append_conflict"]
    print(
        f"\nratios at {big // small}x store: fresh {rf:.2f}x, "
        f"conflicting {rc:.2f}x (bar: ~1.5x — above it, bucket the "
        "store by vec_id or gate the scan for provably-fresh ids)"
    )


if __name__ == "__main__":
    main()
