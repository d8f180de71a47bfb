#!/usr/bin/env python
"""Scale-factor multiplier: build sfN test data from the driver's sf0.1
tables by replicating each fact table K times with key shifts and
content mutations chosen to PRESERVE per-replica statistical structure:

- join fan-outs and FK integrity (all shifted keys stay consistent
  across customer/orders/lineitem/part/supplier),
- group-by cardinalities that should stay fixed (region, nation,
  event_type, lang, mktsegment) stay fixed; ones that should scale
  (users, docs, parts) scale,
- near-duplicate families in ``documents``: every token gets a
  per-replica suffix, so shingle/minhash/simhash structure within a
  replica is IDENTICAL to sf0.1 while cross-replica similarity is ~0 —
  a K× scale-up multiplies candidate pairs by K (linear), instead of
  the K²-per-doc blowup naive replication would cause,
- cosine structure in ``embeddings``: per-replica rotation of the
  dimension order preserves all within-replica angles and norms
  exactly.

Usage:  python tools/gen_scale.py --src /root/testdata/sf0.1 \\
            --out testdata_sf1 --k 10 [--files-scale 1]

The output is bench-compatible: point SPARK_GRAFT_SF_DIR at it.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One shared key offset per replica: max sf0.1 key is ~6e5, and
# 1e7 × 100 replicas stays far inside int64.
OFF = 10_000_000


def _with_replicas(spark: SparkSession, df: DataFrame, k: int) -> DataFrame:
    return df.crossJoin(
        spark.range(k).select(F.col("id").cast("long").alias("_k"))
    )


def _shift(cols: list[str]):
    return [
        (F.col(c) + F.col("_k") * OFF).alias(c) if c != "_k" else F.col(c)
        for c in cols
    ]


def scale_tables(
    spark: SparkSession, src: str, out: str, k: int, files_scale: int = 1
) -> None:
    os.makedirs(out, exist_ok=True)

    def read(name: str) -> DataFrame:
        from physicsnemo_curator_spark.sources.tables import load_table

        return load_table(spark, src, name)

    def write(df: DataFrame, name: str, n_files: int) -> None:
        df.repartition(max(1, n_files * files_scale)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: written")

    # dimension tables stay fixed (the realistic shape: regions and
    # nations do not grow with data volume)
    for name in ("region", "nation"):
        write(read(name), name, 1)

    c = _with_replicas(spark, read("customer"), k)
    write(
        c.select(
            *_shift(["c_custkey"]),
            F.concat("c_name", F.lit("#"), "_k").alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer", 1,
    )

    s = _with_replicas(spark, read("supplier"), k)
    write(
        s.select(
            *_shift(["s_suppkey"]),
            F.concat("s_name", F.lit("#"), "_k").alias("s_name"),
            "s_nationkey", "s_acctbal",
        ),
        "supplier", 1,
    )

    p = _with_replicas(spark, read("part"), k)
    write(
        p.select(
            *_shift(["p_partkey"]),
            F.concat("p_name", F.lit("#"), "_k").alias("p_name"),
            "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "part", 1,
    )

    o = _with_replicas(spark, read("orders"), k)
    write(
        o.select(
            *_shift(["o_orderkey", "o_custkey"]),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders", 2,
    )

    li = _with_replicas(spark, read("lineitem"), k)
    write(
        li.select(
            *_shift(["l_orderkey", "l_partkey", "l_suppkey"]),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem", 8,
    )

    ev = _with_replicas(spark, read("events"), k)
    write(
        ev.select(
            *_shift(["event_id", "user_id"]),
            "ts", "event_type", "value", "props",
        ),
        "events", 4,
    )

    # documents: suffix EVERY token per replica (k=0 keeps originals) —
    # within-replica shingle sets are isomorphic to sf0.1, cross-replica
    # overlap is zero
    d = _with_replicas(spark, read("documents"), k)
    text = F.when(F.col("_k") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"), r"(\S+)", F.concat(F.lit("$1~"), F.col("_k"))
        )
    )
    write(
        d.select(
            *_shift(["doc_id"]),
            text.alias("text"), "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("long")),
        "documents", 2,
    )

    # embeddings: rotate the dimension order by _k (mod dim) — an
    # orthogonal transform, so all within-replica cosines/norms are
    # exactly preserved
    e = _with_replicas(spark, read("embeddings"), k)
    rot = F.expr(
        "CASE WHEN _k = 0 THEN embedding ELSE "
        "concat(slice(embedding, cast(_k % size(embedding) + 1 AS INT), "
        "              size(embedding) - cast(_k % size(embedding) AS INT)), "
        "       slice(embedding, 1, cast(_k % size(embedding) AS INT))) END"
    )
    write(
        e.select(*_shift(["vec_id"]), rot.alias("embedding"), "label"),
        "embeddings", 2,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, required=True, help="replication factor")
    ap.add_argument(
        "--files-scale", type=int, default=1,
        help="multiply per-table output file counts (use k//10 for big runs)",
    )
    args = ap.parse_args()

    from physicsnemo_curator_spark.session import get_spark

    spark = get_spark(app_name="pcs-gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    scale_tables(spark, args.src, args.out, args.k, args.files_scale)
    spark.stop()


if __name__ == "__main__":
    main()
