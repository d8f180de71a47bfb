"""Distributed rank / prefix sum: identical results to the global
window, no data-path single-partition exchange (the 100 TB property)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import atomic, dedup, textops
from physicsnemo_curator_spark.operators.ranking import (
    distributed_prefix_sum,
    distributed_rank,
)
from physicsnemo_curator_spark.sources.tables import load_table


def test_distributed_rank_matches_global_window(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    order = [F.desc("l_quantity"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["r"]
        for r in distributed_rank(li, order, name="r").collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["r"]
        for r in li.select(
            "l_orderkey", "l_linenumber", (F.row_number().over(w) - 1).alias("r")
        ).collect()
    }
    assert got == want


def test_distributed_prefix_sum_matches_global_window(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = {
        r["o_orderkey"]: round(r["p"], 2)
        for r in distributed_prefix_sum(
            orders, "o_totalprice", [F.asc("o_orderkey")], name="p"
        ).collect()
    }
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["o_orderkey"]: round(r["p"], 2)
        for r in orders.select(
            "o_orderkey",
            F.coalesce(F.sum("o_totalprice").over(w), F.lit(0.0)).alias("p"),
        ).collect()
    }
    assert got == want


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocabulary_has_no_data_path_single_partition_exchange(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = textops.vocabulary(docs, min_count=2)
    plan = _plan(vocab)
    # range partitioning spreads the vocab across tasks ...
    assert "rangepartitioning" in plan
    # ... and the only SinglePartition exchange feeds the P-row
    # partition-totals cumulation, never the token stream (the old
    # global-window form had the whole vocab behind one).
    assert plan.count("Exchange SinglePartition") <= 1


def test_pack_offsets_matches_window_form(spark):
    systems = spark.createDataFrame(
        [(3, 7), (1, 2), (2, 5), (5, 1), (4, 4)], "system_id long, natoms long"
    )
    rows = {
        r["system_id"]: r["offset"]
        for r in atomic.pack_offsets(systems).collect()
    }
    assert rows == {1: 0, 2: 2, 3: 7, 4: 14, 5: 18}
    plan = _plan(atomic.pack_offsets(systems))
    assert plan.count("Exchange SinglePartition") <= 1


def test_jaccard_pairs_max_df_drops_boilerplate_shingle(spark):
    # docs 1 and 2 share ONLY the boilerplate shingle carried by every
    # doc; docs 3 and 4 also share a rare shingle.
    rows = [
        (1, "bp"), (2, "bp"), (3, "bp"), (4, "bp"),
        (3, "rare"), (4, "rare"),
        (1, "only1"), (2, "only2"),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    unpruned = {(r["a"], r["b"]) for r in dedup.jaccard_pairs(sh).collect()}
    assert (1, 2) in unpruned
    pruned = dedup.jaccard_pairs(sh, max_df=3).collect()
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in pruned}
    # the df=4 boilerplate shingle generates no pairs ...
    assert (1, 2) not in pairs
    # ... and surviving pairs score over the pruned shingle space
    assert pairs == {(3, 4): 1.0}


def test_sparse_cosine_pairs_max_df_prunes_hot_token(spark):
    rows = [
        (1, "the", 1.0), (2, "the", 1.0), (3, "the", 0.5),
        (3, "zebra", 0.5), (4, "zebra", 1.0),
    ]
    w = spark.createDataFrame(rows, "doc_id long, token string, weight double")
    unpruned = {
        (r["a"], r["b"]) for r in textops.sparse_cosine_pairs(w, 0.4).collect()
    }
    assert (1, 2) in unpruned
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in textops.sparse_cosine_pairs(w, 0.4, max_df=2).collect()
    }
    assert (1, 2) not in got  # df=3 token contributes no pairs
    assert got == {(3, 4): 0.5}
