"""Edge-case hardening for the r05 curation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import sampling, sketches, textops


def test_hash_bucket_rejects_unknown_hash(spark):
    with pytest.raises(ValueError, match="hash_fn"):
        spark.range(1).select(
            sampling.hash_bucket(F.col("id"), hash_fn="md5")
        )


def test_assign_splits_single_label(spark):
    out = sampling.assign_splits(
        spark.range(50).withColumnRenamed("id", "k"), "k", {"train": 1.0}
    )
    assert {r.split for r in out.collect()} == {"train"}


def test_assign_splits_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.assign_splits(df, "k", {})
    with pytest.raises(ValueError):
        sampling.assign_splits(df, "k", {"a": 0.0})


def test_unigram_logprob_total_tokens_hint_is_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], "doc_id long, text string"
    )
    full = {r.doc_id: r.avg_logprob
            for r in textops.unigram_logprob(df).collect()}
    hinted = {r.doc_id: r.avg_logprob
              for r in textops.unigram_logprob(df, total_tokens=7).collect()}
    assert full == hinted


def test_tokenize_to_ids_all_unknown(spark):
    docs = spark.createDataFrame([(1, "zz yy xx")], "doc_id long, text string")
    vocab = spark.createDataFrame([("aa", 0)], "token string, token_id int")
    row = textops.tokenize_to_ids(docs, vocab).first()
    assert row.ids == [-1, -1, -1] and row.n_ids == 3


def test_contamination_report_no_overlap_is_empty(spark):
    c = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    b = spark.createDataFrame([(9, "x y z w")], "doc_id long, text string")
    assert textops.contamination_report(c, b, n=3).count() == 0


def test_sketches_merge_mixed_precision(spark):
    a = sketches.distinct_sketches(
        spark.range(1000).selectExpr("'k' AS k", "id"), ["k"], "id",
        lg_config_k=12,
    )
    b = sketches.distinct_sketches(
        spark.range(500, 1500).selectExpr("'k' AS k", "id"), ["k"], "id",
        lg_config_k=14,
    )
    est = sketches.estimate_distinct(
        sketches.merge_sketch_tables(a.unionByName(b), ["k"])
    ).first()
    assert abs(est.n_distinct - 1500) / 1500 < 0.06


def test_chunk_documents_single_token_doc(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    rows = textops.chunk_documents(df, max_tokens=16, overlap=2).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 1
    assert rows[0].chunk_text == "solo"
