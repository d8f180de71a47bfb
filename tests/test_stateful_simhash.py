"""Stateful streaming running stats + banded SimHash near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import dedup
from physicsnemo_curator_spark.sources.tables import load_table
from physicsnemo_curator_spark.streaming.stateful import run_running_stats


def test_stateful_running_stats_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_us")
    events.write.parquet(path)
    batch = spark.read.parquet(path)

    expected = {
        r["event_type"]: (r["n"], round(r["mean"], 9), round(r["var"], 9))
        for r in batch.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var"),
        )
        .collect()
    }
    got = {
        r["key"]: (r["n"], round(r["mean"], 9), round(r["var_pop"], 9))
        for r in run_running_stats(spark, path, batch.schema).collect()
    }
    assert got == expected and len(got) == 5


def test_streaming_dedup_bounded_state(spark, tmp_path):
    """Streamed docs dedup to first-occurrence by fingerprint; batch and
    stream agree on the surviving set."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, "alpha beta gamma", base),
        (1, "alpha  beta   gamma", base + dt.timedelta(minutes=1)),  # ws-dup of 0
        (2, "something else", base + dt.timedelta(minutes=2)),
        (3, "alpha beta gamma", base + dt.timedelta(minutes=3)),  # dup of 0
    ]
    src = str(tmp_path / "docs_stream")
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
    df.coalesce(1).write.parquet(src)

    from physicsnemo_curator_spark.streaming.stateful import streaming_dedup

    # batch twin
    batch_kept = {r["doc_id"] for r in streaming_dedup(spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_dedup(stream, time_col="ts")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_kept = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    assert len(stream_kept) == 2
    # same fingerprints survive (first-occurrence ids may differ by order)
    assert stream_kept == batch_kept == {0, 2}


def test_simhash_banded_near_duplicates(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again today"),
            (1, "the quick brown fox jumps over the lazy dog again and again tonight"),  # 1-token diff
            (2, "entirely unrelated words about completely different topics and themes"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=8)
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] <= 8
    assert (0, 2) not in got and (1, 2) not in got


def test_simhash_banded_on_corpus(spark, sf_correctness_dir):
    docs = load_table(spark, sf_correctness_dir, "documents")
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=8)
    sim = {(r["a"], r["b"]) for r in pairs.collect()}
    mh = {
        (r["a"], r["b"])
        for r in dedup.minhash_near_duplicates(docs, threshold=0.9).collect()
    }
    # bigram simhash at hamming<=8 must be precise (no false pairs) and
    # recover a majority of the strong minhash near-dups
    assert len(sim) > 0
    assert sim <= mh
    assert len(sim & mh) / len(mh) > 0.5
