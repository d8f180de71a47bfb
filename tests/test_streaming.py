"""Streaming operators: batch/stream parity and memory-sink smoke.

The reference has no streaming engine (SURVEY §1.4); these validate the
Structured Streaming form of its running-stats semantics — the same
aggregation must produce identical results on a batch frame and on the
stream once drained.
"""

from __future__ import annotations

import os
import shutil

import pytest

from physicsnemo_curator_spark.sources.tables import load_table
from physicsnemo_curator_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    sliding_window_stats,
    tumbling_window_stats,
)


def _events_dir(spark, sf_dir, tmp_path):
    """Re-materialize events with micro timestamps (the raw file is
    nanos, unreadable by a plain stream reader)."""
    out = str(tmp_path / "events_us")
    if os.path.exists(out):
        shutil.rmtree(out)
    load_table(spark, sf_dir, "events").write.parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    expected = {
        (r["w"]["start"], r["event_type"]): (r["cnt"], round(r["avg_value"], 9))
        for r in tumbling_window_stats(batch).collect()
    }
    streamed = run_stream_to_memory(
        spark, path, batch.schema, tumbling_window_stats, query_name="tumble"
    )
    got = {
        (r["w"]["start"], r["event_type"]): (r["cnt"], round(r["avg_value"], 9))
        for r in streamed.collect()
    }
    assert got == expected and len(got) > 0


def test_sliding_window_overlap(spark, sf_dir, tmp_path):
    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    tumble = tumbling_window_stats(batch).agg({"cnt": "sum"}).collect()[0][0]
    slide = sliding_window_stats(batch).agg({"cnt": "sum"}).collect()[0][0]
    # 1h window sliding by 15min → each event in exactly 4 windows
    assert slide == 4 * tumble


@pytest.mark.soak
def test_watermark_finalizes_windows_append_mode(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): append mode emits a
    window exactly once when the watermark passes its end, and very
    late data never contaminates an already-finalized window.  (Spark's
    watermark contract: data within the delay is guaranteed aggregated;
    dropping beyond it is best-effort — a very late row may re-emit its
    own window, so we assert isolation, not absence.)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "stream_src")
    batch1 = [(1, base + dt.timedelta(hours=8, minutes=m), "click", 1.0) for m in (0, 10)]
    batch1 += [(2, base + dt.timedelta(hours=10), "click", 1.0)]
    batch2 = [(3, base + dt.timedelta(minutes=30), "click", 99.0)]  # ~10h late
    batch2 += [(4, base + dt.timedelta(hours=10, minutes=30), "click", 1.0)]
    cols = ["event_id", "ts", "event_type", "value"]
    spark.createDataFrame(batch1, cols).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, cols).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from physicsnemo_curator_spark.streaming.windows import tumbling_window_stats

    agg = tumbling_window_stats(stream, watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM late_test").collect()
    by_start = {}
    for r in rows:
        by_start.setdefault(r["w"]["start"].hour, []).append(r)
    # on-time window finalized and emitted exactly once, uncontaminated
    assert len(by_start[8]) == 1
    assert by_start[8][0]["cnt"] == 2 and by_start[8][0]["avg_value"] == 1.0
    # the very late event never merged into any on-time window
    for hour, rs in by_start.items():
        if hour != 0:
            assert all(r["avg_value"] == 1.0 for r in rs)


def test_session_windows(spark, sf_dir, tmp_path):
    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    out = session_window_agg(batch)
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["cnt"] for r in rows)
    assert total == batch.count()


@pytest.mark.soak
def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stop a streaming query mid-source and restart it from its
    checkpoint: the file sink must contain every input row exactly once.

    This is the Structured Streaming form of the reference's
    checkpoint/resume guarantee (pipeline_store.is_completed +
    test_checkpoint.py semantics): progress is tracked in the
    checkpoint, completed work is never redone, pending work resumes.
    """
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    ).coalesce(1).write.parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    writer = lambda df: (
        df.selectExpr("id", "v * 2 AS v2")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
    )
    q = writer(stream).start()
    q.awaitTermination(120)

    first = spark.read.parquet(str(out))
    assert first.count() == 100

    # new data arrives while the query is down
    spark.createDataFrame(
        [(i, float(i)) for i in range(100, 150)], "id long, v double"
    ).coalesce(1).write.parquet(str(src / "batch1"))

    # restart from the same checkpoint — a NEW query object
    stream2 = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q2 = writer(stream2).start()
    q2.awaitTermination(120)

    rows = spark.read.parquet(str(out)).collect()
    # every row exactly once: batch0 NOT reprocessed, batch1 picked up
    assert len(rows) == 150
    assert sorted(r["id"] for r in rows) == list(range(150))
    assert all(r["v2"] == 2.0 * r["id"] for r in rows)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join drains to the same rows
    as the identical batch join (clicks x purchases within 1 hour
    before each click, per user)."""
    from physicsnemo_curator_spark.streaming.joins import interval_join

    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    clicks_b = batch.filter("event_type = 'click'")
    purch_b = batch.filter("event_type = 'purchase'")

    def key_rows(df):
        return sorted(
            (r["l_id"], r["r_id"])
            for r in df.selectExpr(
                "l.event_id AS l_id", "r.event_id AS r_id"
            ).collect()
        )

    expected = key_rows(
        interval_join(clicks_b, purch_b, upper_seconds=3600)
    )
    assert expected, "fixture should produce at least one joined pair"

    schema = batch.schema
    clicks_s = spark.readStream.schema(schema).parquet(path).filter(
        "event_type = 'click'"
    )
    purch_s = spark.readStream.schema(schema).parquet(path).filter(
        "event_type = 'purchase'"
    )
    joined = interval_join(clicks_s, purch_s, upper_seconds=3600)
    out = str(tmp_path / "join_out")
    q = (
        joined.selectExpr("l.event_id AS l_id", "r.event_id AS r_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "join_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["l_id"], r["r_id"]) for r in spark.read.parquet(out).collect()
    )
    assert got == expected


@pytest.mark.soak
def test_run_interval_join_stream_cross_batch(spark, sf_dir, tmp_path):
    """The micro-batch runner (one file per trigger, separate click /
    purchase sources) must emit exactly the batch join: matches form
    out of RETAINED state because the two sides of a pair arrive in
    different micro-batches."""
    from physicsnemo_curator_spark.streaming.joins import (
        interval_join,
        run_interval_join_stream,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    dirs = {}
    for side, etype in (("clicks", "click"), ("purchases", "purchase")):
        d = str(tmp_path / side)
        events.filter(f"event_type = '{etype}'").drop(
            "event_type"
        ).repartition(3).write.parquet(d)
        dirs[side] = d
    expected = sorted(
        (r["a"], r["b"])
        for r in interval_join(
            spark.read.parquet(dirs["clicks"]),
            spark.read.parquet(dirs["purchases"]),
            upper_seconds=86400,
        )
        .selectExpr("l.event_id a", "r.event_id b")
        .collect()
    )
    assert expected
    out = run_interval_join_stream(
        spark,
        dirs["clicks"],
        dirs["purchases"],
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        upper_seconds=86400,
        watermark="60 days",
    )
    got = sorted((r["a"], r["b"]) for r in out.collect())
    assert got == expected
    # idempotent reuse: a second call reads the existing sink
    again = run_interval_join_stream(
        spark,
        dirs["clicks"],
        dirs["purchases"],
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        upper_seconds=86400,
        watermark="60 days",
    )
    assert again.count() == len(expected)


@pytest.mark.soak
def test_run_interval_join_stream_empty_and_partial(spark, tmp_path):
    """A zero-match join must return an EMPTY frame with the declared
    columns (the sink holds metadata only — schema inference would
    refuse it), and a crashed partial run (missing _DONE marker) must
    be rebuilt rather than served as a subset."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    # disjoint user ids on the two sides → no pairs ever
    spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", 1.0)],
        "event_id long, user_id long, ts string, value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "value"
    ).write.parquet(str(tmp_path / "l"))
    spark.createDataFrame(
        [(2, 20, "2024-01-01 00:00:10", 2.0)],
        "event_id long, user_id long, ts string, value double",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "value"
    ).write.parquet(str(tmp_path / "r"))
    out = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "empty_run"),
    )
    assert out.columns == ["a", "b"] and out.count() == 0
    # partial-run detection: drop the marker, plant sink debris
    import os

    os.remove(str(tmp_path / "empty_run" / "_DONE"))
    got = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "empty_run"),
    )
    assert got.count() == 0
    assert os.path.exists(str(tmp_path / "empty_run" / "_DONE"))


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark on a duplicated stream must yield
    each event_id exactly once — identical to batch dropDuplicates.
    The input doubles every row (two parquet files with the same data),
    so the stream really exercises cross-batch duplicate suppression."""
    from physicsnemo_curator_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "events_dup")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    events.write.parquet(src)
    events.write.mode("append").parquet(src)

    dup = spark.read.parquet(src)
    assert dup.count() == 2 * events.count()
    expected = {r["event_id"] for r in dedup_stream(dup).collect()}

    streamed = run_stream_to_memory(
        spark,
        src,
        dup.schema,
        dedup_stream,
        query_name="dedup_stream",
        output_mode="append",
    )
    got = streamed.collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)), "a key was emitted twice"
    assert set(ids) == expected and len(ids) == events.count()


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Session windows (gap-merged activity bursts) must agree between
    the drained stream and the batch twin — the merge of adjacent
    sessions as rows arrive is the stateful part worth pinning."""
    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    expected = {
        (r["w"]["start"], r["w"]["end"], r["user_id"]): (
            r["cnt"],
            round(r["sum_value"], 9),
        )
        for r in session_window_agg(batch).collect()
    }
    streamed = run_stream_to_memory(
        spark, path, batch.schema, session_window_agg, query_name="sess_stream"
    )
    got = {
        (r["w"]["start"], r["w"]["end"], r["user_id"]): (
            r["cnt"],
            round(r["sum_value"], 9),
        )
        for r in streamed.collect()
    }
    assert got == expected and len(got) > 0


def test_foreachbatch_stateful_welford_matches_batch(spark, sf_dir, tmp_path):
    """The foreachBatch-driven stateful runner must fold GroupState
    across multiple micro-batches and land on the exact batch answer."""
    from physicsnemo_curator_spark.streaming.stateful import (
        run_running_stats_foreachbatch,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    src = str(tmp_path / "welford_src")
    events.repartition(3).write.parquet(src)

    out = run_running_stats_foreachbatch(
        spark, src, "event_type string, value double"
    ).collect()
    got = {r["key"]: r for r in out}

    from pyspark.sql import functions as F

    exp = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var_pop"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        assert g["n"] == e["n"]
        assert abs(g["mean"] - e["mean"]) < 1e-9
        assert abs(g["var_pop"] - e["var_pop"]) < 1e-6


@pytest.mark.soak
def test_stateful_table_sink_restart_exactly_once(spark, sf_dir, tmp_path):
    """Production table-sink path: the stateful stream appends per-batch
    update rows to a parquet table, a restart with the same checkpoint
    processes ONLY unseen files with GroupState carried over, and the
    SQL last-write-wins resolver lands on the exact batch answer over
    all data (exactly-once across the restart)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.streaming.stateful import (
        read_running_stats_table,
        run_running_stats_to_table,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    half1 = events.filter("value < 0.5")
    half2 = events.filter("value >= 0.5")
    src = str(tmp_path / "src")
    table = str(tmp_path / "stats_table")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_type string, value double"

    half1.repartition(2).write.parquet(src)
    run_running_stats_to_table(spark, src, schema, table, ckpt)
    mid = {
        r["key"]: r["n"] for r in read_running_stats_table(spark, table).collect()
    }
    assert sum(mid.values()) == half1.count()
    epochs_after_first = (
        spark.read.parquet(table).agg(F.max("_epoch")).first()[0]
    )

    # "restart": new files arrive, a fresh query reuses the checkpoint
    half2.repartition(2).write.mode("append").parquet(src)
    run_running_stats_to_table(spark, src, schema, table, ckpt)

    raw = spark.read.parquet(table)
    # offsets resumed (epochs continue, old data not reprocessed) …
    assert raw.agg(F.max("_epoch")).first()[0] > epochs_after_first
    assert raw.filter(F.col("_epoch") > epochs_after_first).count() > 0

    # … and state resumed: final answer is exact over ALL data
    got = {
        r["key"]: r for r in read_running_stats_table(spark, table).collect()
    }
    exp = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var_pop"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        assert g["n"] == e["n"]
        assert abs(g["mean"] - e["mean"]) < 1e-9
        assert abs(g["var_pop"] - e["var_pop"]) < 1e-6


def test_stateful_table_sink_duplicate_epoch_append_idempotent(
    spark, sf_dir, tmp_path
):
    """Crash-retry semantics of the append-only table (mirrors the
    reference's failed-index retry, test_checkpoint.py:409-431): a
    foreachBatch retried after a mid-write crash double-appends its
    rows, both copies carrying identical (key, _epoch) — the SQL
    last-write-wins resolver must return the same answer as before
    the duplicate landed."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.streaming.stateful import (
        read_running_stats_table,
        run_running_stats_to_table,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    src = str(tmp_path / "src")
    table = str(tmp_path / "stats_table")
    ckpt = str(tmp_path / "ckpt")
    events.repartition(3).write.parquet(src)
    run_running_stats_to_table(
        spark, src, "event_type string, value double", table, ckpt
    )

    before = {
        r["key"]: r for r in read_running_stats_table(spark, table).collect()
    }
    raw = spark.read.parquet(table)
    n_before = raw.count()

    # simulate the retried batch: re-append the final epoch's rows
    last_epoch = raw.agg(F.max("_epoch")).first()[0]
    retried = raw.filter(F.col("_epoch") == last_epoch)
    assert retried.count() > 0
    retried.write.mode("append").parquet(table)

    raw2 = spark.read.parquet(table)
    assert raw2.count() == n_before + retried.count()  # duplicates landed
    after = {
        r["key"]: r for r in read_running_stats_table(spark, table).collect()
    }
    assert set(after) == set(before)
    for k in before:
        assert after[k]["n"] == before[k]["n"]
        assert after[k]["mean"] == before[k]["mean"]
        assert after[k]["var_pop"] == before[k]["var_pop"]


def test_transform_with_state_twin_matches_batch(spark, sf_dir, tmp_path):
    """The Spark-4 StatefulProcessor (transformWithStateInPandas) twin
    folds state across micro-batches to the identical batch answer as
    the applyInPandasWithState operator."""
    import pytest

    try:
        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs Spark >= 4.0")
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas speaks protobuf to its state "
            "server; google.protobuf is absent in this container "
            "(environment gate, see README)"
        )
    from physicsnemo_curator_spark.streaming.stateful import (
        run_running_stats_tws,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    src = str(tmp_path / "tws_src")
    events.repartition(3).write.parquet(src)

    out = run_running_stats_tws(
        spark, src, "event_type string, value double"
    ).collect()
    got = {r["key"]: r for r in out}

    from pyspark.sql import functions as F

    exp = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var_pop"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        assert g["n"] == e["n"]
        assert abs(g["mean"] - e["mean"]) < 1e-9
        assert abs(g["var_pop"] - e["var_pop"]) < 1e-6


@pytest.mark.soak
def test_streaming_bloom_dedup_all_time(spark, tmp_path):
    """All-time streaming dedup with bounded state: a key ingested in
    an early micro-batch is never re-emitted when it reappears ANY
    number of batches later (beyond any watermark horizon), while
    state stays fixed at n_bits per group; restart with the same
    checkpoint processes only unseen files; the resolver is idempotent
    to crash-retry double-appends."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.streaming.dedup import (
        read_bloom_deduped,
        run_streaming_bloom_dedup,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, payload long"

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("https://ex/"), F.col("id")).alias("url"),
            F.col("id").alias("payload"),
        )

    # phase 1: 0..300 with an internal duplicate block (100..150 twice)
    urls(0, 300).unionAll(urls(100, 150)).repartition(3).write.parquet(src)
    run_streaming_bloom_dedup(
        spark, src, schema, out, store, ckpt, key_col="url"
    )
    got1 = read_bloom_deduped(spark, out, key_cols=["url"])
    assert got1.count() == 300  # internal dupes collapsed
    raw1 = spark.read.parquet(out)
    assert raw1.count() == 300  # and not emitted twice either

    # phase 2: 200..500 arrives much later — 100 overlap, 200 new
    urls(200, 500).repartition(2).write.mode("append").parquet(src)
    run_streaming_bloom_dedup(
        spark, src, schema, out, store, ckpt, key_col="url"
    )
    raw2 = spark.read.parquet(out)
    # only the 200 genuinely-new keys were appended (no false
    # positives expected at n=500, m=65536: rate ~1e-6)
    assert raw2.count() == 500
    resolved = read_bloom_deduped(spark, out, key_cols=["url"])
    assert resolved.count() == 500
    assert resolved.groupBy("url").count().filter("count > 1").count() == 0

    # crash-retry: double-append one epoch's rows; resolver unchanged
    dup = raw2.filter(F.col("_epoch") == 0)
    dup.write.mode("append").parquet(out)
    assert read_bloom_deduped(spark, out, key_cols=["url"]).count() == 500


def test_streaming_bloom_dedup_checkpoint_recreation_safe(spark, tmp_path):
    """A recreated checkpoint restarts epoch numbering at 0 — the
    new generation's batch ids must NOT collide with (and overwrite)
    the old generation's filters, and dedup against the old
    generation's membership must still hold."""
    import shutil

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators.sketches import (
        list_bloom_store_batches,
    )
    from physicsnemo_curator_spark.streaming.dedup import (
        read_bloom_deduped,
        run_streaming_bloom_dedup,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, payload long"

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.col("id").alias("payload"),
        )

    urls(0, 200).coalesce(1).write.parquet(src)
    run_streaming_bloom_dedup(spark, src, schema, out, store, ckpt, key_col="url")
    gen1_batches = set(list_bloom_store_batches(spark, store))
    assert gen1_batches

    # ops accident: checkpoint lost; new data arrives with overlap
    shutil.rmtree(ckpt)
    urls(100, 300).coalesce(1).write.mode("append").parquet(src)
    run_streaming_bloom_dedup(spark, src, schema, out, store, ckpt, key_col="url")

    # old generation's filters survived (no batch-id collision)
    gen2_batches = set(list_bloom_store_batches(spark, store))
    assert gen1_batches <= gen2_batches
    assert len(gen2_batches) > len(gen1_batches)
    # and dedup held across the generations: every url exactly once
    resolved = read_bloom_deduped(spark, out, key_cols=["url"])
    assert resolved.count() == 300
    assert resolved.groupBy("url").count().filter("count > 1").count() == 0


@pytest.mark.soak
def test_state_partitions_scoped_to_cloned_session(spark, tmp_path):
    """state_partitions must not leak into the caller's session: the
    runner scopes it to a spark.newSession() clone, so a concurrent
    batch query on the original session keeps its partition count
    (ADVICE r10: the old implementation mutated the shared conf for
    the stream's whole lifetime)."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )
    from physicsnemo_curator_spark.streaming.stateful import (
        run_running_stats_foreachbatch,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows = [
        (i, i % 3, f"2024-01-01 00:00:{i:02d}", float(i)) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    df.write.parquet(str(tmp_path / "l"))
    df.write.parquet(str(tmp_path / "r"))
    out = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        state_partitions=2,
    )
    assert out.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    df.withColumnRenamed("user_id", "k").selectExpr(
        "event_id", "CAST(k AS STRING) event_type", "ts", "value"
    ).write.parquet(str(tmp_path / "s"))
    stats = run_running_stats_foreachbatch(
        spark,
        str(tmp_path / "s"),
        "event_id long, event_type string, ts timestamp, value double",
        state_partitions=2,
    )
    assert stats.count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_run_interval_join_stream_left_outer(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: unmatched left rows
    must emit with NULL right columns — which only happens when the
    watermark passes their state expiry, the mechanics the runner's
    flush batches exist to drive.  Result must equal the batch left
    join exactly."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    # left rows 0..5 at t, right matches only for even ids (within 60s)
    lrows = [(i, i, f"2024-01-01 00:{i:02d}:00", 1.0) for i in range(6)]
    rrows = [
        (100 + i, i, f"2024-01-01 00:{i:02d}:30", 2.0)
        for i in range(0, 6, 2)
    ]
    for side, rows in (("l", lrows), ("r", rrows)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).selectExpr(
            "event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "value"
        ).repartition(2).write.parquet(str(tmp_path / side))
    out = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        lower_seconds=0,
        upper_seconds=60,
        watermark="10 minutes",
        how="left_outer",
        state_partitions=2,
    )
    got = sorted(
        ((r["a"], r["b"]) for r in out.collect()),
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    # matches join r.ts in [l.ts - 60, l.ts]: right event at :30 of
    # the SAME minute is AFTER l.ts, so the matching pair is the right
    # event 30s after the previous even minute... compute expected in
    # plain python: pair (l, r) iff same user and 0 <= l.ts - r.ts <= 60
    import datetime as _dt

    def ts(s):
        return _dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")

    expect = []
    for le, lu, lt, _ in lrows:
        ms = [
            re
            for re, ru, rt, _ in rrows
            if ru == lu and 0 <= (ts(lt) - ts(rt)).total_seconds() <= 60
        ]
        if ms:
            expect.extend((le, m) for m in ms)
        else:
            expect.append((le, None))
    expect.sort(key=lambda t: (t[0], t[1] if t[1] is not None else -1))
    assert got == expect
    assert any(b is None for _a, b in got)  # outer rows really emitted
    # inputs were staged, not mutated
    import os as _os

    assert not any(
        f.startswith("zz-") for f in _os.listdir(str(tmp_path / "l"))
    )
    # idempotent reuse path (skip=True recomputes only the bound)
    again = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        lower_seconds=0,
        upper_seconds=60,
        watermark="10 minutes",
        how="left_outer",
        state_partitions=2,
    )
    assert again.count() == len(expect)


def test_run_interval_join_stream_full_outer(spark, tmp_path):
    """FULL OUTER stream-stream interval join: unmatched rows from
    BOTH sides emit with nulls on the other side, equal to the batch
    full join.  Right-side expiry (r.ts + upper) and left-side expiry
    (l.ts - lower) are both covered by the flush margin."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    # users 0..3; right matches exist for users 0,2 (30s before left);
    # user 5 exists ONLY on the right
    lrows = [(i, i, f"2024-01-01 00:{i:02d}:30", 1.0) for i in range(4)]
    rrows = [
        (100 + i, i, f"2024-01-01 00:{i:02d}:00", 2.0) for i in (0, 2)
    ] + [(105, 5, "2024-01-01 00:07:00", 2.0)]
    for side, rows in (("l", lrows), ("r", rrows)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).selectExpr(
            "event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "value"
        ).repartition(2).write.parquet(str(tmp_path / side))
    out = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        lower_seconds=0,
        upper_seconds=60,
        watermark="10 minutes",
        how="full_outer",
        state_partitions=2,
    )
    key = lambda t: (
        -1 if t[0] is None else t[0],
        -1 if t[1] is None else t[1],
    )
    got = sorted(((r["a"], r["b"]) for r in out.collect()), key=key)
    expect = sorted(
        [(0, 100), (2, 102), (1, None), (3, None), (None, 105)], key=key
    )
    assert got == expect


def test_interval_seconds_parsing():
    """Fractional counts parse; malformed or unknown-unit strings fail
    with the descriptive message, never a bare split/int ValueError
    (r11 advice)."""
    import pytest

    from physicsnemo_curator_spark.streaming.joins import _interval_seconds

    assert _interval_seconds("2 hours") == 7200
    assert _interval_seconds("1.5 hours") == 5400
    assert _interval_seconds("500 milliseconds") == 0.5
    with pytest.raises(ValueError, match="malformed watermark interval"):
        _interval_seconds("60days")
    with pytest.raises(ValueError, match="malformed watermark interval"):
        _interval_seconds("2")
    with pytest.raises(ValueError, match="unsupported watermark unit"):
        _interval_seconds("2 fortnights")


@pytest.mark.soak
def test_outer_join_runner_nested_and_hive_layouts(spark, tmp_path):
    """Nested (date-bucketed, non-hive) source layouts stage flattened
    and produce the same outer join as a flat layout — every column
    lives in the files, so relocation is lossless.  HIVE-partitioned
    layouts keep the loud gate: the partition column exists only in
    the directory name and would read back NULL from a flattened
    stage."""
    import pytest
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    base = 1_700_000_000
    schema = "event_id long, user_id long, ts timestamp, value double"

    def frame(offs):
        rows = [(i, 1, float(i), base + o) for i, o in enumerate(offs)]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, value double, epoch long"
        ).selectExpr(
            "event_id", "user_id",
            "CAST(TIMESTAMP_SECONDS(epoch) AS TIMESTAMP) ts", "value",
        ).select("event_id", "user_id", "ts", "value")

    # nested layout: day-bucketed subdirs WITHOUT hive key=value names
    lefts, rights = [0, 50, 400], [30, 600]
    for side, offs in (("l", lefts), ("r", rights)):
        df = frame(offs)
        df.filter("event_id < 2").coalesce(1).write.parquet(
            str(tmp_path / side / "day1")
        )
        df.filter("event_id >= 2").coalesce(1).write.parquet(
            str(tmp_path / side / "day2")
        )
    out = run_interval_join_stream(
        spark,
        str(tmp_path / "l"),
        str(tmp_path / "r"),
        schema,
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        lower_seconds=0,
        upper_seconds=60,
        watermark="10 minutes",
        how="left_outer",
        state_partitions=2,
    )
    got = sorted(
        ((r["a"], r["b"]) for r in out.collect()),
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    # closed form: (l, r) iff 0 <= l.ts - r.ts <= 60, else (l, None)
    inner = [
        (i, j)
        for i, lo in enumerate(lefts)
        for j, ro in enumerate(rights)
        if 0 <= lo - ro <= 60
    ]
    ml = {i for i, _ in inner}
    expect = sorted(
        inner + [(i, None) for i in range(len(lefts)) if i not in ml],
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    assert got == expect

    # hive layout: partition col only in dir names -> loud gate
    hive = tmp_path / "hive_src"
    frame(lefts).withColumn("day", F.lit(1)).write.partitionBy(
        "day"
    ).parquet(str(hive))
    with pytest.raises(ValueError, match="hive-partitioned"):
        run_interval_join_stream(
            spark,
            str(hive),
            str(tmp_path / "r"),
            schema,
            {"a": "l.event_id", "b": "r.event_id"},
            work_dir=str(tmp_path / "run_hive"),
            lower_seconds=0,
            upper_seconds=60,
            watermark="10 minutes",
            how="left_outer",
        )


@pytest.mark.soak
def test_outer_join_runner_mixed_layout_and_temporary_dirs(spark, tmp_path):
    """Review-finding regressions: (a) a MIXED source (top-level AND
    nested parquet) stages every file — the old fallback took only the
    top level while the event-time bound saw all rows, silently
    dropping the nested rows from the result; (b) files under
    _temporary/hidden dirs (a crashed write's debris) are skipped,
    exactly as Spark's own path filter skips them."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    base = 1_700_000_000
    schema = "event_id long, user_id long, ts timestamp, value double"
    lefts, rights = [0, 50, 400], [30, 600]

    def frame(offs, ids=None):
        rows = [
            (i if ids is None else ids[n], 1, float(o), base + o)
            for n, (i, o) in enumerate(
                (k, v) for k, v in enumerate(offs)
            )
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, value double, epoch long"
        ).selectExpr(
            "event_id", "user_id",
            "CAST(TIMESTAMP_SECONDS(epoch) AS TIMESTAMP) ts", "value",
        ).select("event_id", "user_id", "ts", "value")

    # left: event 0,1 at top level; event 2 nested under day2/
    ldir = tmp_path / "l"
    frame(lefts).filter("event_id < 2").coalesce(1).write.parquet(str(ldir))
    frame(lefts).filter("event_id >= 2").coalesce(1).write.parquet(
        str(ldir / "day2")
    )
    # debris: a duplicate of event 0 under _temporary must NOT stage
    frame(lefts).filter("event_id = 0").coalesce(1).write.parquet(
        str(ldir / "_temporary" / "0")
    )
    rdir = tmp_path / "r"
    frame(rights).coalesce(1).write.parquet(str(rdir))
    out = run_interval_join_stream(
        spark,
        str(ldir),
        str(rdir),
        schema,
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp_path / "run"),
        lower_seconds=0,
        upper_seconds=60,
        watermark="10 minutes",
        how="left_outer",
        state_partitions=2,
    )
    key = lambda t: (t[0], -1 if t[1] is None else t[1])
    got = sorted(((r["a"], r["b"]) for r in out.collect()), key=key)
    inner = [
        (i, j)
        for i, lo in enumerate(lefts)
        for j, ro in enumerate(rights)
        if 0 <= lo - ro <= 60
    ]
    ml = {i for i, _ in inner}
    expect = sorted(
        inner + [(i, None) for i in range(len(lefts)) if i not in ml],
        key=key,
    )
    # event 2 (nested) present exactly once; event 0 not duplicated
    assert got == expect
