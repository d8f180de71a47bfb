"""Watermarked window aggregations over an event stream.

The reference has no streaming engine; its closest machinery is the
online/running statistics of ``DataArrayStatsFilter`` (reference
``domains/da/filters/stats.py:485-574`` — Welford update per arriving
sample).  These operators are the Structured Streaming form of that
contract: stateful aggregation with watermark-bounded state (SURVEY
§2.8).  Each works on both a streaming and a batch DataFrame — the
batch twin is what the DuckDB oracle checks (Q-ST1/ST2).

State-size posture for 100 TB/day streams: the watermark bounds state
to (watermark horizon / slide) windows per group key; avg/count/var
aggregates keep O(1) state per (window, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_stats(
    events: DataFrame,
    *,
    time_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window running stats (count/mean/var) with late-data bound."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark)
    return src.groupBy(F.window(time_col, window).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg("value").alias("avg_value"),
        F.var_pop("value").alias("var_value"),
    )


def sliding_window_stats(
    events: DataFrame,
    *,
    time_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window stats — each event lands in window/slide windows."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark)
    return src.groupBy(F.window(time_col, window, slide).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg("value").alias("avg_value"),
    )


def session_window_agg(
    events: DataFrame,
    *,
    time_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: activity bursts separated by > gap."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark)
    return src.groupBy(F.session_window(time_col, gap).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("sum_value"),
    )


def run_stream_to_memory(
    spark,
    source_dir: str,
    schema,
    build,
    *,
    query_name: str = "stream_out",
    output_mode: str = "complete",
):
    """Drive a parquet-directory stream through ``build`` into an
    in-memory sink and block until drained — the local smoke harness
    for the streaming operators (a real deployment swaps the source
    for Kafka and the sink for foreachBatch).  ``output_mode='append'``
    for non-aggregating stateful ops (dedup, joins)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = build(stream)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
