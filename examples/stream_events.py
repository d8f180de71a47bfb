#!/usr/bin/env python
"""Streaming example: an event feed curated with the PRODUCTION-shape
streaming operators — nothing collected on the driver.

Simulates a click/purchase event feed landing as parquet files and
runs the engine's streaming stack over it:

    file stream (one file per micro-batch)
      → stateful running stats per event_type
        (applyInPandasWithState → executor-side append table,
        last-write-wins readers; restart-resumable checkpoint)
      → watermarked stream-stream interval join
        ("purchase within 24h before the click", inner append mode,
        state bounded by watermark + interval, parquet sink)
      → attribution summary over the joined sink.

The same operators carry the driver gates q_st3_stream_welford and
q_st4_stream_interval_join; this composes them the way a deployment
would, with sinks and checkpoints on shared storage.

Usage: python examples/stream_events.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402
from physicsnemo_curator_spark.streaming import joins as sjoins  # noqa: E402
from physicsnemo_curator_spark.streaming import stateful  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_events"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    spark = get_spark(app_name="stream-events")
    spark.sparkContext.setLogLevel("ERROR")

    # --- land the feed as files (the stream source) -------------------
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    feed = os.path.join(work, "feed")
    events.repartition(4).write.parquet(feed)
    schema = (
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )

    # --- 1. stateful running stats, executor-side table ---------------
    stats_table = os.path.join(work, "stats_table")
    stateful.run_running_stats_to_table(
        spark, feed, schema, stats_table, os.path.join(work, "stats_ckpt")
    )
    final = stateful.read_running_stats_table(spark, stats_table)
    print("running stats per event_type (last-write-wins):")
    for r in final.orderBy("key").collect():
        print(f"  {r['key']:10s} n={r['n']:6d} mean={r['mean']:8.3f}")

    # --- 2. watermarked stream-stream interval join -------------------
    for side, etype in (("clicks", "click"), ("purchases", "purchase")):
        events.filter(F.col("event_type") == etype).drop(
            "event_type"
        ).repartition(3).write.parquet(os.path.join(work, side))
    joined = sjoins.run_interval_join_stream(
        spark,
        os.path.join(work, "clicks"),
        os.path.join(work, "purchases"),
        "event_id long, user_id long, ts timestamp, value double",
        {
            "click_id": "l.event_id",
            "user_id": "l.user_id",
            "click_ts": "l.ts",
            "purchase_value": "r.value",
        },
        work_dir=os.path.join(work, "join_run"),
        upper_seconds=86400,
        watermark="60 days",
    )

    # --- 3. attribution summary over the sink -------------------------
    summary = (
        joined.groupBy(F.window("click_ts", "7 days").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("attributed_pairs"),
            F.round(F.sum("purchase_value"), 2).alias("attributed_value"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy("w")
    )
    print("\nattributed purchases within 24h before a click, by week:")
    for r in summary.collect():
        print(
            f"  {r['w']['start']:%Y-%m-%d}: pairs={r['attributed_pairs']:5d}"
            f" value={r['attributed_value']:10.2f} users={r['users']}"
        )
    print(f"\nartifacts under {work}")


if __name__ == "__main__":
    main()
