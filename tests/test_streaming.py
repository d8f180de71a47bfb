"""Streaming operators: batch/stream parity and memory-sink smoke.

The reference has no streaming engine (SURVEY §1.4); these validate the
Structured Streaming form of its running-stats semantics — the same
aggregation must produce identical results on a batch frame and on the
stream once drained.
"""

from __future__ import annotations

import os
import shutil

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


def test_session_windows(spark, sf_dir, tmp_path):
    path = _events_dir(spark, sf_dir, tmp_path)
    batch = spark.read.parquet(path)
    out = session_window_agg(batch)
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["cnt"] for r in rows)
    assert total == batch.count()
