"""Custom stateful streaming operator: per-key running moment stats.

The true streaming form of the reference's online Welford update
(reference ``domains/da/filters/stats.py:541-574``: one update per
arriving sample, state = (n, mean, M2)).  Implemented with
``applyInPandasWithState``: state per group key holds the power sums
(n, s1, s2) — the same algebraically mergeable representation the batch
``welford_state`` operator persists — and each micro-batch folds its
rows in vectorized numpy.

State size: O(1) per key, no watermark needed (running totals, not
windows).  For windowed variants use streaming.windows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

OUTPUT_SCHEMA = "key string, n long, mean double, var_pop double"
STATE_SCHEMA = "n long, s1 double, s2 double"


def _update_running_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """GroupState update function: fold batch rows into power sums."""
    if state.exists:
        n, s1, s2 = state.get
    else:
        n, s1, s2 = 0, 0.0, 0.0
    for pdf in pdfs:
        v = pdf["value"].astype("float64")
        # count() skips NaN/NULL like the batch twin's F.count/F.sum
        # (operators/stats.py welford_state) — size would inflate n
        n += int(v.count())
        s1 += float(v.sum())
        s2 += float((v * v).sum())
    state.update((n, s1, s2))
    mean = s1 / n if n else 0.0
    var = max(s2 / n - mean * mean, 0.0) if n else 0.0
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n], "mean": [mean], "var_pop": [var]}
    )


def running_stats_stream(events, *, key_col: str = "event_type", value_col: str = "value"):
    """Attach the stateful running-stats operator to a (streaming or
    batch-test) events frame keyed on ``key_col``."""
    from pyspark.sql import functions as F

    # OUTPUT_SCHEMA declares `key string`; cast so non-string key
    # columns don't hit an Arrow type error inside the state server
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update_running_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_dedup(
    docs,
    *,
    text_col: str = "text",
    time_col: str | None = None,
    watermark: str = "1 hour",
):
    """Streaming exact dedup by content fingerprint.

    The streaming form of ``dedup.dedup_exact`` (north star): arriving
    docs keep only the first occurrence of each normalized-content
    fingerprint.  With a ``time_col``, uses
    ``dropDuplicatesWithinWatermark`` so the fingerprint state is
    bounded by the watermark horizon instead of growing forever — the
    required form for an unbounded 100 TB/day ingest stream.
    """
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators.dedup import normalize_text

    keyed = docs.withColumn("fingerprint", F.md5(normalize_text(F.col(text_col))))
    # keep the batch dedup_exact contract: output schema == input schema
    if time_col is not None and keyed.isStreaming:
        return (
            keyed.withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"])
            .drop("fingerprint")
        )
    return keyed.dropDuplicates(["fingerprint"]).drop("fingerprint")


def run_running_stats_foreachbatch(
    spark,
    source_dir: str,
    schema,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
):
    """Drive the stateful operator through a real micro-batch stream
    with a ``foreachBatch`` sink; returns the FINAL per-key stats as a
    batch DataFrame.

    ``maxFilesPerTrigger=1`` forces one micro-batch per source file, so
    the GroupState genuinely folds across batches (a single-batch run
    would never exercise ``state.exists``).  foreachBatch collects each
    update-mode emission driver-side — one row per (key, batch), i.e.
    O(keys × batches), never O(rows) — and last-write-wins per key.

    ``state_partitions`` right-sizes the state store: a stateful query
    pins ``spark.sql.shuffle.partitions`` into its checkpoint and runs
    that many state tasks per micro-batch regardless of key count —
    size it to key cardinality.  The setting is scoped to a CLONED
    session (``spark.newSession()``: same SparkContext, isolated
    SQLConf), so concurrent batch queries on the caller's session
    never see the reduced partition count.
    """
    sess = spark.newSession() if state_partitions is not None else spark
    if state_partitions is not None:
        sess.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    stream = (
        sess.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    out = running_stats_stream(stream, key_col=key_col, value_col=value_col)
    final: dict[str, Any] = {}

    def _sink(batch_df, epoch_id: int) -> None:
        for row in batch_df.collect():
            final[row["key"]] = row

    q = out.writeStream.outputMode("update").foreachBatch(_sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.createDataFrame(list(final.values()), OUTPUT_SCHEMA)


def run_running_stats_to_table(
    spark,
    source_dir: str,
    schema,
    table_dir: str,
    checkpoint_dir: str,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
) -> None:
    """PRODUCTION form of the stateful running-stats pipeline: stream →
    GroupState fold → per-batch APPEND to a parquet table.  Nothing is
    ever collected on the driver; each update-mode emission lands as
    rows ``(key, n, mean, var_pop, _epoch)`` written by the executors.

    Restart-resumable: ``checkpointLocation`` persists both the source
    offsets and the ``applyInPandasWithState`` state store, so a
    stopped-and-restarted run processes only files it has not seen and
    the running totals continue where they left off (exactly-once over
    the source).  Readers resolve last-write-wins per key in SQL —
    :func:`read_running_stats_table` — so the append-only table needs
    no in-place updates (the Delta/Iceberg upgrade path is a MERGE on
    key, same shape).  A batch retried after a mid-write crash can
    double-append its rows; both copies carry identical (key, _epoch)
    values, so the resolver is idempotent to that too.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    out = running_stats_stream(stream, key_col=key_col, value_col=value_col)

    def _sink(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_df.withColumn("_epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(table_dir)

    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_running_stats_table(spark, table_dir: str):
    """Current per-key stats from the append-only table: the row with
    the highest ``_epoch`` per key (one shuffle on key; at warehouse
    scale, partition the table by key bucket and this prunes)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet(table_dir)
    w = Window.partitionBy("key").orderBy(F.desc("_epoch"))
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn", "_epoch")
    )


def run_running_stats(spark, source_dir: str, schema, *, key_col="event_type", value_col="value"):
    """Drive the stateful operator over a parquet-directory stream into
    a memory sink; returns the final per-key stats DataFrame."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = running_stats_stream(stream, key_col=key_col, value_col=value_col)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_stats")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per key per batch; keep the last
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.sql("SELECT *, monotonically_increasing_id() AS _ord FROM running_stats")
    w = Window.partitionBy("key").orderBy(F.desc("_ord"))
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_ord", "_rn")
    )


# --- transformWithStateInPandas twin --------------------------------------
#
# Spark 4 replaces applyInPandasWithState with the StatefulProcessor API
# (multiple named state variables, timers, TTL, initial-state bootstrap).
# The running-stats operator on that API, kept semantically identical to
# running_stats_stream so either engine version serves the pipeline.
#
# ENVIRONMENT GATE: the transformWithState Python runtime speaks
# protobuf to its state server (pyspark/sql/streaming/proto); in a
# container without google.protobuf the query fails at initialization
# with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.  The
# applyInPandasWithState operator above has no such dependency and is
# the default engine path; this twin unlocks wherever protobuf exists
# (its parity test skips itself when the gate is closed).


def _make_running_stats_processor():
    """Build the StatefulProcessor class lazily: the import only exists
    on Spark >= 4.0, and the operator should import cleanly on 3.5."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class RunningStatsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._sums = handle.getValueState("powersums", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            if self._sums.exists():
                n, s1, s2 = self._sums.get()
            else:
                n, s1, s2 = 0, 0.0, 0.0
            for pdf in rows:
                v = pdf["value"].astype("float64")
                n += int(v.count())  # skip NaN/NULL like the batch twin
                s1 += float(v.sum())
                s2 += float((v * v).sum())
            self._sums.update((n, s1, s2))
            mean = s1 / n if n else 0.0
            var = max(s2 / n - mean * mean, 0.0) if n else 0.0
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "mean": [mean], "var_pop": [var]}
            )

        def close(self) -> None:
            pass

    return RunningStatsProcessor()


def running_stats_stream_tws(
    events, *, key_col: str = "event_type", value_col: str = "value"
):
    """running_stats_stream on the transformWithStateInPandas API."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_make_running_stats_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_running_stats_tws(
    spark,
    source_dir: str,
    schema,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
):
    """Micro-batch harness for the transformWithStateInPandas twin —
    same contract as run_running_stats_foreachbatch."""
    from typing import Any

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    out = running_stats_stream_tws(stream, key_col=key_col, value_col=value_col)
    final: dict[str, Any] = {}

    def _sink(batch_df, epoch_id: int) -> None:
        for row in batch_df.collect():
            final[row["key"]] = row

    q = out.writeStream.outputMode("update").foreachBatch(_sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.createDataFrame(list(final.values()), OUTPUT_SCHEMA)
