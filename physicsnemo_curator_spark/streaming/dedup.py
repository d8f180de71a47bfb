"""Streaming deduplication with watermark-bounded state.

The streaming twin of :mod:`physicsnemo_curator_spark.operators.dedup`'s
exact dedup (SURVEY §2.8 stateful operators): on a stream,
``dropDuplicatesWithinWatermark`` keeps one row per key among events
whose timestamps fall within the watermark delay of each other, and —
unlike plain ``dropDuplicates`` on a stream — EVICTS key state once the
watermark passes, so state is bounded by the event rate × delay window,
not the all-time key cardinality.  That eviction is what makes exact
streaming dedup viable on a 100 TB/day firehose: the alternative
(keeping every key ever seen) is unbounded state.

On a batch frame the same call degrades to a plain ``dropDuplicates``
(batch has no watermark), which is what the parity test checks against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-one-row-per-key within the watermark horizon.

    Streaming: watermarked ``dropDuplicatesWithinWatermark`` (append
    mode, bounded state).  Batch: plain ``dropDuplicates`` over the
    keys — the parity oracle.
    """
    if events.isStreaming:
        return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def run_streaming_bloom_dedup(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    store: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    group_col: str | None = None,
    n_bits: int = 65536,
    k: int = 4,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 1,
) -> None:
    """ALL-TIME streaming dedup with BOUNDED state: the Bloom-store
    composition (:mod:`operators.sketches`) run from foreachBatch.

    :func:`dedup_stream` bounds state by evicting keys past the
    watermark — correct for time-local duplicates, blind to a URL
    recrawled a month later.  This pipeline keeps ALL-time membership
    in ``n_bits`` per group (fixed, forever) instead of the unbounded
    key set: each micro-batch (1) probes its keys against the union of
    every EARLIER batch's persisted filter, (2) appends only
    definitely-new rows (``might_contain`` false) to ``out_dir``, and
    (3) persists its own filter under ``batch_id=e{epoch}``.

    Approximation contract: no duplicate key is ever re-emitted (Bloom
    has no false negatives); a bounded fraction of genuinely-new keys
    (the false-positive rate, ~(1 - e^(-kn/m))^k) is wrongly dropped —
    size ``n_bits`` to the loss budget.  For exactness, route
    ``might_contain`` true rows to an exact re-check against the
    emitted table instead of dropping them.

    Crash/retry safety: a replayed epoch overwrites its OWN filter
    partition (dynamic partition overwrite) and is probed only against
    batches with ids OTHER than its own — so a batch never sees the
    filter its failed previous attempt persisted (which would flag
    every one of its keys as duplicates and drop the whole batch).
    Batch ids embed the streaming query's CHECKPOINT-persisted id, so
    an epoch numbering restarted by a recreated checkpoint cannot
    collide with (and silently overwrite) an earlier generation's
    filters — epoch 0 of a new generation is a new partition, and the
    old generation's membership keeps deduplicating.  Output rows
    carry ``_epoch``; a retried batch double-appends identical rows,
    and the reader's ``dropDuplicates`` resolver is idempotent to that
    (same discipline as the running-stats table).
    """
    import json
    import os

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators.sketches import (
        append_bloom_store,
        list_bloom_store_batches,
        probe_bloom_store,
    )

    field_names = (
        schema.fieldNames()
        if hasattr(schema, "fieldNames")
        else spark.createDataFrame([], schema).schema.fieldNames()
    )
    for reserved in ("_epoch",) + (("_g",) if group_col is None else ()):
        if reserved in field_names:
            raise ValueError(
                f"input schema already has a {reserved!r} column — it is "
                "reserved by this pipeline (epoch tag / implicit group) "
                "and would be silently overwritten; rename it upstream"
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def _generation_token() -> str:
        # Spark persists the query id in <checkpoint>/metadata at first
        # start and keeps it across restarts of the SAME checkpoint; a
        # recreated checkpoint gets a new id.  foreachBatch runs after
        # the file exists.  Non-local checkpoint paths fall back to a
        # constant token (same-generation semantics, documented).
        try:
            with open(os.path.join(checkpoint_dir, "metadata")) as fh:
                return json.load(fh)["id"][:8]
        except OSError:
            return "g0"

    def _sink(batch_df, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        grp = group_col or "_g"
        batch = (
            batch_df
            if group_col is not None
            else batch_df.withColumn("_g", F.lit("all"))
        )
        # within-batch exact dedup first: the filter only covers
        # EARLIER batches
        batch = batch.dropDuplicates([grp, key_col])
        my_id = f"{_generation_token()}-e{epoch_id}"
        # Spark-side listing, not a driver listdir: object-store /
        # HDFS / unmounted-store layouts must still see prior batches
        # (a local listdir would silently return [] there and disable
        # every probe)
        earlier = [
            b for b in list_bloom_store_batches(sess, store) if b != my_id
        ]
        if earlier:
            probed = probe_bloom_store(
                sess, store, batch, [grp], key_col, batches=earlier
            )
            new_rows = probed.filter(~F.col("might_contain")).drop(
                "might_contain"
            )
        else:
            new_rows = batch
        new_rows = new_rows.withColumn("_epoch", F.lit(int(epoch_id)))
        if group_col is None:
            new_rows = new_rows.drop("_g")
        new_rows.write.mode("append").parquet(out_dir)
        append_bloom_store(
            batch,
            store,
            [grp],
            key_col,
            batch_id=my_id,
            n_bits=n_bits,
            k=k,
            hash_fn=hash_fn,
        )

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_bloom_deduped(spark, out_dir: str, *, key_cols: Sequence[str]):
    """Resolver for the streaming-bloom output table: identical rows
    double-appended by a crash-retried epoch collapse here."""
    return spark.read.parquet(out_dir).drop("_epoch").dropDuplicates(
        list(key_cols)
    )
