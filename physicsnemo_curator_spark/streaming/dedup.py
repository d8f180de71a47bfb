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
