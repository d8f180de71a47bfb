"""Stream-stream joins with event-time bounds.

The reference has no streaming engine (SURVEY §1.4); this is the
Structured Streaming capability its as-of/attach patterns map onto when
both sides are unbounded: join click and purchase streams on key with a
time-range predicate, watermarks bounding how much state each side must
keep.  Semantics are checkable in batch — the same join expression over
static frames must produce the same rows (tests do exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Key-equality join with right_time ∈ [left_time − upper,
    left_time − lower]: "attach the right-side event that happened up
    to `upper_seconds` BEFORE the left event".

    On streaming inputs both sides get watermarks — together with the
    range predicate they bound the join state Spark must retain (rows
    older than watermark + interval are evicted), which is the entire
    scale story of a stream-stream join: state is O(window), never
    O(stream).  On batch inputs the watermark calls are no-ops and the
    join is an ordinary range join, which is how the tests pin parity.
    """
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    lw = (
        left.withWatermark(left_time, left_watermark)
        if left.isStreaming
        else left
    )
    rw = (
        right.withWatermark(right_time, right_watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt >= lt - F.expr(f"INTERVAL {upper_seconds} SECONDS"))
        & (rt <= lt - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)
