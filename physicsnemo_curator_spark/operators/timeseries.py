"""Time-series operators Spark lacks natively: as-of join, sessionize.

Declared in SURVEY §2.6 (interval/as-of joins absent from the reference
but required for events-style data).  Both are compositions of existing
DataFrame ops — no UDFs — so they stay JVM-side and scale with the
shuffle, not the pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < when strict), per join key.

    Union-and-window implementation: tag both sides, union on the key +
    time axis, and carry the last right values forward with a window
    running ``last(..., ignorenulls=True)`` — one shuffle on
    (keys, time), no range-join explosion.  The standard alternative
    (bucketize + equi-join + filter) shuffles the same data but can't
    avoid bucket skew; this form is skew-bound only by the key.
    """
    lt = F.col(left_time)
    # NULL join keys never match in SQL ASOF semantics — drop NULL-key
    # right rows so a NULL-key left row gets asof NULL instead of
    # silently pairing inside the shared NULL window partition
    r_src = right
    for k in on:
        r_src = r_src.filter(F.col(k).isNotNull())
    l_tag = left.select(
        *on,
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"`{c}`: {dict(right.dtypes)[c]}" for c in right_cols
            )
            + ">"
        )
        .alias("_rrow"),
    )
    r_tag = r_src.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        # ONE struct per right row: last(ignorenulls) over per-column
        # placeholders would skip a right row whose value is genuinely
        # NULL and attach a stale older value (and mix columns from
        # different rows); the struct is non-null whenever a right row
        # exists, so its fields carry real NULLs faithfully
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal time unless strict —
    # an as-of match at exactly t counts (<=) or not (<)
    order = [F.col("_t"), F.col("_is_left") if not strict else (1 - F.col("_is_left"))]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    filled = u.select(
        "*",
        F.last("_rrow", ignorenulls=True).over(w).alias("_asof_row"),
    ).filter(F.col("_is_left") == 1)
    out_cols = [F.col("_lrow").getField(c).alias(c) for c in left.columns]
    out_cols += [
        F.col("_asof_row").getField(c).alias(f"asof_{c}") for c in right_cols
    ]
    return filled.select(*out_cols)


def sessionize(
    events: DataFrame,
    *,
    key: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_seconds``.

    lag + cumulative-sum-of-boundaries — the batch twin of
    ``session_window`` in streaming (physicsnemo_curator_spark.streaming).
    """
    order = [F.col(time_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.col(time_col).cast("long")
    gap = epoch - F.lag(epoch).over(w)
    # two projection steps: window functions can't nest in one select
    with_boundary = events.select(
        "*",
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0).alias("_boundary"),
    )
    return with_boundary.select(
        *events.columns,
        F.sum("_boundary")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )


def rollup_cascade(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Hypertable-style continuous-aggregate cascade: mergeable moment
    state at the finest time bucket, every coarser level re-aggregated
    from the finer level's STATE — raw rows are scanned exactly once.

    State per bucket is (n, Σv, Σv², Σv³, Σv⁴, min, max) — the power-sum
    form of the reference's resumable Welford state (``stats.py:96-102``,
    see stats.welford_state): states merge by plain addition, so an
    incremental refresh of a new hour folds into the day/month levels
    without touching history.  At 100 TB this is the difference between
    re-aggregating a day (rescan) and summing 24 rows per key.
    """
    v = F.col(value_col)
    state = df.groupBy(
        F.date_trunc(levels[0], F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )
    out = {levels[0]: state}
    for lvl in levels[1:]:
        state = state.groupBy(
            F.date_trunc(lvl, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.sum("s3").alias("s3"),
            F.sum("s4").alias("s4"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        out[lvl] = state
    return out


def finalize_rollup(state: DataFrame) -> DataFrame:
    """(bucket, n, mean, var_pop, vmin, vmax) from cascade state —
    population variance per the reference's finalize semantics."""
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    return state.select(
        "bucket",
        "n",
        mean.alias("mean"),
        F.greatest(m2, F.lit(0.0)).alias("var_pop_v"),
        "vmin",
        "vmax",
    )
