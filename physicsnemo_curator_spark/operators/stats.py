"""Distributed statistics operators.

Re-expresses the reference's Welford/Chan partial+merge statistics
machinery (reference ``domains/mesh/filters/stats.py:232-498,675-837``,
``domains/da/filters/stats.py:485-819``, ``domains/mesh/filters/mean.py``)
as Catalyst aggregates.  Spark's ``avg/var_pop/stddev_pop/skewness/
kurtosis`` already run as partial (map-side) + final (merge) aggregates
— the exact contract the reference hand-builds with Chan's parallel
moment formulas — so every stat here is a single shuffle on the group
keys with map-side combine, no custom UDAF needed.

Scale notes (100 TB posture):
- One hash-aggregate shuffle keyed on the group columns; partial
  aggregation means shuffled bytes ~ O(groups), not O(rows).
- ``percentile_approx`` (KLL-style sketch) replaces exact median: the
  reference itself declares median non-mergeable and emits NaN after
  its distributed merge (``stats.py:825-827``); we return an
  approximate value instead of NaN and document the tolerance.
- Population (not sample) variance, excess kurtosis, skew/kurt
  semantics follow the reference (``stats.py:182,199-202``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    abs_center: float = 0.0,
    include_median: bool = False,
) -> DataFrame:
    """Per-group moment statistics (MeshStatsFilter semantics).

    Emits count, mean, min, max, stddev_pop, var_pop, skewness,
    excess kurtosis, abs_mean (mean of |x - abs_center|), abs_max.
    Column names are stable so downstream code and the differential
    oracle can address them.
    """
    v = F.col(value_col)
    # Skew/kurt come from power sums + the same guarded finalize as
    # finalize_welford_state, NOT Spark's builtin skewness/kurtosis:
    # under ANSI mode the builtins raise DIVIDE_BY_ZERO whenever the
    # internal Σ(x-mean)² cubes/squares underflow to exactly 0 (found
    # by hypothesis with a near-constant group at ~1e-56 — a real
    # crash for constant or unit-converted tiny fields).  Projection-
    # level double division never throws, and the zero-variance guard
    # pins those groups to 0 per the reference's finalize semantics.
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("mean"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.stddev_pop(v).alias("stddev_pop_v"),
        F.var_pop(v).alias("var_pop_v"),
        F.avg(v * v).alias("_p2"),
        F.avg(v * v * v).alias("_p3"),
        F.avg(v * v * v * v).alias("_p4"),
        F.avg(F.abs(v - F.lit(abs_center))).alias("abs_mean"),
        F.max(F.abs(v - F.lit(abs_center))).alias("abs_max"),
    ]
    if include_median:
        aggs.append(F.percentile_approx(v, 0.5).alias("median_approx"))
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    agg = grouped.agg(*aggs)
    mean = F.col("mean")
    m2 = F.col("_p2") - mean * mean
    m3 = F.col("_p3") - 3 * mean * F.col("_p2") + 2 * mean * mean * mean
    m4 = (
        F.col("_p4")
        - 4 * mean * F.col("_p3")
        + 6 * mean * mean * F.col("_p2")
        - 3 * mean * mean * mean * mean
    )
    # Degenerate-group detection uses Spark's STABLE central-moment
    # var_pop (exactly 0 for constant groups), not the power-sum m2
    # (rounding can leave it tiny-positive, letting garbage skew/kurt
    # escape a m2<=0 guard).  The denominators are additionally
    # guarded against underflowing to exactly 0 while m2 > 0 — under
    # ANSI mode that division would otherwise throw.  Caveat (single-
    # pass design): for mean >> std fields the raw power sums cancel
    # precision in m3/m4; use welford_state + two-pass tooling when
    # high-accuracy tail moments of such fields matter.
    skew_den = F.pow(m2, 1.5)
    kurt_den = m2 * m2
    degenerate = F.col("var_pop_v") <= F.lit(0.0)
    tail = ["abs_mean", "abs_max"] + (
        ["median_approx"] if include_median else []
    )
    return agg.select(
        *group_cols,
        "n",
        "mean",
        "min_v",
        "max_v",
        "stddev_pop_v",
        "var_pop_v",
        F.when(degenerate | (skew_den <= 0), F.lit(0.0))
        .otherwise(m3 / skew_den)
        .alias("skew_v"),
        F.when(degenerate | (kurt_den <= 0), F.lit(0.0))
        .otherwise(m4 / kurt_den - 3.0)
        .alias("kurt_v"),
        *tail,
    )


def elementwise_stats(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Element-wise (per grid cell) stats reduced over the remaining dims.

    DataArrayStatsFilter semantics (reference ``domains/da/filters/
    stats.py:47-483``): the reference runs an online Welford update per
    time sample and Chan-merges worker shards; here the reduce-over-time
    is simply a groupBy over the *kept* dims, one shuffle.
    """
    v = F.col(value_col)
    return df.groupBy(*cell_cols).agg(
        F.avg(v).alias("mean"),
        F.var_pop(v).alias("var_pop_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.count(F.lit(1)).alias("n"),
    )


def welford_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Mergeable moment state as power sums (resumable-stats parity).

    The reference persists per-worker Welford state (n, mean, M2, M3,
    M4 — ``stats.py:96-102``) so runs can resume.  Power sums
    (Σv, Σv², Σv³, Σv⁴) are the algebraically mergeable, SQL-native
    equivalent: states from different runs merge by plain addition.
    """
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )


def merge_welford_state(a: DataFrame, b: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge two power-sum state tables (Chan-merge equivalent,
    reference ``stats.py:729-836``) — a union + re-aggregate, no
    special-case pairwise formulas needed."""
    cols = [F.sum(c).alias(c) for c in ("n", "s1", "s2", "s3", "s4")]
    return a.unionByName(b).groupBy(*group_cols).agg(*cols)


def finalize_welford_state(state: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Derive mean/var/skew/kurt from power-sum state.

    Follows the reference's finalize semantics: population variance,
    excess kurtosis, and skew/kurt forced to 0 where variance is 0
    (``stats.py:182,199-202``).
    """
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * F.col("s2") / n + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / n
        - 4 * mean * F.col("s3") / n
        + 6 * mean * mean * F.col("s2") / n
        - 3 * mean * mean * mean * mean
    )
    # guard the DENOMINATORS, not just m2: pow(m2, 1.5) can underflow
    # to exactly 0 while m2 > 0, and ANSI double division by 0 throws
    skew_den = F.pow(m2, 1.5)
    kurt_den = m2 * m2
    return state.select(
        *group_cols,
        F.col("n"),
        mean.alias("mean"),
        F.greatest(m2, F.lit(0.0)).alias("var_pop_v"),
        F.when((m2 <= 0) | (skew_den <= 0), F.lit(0.0))
        .otherwise(m3 / skew_den)
        .alias("skew_v"),
        F.when((m2 <= 0) | (kurt_den <= 0), F.lit(0.0))
        .otherwise(m4 / kurt_den - 3.0)
        .alias("kurt_v"),
    )


def spatial_mean(
    df: DataFrame,
    id_col: str,
    field_col: str,
    value_col: str,
) -> DataFrame:
    """Per-item spatial mean of every field, pivoted wide.

    MeanFilter semantics (reference ``domains/mesh/filters/mean.py:
    42-246``): dynamic columns = union of field keys across items,
    NULL-filled — exactly Spark's ``pivot`` contract.
    """
    return (
        df.groupBy(id_col)
        .pivot(field_col)
        .agg(F.avg(value_col))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    *,
    approx_support: float | None = None,
) -> DataFrame:
    """Top-k most frequent values of a column.

    Exact path: groupBy + count + per-partition top-k
    (TakeOrderedAndProject — no global sort).  With ``approx_support``,
    uses Spark's one-pass ``freqItems`` sketch instead (candidate set
    with possible false positives, no counts) — the scale path when an
    exact pass per column is too expensive.  Ties broken by value for
    determinism.
    """
    if approx_support is not None:
        row = df.stat.freqItems([col], approx_support).collect()[0]
        items = row[f"{col}_freqItems"]
        spark = df.sparkSession
        # an empty sketch result can't infer a schema from zero rows —
        # carry the source column's real DataType
        schema = df.select(col).schema
        return spark.createDataFrame([(v,) for v in items], schema)
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )


def conditional_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    conditions: dict[str, Column],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-group conditional counts (MeshQualityFilter report rows,
    reference ``domains/mesh/filters/quality.py:434-836``): each
    condition becomes a ``count_if``; NaN/Inf tallies, degenerate-cell
    counts, inverted-Jacobian counts are all this shape."""
    aggs = [F.count_if(cond).alias(name) for name, cond in conditions.items()]
    for name, agg in (extra_aggs or {}).items():
        aggs.append(agg.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)
