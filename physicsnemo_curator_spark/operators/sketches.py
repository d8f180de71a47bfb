"""Mergeable cardinality sketches: incremental distinct counts at scale.

A 100 TB pipeline tracks per-partition/per-day distinct counts (users,
documents, vocab) without re-scanning history.  Exact COUNT(DISTINCT)
is not mergeable — yesterday's number plus today's number double-counts
the overlap — but HyperLogLog sketches union losslessly: persist one
small binary sketch per (group, batch), merge any subset later, and
estimate within ~1.6 % (lgConfigK=12 default).  Spark ships the Apache
DataSketches HLL as first-class expressions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, partial-agg
friendly); these operators wrap them into the persisted-store workflow
matching the engine's other incremental state (Welford power sums in
``operators/stats.py``, the MinHash store in ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketches",
    "merge_sketch_tables",
    "estimate_distinct",
    "append_sketch_store",
    "read_sketch_store",
]


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lg_config_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group —
    a partial+final hash aggregate; each sketch is ~2^lgConfigK bytes
    regardless of group size."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(sketch_col)
    )


def merge_sketch_tables(
    sketches: DataFrame,
    group_cols: list[str],
    *,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches per group across batches — the mergeability that
    exact distinct counts lack.  Input may mix lgConfigK values
    (allowDifferentLgConfigK=true keeps the coarser precision)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col, F.lit(True)).alias(sketch_col)
    )


def estimate_distinct(
    sketches: DataFrame,
    *,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Replace the binary sketch with its cardinality estimate."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)


def append_sketch_store(
    df: DataFrame,
    store: str,
    group_cols: list[str],
    value_col: str,
    *,
    batch_id: str,
    lg_config_k: int = 12,
) -> None:
    """Sketch this batch and append it to the store partitioned by
    ``batch_id`` — idempotent re-runs overwrite only their own batch
    partition (dynamic partition overwrite)."""
    sk = distinct_sketches(
        df, group_cols, value_col, lg_config_k=lg_config_k
    ).withColumn("batch_id", F.lit(batch_id))
    sk.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(store)


def read_sketch_store(
    spark: SparkSession,
    store: str,
    group_cols: list[str],
    *,
    batches: list[str] | None = None,
) -> DataFrame:
    """Merged per-group estimates over all (or selected) batches.
    Partition pruning keeps a batch subset scan proportional to the
    subset, not the store."""
    sk = spark.read.parquet(store)
    if batches is not None:
        sk = sk.filter(F.col("batch_id").isin(batches))
    return estimate_distinct(merge_sketch_tables(sk, group_cols))


# --- Mergeable quantile sketches: fixed-bin histograms ---------------------


def value_histograms(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 256,
    hist_col: str = "hist",
) -> DataFrame:
    """One fixed-bin histogram of ``value_col`` per group — the
    mergeable quantile counterpart of :func:`distinct_sketches`.

    Unlike ``percentile_approx`` (whose GK state Spark never exposes),
    a fixed-bin histogram persists as a plain ``array<bigint>`` and
    merges by elementwise addition — so per-batch histograms union
    losslessly across days/partitions and quantile error stays bounded
    by one bin width of the DECLARED range [lo, hi).  Out-of-range
    values land in ``below``/``above`` overflow counters rather than
    silently clamping into edge bins.

    Plan: a (group, bin) partial+final count (at most groups x n_bins
    rows survive the map side), then one array assembly per group —
    both hash aggregates, no window over the corpus.
    """
    if not hi > lo:
        raise ValueError("need hi > lo")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    # NULL values must not land in a bin: F.least skips NULLs, so the
    # otherwise branch would silently route them to bin n_bins-1 —
    # route them to a NULL bin and drop it instead (NULLs carry no
    # quantile information)
    bin_ = (
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_bins))
        .otherwise(F.least(bin_, F.lit(n_bins - 1)))
    )
    per_bin = (
        df.select(*group_cols, bin_.alias("_bin"))
        .filter(F.col("_bin").isNotNull())
        .groupBy(*group_cols, "_bin")
        .agg(F.count("*").alias("_c"))
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("_bin"), F.col("_c")))
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda i: F.coalesce(entries[i], F.lit(0)).cast("long"),
    )
    return per_bin.groupBy(*group_cols).agg(
        counts.alias(hist_col),
        F.coalesce(entries[F.lit(-1)], F.lit(0)).cast("long").alias("below"),
        F.coalesce(entries[F.lit(n_bins)], F.lit(0)).cast("long").alias("above"),
    )


def merge_histogram_tables(
    hists: DataFrame,
    group_cols: list[str],
    *,
    hist_col: str = "hist",
) -> DataFrame:
    """Merge per-batch histograms per group: elementwise array addition
    (the mergeability exact quantiles lack).

    Histograms are only mergeable over the SAME binning — mixed array
    lengths within a group mean the batches were sketched with
    different n_bins, and zip_with would silently NULL-pad the shorter
    side; that mistake fails loudly here instead."""
    merged = F.aggregate(
        F.collect_list(hist_col),
        F.transform(
            F.sequence(F.lit(1), F.size(F.first(hist_col))), lambda _: F.lit(0).cast("long")
        ),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    out = hists.groupBy(*group_cols).agg(
        merged.alias(hist_col),
        F.sum("below").alias("below"),
        F.sum("above").alias("above"),
        (
            F.min(F.size(F.col(hist_col)))
            == F.max(F.size(F.col(hist_col)))
        ).alias("_same_bins"),
    )

    # attach the guard to EVERY data column, not just hist: Catalyst
    # prunes unselected columns, so a hist-only guard silently vanishes
    # for consumers that read only below/above
    def _guarded(col: str):
        return F.when(F.col("_same_bins"), F.col(col)).otherwise(
            F.raise_error(
                F.lit(
                    "merge_histogram_tables: mixed n_bins within a group "
                    "— histograms are only mergeable over identical "
                    "binning"
                )
            )
        )

    return (
        out.withColumn(hist_col, _guarded(hist_col))
        .withColumn("below", _guarded("below"))
        .withColumn("above", _guarded("above"))
        .drop("_same_bins")
    )


def histogram_quantiles(
    hists: DataFrame,
    group_cols: list[str],
    qs: list[float],
    *,
    lo: float,
    hi: float,
    hist_col: str = "hist",
) -> DataFrame:
    """Per-group quantile estimates from a histogram table.

    For each q: the target rank is ``ceil(q * n)`` (clamped to >= 1)
    over the in-range mass; the estimate is the left edge of the first
    bin whose cumulative count reaches it, plus a linear interpolation
    inside that bin — deterministic arithmetic, replayable in SQL.
    Output: one row per (group, q) with ``quantile`` and ``estimate``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    width_expr = (F.lit(hi) - F.lit(lo)) / F.size(F.col(hist_col))
    exploded = hists.select(
        *group_cols,
        F.col(hist_col),
        F.posexplode(F.col(hist_col)).alias("_bin", "_c"),
    )
    total = F.aggregate(
        F.col(hist_col), F.lit(0).cast("long"), lambda a, b: a + b
    )
    cum = F.aggregate(
        F.slice(F.col(hist_col), F.lit(1), F.col("_bin") + 1),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    ranked = exploded.select(
        *group_cols,
        "_bin",
        "_c",
        total.alias("_n"),
        cum.alias("_cum"),
        width_expr.alias("_w"),
    ).filter(F.col("_c") > 0)
    out = None
    for q in qs:
        target = F.greatest(
            F.ceil(F.lit(float(q)) * F.col("_n")), F.lit(1)
        ).cast("long")
        hit = ranked.filter(
            (F.col("_cum") >= target) & (F.col("_cum") - F.col("_c") < target)
        )
        est = (
            F.lit(lo)
            + F.col("_w") * F.col("_bin")
            + F.col("_w")
            * (
                (target - (F.col("_cum") - F.col("_c"))).cast("double")
                / F.col("_c").cast("double")
            )
        )
        sel = hit.select(
            *group_cols,
            F.lit(float(q)).alias("quantile"),
            est.alias("estimate"),
        )
        out = sel if out is None else out.unionByName(sel)
    return out
