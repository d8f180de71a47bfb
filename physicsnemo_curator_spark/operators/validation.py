"""Data-validation rules: the expectations gate of a production pipeline.

Before a 100 TB curation output ships, the pipeline asserts invariants
— null discipline, key uniqueness, value ranges, categorical domains,
format shapes.  Each rule compiles to a conditional aggregate and the
WHOLE rule set evaluates in ONE pass over the data (a single
partial+final hash aggregate, no per-rule jobs); ``unique`` adds a
count-distinct in the same aggregate.

Report row per rule: (rule, column, violations, total, passed).
``expect`` raises on the first failing rule for gate-style use.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "not_null", "unique", "in_range", "in_set", "matches",
           "max_null_frac", "validate", "expect", "profile"]


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str
    params: tuple[Any, ...] = ()

    @property
    def name(self) -> str:
        extra = f"({', '.join(map(str, self.params))})" if self.params else ""
        return f"{self.kind}{extra}"


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def in_range(column: str, lo: float, hi: float) -> Rule:
    return Rule("in_range", column, (lo, hi))


def in_set(column: str, values: tuple) -> Rule:
    return Rule("in_set", column, tuple(values))


def matches(column: str, pattern: str) -> Rule:
    return Rule("matches", column, (pattern,))


def max_null_frac(column: str, frac: float) -> Rule:
    return Rule("max_null_frac", column, (frac,))


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind in ("not_null", "max_null_frac"):
        bad = c.isNull()
    elif rule.kind == "in_range":
        lo, hi = rule.params
        bad = c.isNull() | (c < lo) | (c > hi)
    elif rule.kind == "in_set":
        bad = c.isNull() | ~c.isin(*rule.params)
    elif rule.kind == "matches":
        (pat,) = rule.params
        bad = c.isNull() | ~c.rlike(pat)
    elif rule.kind == "unique":
        return F.lit(None)  # handled via count distinct
    else:
        raise ValueError(f"unknown rule kind: {rule.kind}")
    return F.sum(bad.cast("long"))


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregate pass; returns the report
    frame (rule, column, violations, total, passed) in rule order."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            aggs.append(F.count(r.column).alias(f"_nn{i}"))
            aggs.append(F.countDistinct(r.column).alias(f"_nd{i}"))
        else:
            aggs.append(_violation_expr(r).alias(f"_v{i}"))
    row = df.agg(*aggs)

    # one inline(array(structs)) select so the report is ONE job —
    # a union of per-rule selects would re-run the aggregate per rule
    entries = []
    for i, r in enumerate(rules):
        if r.kind == "unique":
            viol = F.col(f"_nn{i}") - F.col(f"_nd{i}")
        else:
            viol = F.coalesce(F.col(f"_v{i}"), F.lit(0))
        if r.kind == "max_null_frac":
            passed = viol <= F.col("_total") * float(r.params[0])
        else:
            passed = viol == 0
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.column).alias("column"),
                viol.cast("long").alias("violations"),
                F.col("_total").alias("total"),
                passed.alias("passed"),
            )
        )
    return row.select(F.inline(F.array(*entries)))


def expect(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Gate form: raise ValueError listing every failing rule; returns
    ``df`` unchanged when all rules pass (chainable mid-pipeline)."""
    failed = [
        (r["rule"], r["column"], r["violations"], r["total"])
        for r in validate(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        lines = ", ".join(
            f"{rule} on {col}: {v}/{t} rows" for rule, col, v, t in failed
        )
        raise ValueError(f"validation failed: {lines}")
    return df


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    distinct: str = "approx",
) -> DataFrame:
    """One-pass column profile — the dataset-card summary curation runs
    publish: per column (dtype, n_null, n_distinct, min, max), min/max
    surfaced as strings so one report schema covers every column type.

    ``distinct='approx'`` (default, the production path) uses
    HyperLogLog ``approx_count_distinct`` — the whole report is ONE
    hash-aggregate pass.  ``distinct='exact'`` is the
    engine-reproducible twin the DuckDB oracle replays; multiple exact
    distincts force Catalyst's Expand (input × (columns+1) rows through
    the aggregate — measured 6.3 s vs 1 s at sf0.1), so reserve it for
    audits.
    """
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    nd = F.approx_count_distinct if distinct == "approx" else F.countDistinct
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_n{i}"))
        aggs.append(nd(c).alias(f"_d{i}"))
        aggs.append(F.min(c).cast("string").alias(f"_lo{i}"))
        aggs.append(F.max(c).cast("string").alias(f"_hi{i}"))
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("_total").alias("n_rows"),
            F.col(f"_n{i}").alias("n_null"),
            F.col(f"_d{i}").alias("n_distinct"),
            F.col(f"_lo{i}").alias("min_value"),
            F.col(f"_hi{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.inline(F.array(*entries)))


def corpus_card(
    docs: DataFrame, *, text_col: str = "text", short_chars: int = 100
) -> DataFrame:
    """The dataset-card summary a curation run publishes with its
    output: corpus size, EXACT dedup rate (distinct md5 — one
    shuffle of digests, never text), character/token totals and
    means, extremes, and the short-document fraction.  ONE wide
    aggregation plus the distinct count; every value is plain
    aggregate arithmetic, so the whole card replays in SQL.
    Returns (metric, value) rows — compose with
    ``profile_columns`` for per-column detail and the sketches
    family for mergeable cross-batch cards.  NULL text counts as an
    empty document (so Spark and SQL replays agree)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(F.split(t, r"\s+"))
    row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(t.cast("binary"))).alias("n_unique"),
        F.sum(F.length(t)).alias("total_chars"),
        F.avg(F.length(t)).alias("avg_chars"),
        F.sum(n_tokens).alias("total_tokens"),
        F.avg(n_tokens).alias("avg_tokens"),
        F.min(F.length(t)).alias("min_chars"),
        F.max(F.length(t)).alias("max_chars"),
        F.avg((F.length(t) < short_chars).cast("double")).alias(
            "short_frac"
        ),
    ).collect()[0]
    n = row["n_docs"]
    metrics = [
        ("n_docs", float(n)),
        ("n_unique", float(row["n_unique"])),
        (
            "dup_ratio",
            round(1.0 - row["n_unique"] / n, 9) if n else 0.0,
        ),
        ("total_chars", float(row["total_chars"] or 0)),
        ("avg_chars", round(float(row["avg_chars"] or 0.0), 6)),
        ("total_tokens", float(row["total_tokens"] or 0)),
        ("avg_tokens", round(float(row["avg_tokens"] or 0.0), 6)),
        ("min_chars", float(row["min_chars"] or 0)),
        ("max_chars", float(row["max_chars"] or 0)),
        ("short_frac", round(float(row["short_frac"] or 0.0), 9)),
    ]
    return docs.sparkSession.createDataFrame(
        metrics, "metric string, value double"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Dataset-version diff — what changed between two corpus
    snapshots: per key, ``added`` (only in new), ``removed`` (only in
    old), ``changed`` (both, different content hash), ``unchanged``.
    The governance primitive behind incremental reprocessing ("curate
    only what moved"), audit trails, and release notes for a corpus.

    Content equality is an ``xxhash64`` over the named columns (all
    SHARED non-key columns by default, in sorted-name order so the
    hash is column-order-stable; schema-evolved snapshots — a column
    on one side only — are REJECTED with the fix spelled out, because
    silently dropping the column would classify rows whose only change
    is in it as 'unchanged').  Each column contributes its value AND
    an is-null flag to the hash: Spark's xxhash64 skips NULL children,
    so without the flags content migrating between adjacent columns
    (``(NULL, 'x')`` → ``('x', NULL)``) would collide as 'unchanged'.
    ``content_cols=[]`` is the pure key-set diff (added/removed only;
    shared keys are 'unchanged' by definition).

    ``key_col`` must be UNIQUE within each snapshot — a diff keyed on
    a non-key would silently fan the full-outer join out m×n per key
    with mixed statuses, misleading for a governance/audit primitive.
    The precondition is ENFORCED, not advisory: each side aggregates
    per key (count + hash) and a duplicate key raises at execution
    time, naming the side and the key.  The aggregate shares the
    join's own hash partitioning, so enforcement adds no extra
    shuffle pass over the data.

    Plan: one hash projection + per-key aggregate per side and ONE
    full-outer shuffle join on the key — no collects, no second pass;
    at 100 TB co-locate the snapshots by bucketing on ``key_col`` and
    the whole pipeline (aggregates AND join) runs exchange-free on the
    bucketed scan (plan-asserted in tests/test_validation.py).
    Output: ``(key, status)`` plus both hashes for audit."""
    if content_cols is None:
        only_new = set(new.columns) - set(old.columns)
        only_old = set(old.columns) - set(new.columns)
        if only_new or only_old:
            raise ValueError(
                f"snapshot schemas differ (only in new: "
                f"{sorted(only_new)}, only in old: {sorted(only_old)}); "
                "pass content_cols explicitly to diff schema-evolved "
                "snapshots"
            )
        content_cols = sorted(c for c in new.columns if c != key_col)

    def content_hash():
        if not content_cols:
            return F.lit(0).cast("long")
        children = []
        for c in content_cols:
            children.append(F.col(c))
            children.append(F.col(c).isNull())
        return F.xxhash64(*children)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        per_key = df.select(
            F.col(key_col).alias("key"),
            content_hash().alias("_h"),
        ).groupBy("key").agg(
            F.count("*").alias("_cnt"), F.min("_h").alias(f"{tag}_hash")
        )
        guard = F.when(
            F.col("_cnt") > 1,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"snapshot_diff: duplicate {key_col!r} in the "
                        f"{tag} snapshot (key="
                    ),
                    F.col("key").cast("string"),
                    F.lit(
                        "); the diff is keyed on a unique id — dedupe "
                        "or aggregate the snapshot first"
                    ),
                )
            ),
        ).otherwise(F.col(f"{tag}_hash"))
        return per_key.select("key", guard.alias(f"{tag}_hash"))

    o = hashed(old, "old")
    n = hashed(new, "new")
    joined = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("key", status.alias("status"), "old_hash", "new_hash")
