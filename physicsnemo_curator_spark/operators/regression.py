"""Closed-form distributed linear / ridge regression — the trainable
half of a quality-filter pipeline, Spark-first.

A linear model over d features needs only the (d+1)x(d+1) moment
matrix ``X'X`` and vector ``X'y`` — every entry is a plain
``sum(x_i * x_j)`` Catalyst aggregate, so the WHOLE fit is ONE
distributed pass with map-side partial aggregation (the same
shuffle shape as any ``groupBy().agg()``: O(d^2) doubles cross the
wire per partition, independent of row count).  The tiny symmetric
system solves on the driver with numpy; scoring is a pure column
expression, so predictions never leave the JVM.

At the 100 TB design point this is how a quality regressor trains
over a full corpus: no gradient iterations, no Python in the hot
path, no collect of anything but the d^2 moments.  (The reference's
curation pipelines score documents with externally-trained weights;
this operator closes the train half with the same public
normal-equations math — see also Spark MLlib's ``LinearRegression``
"normal" solver, which this mirrors without the mllib dependency.)

Ridge regularization adds ``lam`` to the feature-block diagonal
(the intercept is never penalized).  Exactly-integer-valued
features keep every moment exact in float64 (< 2^53), which is what
makes the driver gate's DuckDB Cramer-rule replay hash-stable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinearModel:
    feature_cols: tuple[str, ...]
    coef: tuple[float, ...]
    intercept: float
    n_rows: int
    r2: float
    sse: float

    def expression(self) -> Column:
        """The prediction as a pure Catalyst column expression."""
        expr = F.lit(self.intercept)
        for name, c in zip(self.feature_cols, self.coef):
            expr = expr + F.col(name) * F.lit(c)
        return expr


def fit_linear_model(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    ridge: float = 0.0,
) -> LinearModel:
    """Ordinary least squares (ridge when ``lam > 0``) via the normal
    equations: one distributed aggregation over sums of products,
    then a driver-side (d+1)x(d+1) solve."""
    if not feature_cols:
        raise ValueError("need at least one feature column")
    cols = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    d = len(cols)
    aggs = []
    # upper triangle of X'X (bias term folded in as a constant-1
    # feature), then X'y, then the label moments for R^2
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cols[i] * cols[j]))
    for i in range(d):
        aggs.append(F.sum(cols[i]))
    for i in range(d):
        aggs.append(F.sum(cols[i] * y))
    aggs += [F.sum(y), F.sum(y * y), F.count(F.lit(1))]
    row = df.agg(*aggs).collect()[0]
    vals = list(row)
    n = int(vals[-1])
    if n == 0:
        raise ValueError("cannot fit a model on an empty DataFrame")
    if any(v is None for v in vals[:-1]):
        raise ValueError(
            "all-null feature or label moments — check the input "
            "columns for nulls before fitting"
        )
    at = 0
    A = np.zeros((d + 1, d + 1))
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = vals[at]
            at += 1
    sx = vals[at : at + d]
    at += d
    sxy = vals[at : at + d]
    at += d
    sy, syy = vals[at], vals[at + 1]
    A[:d, d] = A[d, :d] = sx
    A[d, d] = n
    b = np.array(sxy + [sy])
    if ridge:
        A[:d, :d] += ridge * np.eye(d)
    try:
        theta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        # degenerate features (a constant-zero column, exact
        # collinearity): take the minimum-norm solution instead of
        # failing the whole fit
        theta, *_ = np.linalg.lstsq(A, b, rcond=None)
    coef, intercept = theta[:d], float(theta[d])
    # SSE from the same moments: y'y - theta'(X'y) for the OLS
    # solution; under ridge, (X'X + lam*I)theta = b shifts
    # theta'X'X theta by lam*||coef||^2, so subtract it back
    sse = float(syy - theta @ b - ridge * float(coef @ coef))
    sst = float(syy - sy * sy / n)
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return LinearModel(
        feature_cols=tuple(feature_cols),
        coef=tuple(float(c) for c in coef),
        intercept=intercept,
        n_rows=n,
        r2=r2,
        sse=sse,
    )


def with_linear_score(
    df: DataFrame, model: LinearModel, *, output_col: str = "score"
) -> DataFrame:
    """Append the model's prediction — a whole-stage-codegen column
    expression, nothing leaves the JVM."""
    return df.withColumn(output_col, model.expression())


def fit_quality_model(
    docs: DataFrame, label_col: str, *, text_col: str = "text",
    ridge: float = 0.0,
) -> tuple[LinearModel, DataFrame]:
    """Convenience composition: derive the standard text-quality
    features (length, word count, mean word length, punctuation and
    digit ratios — all Catalyst expressions), fit against
    ``label_col``, and return (model, featurized frame)."""
    t = F.col(text_col)
    length = F.length(t).cast("double")
    words = F.size(F.split(t, r"\s+")).cast("double")
    feats = docs.withColumn("f_len", length).withColumn(
        "f_words", words
    ).withColumn(
        "f_word_len", F.when(words > 0, length / words).otherwise(0.0)
    ).withColumn(
        "f_punct",
        (F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / F.greatest(
            length, F.lit(1.0)
        )),
    ).withColumn(
        "f_digit",
        (F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.greatest(
            length, F.lit(1.0)
        )),
    )
    model = fit_linear_model(
        feats,
        ["f_len", "f_words", "f_word_len", "f_punct", "f_digit"],
        label_col,
        ridge=ridge,
    )
    return model, feats
