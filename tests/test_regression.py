"""Closed-form distributed regression (operators/regression.py):
exact recovery, ridge behavior, moment math vs numpy lstsq, and the
JVM-only scoring plan."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.operators.regression import (
    fit_linear_model,
    fit_quality_model,
    with_linear_score,
)


def _frame(spark, n=500, seed=11, noise=0.0):
    rng = np.random.default_rng(seed)
    x1 = rng.integers(0, 80, n).astype(float)
    x2 = rng.integers(0, 31, n).astype(float)
    eps = rng.normal(0, noise, n) if noise else np.zeros(n)
    y = 2.0 * x1 - 3.0 * x2 + 5.0 + eps
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    return (
        spark.createDataFrame(rows, "x1 double, x2 double, y double"),
        np.column_stack([x1, x2]),
        y,
    )


def test_exact_recovery_noiseless(spark):
    df, _, _ = _frame(spark)
    m = fit_linear_model(df, ["x1", "x2"], "y")
    assert m.coef[0] == pytest.approx(2.0, abs=1e-9)
    assert m.coef[1] == pytest.approx(-3.0, abs=1e-9)
    assert m.intercept == pytest.approx(5.0, abs=1e-9)
    assert m.r2 == pytest.approx(1.0, abs=1e-12)
    assert m.sse == pytest.approx(0.0, abs=1e-6)
    assert m.n_rows == 500


def test_matches_numpy_lstsq_with_noise(spark):
    df, X, y = _frame(spark, noise=3.0, seed=4)
    m = fit_linear_model(df, ["x1", "x2"], "y")
    A = np.column_stack([X, np.ones(len(y))])
    ref, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert m.coef[0] == pytest.approx(ref[0], rel=1e-9)
    assert m.coef[1] == pytest.approx(ref[1], rel=1e-9)
    assert m.intercept == pytest.approx(ref[2], rel=1e-9)
    resid = y - A @ ref
    assert m.sse == pytest.approx(float(resid @ resid), rel=1e-6)


def test_ridge_shrinks_coefficients(spark):
    df, _, _ = _frame(spark, noise=2.0, seed=9)
    plain = fit_linear_model(df, ["x1", "x2"], "y")
    ridged = fit_linear_model(df, ["x1", "x2"], "y", ridge=1e4)
    assert abs(ridged.coef[0]) < abs(plain.coef[0])
    assert abs(ridged.coef[1]) < abs(plain.coef[1])


def test_scoring_expression_matches_model(spark):
    df, X, y = _frame(spark, n=50)
    m = fit_linear_model(df, ["x1", "x2"], "y")
    scored = with_linear_score(df, m).collect()
    for r in scored:
        assert r["score"] == pytest.approx(
            m.intercept + m.coef[0] * r["x1"] + m.coef[1] * r["x2"],
            rel=1e-12,
        )
        assert r["score"] == pytest.approx(r["y"], abs=1e-6)


def test_scoring_stays_jvm_side(spark):
    df, _, _ = _frame(spark, n=20)
    m = fit_linear_model(df, ["x1", "x2"], "y")
    plan = (
        with_linear_score(df, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_single_row_and_empty_errors(spark):
    with pytest.raises(ValueError, match="empty"):
        fit_linear_model(
            spark.createDataFrame([], "x1 double, y double"), ["x1"], "y"
        )
    with pytest.raises(ValueError, match="feature"):
        df, _, _ = _frame(spark, n=5)
        fit_linear_model(df, [], "y")


def test_quality_model_composition(spark, sf_dir):
    from physicsnemo_curator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(400)
    labeled = docs.withColumn(
        "label",
        (docs["n_chars"] % 97).cast("double"),
    )
    model, feats = fit_quality_model(labeled, "label")
    assert model.n_rows == 400
    assert len(model.coef) == 5
    scored = with_linear_score(feats, model, output_col="q")
    assert scored.filter("q IS NULL").count() == 0


def test_ridge_sse_matches_direct_residual(spark):
    import numpy as np

    df, X, y = _frame(spark, n=300, noise=2.0, seed=13)
    lam = 50.0
    m = fit_linear_model(df, ["x1", "x2"], "y", ridge=lam)
    pred = X @ np.array(m.coef) + m.intercept
    direct = float(((y - pred) ** 2).sum())
    assert m.sse == pytest.approx(direct, rel=1e-6)


def test_all_null_label_raises(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "x1 double, y double"
    )
    with pytest.raises(ValueError, match="null"):
        fit_linear_model(df, ["x1"], "y")
