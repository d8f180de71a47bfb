"""Expectations gate (operators/validation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import validation as V


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a", "x1"),
            (2, 20.0, "b", "x2"),
            (3, None, "a", "x3"),
            (3, 99.0, "c", "bad"),
        ],
        "id long, v double, cat string, code string",
    )


def test_validate_report(spark):
    rules = [
        V.not_null("v"),
        V.unique("id"),
        V.in_range("v", 0.0, 50.0),
        V.in_set("cat", ("a", "b")),
        V.matches("code", "^x[0-9]$"),
        V.max_null_frac("v", 0.5),
    ]
    rep = {r["rule"]: r for r in V.validate(_df(spark), rules).collect()}
    assert rep["not_null"]["violations"] == 1 and not rep["not_null"]["passed"]
    assert rep["unique"]["violations"] == 1 and not rep["unique"]["passed"]
    # in_range: null counts as violation + 99.0 out of range
    assert rep["in_range(0.0, 50.0)"]["violations"] == 2
    assert rep["in_set(a, b)"]["violations"] == 1
    assert rep["matches(^x[0-9]$)"]["violations"] == 1
    # 1 null of 4 rows <= 50% -> passes
    assert rep["max_null_frac(0.5)"]["passed"]
    assert all(r["total"] == 4 for r in rep.values())


def test_validate_is_one_job(spark):
    """The whole rule set compiles to one aggregate — a single scan."""
    df = _df(spark)
    rep = V.validate(df, [V.not_null("v"), V.unique("id"), V.in_range("v", 0, 50)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_expect_raises_and_chains(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="not_null on v"):
        V.expect(df, [V.not_null("v")])
    # passing rules return the frame unchanged
    out = V.expect(df, [V.max_null_frac("v", 0.9)])
    assert out.count() == 4


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError):
        V.validate(_df(spark), [])


def test_profile_report(spark):
    df = _df(spark)
    rep = {r["column"]: r for r in V.profile(df, ["id", "v", "cat"]).collect()}
    assert rep["id"]["n_distinct"] == 3 and rep["id"]["n_null"] == 0
    assert rep["v"]["n_null"] == 1
    assert rep["v"]["min_value"] == "10.0" and rep["v"]["max_value"] == "99.0"
    assert rep["cat"]["dtype"] == "string" and rep["cat"]["n_distinct"] == 3
    assert all(r["n_rows"] == 4 for r in rep.values())
    plan = V.profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_corpus_card_metrics(spark):
    from physicsnemo_curator_spark.operators.validation import corpus_card

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x" * 120)],
        "doc_id long, text string",
    )
    card = {r["metric"]: r["value"] for r in corpus_card(df).collect()}
    assert card["n_docs"] == 3.0
    assert card["n_unique"] == 2.0
    assert card["dup_ratio"] == round(1 - 2 / 3, 9)
    assert card["min_chars"] == 5.0 and card["max_chars"] == 120.0
    assert card["short_frac"] == round(2 / 3, 9)
    assert card["total_chars"] == 130.0


def test_corpus_card_null_text_counts_as_empty(spark):
    from physicsnemo_curator_spark.operators.validation import corpus_card

    df = spark.createDataFrame(
        [(0, None), (1, "x" * 150)], "doc_id long, text string"
    )
    card = {r["metric"]: r["value"] for r in corpus_card(df).collect()}
    assert card["n_docs"] == 2.0
    assert card["short_frac"] == 0.5  # the NULL row IS a short doc
    assert card["min_chars"] == 0.0


def test_snapshot_diff_statuses(spark):
    """Each status from first principles, default content columns in
    sorted-name order, and NULL-content stability (NULL == NULL is
    'unchanged', not a three-valued-logic surprise)."""
    from physicsnemo_curator_spark.operators.validation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (5, None, 5.0)],
        "doc_id long, text string, score double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0), (5, None, 5.0)],
        "doc_id long, text string, score double",
    )
    out = {r["key"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",
    }
    # restricting content_cols ignores other columns' drift
    new2 = new.withColumn("score", new["score"] + 100)
    out2 = {
        r["key"]: r["status"]
        for r in snapshot_diff(old, new2, content_cols=["text"]).collect()
    }
    assert out2[1] == "unchanged" and out2[2] == "changed"


def test_snapshot_diff_schema_and_null_edges(spark):
    """Review-finding regressions: schema-evolved snapshots are
    rejected with the fix named; content migrating between columns
    ((NULL,'x') -> ('x',NULL)) is 'changed', not a NULL-skip hash
    collision; content_cols=[] is the pure key-set diff."""
    import pytest

    from physicsnemo_curator_spark.operators.validation import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")],
        "doc_id long, title string, body string",
    )
    new = spark.createDataFrame(
        [(1, "x", None), (2, "a", "b")],
        "doc_id long, title string, body string",
    )
    out = {r["key"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "changed", 2: "unchanged"}

    evolved = new.withColumn("lang", new["title"])
    with pytest.raises(ValueError, match="pass content_cols explicitly"):
        snapshot_diff(old, evolved)
    # explicit shared columns still work on evolved schemas
    ok = {
        r["key"]: r["status"]
        for r in snapshot_diff(
            old, evolved, content_cols=["title", "body"]
        ).collect()
    }
    assert ok == {1: "changed", 2: "unchanged"}

    keys_only = {
        r["key"]: r["status"]
        for r in snapshot_diff(
            old, new.filter("doc_id = 1"), content_cols=[]
        ).collect()
    }
    assert keys_only == {1: "unchanged", 2: "removed"}


def test_snapshot_diff_duplicate_key_raises(spark):
    """The unique-key precondition is enforced, not advisory: a
    duplicated key on either side raises at execution time with the
    side and key named, instead of silently fanning the full-outer
    join out m x n with mixed statuses."""
    import pytest

    from physicsnemo_curator_spark.operators.validation import snapshot_diff

    clean = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    duped = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="duplicate 'doc_id' in the old"):
        snapshot_diff(duped, clean).collect()
    with pytest.raises(Exception, match="duplicate 'doc_id' in the new"):
        snapshot_diff(clean, duped).collect()
    # identical-content duplicates are still duplicates (a key that
    # repeats is not a key)
    duped_same = spark.createDataFrame(
        [(1, "a"), (1, "a")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="duplicate 'doc_id'"):
        snapshot_diff(duped_same, clean).collect()


def test_snapshot_diff_bucketed_exchange_free(spark, tmp_path):
    """The 100 TB claim in the docstring, plan-asserted: with both
    snapshots bucketed on the key, the whole diff (per-side per-key
    aggregates AND the full-outer join) runs on the bucketed scan's
    partitioning — a SortMergeJoin with ZERO Exchange operators in the
    executed plan."""
    from physicsnemo_curator_spark.operators.validation import snapshot_diff

    old = spark.range(0, 500).selectExpr(
        "id AS doc_id", "CAST(id % 97 AS STRING) AS text"
    )
    new = spark.range(3, 503).selectExpr(
        "id AS doc_id",
        "CAST(CASE WHEN id % 5 = 0 THEN id ELSE id % 97 END AS STRING)"
        " AS text",
    )
    spark.sql("DROP TABLE IF EXISTS snap_old_b")
    spark.sql("DROP TABLE IF EXISTS snap_new_b")
    loc = str(tmp_path / "wh")
    (
        old.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", loc + "/old").saveAsTable("snap_old_b")
    )
    (
        new.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", loc + "/new").saveAsTable("snap_new_b")
    )
    try:
        out = snapshot_diff(
            spark.table("snap_old_b"), spark.table("snap_new_b"),
            key_col="doc_id",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        counts = {
            r["status"]: r["n"]
            for r in out.groupBy("status").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert counts["added"] == 3 and counts["removed"] == 3
        assert counts.get("changed", 0) > 0
        assert sum(counts.values()) == 503
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old_b")
        spark.sql("DROP TABLE IF EXISTS snap_new_b")
