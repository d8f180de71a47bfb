"""HLL sketch store (operators/sketches.py): mergeability, accuracy,
batch pruning, idempotent re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import sketches


def _events(spark, lo, hi, kinds=("a", "b")):
    """user ids in [lo, hi) spread over event kinds."""
    return spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in kinds]),
            (F.col("id") % len(kinds) + 1).cast("int"),
        ).alias("kind"),
    )


def test_merged_sketches_do_not_double_count(spark, tmp_path):
    store = str(tmp_path / "hll")
    # two batches with 5k users of overlap: exact union is 15k, the
    # naive sum of per-batch counts would be 20k
    sketches.append_sketch_store(
        _events(spark, 0, 10_000), store, ["kind"], "user_id", batch_id="d1"
    )
    sketches.append_sketch_store(
        _events(spark, 5_000, 15_000), store, ["kind"], "user_id", batch_id="d2"
    )
    est = {
        r.kind: r.n_distinct
        for r in sketches.read_sketch_store(spark, store, ["kind"]).collect()
    }
    # 7.5k distinct per kind; lgConfigK=12 → rsd ~1.6%, allow 5%
    for kind in ("a", "b"):
        assert abs(est[kind] - 7_500) / 7_500 < 0.05


def test_batch_subset_and_idempotent_rewrite(spark, tmp_path):
    store = str(tmp_path / "hll")
    sketches.append_sketch_store(
        _events(spark, 0, 4_000), store, ["kind"], "user_id", batch_id="d1"
    )
    sketches.append_sketch_store(
        _events(spark, 4_000, 8_000), store, ["kind"], "user_id", batch_id="d2"
    )
    one = sketches.read_sketch_store(spark, store, ["kind"], batches=["d1"])
    n1 = sum(r.n_distinct for r in one.collect())
    assert abs(n1 - 4_000) / 4_000 < 0.05

    # re-running batch d2 with different data replaces ONLY d2
    sketches.append_sketch_store(
        _events(spark, 4_000, 5_000), store, ["kind"], "user_id", batch_id="d2"
    )
    total = sum(
        r.n_distinct
        for r in sketches.read_sketch_store(spark, store, ["kind"]).collect()
    )
    assert abs(total - 5_000) / 5_000 < 0.05


def test_estimate_matches_exact_single_batch(spark):
    df = _events(spark, 0, 20_000, kinds=("x",))
    est = sketches.estimate_distinct(
        sketches.distinct_sketches(df, ["kind"], "user_id")
    ).first()
    assert abs(est.n_distinct - 20_000) / 20_000 < 0.05
