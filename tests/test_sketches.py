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


# --- fixed-bin histogram quantile sketches ---------------------------------


def test_value_histograms_overflow_bins(spark):
    from physicsnemo_curator_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", v) for v in [-5.0, 0.0, 3.5, 9.99, 10.0, 42.0]],
        "k string, v double",
    )
    row = sketches.value_histograms(
        df, ["k"], "v", lo=0.0, hi=10.0, n_bins=10
    ).collect()[0]
    assert row["below"] == 1 and row["above"] == 2
    assert sum(row["hist"]) == 3
    assert row["hist"][0] == 1 and row["hist"][3] == 1 and row["hist"][9] == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="hi > lo"):
        sketches.value_histograms(df, ["k"], "v", lo=1.0, hi=1.0)


def test_histogram_merge_equals_whole_table(spark):
    """Merging per-batch histograms is lossless: identical to binning
    the union directly (the property exact quantiles lack)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches
    from physicsnemo_curator_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    mk = lambda b: sketches.value_histograms(
        b, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=32
    )
    parts = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    merged = sketches.merge_histogram_tables(
        parts[0].transform(mk).unionByName(mk(parts[1])).unionByName(mk(parts[2])),
        ["l_returnflag"],
    )
    whole = mk(li)
    a = {r["l_returnflag"]: (r["hist"], r["below"], r["above"]) for r in merged.collect()}
    b = {r["l_returnflag"]: (r["hist"], r["below"], r["above"]) for r in whole.collect()}
    assert a == b


def test_histogram_merge_mixed_n_bins_raises(spark):
    """Batches sketched with different n_bins are NOT mergeable —
    zip_with would silently NULL-pad the shorter array; the merge must
    fail loudly instead."""
    import pytest
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches
    from physicsnemo_curator_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    h16 = sketches.value_histograms(
        li, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=16
    )
    h32 = sketches.value_histograms(
        li, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=32
    )
    merged = sketches.merge_histogram_tables(
        h16.unionByName(h32), ["l_returnflag"]
    )
    with pytest.raises(Exception, match="mixed n_bins"):
        merged.collect()
    # the guard must survive column pruning: a consumer reading only
    # below/above (hist pruned away) still fails loudly
    with pytest.raises(Exception, match="mixed n_bins"):
        merged.select("l_returnflag", "below", "above").collect()


def test_histogram_quantiles_error_bound(spark):
    """Every estimate sits within one bin width of the exact quantile."""
    import numpy as np

    from physicsnemo_curator_spark.operators import sketches
    from physicsnemo_curator_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    h = sketches.value_histograms(
        li, ["l_returnflag"], "l_quantity", lo=0.0, hi=64.0, n_bins=64
    )
    qs = [0.1, 0.5, 0.99]
    est = sketches.histogram_quantiles(
        h, ["l_returnflag"], qs, lo=0.0, hi=64.0
    ).collect()
    pdf = li.select("l_returnflag", "l_quantity").toPandas()
    width = 1.0
    for r in est:
        exact = np.quantile(
            pdf[pdf.l_returnflag == r["l_returnflag"]].l_quantity,
            r["quantile"],
        )
        assert abs(r["estimate"] - float(exact)) <= width + 1e-9


def test_bloom_membership_no_false_negatives_and_bounded_fp(spark):
    """Every built key probes true (no false negatives — the Bloom
    contract); unseen keys' false-positive rate stays near the
    (1 - e^(-kn/m))^k design bound; md5 and xxhash64 twins agree on
    the no-false-negative contract."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches

    build = spark.createDataFrame(
        [(g, f"key-{g}-{i}") for g in ("a", "b") for i in range(200)],
        "grp string, key string",
    )
    fresh = spark.createDataFrame(
        [(g, f"unseen-{g}-{i}") for g in ("a", "b") for i in range(500)],
        "grp string, key string",
    )
    for hash_fn in ("md5", "xxhash64"):
        bf = sketches.bloom_filters(
            build, ["grp"], "key", n_bits=4096, k=4, hash_fn=hash_fn
        )
        hits = sketches.bloom_might_contain(
            bf, build, ["grp"], "key", n_bits=4096, k=4, hash_fn=hash_fn
        )
        assert hits.filter(~F.col("might_contain")).count() == 0
        fp = sketches.bloom_might_contain(
            bf, fresh, ["grp"], "key", n_bits=4096, k=4, hash_fn=hash_fn
        )
        n_fp = fp.filter(F.col("might_contain")).count()
        # design rate at n=200, m=4096, k=4 is ~0.24%; allow 10x slack
        assert n_fp <= 0.025 * 1000, f"{hash_fn}: {n_fp} false positives"


def test_bloom_merge_equals_whole_and_geometry_guards(spark):
    """ORing per-batch filters equals building over the union (the
    mergeability the raw key sets lack at scale); mixed geometries
    fail loudly at merge and at probe."""
    import pytest
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches

    rows = [("g", f"k{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, key string")
    b1 = sketches.bloom_filters(
        df.filter(F.col("key") < "k2"), ["grp"], "key", n_bits=1024
    )
    b2 = sketches.bloom_filters(
        df.filter(F.col("key") >= "k2"), ["grp"], "key", n_bits=1024
    )
    merged = sketches.merge_bloom_tables(b1.unionByName(b2), ["grp"])
    whole = sketches.bloom_filters(df, ["grp"], "key", n_bits=1024)
    assert merged.collect()[0]["bloom"] == whole.collect()[0]["bloom"]

    other = sketches.bloom_filters(df, ["grp"], "key", n_bits=2048)
    with pytest.raises(Exception, match="mixed n_bits"):
        sketches.merge_bloom_tables(
            b1.unionByName(other), ["grp"]
        ).collect()
    with pytest.raises(Exception, match="geometry"):
        sketches.bloom_might_contain(
            other, df, ["grp"], "key", n_bits=1024
        ).collect()


def test_bloom_probe_plan_broadcasts_and_validation(spark):
    """The probe side never shuffles: the filter table broadcasts.
    Parameter validation fails fast."""
    import pytest

    from physicsnemo_curator_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(50)], "grp string, key string"
    )
    bf = sketches.bloom_filters(df, ["grp"], "key", n_bits=512)
    probed = sketches.bloom_might_contain(bf, df, ["grp"], "key", n_bits=512)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    with pytest.raises(ValueError, match="multiple of 64"):
        sketches.bloom_filters(df, ["grp"], "key", n_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        sketches.bloom_filters(df, ["grp"], "key", n_bits=64, k=0)


def test_cms_never_undercounts_and_is_mostly_exact(spark):
    """est >= true for every key (the CMS contract), and with width
    far above distinct-key count the estimates are exact; md5 and
    xxhash64 twins both honor the bound."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches
    from physicsnemo_curator_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_returnflag").alias("grp"), F.col("l_suppkey").alias("key")
    )
    exact = {
        (r.grp, r.key): r.cnt
        for r in li.groupBy("grp", "key").agg(F.count("*").alias("cnt")).collect()
    }
    probes = li.select("grp", "key").distinct()
    for hash_fn in ("md5", "xxhash64"):
        cms = sketches.cms_sketches(
            li, ["grp"], "key", depth=4, width=1024, hash_fn=hash_fn
        )
        est = sketches.cms_estimate(
            cms, probes, ["grp"], "key", depth=4, width=1024, hash_fn=hash_fn
        )
        n_exact = 0
        rows = est.collect()
        for r in rows:
            true = exact[(r.grp, r.key)]
            assert r.est_count >= true, (hash_fn, r.grp, r.key)
            n_exact += r.est_count == true
        # ~100 distinct suppkeys in 1024 columns: collisions are rare
        assert n_exact >= 0.9 * len(rows)
    # an absent key with no collisions estimates 0 (never negative)
    ghost = spark.createDataFrame([("A", 999_999)], "grp string, key long")
    g = sketches.cms_estimate(
        sketches.cms_sketches(li, ["grp"], "key", depth=4, width=1024),
        ghost, ["grp"], "key", depth=4, width=1024,
    ).collect()[0]
    assert g.est_count >= 0


def test_cms_merge_equals_whole_and_geometry_guard(spark):
    """Per-batch sketch addition equals sketching the union (count
    additivity survives the sketch); mixed geometries fail loudly at
    merge and probe."""
    import pytest
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches
    from physicsnemo_curator_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_returnflag").alias("grp"), F.col("l_suppkey").alias("key")
    )
    parts = [li.filter(F.col("key") % 2 == i) for i in range(2)]
    mk = lambda b: sketches.cms_sketches(b, ["grp"], "key", depth=3, width=256)
    merged = sketches.merge_cms_tables(
        mk(parts[0]).unionByName(mk(parts[1])), ["grp"]
    )
    whole = mk(li)
    a = {r.grp: r.cms for r in merged.collect()}
    b = {r.grp: r.cms for r in whole.collect()}
    assert a == b

    other = sketches.cms_sketches(li, ["grp"], "key", depth=3, width=512)
    with pytest.raises(Exception, match="mixed depth"):
        sketches.merge_cms_tables(
            mk(parts[0]).unionByName(other), ["grp"]
        ).collect()
    with pytest.raises(Exception, match="geometry"):
        sketches.cms_estimate(
            other, li.limit(5), ["grp"], "key", depth=3, width=256
        ).collect()


def test_bloom_store_incremental_new_vs_seen(spark, tmp_path):
    """The incremental crawl-dedup workflow: per-batch persisted
    filters, merged probe answers 'seen before?' with no false
    negatives; batch pruning and idempotent batch rewrite both hold
    (same store discipline as the HLL sketch store)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches

    store = str(tmp_path / "bloom_store")
    mk = lambda lo, hi: spark.createDataFrame(
        [("h", f"url-{i}") for i in range(lo, hi)], "grp string, url string"
    )
    sketches.append_bloom_store(
        mk(0, 300), store, ["grp"], "url", batch_id="d1", n_bits=8192
    )
    sketches.append_bloom_store(
        mk(300, 600), store, ["grp"], "url", batch_id="d2", n_bits=8192
    )

    probes = mk(250, 900)  # 350 seen, 300 new
    out = sketches.probe_bloom_store(
        spark, store, probes, ["grp"], "url", n_bits=8192
    )
    seen = {r.url for r in out.filter(F.col("might_contain")).collect()}
    # no false negatives: every previously ingested url flags seen
    assert {f"url-{i}" for i in range(250, 600)} <= seen
    # new urls mostly pass (bounded false positives)
    n_new_flagged = len(seen - {f"url-{i}" for i in range(250, 600)})
    assert n_new_flagged <= 0.03 * 300

    # batch pruning: probing only d1 must not know d2's keys
    d1_only = sketches.probe_bloom_store(
        spark, store, mk(300, 320), ["grp"], "url", n_bits=8192,
        batches=["d1"],
    )
    assert d1_only.filter(F.col("might_contain")).count() <= 2

    # idempotent rewrite: re-running d2 with different keys replaces it
    sketches.append_bloom_store(
        mk(1000, 1100), store, ["grp"], "url", batch_id="d2", n_bits=8192
    )
    out2 = sketches.probe_bloom_store(
        spark, store, mk(300, 320), ["grp"], "url", n_bits=8192
    )
    assert out2.filter(F.col("might_contain")).count() <= 2


def test_unknown_group_probes_false_and_zero_not_dropped(spark):
    """A probe group absent from the build answers might_contain=false
    (definitely new) / est_count=0 — NOT a silently dropped row; an
    inner join here would exclude whole never-before-seen groups from
    a dedup pipeline's output."""
    from physicsnemo_curator_spark.operators import sketches

    build = spark.createDataFrame(
        [("g1", f"k{i}") for i in range(50)], "grp string, key string"
    )
    probes = spark.createDataFrame(
        [("g1", "k1"), ("g2", "k1"), ("g2", "brand-new")],
        "grp string, key string",
    )
    bf = sketches.bloom_filters(build, ["grp"], "key", n_bits=1024)
    out = {
        (r.grp, r.key): r.might_contain
        for r in sketches.bloom_might_contain(
            bf, probes, ["grp"], "key", n_bits=1024
        ).collect()
    }
    assert len(out) == 3
    assert out[("g1", "k1")] is True
    assert out[("g2", "k1")] is False
    assert out[("g2", "brand-new")] is False

    cms = sketches.cms_sketches(build, ["grp"], "key", depth=3, width=256)
    est = {
        (r.grp, r.key): r.est_count
        for r in sketches.cms_estimate(
            cms, probes, ["grp"], "key", depth=3, width=256
        ).collect()
    }
    assert len(est) == 3
    assert est[("g1", "k1")] >= 1
    assert est[("g2", "k1")] == 0 and est[("g2", "brand-new")] == 0


def test_null_sketch_keys_raise_loudly(spark):
    """A NULL key raises an actionable error at build AND probe time
    — unguarded it aborted deep in map_from_entries with NULL_MAP_KEY
    (build) or produced a NULL membership that both filter(x) and
    filter(~x) drop (probe)."""
    import pytest

    from physicsnemo_curator_spark.operators import sketches

    with_null = spark.createDataFrame(
        [("g", "a"), ("g", None)], "grp string, key string"
    )
    clean = spark.createDataFrame([("g", "a")], "grp string, key string")
    with pytest.raises(Exception, match="key is NULL"):
        sketches.bloom_filters(with_null, ["grp"], "key", n_bits=256).collect()
    with pytest.raises(Exception, match="key is NULL"):
        sketches.cms_sketches(with_null, ["grp"], "key", width=64).collect()
    bf = sketches.bloom_filters(clean, ["grp"], "key", n_bits=256)
    with pytest.raises(Exception, match="key is NULL"):
        sketches.bloom_might_contain(
            bf, with_null, ["grp"], "key", n_bits=256
        ).collect()


def test_bloom_store_self_describing_params(spark, tmp_path):
    """The store persists n_bits/k/hash_fn; probing uses them by
    default, validates explicit mismatches loudly (a k or hash_fn
    mismatch would silently produce false negatives), and refuses a
    store mixing parameter sets."""
    import pytest

    from physicsnemo_curator_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(100)], "grp string, url string"
    )
    store = str(tmp_path / "store")
    sketches.append_bloom_store(
        df, store, ["grp"], "url", batch_id="d1", n_bits=2048, k=5,
        hash_fn="md5",
    )
    # defaults come from the store — no false negatives
    out = sketches.probe_bloom_store(spark, store, df, ["grp"], "url")
    assert out.filter("NOT might_contain").count() == 0
    # explicit mismatches raise
    with pytest.raises(ValueError, match="does not match the store"):
        sketches.probe_bloom_store(
            spark, store, df, ["grp"], "url", hash_fn="xxhash64"
        )
    with pytest.raises(ValueError, match="does not match the store"):
        sketches.probe_bloom_store(spark, store, df, ["grp"], "url", k=4)
    # mixed parameter sets across batches refuse to merge
    sketches.append_bloom_store(
        df, store, ["grp"], "url", batch_id="d2", n_bits=2048, k=3,
        hash_fn="md5",
    )
    with pytest.raises(ValueError, match="mixes build parameters"):
        sketches.probe_bloom_store(spark, store, df, ["grp"], "url")


def test_bloom_store_empty_batch_selection_message(spark, tmp_path):
    """A batches= list matching nothing is a caller error (typo'd ids),
    not a mixed-parameter store — the error must say so and list the
    requested vs available ids."""
    import pytest

    from physicsnemo_curator_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(20)], "grp string, url string"
    )
    store = str(tmp_path / "store")
    sketches.append_bloom_store(
        df, store, ["grp"], "url", batch_id="d1", n_bits=1024, k=3,
        hash_fn="md5",
    )
    with pytest.raises(ValueError, match="no batches matched") as ei:
        sketches.probe_bloom_store(
            spark, store, df, ["grp"], "url", batches=["typo"]
        )
    assert "typo" in str(ei.value) and "d1" in str(ei.value)


def test_list_bloom_store_batches_error_propagation(spark, tmp_path):
    """A missing store is 'not created yet' → []; a CORRUPT store must
    raise (treating it as empty would silently disable all-time dedup
    and re-emit every previously-seen key as definitely-new)."""
    import pytest

    from physicsnemo_curator_spark.operators import sketches

    missing = str(tmp_path / "never_written")
    assert sketches.list_bloom_store_batches(spark, missing) == []
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        sketches.list_bloom_store_batches(spark, str(corrupt))
