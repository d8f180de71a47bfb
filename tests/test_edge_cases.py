"""Edge-case hardening for the r05 curation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import sampling, sketches, textops


def test_hash_bucket_rejects_unknown_hash(spark):
    with pytest.raises(ValueError, match="hash_fn"):
        spark.range(1).select(
            sampling.hash_bucket(F.col("id"), hash_fn="md5")
        )


def test_assign_splits_single_label(spark):
    out = sampling.assign_splits(
        spark.range(50).withColumnRenamed("id", "k"), "k", {"train": 1.0}
    )
    assert {r.split for r in out.collect()} == {"train"}


def test_assign_splits_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sampling.assign_splits(df, "k", {})
    with pytest.raises(ValueError):
        sampling.assign_splits(df, "k", {"a": 0.0})


def test_unigram_logprob_total_tokens_hint_is_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], "doc_id long, text string"
    )
    full = {r.doc_id: r.avg_logprob
            for r in textops.unigram_logprob(df).collect()}
    hinted = {r.doc_id: r.avg_logprob
              for r in textops.unigram_logprob(df, total_tokens=7).collect()}
    assert full == hinted


def test_tokenize_to_ids_all_unknown(spark):
    docs = spark.createDataFrame([(1, "zz yy xx")], "doc_id long, text string")
    vocab = spark.createDataFrame([("aa", 0)], "token string, token_id int")
    row = textops.tokenize_to_ids(docs, vocab).first()
    assert row.ids == [-1, -1, -1] and row.n_ids == 3


def test_contamination_report_no_overlap_is_empty(spark):
    c = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    b = spark.createDataFrame([(9, "x y z w")], "doc_id long, text string")
    assert textops.contamination_report(c, b, n=3).count() == 0


def test_sketches_merge_mixed_precision(spark):
    a = sketches.distinct_sketches(
        spark.range(1000).selectExpr("'k' AS k", "id"), ["k"], "id",
        lg_config_k=12,
    )
    b = sketches.distinct_sketches(
        spark.range(500, 1500).selectExpr("'k' AS k", "id"), ["k"], "id",
        lg_config_k=14,
    )
    est = sketches.estimate_distinct(
        sketches.merge_sketch_tables(a.unionByName(b), ["k"])
    ).first()
    assert abs(est.n_distinct - 1500) / 1500 < 0.06


def test_chunk_documents_single_token_doc(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    rows = textops.chunk_documents(df, max_tokens=16, overlap=2).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 1
    assert rows[0].chunk_text == "solo"


def test_empty_docs_produce_no_phantom_tokens(spark):
    """''.split yields [''] in the JVM; the explode-based text
    operators must not count that phantom token (an empty-doc pair
    would otherwise score TF-IDF cosine 1.0)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real tokens here"), (4, "")],
        "doc_id long, text string",
    )
    freq = {r["token"]: r for r in textops.token_frequencies(docs).collect()}
    assert "" not in freq
    vocab = textops.vocabulary(docs, min_count=1)
    assert vocab.filter(F.col("token") == "").count() == 0
    w = textops.tfidf(docs, n_docs=4)
    assert w.filter(F.col("doc_id").isin(1, 2, 4)).count() == 0
    lp = textops.unigram_logprob(docs, total_tokens=3)
    assert {r["doc_id"] for r in lp.collect()} == {3}


def test_mixing_weights_unmatched_targets_keep_nothing(spark):
    """A target naming no present domain must yield rate 0 everywhere
    (F.least skips NULLs, so the NULL budget used to become rate 1.0)."""
    from physicsnemo_curator_spark.operators import sampling

    docs = spark.createDataFrame(
        [(1, "en"), (2, "de")], "doc_id long, lang string"
    )
    out = sampling.mixing_weights(
        docs, domain_col="lang", targets={"wikipedia": 1.0}
    ).collect()
    assert all(r["sample_rate"] == 0.0 for r in out)
    assert all(r["expected_mass"] == 0.0 for r in out)


def test_value_histograms_null_values_excluded(spark):
    """NULLs must not inflate the top bin (F.least NULL-skip)."""
    from physicsnemo_curator_spark.operators import sketches

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", None), ("g", 8.0)],
        "k string, v double",
    )
    row = sketches.value_histograms(
        df, ["k"], "v", lo=0.0, hi=10.0, n_bins=10
    ).collect()[0]
    assert sum(row["hist"]) == 2
    assert row["hist"][9] == 0 and row["below"] == 0 and row["above"] == 0


def test_incremental_semantic_rerun_no_self_pairs(spark, tmp_path):
    """Probing a batch whose rows are already stored must not emit
    self-pairs (cosine 1.0 with itself)."""
    from physicsnemo_curator_spark.operators import mllib_ann
    from physicsnemo_curator_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").filter(
        "vec_id < 100"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    store = str(tmp_path / "s")
    mllib_ann.write_semantic_store(emb, centers, store)
    pairs = mllib_ann.incremental_semantic_dedup(
        spark, emb, centers, store, threshold=0.3
    ).collect()
    assert all(r["a"] != r["b"] for r in pairs)


def test_assign_splits_rejects_negative_weights(spark):
    import pytest as _pt

    from physicsnemo_curator_spark.operators import sampling

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with _pt.raises(ValueError, match="non-negative"):
        sampling.assign_splits(
            docs, "doc_id", {"train": 1.0, "val": -0.4}
        )


def test_arith_bucket_sql_negative_keys_match_spark(spark):
    """SQL % keeps the dividend's sign; the oracle twin must pmod."""
    import duckdb
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sampling

    keys = [-7, -1, 0, 3, 12345]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k",
            sampling.hash_bucket(
                F.col("k"), seed=5, hash_fn="arith"
            ).alias("b"),
        ).collect()
    }
    sql = sampling.arith_bucket_sql("k", seed=5)
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT k, {sql} FROM (SELECT unnest({keys}) k)"
        ).fetchall()
    )
    assert got == want
    assert all(v >= 0 for v in got.values())


def test_streaming_stats_nulls_and_nonstring_keys(spark, tmp_path):
    """Driven through a real micro-batch stream: NULL values must not
    count toward n (parity with the batch welford twin's F.count
    semantics), and a bigint key column must cast into the declared
    string schema instead of crashing the Arrow serialization."""
    from physicsnemo_curator_spark.streaming.stateful import (
        run_running_stats_foreachbatch,
    )

    src = str(tmp_path / "src")
    events = spark.createDataFrame(
        [(7, 2.0), (7, None), (9, 1.0), (9, 3.0)],
        "sensor_id long, value double",
    )
    events.repartition(2).write.parquet(src)
    final = run_running_stats_foreachbatch(
        spark, src, "sensor_id long, value double", key_col="sensor_id"
    )
    rows = {r["key"]: r for r in final.collect()}
    assert rows["7"]["n"] == 1 and rows["7"]["mean"] == 2.0
    assert rows["7"]["var_pop"] == 0.0
    assert rows["9"]["n"] == 2 and rows["9"]["mean"] == 2.0


def test_streaming_dedup_schema_matches_input(spark):
    """The streaming dedup output must not leak the internal
    fingerprint column (batch dedup contract)."""
    from physicsnemo_curator_spark.streaming.stateful import streaming_dedup

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    out = streaming_dedup(docs)
    assert out.columns == docs.columns
    assert out.count() == 2


def test_grid_zarr_v3_stale_shard_ignored(spark, tmp_path):
    """Re-writing a v3 store with fewer timesteps must not decode the
    surviving larger-run shard files (phantom rows / index crash)."""
    import numpy as np

    from physicsnemo_curator_spark.sinks.zarr_store import write_grid_zarr_v3
    from physicsnemo_curator_spark.sources.grid_stores import read_grid_zarr
    from physicsnemo_curator_spark.sources.synthetic import random_grid

    store = str(tmp_path / "v3")
    big = random_grid(spark, n_times=20, n_lat=3, n_lon=3)
    write_grid_zarr_v3(big, store, shard_time=8)
    small = random_grid(spark, n_times=4, n_lat=3, n_lon=3)
    write_grid_zarr_v3(small, store, shard_time=8)
    back = read_grid_zarr(spark, store)
    n_t = back.select("time").distinct().count()
    assert n_t <= 4  # stale c/1, c/2 shards must not surface


def test_grid_sidecar_relpath_escape_rejected(spark, tmp_path):
    from physicsnemo_curator_spark.sinks.grid_sidecar import (
        write_grid_sidecar,
    )

    grid = spark.createDataFrame(
        [("g1", "f", 0, 0, 0, 1.0)],
        "grid_id string, field string, iz int, iy int, ix int, value double",
    )
    meta = spark.createDataFrame(
        [("g1", 1, 1, 1, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, "../../escape")],
        "grid_id string, nx int, ny int, nz int, ox double, oy double,"
        " oz double, sx double, sy double, sz double, relpath string",
    )
    out = str(tmp_path / "out")
    import pytest as _pt

    with _pt.raises(Exception, match="escapes the output directory"):
        write_grid_sidecar(grid, meta, out).collect()


def test_exact_dedup_edge_whitespace_and_null_text(spark):
    """'x' and 'x\\n' are the same document (F.trim strips spaces only,
    so trim-then-collapse used to miss edge newlines); NULL-text docs
    are unknown content and must never group as duplicates."""
    from physicsnemo_curator_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "hello world\n"),
            (3, "\thello   world "),
            (10, None),
            (11, None),
            (12, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.exact_duplicates(docs).collect()}
    assert out[1]["group_size"] == 3
    assert out[2]["canonical_id"] == 1 and out[3]["canonical_id"] == 1
    for i in (10, 11, 12):
        assert out[i]["group_size"] == 1 and out[i]["canonical_id"] == i


def test_connected_components_string_ids(spark):
    """String (UUID-style) node ids must converge correctly — the old
    decimal-cast probe threw under ANSI / silently 'converged' early."""
    from physicsnemo_curator_spark.operators import components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "a string, b string",
    )
    comp = {
        r["node"]: r["comp"]
        for r in components.connected_components(pairs).collect()
    }
    assert {comp[n] for n in "abcde"} == {"a"}
    assert comp["x"] == comp["y"] == "x"


def test_dedup_groups_nan_scores_never_win(spark):
    """NaN sorts above every double in Spark; an unscorable doc must
    not beat a scored one for group representative."""
    from physicsnemo_curator_spark.operators import components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    scores = spark.createDataFrame(
        [(1, float("nan")), (2, 0.9), (3, 0.5)], "id long, score double"
    )
    groups = components.dedup_groups(pairs, id_out="id", scores=scores)
    kept = {r["id"] for r in groups.collect() if r["keep"]}
    assert kept == {2}


def test_dedup_groups_scored_string_ids(spark):
    """The scored keep policy must work for string ids too (the old
    max-struct negation only handled numerics)."""
    from physicsnemo_curator_spark.operators import components

    pairs = spark.createDataFrame([("u1", "u2")], "a string, b string")
    scores = spark.createDataFrame(
        [("u1", 0.1), ("u2", 0.8)], "id string, score double"
    )
    groups = components.dedup_groups(pairs, id_out="id", scores=scores)
    kept = {r["id"] for r in groups.collect() if r["keep"]}
    assert kept == {"u2"}


def test_pack_sequences_rejects_null_and_negative_tokens(spark):
    import pytest as _pt

    from physicsnemo_curator_spark.operators.packing import pack_sequences

    bad_null = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id long, n_tokens long"
    )
    with _pt.raises(Exception, match="NULL"):
        pack_sequences(bad_null, budget=64, n_buckets=1).collect()
    bad_neg = spark.createDataFrame(
        [(1, 10), (2, -5)], "doc_id long, n_tokens long"
    )
    with _pt.raises(Exception, match="negative"):
        pack_sequences(bad_neg, budget=64, n_buckets=1).collect()


def test_pack_sequences_overbudget_singleton_stays_closed(spark):
    """A doc longer than the budget is a singleton pack; zero-token
    docs must not join it through a rem=0 capacity entry."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 0)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(docs, budget=64, n_buckets=1).collect()
    packs = {r["doc_id"]: r["pack_index"] for r in out}
    assert packs[2] != packs[1] and packs[3] != packs[1]
    fills = {r["pack_index"]: r["pack_fill"] for r in out}
    assert fills[packs[1]] == 100  # singleton, nothing joined it


def test_asof_join_null_values_and_null_keys(spark):
    """A right row whose carried column is genuinely NULL must win the
    as-of match (not an older non-NULL row), and NULL join keys never
    match — SQL ASOF semantics on both counts."""
    from physicsnemo_curator_spark.operators import timeseries

    left = spark.createDataFrame(
        [("u", 3), (None, 3)], "user_id string, t long"
    )
    right = spark.createDataFrame(
        [("u", 1, 5.0), ("u", 2, None), (None, 1, 9.0)],
        "user_id string, t long, value double",
    )
    out = {
        (r["user_id"], r["t"]): r["asof_value"]
        for r in timeseries.as_of_join(
            left, right, on=["user_id"], left_time="t", right_time="t",
            right_cols=["value"],
        ).collect()
    }
    assert out[("u", 3)] is None  # the t=2 NULL row is the as-of match
    assert out[(None, 3)] is None  # NULL keys never match


def test_cosine_zero_norm_vectors_no_ansi_crash(spark):
    """An all-zeros embedding must not raise DIVIDE_BY_ZERO (Spark 4
    ANSI throws on double division too); it drops from thresholded
    pair output instead."""
    from physicsnemo_curator_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.0, 0.0]),  # zero norm
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = similarity.pairwise_near_duplicates(
        emb, threshold=0.9, exact=True, dim=2
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}


def test_lsh_banded_null_embeddings_skipped(spark):
    from physicsnemo_curator_spark.operators import similarity

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.lsh_banded(emb, 2, n_bands=2, bits_per_band=2)
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == {1, 3}


def test_heavy_hitters_empty_sketch_result(spark):
    """freqItems returning no candidates must yield an empty frame
    with the source column's type, not a schema-inference crash."""
    from physicsnemo_curator_spark.operators import stats

    df = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "k string"
    )
    out = stats.heavy_hitters(df, "k", k=2, approx_support=0.9)
    assert out.count() >= 0  # executes; no inference ValueError
    assert out.schema["k"].dataType.typeName() == "string"


def test_moment_stats_tiny_variance_pins_to_zero(spark):
    """Constant groups whose power-sum m2 rounds tiny-POSITIVE must
    still pin skew/kurt to 0 (the stable var_pop is the detector)."""
    from physicsnemo_curator_spark.operators import stats

    df = spark.createDataFrame(
        [("g", 0.1)] * 5, "k string, v double"
    )
    (row,) = stats.moment_stats(df, ["k"], "v").collect()
    assert row["skew_v"] == 0.0 and row["kurt_v"] == 0.0


def test_unique_edges_and_remap_tolerate_empty_cells(spark):
    """Zero-arity cells (padded-codec output) must not crash edge
    extraction under ANSI, and a total remap must preserve them
    (vacuous-truth survival; a pure reordering can't delete cells)."""
    from physicsnemo_curator_spark.operators import mesh

    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2]), (0, 1, [])],
        "mesh_id long, cell_id long, vs array<long>",
    )
    edges = mesh.unique_edges(cells).collect()
    assert len(edges) == 3  # triangle only; empty cell contributes none
    remap = spark.createDataFrame(
        [(0, i, i) for i in range(3)],
        "mesh_id long, point_id long, new_point_id long",
    )
    out = mesh.remap_connectivity(cells, remap).collect()
    got = {r["cell_id"]: r["vs"] for r in out}
    assert got[0] == [0, 1, 2] and got[1] == []


def test_tessellate_fan_preserves_extra_columns(spark):
    from physicsnemo_curator_spark.operators import mesh

    cells = spark.createDataFrame(
        [(0, 0, [0, 1, 2, 3], "boundary.box"), (0, 1, [4, 5, 6], "interior")],
        "mesh_id long, cell_id long, vs array<long>, region string",
    )
    out = mesh.tessellate_fan(cells).collect()
    regions = {(r["cell_id"], r["fan_idx"]): r["region"] for r in out}
    assert regions[(0, 1)] == "boundary.box"  # quad's second triangle
    assert regions[(1, 0)] == "interior"


def test_boundary_injection_point_cloud_mesh(spark):
    """A mesh with points but zero cells still gets its boundary faces
    (cell ids from 0) instead of orphan corner points."""
    from physicsnemo_curator_spark.operators import mesh

    points = spark.createDataFrame(
        [(0, i, float(i % 2), float(i // 2 % 2), float(i // 4)) for i in range(8)],
        "mesh_id long, point_id long, x double, y double, z double",
    )
    cells = spark.createDataFrame(
        [], "mesh_id long, cell_id long, vs array<long>"
    )
    _, ac = mesh.inject_box_boundary(points, cells)
    faces = ac.filter("region = 'boundary.box'").collect()
    assert len(faces) == 6
    assert min(r["cell_id"] for r in faces) == 0


def test_write_mesh_zarr_rejects_sparse_ids(spark, tmp_path):
    import pytest as _pt

    from physicsnemo_curator_spark.sinks.zarr_store import write_mesh_zarr

    points = spark.createDataFrame(
        [(0, 0, 0.0, 0.0, 0.0), (0, 5, 1.0, 0.0, 0.0)],
        "mesh_id long, point_id long, x double, y double, z double",
    )
    disp = spark.createDataFrame(
        [(0, 0, 1, 0.0, 0.0, 0.0), (0, 5, 1, 0.0, 0.0, 0.0)],
        "mesh_id long, point_id long, t long, dx double, dy double, dz double",
    )
    with _pt.raises(ValueError, match="dense 0-based"):
        write_mesh_zarr(points, disp, str(tmp_path / "z"))


def test_write_flat_zarr_empty_input(spark, tmp_path):
    from physicsnemo_curator_spark.sinks.zarr_store import (
        read_array,
        write_flat_zarr,
    )

    rows = spark.createDataFrame(
        [], "row_idx long, a double, b double"
    )
    write_flat_zarr(
        rows, str(tmp_path / "s"), "arr", index_col="row_idx",
        value_cols=["a", "b"], chunk_rows=4,
    )
    arr = read_array(str(tmp_path / "s" / "arr"))
    assert arr.shape == (0, 2)


def test_geometry_kernels_scale_invariant():
    """mm-scale loops in meter units triangulate identically to unit
    scale (the absolute predicate epsilons used to produce garbage)."""
    import numpy as np

    from physicsnemo_curator_spark.functions.geometry import (
        constrained_delaunay,
        delaunay,
    )

    rng = np.random.default_rng(0)
    pts = rng.random((30, 2))
    base = {tuple(sorted(t)) for t in delaunay(pts)}
    tiny = {tuple(sorted(t)) for t in delaunay(pts * 1e-3)}
    huge = {tuple(sorted(t)) for t in delaunay(pts * 1e5)}
    assert base == tiny == huge
    star = np.array(
        [
            [np.cos(a) * (1 if i % 2 == 0 else 0.4),
             np.sin(a) * (1 if i % 2 == 0 else 0.4)]
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 10, endpoint=False))
        ]
    )
    for scale in (1.0, 1e-3):
        p = star * scale
        tris = constrained_delaunay(p)
        tri_area = sum(
            abs(np.cross(p[t[1]] - p[t[0]], p[t[2]] - p[t[0]])) / 2
            for t in tris
        )
        poly_area = abs(
            sum(np.cross(p[i], p[(i + 1) % 10]) for i in range(10))
        ) / 2
        assert abs(tri_area - poly_area) < 1e-9 * max(scale**2, 1e-12)


def test_quality_report_mixed_arity_and_unresolved(spark):
    """Line cells and cells referencing missing points must not crash
    the report under ANSI — they surface as n_unresolved."""
    from physicsnemo_curator_spark.operators import quality

    points = spark.createDataFrame(
        [(0, i, float(i), float(i * i % 3), 0.0) for i in range(3)],
        "mesh_id long, point_id long, x double, y double, z double",
    )
    cells = spark.createDataFrame(
        [
            (0, 0, [0, 1, 2]),     # fine triangle
            (0, 1, [0, 1]),        # line cell (arity 2)
            (0, 2, [0, 1, 99]),    # references a missing point
        ],
        "mesh_id long, cell_id long, vs array<long>",
    )
    (row,) = quality.mesh_quality_report(points, cells).collect()
    assert row["n_cells"] == 1
    assert row["n_unresolved"] == 2


def test_coarsen_negative_coordinates_floor(spark):
    from physicsnemo_curator_spark.operators import grid

    g = spark.createDataFrame(
        [(0, "t2m", float(la), 0.0, 1.0) for la in range(-4, 4)],
        "time_idx long, variable string, lat double, lon double, value double",
    )
    out = grid.coarsen(g, 4).collect()
    blocks = {r["lat_c"]: r["n_fine"] for r in out}
    # floor semantics: every block exactly 4 wide (cast truncation
    # used to merge a 7-wide block straddling zero)
    assert blocks == {-1: 4, 0: 4}


def test_salted_join_rejects_outer(spark):
    import pytest as _pt

    from physicsnemo_curator_spark.operators import joins

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    with _pt.raises(ValueError, match="inner/left"):
        joins.salted_join(a, b, "k", how="full")


def test_atomic_info_empty_system_counts_zero(spark):
    from physicsnemo_curator_spark.operators import atomic

    systems = spark.createDataFrame(
        [(1, "a"), (2, "b")], "system_id long, name string"
    )
    atoms = spark.createDataFrame(
        [(1, 6), (1, 1)], "system_id long, z long"
    )
    out = {r["system_id"]: r for r in atomic.atomic_info(systems, atoms).collect()}
    assert out[2]["n_atoms"] == 0 and out[2]["n_elements"] == 0


def test_multimodal_null_dims_pass_through(spark):
    """Nullable int dims arrive as NaN in pandas batches — rows with
    unknown dimensions must pass through / skip, not crash int(NaN)."""
    from physicsnemo_curator_spark.sources import multimodal

    media = spark.createDataFrame(
        [
            (1, "image", b"\x01\x02\x03\x04", 2, 2, 4),
            (2, "image", b"\xff\xd8\xff", None, None, 3),
            (3, "video", b"\x00" * 8, None, None, 8),
        ],
        "media_id long, kind string, payload binary, width int,"
        " height int, n_bytes long",
    )
    resized = multimodal.resize_images(media, width=1, height=1).collect()
    assert len(resized) == 3  # null-dim rows pass through untouched
    frames = multimodal.sample_frames(media, every_n=1).collect()
    assert all(r["media_id"] != 3 for r in frames)  # null dims skip


def test_per_group_files_reject_path_keys(spark, tmp_path):
    import pytest as _pt

    from physicsnemo_curator_spark.sinks.scientific import (
        write_per_group_files,
    )

    df = spark.createDataFrame(
        [("../escape", 1.0)], "g string, v double"
    )
    with _pt.raises(Exception, match="path separators|cannot name"):
        write_per_group_files(df, str(tmp_path), ["g"])


def test_legacy_vtk_multicomponent_scalars(tmp_path):
    from physicsnemo_curator_spark.sources.vtk import _parse_legacy_vtk

    text = """# vtk DataFile Version 3.0
t
ASCII
DATASET UNSTRUCTURED_GRID
POINTS 2 float
0 0 0
1 0 0
POINT_DATA 2
SCALARS stress float 3
LOOKUP_TABLE default
1 2 3
4 5 6
"""
    mf = _parse_legacy_vtk(text)
    assert mf.point_data["stress_0"] == [1.0, 4.0]
    assert mf.point_data["stress_2"] == [3.0, 6.0]


def test_netcdf3_rejects_record_dim_not_first(tmp_path):
    import numpy as np
    import pytest as _pt

    from physicsnemo_curator_spark.sinks.netcdf3 import write_netcdf3

    with _pt.raises(ValueError, match="must be the first dim"):
        write_netcdf3(
            str(tmp_path / "x.nc"),
            dims={"time": None, "x": 3},
            variables={"bad": (("x", "time"), np.zeros((3, 5)))},
        )


def test_read_vtk_mesh_id_from_path(spark, tmp_path):
    """Same-named files in different dirs must not merge into one mesh
    when mesh_id_from='path'."""
    import os

    from physicsnemo_curator_spark.sources import vtk as vtk_mod
    from physicsnemo_curator_spark.sources.vtk_xml import write_vtu

    pts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    for d in ("b0", "b1"):
        os.makedirs(tmp_path / d)
        write_vtu([(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
                  [[0, 1, 2]], None, None, str(tmp_path / d / "piece.vtu"))
    tables = vtk_mod.read_vtk(
        spark, [str(tmp_path / "b0"), str(tmp_path / "b1")],
        glob="*.vtu", mesh_id_from="path",
    )
    ids = {r["mesh_id"] for r in tables["points"].select("mesh_id").distinct().collect()}
    assert len(ids) == 2


def test_bigram_logprob_hand_computed(spark):
    """Add-k bigram LM against hand-computed probabilities: corpus
    'a b a b' + 'b a' has bc(a,b)=2, bc(b,a)=2, h(a)=2, h(b)=2, V=2,
    so every transition scores ln(2.5/3) at k=0.5; single-token docs
    have no transitions and emit no row; vocab_size hint is exact."""
    import math

    from physicsnemo_curator_spark.operators import textops

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.bigram_logprob(df, k=0.5).collect()}
    # vocab = {a, b, x} -> V=3, denominator h + 0.5*3 = 3.5
    lp = math.log(2.5 / 3.5)
    assert set(out) == {1, 2}  # doc 3 has no bigrams
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    assert abs(out[1]["avg_logprob"] - lp) < 1e-12
    assert abs(out[2]["avg_logprob"] - lp) < 1e-12
    assert abs(out[1]["ppl"] - 3.5 / 2.5) < 1e-12
    # explicit vocab_size skips the distinct scan and changes the
    # smoothing denominator deterministically
    out2 = {r["doc_id"]: r
            for r in textops.bigram_logprob(df, k=0.5, vocab_size=2).collect()}
    assert abs(out2[1]["avg_logprob"] - math.log(2.5 / 3.0)) < 1e-12
