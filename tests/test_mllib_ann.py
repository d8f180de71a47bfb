"""IVF (KMeans) ANN: self-retrieval, recall vs exact, probe scaling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mllib_ann, similarity
from physicsnemo_curator_spark.sources.tables import load_table


def test_ivf_topk_recall(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = mllib_ann.train_ivf(emb, k=8)
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.cosine_topk(emb, qs, k=10).collect()}

    lo = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, model, k=10, n_probe=2).collect()}
    hi = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, model, k=10, n_probe=8).collect()}

    # every query finds itself even at low probe count
    assert all((q, q) in lo for q in range(5))
    # probing all cells == exact
    assert hi == exact
    # recall grows with n_probe
    assert len(lo & exact) <= len(hi & exact)
    assert len(lo & exact) / len(exact) >= 0.4


def test_assign_cells_partitions_corpus(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    model = mllib_ann.train_ivf(emb, k=8, sample_fraction=0.5)
    cells = mllib_ann.assign_cells(emb, model)
    sizes = cells.groupBy("cell").count().collect()
    assert sum(r["count"] for r in sizes) == emb.count()
    assert len(sizes) == 8


def test_ivf_sample_trainer_recall(spark, sf_correctness_dir):
    """Driver-sample numpy trainer feeds the same ivf_topk; full-probe
    equals exact, and every query retrieves itself."""
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.train_ivf_sample(emb, k=8, seed=7, sample_rows=256, iters=8)
    assert len(centers) == 8 and len(centers[0]) == 64

    exact = {(r["query_id"], r["vec_id"])
             for r in similarity.cosine_topk(emb, qs, k=10).collect()}
    hi = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=8).collect()}
    lo = {(r["query_id"], r["vec_id"])
          for r in mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=2).collect()}
    assert hi == exact
    assert all((q, q) in lo for q in range(5))
    assert len(lo & exact) / len(exact) >= 0.4


def test_ivf_trainer_determinism(spark, sf_correctness_dir):
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    a = mllib_ann.train_ivf_sample(emb, k=4, seed=3, sample_rows=128, iters=4)
    b = mllib_ann.train_ivf_sample(emb, k=4, seed=3, sample_rows=128, iters=4)
    assert a == b


# --- SemDeDup --------------------------------------------------------------


def _clustered_vectors(spark):
    """Two well-separated clusters; within cluster A, vectors 1/2/3 are
    near-identical (dups) and 4 points elsewhere; cluster B has one
    near-dup pair (10, 11) and a loner 12."""
    import numpy as np

    rng = np.random.default_rng(7)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    for vid, base, jitter in [
        (1, base_a, 0.0),
        (2, base_a, 0.01),
        (3, base_a, 0.02),
        (4, base_a + np.array([0.0, 0.0, 1.0, 0.0]), 0.0),
        (10, base_b, 0.0),
        (11, base_b, 0.01),
        (12, base_b + np.array([0.0, 0.0, 0.0, 1.2]), 0.0),
    ]:
        v = base + jitter * rng.normal(size=4)
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_keep_lowest_id(spark):
    emb = _clustered_vectors(spark)
    centers = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {
        r["vec_id"]: r
        for r in mllib_ann.semantic_dedup(
            emb, centers, threshold=0.95
        ).collect()
    }
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    assert not out[3]["keep"] and out[3]["dup_of"] == 1
    assert out[4]["keep"]  # same cell, below threshold
    assert out[10]["keep"]
    assert not out[11]["keep"] and out[11]["dup_of"] == 10
    assert out[12]["keep"]


def test_semantic_pairs_cluster_scoped(spark):
    """Vectors 2 and 11 are dissimilar cluster-mates of nothing across
    clusters: no cross-cell pair may appear even at threshold 0."""
    emb = _clustered_vectors(spark)
    centers = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    pairs = mllib_ann.semantic_pairs(emb, centers, threshold=-1.0).collect()
    a_ids = {1, 2, 3, 4}
    for r in pairs:
        same_a = r["a"] in a_ids and r["b"] in a_ids
        same_b = r["a"] not in a_ids and r["b"] not in a_ids
        assert same_a or same_b
        assert r["a"] < r["b"]


def test_semantic_dedup_composes_with_groups(spark):
    """The paper's keep-best-representative policy: pipe semantic_pairs
    into components.dedup_groups with a score column."""
    from physicsnemo_curator_spark.operators import components

    emb = _clustered_vectors(spark)
    centers = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    pairs = mllib_ann.semantic_pairs(emb, centers, threshold=0.95)
    scores = emb.select(
        F.col("vec_id").alias("id"),
        (F.col("vec_id") % 10).cast("double").alias("score"),
    )
    groups = components.dedup_groups(
        pairs.select("a", "b"), id_out="id", scores=scores
    )
    kept = {r["id"] for r in groups.filter(F.col("keep")).collect()}
    seen = {r["id"] for r in groups.collect()}
    # group {1,2,3}: best score = 3; group {10,11}: best = 11;
    # singletons (4, 12) are not in any pair -> left to the caller
    assert kept == {3, 11}
    assert seen == {1, 2, 3, 10, 11}


def test_semantic_dedup_kmeans_model_variant(spark, sf_correctness_dir):
    """KMeansModel and its extracted centers give identical results."""
    emb = load_table(spark, sf_correctness_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    model = mllib_ann.train_ivf(emb, k=4, seed=11, max_iter=3)
    via_model = sorted(
        (r["vec_id"], r["cell"], r["dup_of"])
        for r in mllib_ann.semantic_dedup(
            emb, model, threshold=0.4
        ).collect()
    )
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    via_list = sorted(
        (r["vec_id"], r["cell"], r["dup_of"])
        for r in mllib_ann.semantic_dedup(
            emb, centers, threshold=0.4
        ).collect()
    )
    assert via_model == via_list


def test_semantic_pairs_arrow_dot_agrees(spark, sf_correctness_dir):
    """The Arrow einsum kernel and the unrolled codegen expression pick
    the same pair set (float-summation-order differences only matter
    within float error of the threshold; none sit there)."""
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    unrolled = {
        (r["a"], r["b"])
        for r in mllib_ann.semantic_pairs(
            emb, centers, threshold=0.35
        ).collect()
    }
    arrow = {
        (r["a"], r["b"])
        for r in mllib_ann.semantic_pairs(
            emb, centers, threshold=0.35, dot="arrow"
        ).collect()
    }
    assert unrolled == arrow and len(unrolled) > 0


def test_incremental_semantic_dedup_parity_and_append(spark, tmp_path, sf_correctness_dir):
    """Incremental probe == full recompute minus corpus-internal pairs;
    appended batches become part of the corpus for later probes;
    re-running a batch write is idempotent."""
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 300)
    batch1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    batch2 = emb.filter(F.col("vec_id") >= 400)
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    store = str(tmp_path / "sem_store")
    mllib_ann.write_semantic_store(corpus, centers, store)

    inc = mllib_ann.incremental_semantic_dedup(
        spark, batch1, centers, store, threshold=0.35,
        update_store=True, batch_id="b1",
    ).collect()
    got = {frozenset((r["a"], r["b"])) for r in inc}
    full = mllib_ann.semantic_pairs(
        corpus.unionByName(batch1), centers, threshold=0.35
    ).collect()
    b1_ids = {r["vec_id"] for r in batch1.select("vec_id").collect()}
    want = {
        frozenset((r["a"], r["b"]))
        for r in full
        if r["a"] in b1_ids or r["b"] in b1_ids
    }
    assert got == want and len(got) > 0
    # scopes are labeled correctly
    for r in inc:
        if r["scope"] == "corpus":
            assert r["a"] not in b1_ids and r["b"] in b1_ids
        else:
            assert r["a"] in b1_ids and r["b"] in b1_ids and r["a"] < r["b"]

    # idempotent re-write of the same batch, then probe batch2 against
    # corpus+batch1
    mllib_ann.write_semantic_store(
        batch1, centers, store, mode="append", batch_id="b1"
    )
    inc2 = mllib_ann.incremental_semantic_dedup(
        spark, batch2, centers, store, threshold=0.35
    ).collect()
    got2 = {frozenset((r["a"], r["b"])) for r in inc2}
    full2 = mllib_ann.semantic_pairs(emb, centers, threshold=0.35).collect()
    b2_ids = {r["vec_id"] for r in batch2.select("vec_id").collect()}
    want2 = {
        frozenset((r["a"], r["b"]))
        for r in full2
        if r["a"] in b2_ids or r["b"] in b2_ids
    }
    assert got2 == want2
    # no duplicated corpus rows from the idempotent re-write
    n_store = spark.read.parquet(store).count()
    assert n_store == corpus.count() + batch1.count()


def test_pq_topk_recall_and_rescore(spark, sf_correctness_dir):
    """PQ/ADC must (a) emit m codes per vector in [0, ks); (b) recover
    a solid share of the exact top-10 (coarser than SQ8 — 8 subspace
    codes vs 64 8-bit dims); (c) with rescore the surviving candidates
    carry EXACT cosine scores; (d) accept precomputed codebooks."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import mllib_ann, similarity

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    codes = mllib_ann.pq_encode(emb, cbs).collect()
    flat = [c for r in codes for c in r["codes"]]
    assert len(codes[0]["codes"]) == 8
    assert min(flat) >= 0 and max(flat) < 16
    exact = similarity.cosine_topk(emb, qs, k=10, dim=64)
    approx = mllib_ann.pq_topk(emb, qs, k=10, dim=64, codebooks=cbs)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.3  # 8-code ADC is coarse by design
    rescored = mllib_ann.pq_topk(
        emb, qs, k=10, dim=64, codebooks=cbs, rescore=3
    )
    ex = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    shared = 0
    for r in rescored.collect():
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            shared += 1
            assert abs(r["cosine"] - ex[key]) < 1e-12
    assert shared > 0


def test_pq_train_guards(spark, sf_correctness_dir):
    import pytest as _pytest

    from physicsnemo_curator_spark.operators import mllib_ann

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    with _pytest.raises(ValueError, match="not divisible"):
        mllib_ann.pq_train(emb, m=7, ks=4, dim=64)
    with _pytest.raises(ValueError, match="need ks"):
        mllib_ann.pq_train(emb.limit(3), m=8, ks=16, dim=64)


def test_pq_train_sample_refines_quantization(spark, sf_correctness_dir):
    """The Lloyd trainer is deterministic at a seed, emits (m, ks,
    dim/m) codebooks, keeps the divisibility/size guards, and its
    refined codebooks carry LOWER total quantization error than the
    md5-sample-init pq_train codebooks on the same corpus (the whole
    point of refinement)."""
    import numpy as np
    import pytest as _pytest

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    a = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64, seed=5)
    b = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64, seed=5)
    assert a == b
    assert len(a) == 8 and len(a[0]) == 16 and len(a[0][0]) == 8
    with _pytest.raises(ValueError, match="not divisible"):
        mllib_ann.pq_train_sample(emb, m=7, ks=4, dim=64)
    with _pytest.raises(ValueError, match="need ks"):
        mllib_ann.pq_train_sample(emb.limit(3), m=8, ks=16, dim=64)

    x = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )

    def qerr(cbs):
        total = 0.0
        for j, cb in enumerate(cbs):
            sub = x[:, j * 8 : (j + 1) * 8]
            c = np.asarray(cb)
            d = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            total += d.min(axis=1).sum()
        return total

    init = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    assert qerr(a) < qerr(init)


def test_recall_ladder_floors(spark, sf_correctness_dir):
    """RECALL.md's sf0.01 floors as assertions: every strategy is
    deterministic at the gate parameters, so a quantization/banding
    regression drops recall below its floor and fails HERE instead of
    silently returning worse neighbors."""
    emb = load_table(spark, sf_correctness_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    cbs_l = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64)
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)

    floors = [
        (similarity.lsh_topk(emb, qs, 64, k=10), 0.50, "lsh"),
        (mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=3), 0.40, "ivf"),
        (similarity.sq8_topk(emb, qs, k=10, dim=64), 0.90, "sq8"),
        (
            similarity.sq8_topk(emb, qs, k=10, dim=64, rescore=2),
            0.95,
            "sq8+rescore2",
        ),
        (mllib_ann.pq_topk(emb, qs, k=10, dim=64, codebooks=cbs), 0.20, "pq"),
        (
            mllib_ann.pq_topk(emb, qs, k=10, dim=64, codebooks=cbs, rescore=5),
            0.45,
            "pq+rescore5",
        ),
        (
            mllib_ann.pq_topk(
                emb, qs, k=10, dim=64, codebooks=cbs_l, rescore=5
            ),
            0.60,
            "pq-lloyd+rescore5",
        ),
        (
            mllib_ann.ivfpq_topk(
                emb, qs, centers, k=10, n_probe=3, codebooks=cbs
            ),
            0.18,
            "ivfpq",
        ),
        (
            mllib_ann.ivfpq_topk(
                emb, qs, centers, k=10, n_probe=3, codebooks=cbs, rescore=5
            ),
            0.30,
            "ivfpq+rescore5",
        ),
    ]
    got = {name: recall(df) for df, _floor, name in floors}
    for _df, floor, name in floors:
        assert got[name] >= floor, (name, got[name], floor)


def test_ivfpq_index_roundtrip_and_append(spark, tmp_path, sf_correctness_dir):
    """The persisted index must serve the same results as the inline
    ivfpq_topk over the same corpus and quantizers; appending a batch
    extends the served corpus; re-appending the same batch is
    idempotent; rescore needs (and uses) the original vectors."""
    import pytest as _pytest

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(corpus, k=8)
    cbs = mllib_ann.pq_train(corpus, m=8, ks=16, dim=64)
    store = str(tmp_path / "ivfpq")
    mllib_ann.write_ivfpq_index(corpus, centers, cbs, store)

    def key_set(df):
        return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}

    served = mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=10, n_probe=3, codebooks=cbs
    )
    inline = mllib_ann.ivfpq_topk(
        corpus, qs, centers, k=10, n_probe=3, codebooks=cbs
    )
    assert key_set(served) == key_set(inline) and len(key_set(served)) > 0

    # append the odd half; the store now serves the FULL corpus
    mllib_ann.write_ivfpq_index(
        batch, centers, cbs, store, mode="append", batch_id="b1"
    )
    served2 = mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=10, n_probe=3, codebooks=cbs
    )
    inline2 = mllib_ann.ivfpq_topk(
        emb, qs, centers, k=10, n_probe=3, codebooks=cbs
    )
    assert key_set(served2) == key_set(inline2)
    # idempotent re-append: dynamic overwrite replaces b1, no doubling
    mllib_ann.write_ivfpq_index(
        batch, centers, cbs, store, mode="append", batch_id="b1"
    )
    assert spark.read.parquet(store).count() == emb.count()

    # rescore: exact cosine on the original vectors, which the index
    # does not hold — corpus= is required
    with _pytest.raises(ValueError, match="pass corpus="):
        mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=10, codebooks=cbs, rescore=2
        )
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect()
    }
    shared = 0
    for r in mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=10, n_probe=3, codebooks=cbs,
        rescore=3, corpus=emb,
    ).collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact:
            shared += 1
            assert abs(r["cosine"] - exact[key]) < 1e-12
    assert shared > 0


def test_ivfpq_index_duplicate_batch_and_mode_guard(
    spark, tmp_path, sf_correctness_dir
):
    """Review-finding regressions: (a) a vector re-ingested under a
    SECOND batch_id (instead of idempotently under its own) must not
    double inside the ADC sums — the probe dedupes per (query, vec) on
    the atomic codes row, so scores equal the single-copy index's; (b)
    an unknown mode raises instead of silently static-overwriting the
    store; (c) the trainers tolerate NULL embeddings."""
    import pytest as _pytest

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(200)
    )
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    clean = str(tmp_path / "clean")
    dup = str(tmp_path / "dup")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    mllib_ann.write_ivfpq_index(emb, centers, cbs, dup)
    # the SAME rows again under a different batch id — the
    # non-idempotent re-ingest a backfill job would produce
    half = emb.filter(F.col("vec_id") % 2 == 0)
    mllib_ann.write_ivfpq_index(
        half, centers, cbs, dup, mode="append", batch_id="backfill"
    )
    assert spark.read.parquet(dup).count() == 200 + half.count()

    def rows(store):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=10, n_probe=3, codebooks=cbs
            ).collect()
        )

    assert rows(dup) == rows(clean)

    with _pytest.raises(ValueError, match="unknown write_ivfpq_index mode"):
        mllib_ann.write_ivfpq_index(
            emb, centers, cbs, dup, mode="Append", batch_id="x"
        )
    # NULL embeddings must not crash training either
    nulls = spark.createDataFrame(
        [(990_001, None)], "vec_id long, embedding array<float>"
    )
    with_null = emb.unionByName(nulls)
    assert len(mllib_ann.md5_sample_centroids(with_null, k=8)) == 8
    assert len(mllib_ann.pq_train(with_null, m=8, ks=16, dim=64)) == 8
    assert len(mllib_ann.train_ivf_sample(with_null, k=4, sample_rows=64)) == 4


def test_ivfpq_index_probe_prunes_partitions(spark, tmp_path, sf_correctness_dir):
    """The index probe must BROADCAST the query side and prune the
    store scan to the probed cell partitions — the two properties that
    keep a probe proportional to n_probe/k_cells at 100 TB."""
    import os
    import re

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "ivfpq_plan")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)

    def assert_pruned():
        out = mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=5, n_probe=2, codebooks=cbs
        )
        out.collect()  # AQE finalizes the plan (and its DPP filters)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # a REAL dynamic pruning filter, not just isnotnull(cell) — the
        # r16 regression: marking the probe-side UDF nondeterministic
        # silently degraded "cell IN dynamicpruning#N" to a full scan,
        # and the old `"cell" in filters` assert could not see it
        pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert any(
            "dynamicpruningexpression(cell" in pf and "IN dynamicpruning" in pf
            for pf in pfs
        ), plan[:1500]

    assert_pruned()
    # and STILL pruned once the lifecycle has created live tombstones
    # (conflicting re-ingest under a new batch): the tombstone filter
    # applies AFTER the cell join, so the store scan's partition
    # pruning can't depend on how the optimizer orders a join placed
    # upstream of it
    mllib_ann.write_ivfpq_index(
        emb.limit(5), centers, cbs, store, mode="append", batch_id="b2"
    )
    tomb = os.path.join(store, "_tombstones")
    assert os.path.exists(tomb) and spark.read.parquet(tomb).count() > 0
    assert_pruned()


def test_pq_probe_size_guard(spark, sf_correctness_dir):
    """The driver-side LUT collect is bounded: a probe frame over the
    documented cap raises a sized message naming the knob instead of
    materializing the corpus on the driver."""
    import pytest as _pytest

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    with _pytest.raises(ValueError, match="max_probe_queries"):
        mllib_ann.pq_topk(
            emb, qs, k=5, dim=64, codebooks=cbs, max_probe_queries=10
        ).collect()
    # and the knob genuinely widens the bound
    ok = mllib_ann.pq_topk(
        emb.limit(50),
        qs.limit(5),
        k=3,
        dim=64,
        codebooks=cbs,
        max_probe_queries=5,
    )
    assert ok.count() > 0


def test_ann_null_embeddings_dropped(spark, sf_correctness_dir):
    """A NULL embedding must not crash the Arrow batch or consume
    ranks, in ANY family member (the _assign_with_norm convention)."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(60)
    )
    nulls = spark.createDataFrame(
        [(990_001, None), (990_002, None)],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.unionByName(nulls)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    outs = [
        similarity.sq8_topk(corpus, qs, k=5, dim=64),
        mllib_ann.pq_topk(corpus, qs, k=5, dim=64, codebooks=cbs),
        mllib_ann.ivf_topk(corpus, qs, centers, k=5, n_probe=4),
        mllib_ann.ivfpq_topk(
            corpus, qs, centers, k=5, n_probe=4, codebooks=cbs
        ),
    ]
    for out in outs:
        rows = out.collect()
        assert rows and all(r["vec_id"] < 990_000 for r in rows)
        assert all(r["cosine"] is not None for r in rows)
    assert mllib_ann.pq_encode(corpus, cbs).count() == 60


def test_ivfpq_topk_candidates_and_rescore(spark, sf_correctness_dir):
    """IVF-PQ candidates are exactly the probed-cell subset: its
    results are a subset of PQ-over-the-same-cells, every query
    retrieves itself (its own cell is always probed, and the identical
    vector shares all PQ codes), and the rescore path carries exact
    cosine scores."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import mllib_ann, similarity

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    out = mllib_ann.ivfpq_topk(
        emb, qs, centers, k=10, n_probe=3, codebooks=cbs
    )
    got = {(r["query_id"], r["vec_id"]) for r in out.collect()}
    assert all((q, q) in got for q in range(5))  # self-retrieval
    # subset check vs unrestricted PQ with a huge k (all candidates)
    pq_all = mllib_ann.pq_topk(
        emb, qs, k=10_000, dim=64, codebooks=cbs
    )
    universe = {(r["query_id"], r["vec_id"]) for r in pq_all.collect()}
    assert got <= universe
    # full probing (n_probe = all cells) == plain PQ top-k
    full = mllib_ann.ivfpq_topk(
        emb, qs, centers, k=10, n_probe=8, codebooks=cbs
    )
    pq10 = mllib_ann.pq_topk(emb, qs, k=10, dim=64, codebooks=cbs)
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in full.collect()} == {
        (r["query_id"], r["vec_id"], r["rank"]) for r in pq10.collect()
    }
    # rescore: shared pairs score EXACTLY like brute-force cosine
    exact = similarity.cosine_topk(emb, qs, k=10, dim=64)
    ex = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    rescored = mllib_ann.ivfpq_topk(
        emb, qs, centers, k=10, n_probe=3, codebooks=cbs, rescore=3
    )
    shared = 0
    for r in rescored.collect():
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            shared += 1
            assert abs(r["cosine"] - ex[key]) < 1e-12
    assert shared > 0


def test_cluster_balanced_sample_caps_and_determinism(spark, sf_correctness_dir):
    """Every cell contributes at most n_per_cell rows, ranks are
    1..min(n, cell size), the pick is deterministic, and the union of
    picks across a big-enough cap is the whole corpus."""
    emb = load_table(spark, sf_correctness_dir, "embeddings")
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    out = mllib_ann.cluster_balanced_sample(emb, centers, n_per_cell=5)
    rows = out.collect()
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r["pick_rank"])
    assert len(by_cell) == 8
    for ranks in by_cell.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    again = mllib_ann.cluster_balanced_sample(emb, centers, n_per_cell=5)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # cap >= corpus: everything is kept exactly once
    all_kept = mllib_ann.cluster_balanced_sample(
        emb, centers, n_per_cell=10_000
    )
    assert all_kept.count() == emb.count()
    assert all_kept.select("vec_id").distinct().count() == emb.count()


def test_mmr_rerank_diversifies(spark):
    """Constructed corpus: two near-identical highly-relevant vectors
    (a, a') and a less-relevant but orthogonal vector b.  Plain top-2
    keeps the twins; MMR at λ=0.5 keeps one twin then b (the twin's
    redundancy penalty exceeds b's relevance gap).  λ=1 degenerates to
    pure relevance order, and an ANTI-correlated candidate's score
    exceeds λ·rel (negative max-sim is a bonus, not floored at 0)."""
    from physicsnemo_curator_spark.operators import similarity

    # NOTE: no candidate may EQUAL the query — then every step-2 score
    # is exactly 0 (sim-to-selected == rel) and ties dominate
    rows = [
        (1, [0.9, 0.1, 0.0, 0.0]),    # near-query a
        (2, [0.9, 0.11, 0.0, 0.0]),   # twin a'
        (3, [0.6, 0.0, 0.8, 0.0]),    # diverse, less relevant
        (4, [-0.5, 0.0, 0.0, 0.9]),   # anti-correlated to a
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    cand = emb.select(F.lit(100).alias("query_id"), "vec_id")
    out = {
        r["mmr_rank"]: r
        for r in similarity.mmr_rerank(emb, qs, cand, k=4, lamb=0.5).collect()
    }
    assert out[1]["vec_id"] == 1          # most relevant first
    assert out[2]["vec_id"] == 3          # diversity beats the twin
    assert out[3]["vec_id"] == 2          # then the twin
    assert out[4]["vec_id"] == 4
    # anti-correlated candidate scores ABOVE 0.5*rel at step >= 2
    # (negative max-sim is a bonus, not floored at 0)
    rel4 = -0.5 / (0.5**2 + 0.9**2) ** 0.5
    assert out[4]["mmr_score"] > 0.5 * rel4
    # lambda=1: pure relevance order (exact top-k order)
    pure = [
        r["vec_id"]
        for r in sorted(
            similarity.mmr_rerank(emb, qs, cand, k=4, lamb=1.0).collect(),
            key=lambda r: r["mmr_rank"],
        )
    ]
    exact = [
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qs, k=4, dim=4)
        .orderBy("rank")
        .collect()
    ]
    assert pure == exact


def test_compact_ivfpq_index(spark, tmp_path, sf_correctness_dir):
    """Compaction merges every batch partition into one 'compacted'
    generation: row count and probe results are unchanged, and the
    store's _batch listing collapses to one value."""
    import os

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(120)
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "to_compact")
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), centers, cbs, store
    )
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 1), centers, cbs, store,
        mode="append", batch_id="b1",
    )

    def probe():
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=5, n_probe=2, codebooks=cbs
            ).collect()
        )

    before = probe()
    n_before = spark.read.parquet(store).count()
    mllib_ann.compact_ivfpq_index(spark, store)
    data_dir = mllib_ann._resolve_data_dir(store)
    assert data_dir == os.path.join(store, "v00001")  # pointer flipped
    assert spark.read.parquet(data_dir).count() == n_before
    assert probe() == before
    batches = [
        d for d in os.listdir(data_dir) if d.startswith("_batch=")
    ]
    assert batches == ["_batch=compacted"]
    # the flat-layout partitions survive ONE compact as the in-flight
    # reader grace copy...
    assert [d for d in os.listdir(store) if d.startswith("_batch=")]
    # compacting again rolls the generation, sweeps the two-generation-
    # old flat leftovers, keeps v00001 as the new grace copy
    mllib_ann.compact_ivfpq_index(spark, store)
    assert mllib_ann._resolve_data_dir(store) == os.path.join(
        store, "v00002"
    )
    assert not [d for d in os.listdir(store) if d.startswith("_batch=")]
    assert os.path.exists(os.path.join(store, "v00001"))  # grace copy
    assert probe() == before
    # ...and a third compact finally drops v00001 (>= 2 compacts old)
    mllib_ann.compact_ivfpq_index(spark, store)
    assert not os.path.exists(os.path.join(store, "v00001"))
    assert os.path.exists(os.path.join(store, "v00002"))  # new grace
    assert probe() == before


def test_rrf_fuse_semantics(spark):
    """Known-arithmetic fusion: a doc in BOTH lists outranks docs in
    one list at comparable ranks; scores are exact rational sums; the
    empty-input guard raises; single-ranker fusion preserves order."""
    import math

    import pytest as _pytest

    from physicsnemo_curator_spark.operators import similarity

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, vec_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, vec_id long, rank int",
    )
    out = {
        r["vec_id"]: r
        for r in similarity.rrf_fuse([a, b], k=4, c=60).collect()
    }
    # 11: 1/62 + 1/61; 10: 1/61 + 1/63; 12: 1/63; 13: 1/62
    assert math.isclose(out[11]["rrf_score"], 1 / 62 + 1 / 61, rel_tol=1e-12)
    assert math.isclose(out[10]["rrf_score"], 1 / 61 + 1 / 63, rel_tol=1e-12)
    assert out[11]["rank"] == 1 and out[10]["rank"] == 2
    assert {out[12]["rank"], out[13]["rank"]} == {3, 4}
    assert out[13]["rank"] < out[12]["rank"]  # 1/62 > 1/63
    with _pytest.raises(ValueError, match="at least one ranking"):
        similarity.rrf_fuse([], k=3)
    solo = similarity.rrf_fuse([a], k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in solo] == [10, 11, 12]


def test_hard_negatives_label_exclusion(spark):
    """Mined negatives never share the anchor's label (the anchor
    itself is therefore excluded by construction), and within the
    allowed labels the ranking is by true cosine."""
    from physicsnemo_curator_spark.operators import similarity

    rows = [
        (1, "a", [1.0, 0.0, 0.0, 0.0]),
        (2, "a", [0.99, 0.1, 0.0, 0.0]),   # same label: never a negative
        (3, "b", [0.98, 0.0, 0.2, 0.0]),   # hardest negative
        (4, "b", [0.5, 0.0, 0.8, 0.0]),
        (5, "c", [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    anchors = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    out = sorted(
        similarity.hard_negatives(emb, anchors, k=10, dim=4).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["vec_id"] for r in out] == [3, 4, 5]
    assert all(r["label"] != "a" for r in out)
    assert out[0]["cosine"] > out[1]["cosine"] > out[2]["cosine"]


def test_ivfpq_index_conflicting_reingest_latest_batch_wins(
    spark, tmp_path, sf_correctness_dir
):
    """A vec_id re-ingested with DIFFERENT codes under a later batch_id
    must resolve deterministically to the LATEST batch's codes — the
    served results equal an index holding only the new version."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(100)
    )
    # v2: same ids, embeddings rolled by one position -> different codes
    v2 = emb.select(
        "vec_id",
        F.concat(
            F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
        ).alias("embedding"),
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    conflicted = str(tmp_path / "conflicted")
    clean_v2 = str(tmp_path / "clean_v2")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, conflicted,
                                batch_id="2026-01-01")
    mllib_ann.write_ivfpq_index(v2, centers, cbs, conflicted,
                                mode="append", batch_id="2026-02-01")
    mllib_ann.write_ivfpq_index(v2, centers, cbs, clean_v2)

    def rows(store):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    # clean_v2 stores under _batch='seed', conflicted's winner under
    # '2026-02-01' — the batch NAME differs but the served codes (and
    # therefore the ADC ranking) must be identical
    assert rows(conflicted) == rows(clean_v2)


@pytest.mark.soak
def test_compact_ivfpq_index_crash_recovery_and_guards(
    spark, tmp_path, sf_correctness_dir
):
    """Pointer-protocol crash points: (a) a new generation written but
    the pointer NOT flipped -> readers stay on the old generation and
    the next compact overwrites the garbage; (b) pointer flipped but
    the old generation not swept -> readers serve the new one and the
    next compact sweeps; (c) a legacy pre-pointer crash (store at
    ._old, nothing at store) is still healed; (d) non-file schemes
    raise with the object-store porting note; (e) a corrupt pointer
    raises instead of probing garbage."""
    import os

    import pytest as _pytest

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(60)
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    store = str(tmp_path / "crashy")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
    n = spark.read.parquet(store).count()

    def probe():
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=5, n_probe=2, codebooks=cbs
            ).collect()
        )

    healthy = probe()
    # legacy crash window of the old two-rename swap: healed first
    os.rename(store, store + "._old")
    mllib_ann.compact_ivfpq_index(spark, store)
    assert not os.path.exists(store + "._old")
    data1 = mllib_ann._resolve_data_dir(store)
    assert spark.read.parquet(data1).count() == n
    assert probe() == healthy

    # the legacy protocol's OTHER crash window (swap complete, cleanup
    # never ran): ._old alongside a live store is dropped, not restored
    os.makedirs(store + "._old")
    mllib_ann.compact_ivfpq_index(spark, store)  # -> v00002
    assert not os.path.exists(store + "._old")
    assert mllib_ann._resolve_data_dir(store).endswith("v00002")
    assert probe() == healthy

    # crash BEFORE the flip: a garbage v00003 exists, pointer says
    # v00002 -> readers untouched, next compact rewrites v00003
    os.makedirs(os.path.join(store, "v00003", "_batch=junk"))
    assert mllib_ann._resolve_data_dir(store).endswith("v00002")
    assert probe() == healthy
    mllib_ann.compact_ivfpq_index(spark, store)
    assert mllib_ann._resolve_data_dir(store).endswith("v00003")
    assert probe() == healthy
    # reader grace window: the immediately-superseded generation is
    # KEPT for in-flight probes; v00001 (two compacts old) is swept
    assert os.path.exists(os.path.join(store, "v00002"))
    assert not os.path.exists(os.path.join(store, "v00001"))

    with _pytest.raises(NotImplementedError, match="object-store"):
        mllib_ann.compact_ivfpq_index(spark, "s3a://bucket/idx")
    # file:// URIs are local and must work end-to-end
    mllib_ann.compact_ivfpq_index(spark, "file://" + store)
    assert mllib_ann._resolve_data_dir(store).endswith("v00004")
    assert not os.path.exists(os.path.join(store, "v00002"))
    assert probe() == healthy

    with open(os.path.join(store, "_CURRENT"), "w") as fh:
        fh.write("not-a-generation")
    with _pytest.raises(ValueError, match="corrupt generation pointer"):
        mllib_ann._resolve_data_dir(store)


@pytest.mark.soak
def test_ivfpq_lifecycle_compact_then_reingest_equals_rebuild(
    spark, tmp_path, sf_correctness_dir
):
    """The composed lifecycle the r12 audit found broken: seed ->
    append (WRONG vectors) -> compact -> conflicting re-ingest with
    the CORRECT vectors.  The probe must serve the post-compaction
    re-ingest (latest _gen wins; the lexical-'_batch' rule inverted
    here because 'compacted' > any ISO date), and the whole store must
    equal a clean single-write rebuild."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(100)
    )
    wrong = emb.select(
        "vec_id",
        F.concat(
            F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
        ).alias("embedding"),
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds_wrong = wrong.filter(F.col("vec_id") % 2 == 1)
    odds_right = emb.filter(F.col("vec_id") % 2 == 1)

    lived = str(tmp_path / "lived")
    clean = str(tmp_path / "clean")
    mllib_ann.write_ivfpq_index(evens, centers, cbs, lived)
    mllib_ann.write_ivfpq_index(
        odds_wrong, centers, cbs, lived, mode="append", batch_id="2026-01-01"
    )
    mllib_ann.compact_ivfpq_index(spark, lived)
    mllib_ann.write_ivfpq_index(
        odds_right, centers, cbs, lived, mode="append", batch_id="2026-02-01"
    )
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)

    def rows(store):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    assert rows(lived) == rows(clean)
    # and compacting the lived store AGAIN (conflicts resolved with
    # latest-_gen-wins BEFORE generations collapse) changes nothing
    mllib_ann.compact_ivfpq_index(spark, lived)
    assert rows(lived) == rows(clean)
    # post-dedup the compacted generation holds exactly one row per id
    data = spark.read.parquet(mllib_ann._resolve_data_dir(lived))
    assert data.count() == emb.count()


@pytest.mark.soak
@pytest.mark.parametrize("seed", [7, 23, 91])
def test_ivfpq_lifecycle_randomized_equals_rebuild(
    spark, tmp_path, sf_correctness_dir, seed
):
    """Randomized lifecycle equivalence: ANY seeded sequence of
    appends (random vec subsets, each re-ingested under a random
    variant of its embedding, under fresh or repeated batch names)
    interleaved with compactions must probe EXACTLY like a clean
    single-write rebuild of the final per-vector state.  This is the
    composed guarantee the r12 audit found broken in two separate
    ways (generation-order inversion, pruned-probe stale pick) — the
    deterministic tests pin those two; this pins the space around
    them.  A random subset of the writes and compactions runs under
    ``lease=True`` (single-threaded, so never contended): any stuck
    lease, failed fencing verify, or lease-file interference with the
    data layout would break the equivalence or raise."""
    import random

    rng = random.Random(seed)
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(80)
    )
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]

    def variant(df, v):
        # v=0: original; v=1: rolled by 1; v=2: halves swapped — three
        # distinct, cell-moving, oracle-free encodings of "the vector
        # changed"
        if v == 0:
            return df
        if v == 1:
            return df.select(
                "vec_id",
                F.concat(
                    F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
                ).alias("embedding"),
            )
        return df.select(
            "vec_id",
            F.concat(
                F.slice("embedding", 33, 32), F.slice("embedding", 1, 32)
            ).alias("embedding"),
        )

    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / f"rand{seed}")
    state: dict[int, int] = {}  # vec_id -> live variant
    batch_names = []
    first = True
    for step in range(5):
        subset = sorted(rng.sample(ids, rng.randint(20, 60)))
        v = rng.randint(0, 2)
        if rng.random() < 0.4 and batch_names:
            name = rng.choice(batch_names)  # idempotent-style re-run
        else:
            name = f"2026-0{step + 1}-01"
            batch_names.append(name)
        chunk = variant(emb.filter(F.col("vec_id").isin(subset)), v)
        mllib_ann.write_ivfpq_index(
            chunk, centers, cbs, store,
            mode="overwrite" if first else "append",
            batch_id=name,
            lease=rng.random() < 0.5,
        )
        first = False
        for i in subset:
            state[i] = v
        if rng.random() < 0.5:
            mllib_ann.compact_ivfpq_index(
                spark, store, lease=rng.random() < 0.5
            )

    clean = str(tmp_path / f"rand{seed}_clean")
    parts = [
        variant(
            emb.filter(
                F.col("vec_id").isin([i for i, vv in state.items() if vv == v])
            ),
            v,
        )
        for v in (0, 1, 2)
    ]
    final = parts[0].unionByName(parts[1]).unionByName(parts[2])
    mllib_ann.write_ivfpq_index(final, centers, cbs, clean)

    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=3, codebooks=cbs
            ).collect()
        )

    assert rows(store) == rows(clean)
    # one final compact must also be a no-op for serving
    mllib_ann.compact_ivfpq_index(spark, store)
    assert rows(store) == rows(clean)


def test_ivfpq_moved_cell_reingest_same_batch(
    spark, tmp_path, sf_correctness_dir
):
    """Idempotent same-batch re-ingest where a vector's CELL moved:
    dynamic overwrite can't clear the old-cell row (its partition gets
    no new data), so the stale row survives physically — but it loses
    to the re-ingest's higher _gen at probe time, and compaction
    drops it.  Also: batch-name validation rejects the reserved and
    unsafe names."""
    import pytest as _pytest

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(80)
    )
    moved = emb.select(
        "vec_id",
        F.concat(
            F.slice("embedding", 33, 32), F.slice("embedding", 1, 32)
        ).alias("embedding"),
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    lived = str(tmp_path / "moved")
    clean = str(tmp_path / "movedclean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, lived,
                                mode="append", batch_id="b1")
    # the corrected re-run of the SAME batch: halves swapped -> many
    # vectors change cell, leaving stale rows in unrewritten partitions
    mllib_ann.write_ivfpq_index(moved, centers, cbs, lived,
                                mode="append", batch_id="b1")
    mllib_ann.write_ivfpq_index(moved, centers, cbs, clean)

    def rows(store):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    assert rows(lived) == rows(clean)
    mllib_ann.compact_ivfpq_index(spark, lived)
    assert rows(lived) == rows(clean)
    data = spark.read.parquet(mllib_ann._resolve_data_dir(lived))
    assert data.count() == emb.count()

    with _pytest.raises(ValueError, match="reserved"):
        mllib_ann.write_ivfpq_index(
            emb, centers, cbs, lived, mode="append", batch_id="compacted"
        )
    with _pytest.raises(ValueError, match="invalid batch_id"):
        mllib_ann.write_ivfpq_index(
            emb, centers, cbs, lived, mode="append", batch_id="a/b"
        )


@pytest.mark.soak
@pytest.mark.parametrize("batch_id", ["007", "2026-01-01T00:15:00"])
def test_ivfpq_partial_rerun_awkward_batch_names(
    spark, tmp_path, sf_correctness_dir, batch_id
):
    """The r13 review's partition-inference trap: a numeric-looking
    batch name ('007' reads back as integer 7 under Spark's partition
    type inference, so a string-value filter matches NOTHING) and a
    ':'-bearing ISO timestamp (percent-escaped in the partition
    directory name).  A PARTIAL re-run under either name must still
    carry the batch's other vectors through the rewrite — the upsert
    reads the partition by directory, not by value comparison."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(60)
    )
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "awkward")
    mllib_ann.write_ivfpq_index(
        emb, centers, cbs, store, mode="append", batch_id=batch_id
    )
    # partial re-run: only a third of the vectors, MOVED (halves
    # swapped) so their cells change and the overwrite touches
    # partitions holding uncarried rows
    third = [r["vec_id"] for r in emb.select("vec_id").collect()][::3]
    moved = emb.filter(F.col("vec_id").isin(third)).select(
        "vec_id",
        F.concat(
            F.slice("embedding", 33, 32), F.slice("embedding", 1, 32)
        ).alias("embedding"),
    )
    mllib_ann.write_ivfpq_index(
        moved, centers, cbs, store, mode="append", batch_id=batch_id
    )
    clean = str(tmp_path / "awkward_clean")
    final = emb.filter(~F.col("vec_id").isin(third)).unionByName(moved)
    mllib_ann.write_ivfpq_index(final, centers, cbs, clean)

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    assert rows(store) == rows(clean)


def test_mmr_rerank_string_ids_and_nulls(spark):
    """String ids flow through mmr_rerank unchanged (the exact_rerank
    type-generic contract), and NULL embeddings on either side are
    dropped instead of crashing the pandas batch."""
    from physicsnemo_curator_spark.operators import similarity

    rows = [
        ("d-a", [0.9, 0.1, 0.0, 0.0]),
        ("d-b", [0.9, 0.11, 0.0, 0.0]),
        ("d-c", [0.6, 0.0, 0.8, 0.0]),
        ("d-null", None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )
    qs = spark.createDataFrame(
        [("q1", [1.0, 0.0, 0.0, 0.0]), ("q-null", None)],
        "query_id string, embedding array<double>",
    )
    cand = emb.crossJoin(qs.select("query_id")).select("query_id", "vec_id")
    out = similarity.mmr_rerank(emb, qs, cand, k=3, lamb=0.5).collect()
    assert {r["query_id"] for r in out} == {"q1"}
    got = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert got == ["d-a", "d-c", "d-b"]  # diversity beats the twin


def test_hard_negatives_null_handling(spark):
    """NULL embeddings/labels never surface: no null-cosine rows, no
    silently-empty anchors crashing downstream."""
    from physicsnemo_curator_spark.operators import similarity

    rows = [
        (1, "a", [1.0, 0.0, 0.0, 0.0]),
        (2, "b", [0.9, 0.1, 0.0, 0.0]),
        (3, "b", None),          # NULL embedding: dropped
        (4, None, [0.8, 0.0, 0.6, 0.0]),  # NULL label: dropped
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    anchors = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    out = similarity.hard_negatives(emb, anchors, k=10, dim=4).collect()
    assert [r["vec_id"] for r in out] == [2]
    assert all(r["cosine"] is not None for r in out)


def test_embedding_drift_signals(spark, sf_correctness_dir):
    """Self-drift is identically (0, 1); a shifted+scaled copy shows
    exactly the injected signal; NULL embeddings are ignored."""
    from physicsnemo_curator_spark.operators import similarity

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(200)
    )
    self_drift = similarity.embedding_drift(emb, emb).collect()
    assert len(self_drift) == 64
    for r in self_drift:
        assert abs(r["mean_shift"]) < 1e-9
        assert abs(r["std_ratio"] - 1.0) < 1e-9
    # current = 2*x + 3: mean_shift = |(2mu+3) - mu|/sigma, std_ratio = 2
    cur = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v * 2.0 + 3.0).alias("embedding"),
    )
    nulls = spark.createDataFrame(
        [(990_001, None)], "vec_id long, embedding array<double>"
    )
    drift = {
        r["j"]: r
        for r in similarity.embedding_drift(
            emb, cur.unionByName(nulls)
        ).collect()
    }
    for j, r in drift.items():
        assert abs(r["std_ratio"] - 2.0) < 1e-6
        expect = abs(r["ref_mean"] + 3.0) / r["ref_std"]
        assert abs(r["mean_shift"] - expect) < 1e-6


def test_embedding_drift_psi_sees_what_moments_miss(spark):
    """The reason the PSI signal exists: a current snapshot whose
    per-dimension mean AND std equal the reference's but whose
    DISTRIBUTION is different (uniform on [-1,1] vs the two-point
    {-1,+1} mass with identical mean 0 and std 1) must light up PSI
    while the moment monitor reads clean.  Self-drift is ~0, empty
    bins stay finite (alpha smoothing), and bins<2 raises."""
    import pytest as _pytest

    from physicsnemo_curator_spark.operators import similarity

    n = 400
    # dim 0: two-point mass {-1, +1} at 50/50 — mean 0, std 1
    # dim 1: constant 0.0 on both sides (quiet)
    # dim 2: constant 0.0 in reference, constant 100.0 in current —
    #        the width-0 edge the r13 review flagged (old binning sent
    #        every current value to the reference's own bin 0, PSI 0)
    ref = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.when(F.col("id") % 2 == 0, -1.0).otherwise(1.0),
            F.lit(0.0),
            F.lit(0.0),
        ).alias("embedding"),
    )
    # dim 0 current: {+sqrt2: 1/4, -sqrt2: 1/4, 0: 1/2} — SAME mean 0
    # and std 1, completely different histogram
    s2 = 2.0 ** 0.5
    cur = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.when(F.col("id") % 4 == 0, s2)
            .when(F.col("id") % 4 == 1, -s2)
            .otherwise(0.0),
            F.lit(0.0),
            F.lit(100.0),
        ).alias("embedding"),
    )
    moments = {
        r["j"]: r for r in similarity.embedding_drift(ref, cur).collect()
    }
    assert moments[0]["mean_shift"] < 1e-9  # moments read clean...
    assert abs(moments[0]["std_ratio"] - 1.0) < 1e-9
    psi = {
        r["j"]: r
        for r in similarity.embedding_drift_psi(
            ref, cur, bins=10, alpha=0.5
        ).collect()
    }
    assert psi[0]["psi"] > 1.0  # ...but the histogram shift is glaring
    assert psi[0]["ref_n"] == n and psi[0]["cur_n"] == n
    assert abs(psi[1]["psi"]) < 1e-9  # the constant dim is quiet
    assert psi[2]["psi"] > 1.0  # constant -> moved constant flags too
    self_psi = similarity.embedding_drift_psi(ref, ref).collect()
    assert all(abs(r["psi"]) < 1e-12 for r in self_psi)
    with _pytest.raises(ValueError, match="bins must be"):
        similarity.embedding_drift_psi(ref, cur, bins=1)


def test_ivfpq_index_stats_lifecycle(spark, tmp_path, sf_correctness_dir):
    """The inspection surface tracks the store through its lifecycle:
    flat seed -> conflicting append (superseded rows + tombstones
    pending) -> compact (pointer generation, conflicts resolved,
    tombstones retired)."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(80)
    )
    moved = emb.select(
        "vec_id",
        F.concat(
            F.slice("embedding", 33, 32), F.slice("embedding", 1, 32)
        ).alias("embedding"),
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "stats")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
    s0 = mllib_ann.ivfpq_index_stats(spark, store)
    assert s0["generation"] is None and s0["n_rows"] == 80
    assert s0["n_vectors"] == 80 and s0["pending_superseded"] == 0
    assert s0["tombstones"] == 0 and list(s0["batches"]) == ["seed"]
    # the writer stamped the (absent) encode transform
    assert s0["transform_stamped"] is True
    assert s0["perm"] is None and s0["rot_set"] is False
    assert s0["batches"]["seed"] == {"rows": 80, "min_gen": 0, "max_gen": 0}
    assert s0["n_cells"] <= 4 and s0["max_cell_rows"] >= s0["mean_cell_rows"]

    # conflicting re-ingest of half the vectors under a new batch
    half = moved.filter(F.col("vec_id") % 2 == 0)
    mllib_ann.write_ivfpq_index(
        half, centers, cbs, store, mode="append", batch_id="b1"
    )
    s1 = mllib_ann.ivfpq_index_stats(spark, store)
    assert s1["n_vectors"] == 80 and s1["n_rows"] == 120
    assert s1["pending_superseded"] == 40 and s1["tombstones"] == 40
    assert s1["batches"]["b1"]["min_gen"] == 1
    # idempotent re-run appends duplicate tombstone ROWS; the live
    # count stays one per conflicted vec_id
    mllib_ann.write_ivfpq_index(
        half, centers, cbs, store, mode="append", batch_id="b1"
    )
    s1b = mllib_ann.ivfpq_index_stats(spark, store)
    assert s1b["tombstones"] == 40 and s1b["pending_superseded"] == 40

    mllib_ann.compact_ivfpq_index(spark, store)
    s2 = mllib_ann.ivfpq_index_stats(spark, store)
    assert s2["generation"] == "v00001"
    assert s2["n_rows"] == 80 and s2["n_vectors"] == 80
    assert s2["pending_superseded"] == 0 and s2["tombstones"] == 0
    assert list(s2["batches"]) == ["compacted"]
    # a pre-generation store fails with the actionable sibling error,
    # not a raw unresolved-column exception
    import pytest as _pytest

    legacy = str(tmp_path / "legacy")
    emb.limit(5).write.parquet(legacy)
    with _pytest.raises(ValueError, match="no _gen"):
        mllib_ann.ivfpq_index_stats(spark, legacy)


def test_quantizer_sidecar_roundtrip(spark, tmp_path, sf_correctness_dir):
    """save/load_quantizers round-trips exactly, survives compaction,
    and a store without a sidecar fails with the fix spelled out."""
    import pytest as _pytest

    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(80)
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "with_sidecar")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
    mllib_ann.save_quantizers(store, centers, cbs)
    c2, cb2 = mllib_ann.load_quantizers(store)
    assert c2 == centers and cb2 == cbs
    # probing with the LOADED quantizers serves identical results
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(
        map(tuple, mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=5, codebooks=cbs
        ).collect())
    )
    b = sorted(
        map(tuple, mllib_ann.ivfpq_index_topk(
            spark, qs, c2, store, k=5, codebooks=cb2
        ).collect())
    )
    assert a == b
    # compaction carries the sidecar into the new generation
    mllib_ann.compact_ivfpq_index(spark, store)
    assert mllib_ann.load_quantizers(store)[0] == centers
    # file:// URIs address the same sidecar as the plain path (the
    # r13 review found save/load silently writing to a literal
    # './file:...' directory)
    assert mllib_ann.load_quantizers("file://" + store)[0] == centers
    mllib_ann.save_quantizers("file://" + store, centers, cbs)
    assert mllib_ann.load_quantizers(store)[1] == cbs
    with _pytest.raises(FileNotFoundError, match="save_quantizers"):
        mllib_ann.load_quantizers(str(tmp_path / "no_sidecar"))


def test_quantizer_sidecar_survives_overwrite(spark, tmp_path, sf_correctness_dir):
    """A full index rewrite (static overwrite deletes the whole store
    path) must carry the quantizer sidecar across, like compaction
    does across generations."""
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(60)
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "rewrite")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
    mllib_ann.save_quantizers(store, centers, cbs)
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)  # rewrite
    c2, cb2 = mllib_ann.load_quantizers(store)
    assert c2 == centers and cb2 == cbs
    # a rewrite whose Spark job DIES mid-write (here: wrong-dim
    # vectors crash the encode UDF after the static overwrite already
    # deleted the store path) must still restore the sidecar — the
    # codes are unreadable without it
    import pytest as _pytest

    bad = emb.select("vec_id", F.slice("embedding", 1, 7).alias("embedding"))
    with _pytest.raises(Exception):
        mllib_ann.write_ivfpq_index(bad, centers, cbs, store)
    c3, cb3 = mllib_ann.load_quantizers(store)
    assert c3 == centers and cb3 == cbs


def test_read_optional_parquet_narrow_catch(spark, tmp_path):
    """Only the genuinely-absent error classes read as None; any other
    AnalysisException (schema-level corruption, an unreadable store)
    PROPAGATES — swallowing it would silently serve superseded rows or
    drop an upsert carry (ADVICE r13)."""
    import os

    import pytest as _pytest
    from pyspark.errors import AnalysisException

    # missing path -> None (local fast path)
    assert mllib_ann._read_optional_parquet(
        spark, str(tmp_path / "never_written")
    ) is None
    # existing dir with nothing to infer a schema from (the crashed-
    # write artifact: only a _temporary subdir) -> the real Spark
    # UNABLE_TO_INFER_SCHEMA, swallowed -> None
    crashed = tmp_path / "crashed"
    os.makedirs(crashed / "_temporary")
    assert mllib_ann._read_optional_parquet(spark, str(crashed)) is None
    # any OTHER AnalysisException propagates (condition None here —
    # pure-Python AnalysisExceptions carry no error class)
    class _Reader:
        def parquet(self, p):
            raise AnalysisException(message="boom")

    class _Spark:
        read = _Reader()

    with _pytest.raises(AnalysisException, match="boom"):
        mllib_ann._read_optional_parquet(_Spark(), str(crashed))


def _mini_store(spark, sf_correctness_dir, tmp_path, name):
    emb = (
        load_table(spark, sf_correctness_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(60)
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / name)
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), centers, cbs, store
    )
    return emb, centers, cbs, store


def test_ivfpq_append_detects_concurrent_compact(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """Interleaving #1 (VERDICT r13 task #4): a compaction flips
    _CURRENT between an append's data commit and its post-commit
    pointer check.  The append must raise LOUDLY with the retry
    instruction instead of silently leaving its rows in the superseded
    generation for the next sweep to delete — and zero rows may be
    lost at any point."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "race_append"
    )
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    orig = mllib_ann._check_pointer_unmoved

    def hook(root, ptr, data_dir):
        # the racing compaction commits while the append is between
        # its last write and its validation read
        mllib_ann.compact_ivfpq_index(spark, store)
        orig(root, ptr, data_dir)

    monkeypatch.setattr(mllib_ann, "_check_pointer_unmoved", hook)
    with _pytest.raises(RuntimeError, match="concurrent compaction"):
        mllib_ann.write_ivfpq_index(
            odds, centers, cbs, store, mode="append", batch_id="b2"
        )
    monkeypatch.setattr(mllib_ann, "_check_pointer_unmoved", orig)

    # zero rows lost: the racing compact read AFTER the append's data
    # commit, so it carried the appended rows into the new generation
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    clean = str(tmp_path / "race_append_clean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    # the instructed RETRY is idempotent whether or not the racing
    # compact carried the rows
    mllib_ann.write_ivfpq_index(
        odds, centers, cbs, store, mode="append", batch_id="b2"
    )
    assert rows(store) == rows(clean)


@pytest.mark.soak
def test_ivfpq_compact_detects_concurrent_append(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """Interleaving #2 (VERDICT r13 task #4): an append commits into
    the old generation after a compaction's merge read its snapshot.
    The compaction must FAIL THE FLIP (discarding its merge), leave
    the store untouched and serving the appended rows, and succeed on
    retry."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "race_compact"
    )
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    orig = mllib_ann._check_no_concurrent_append
    fired = []

    def hook(sp, data_dir, gen_at_read, target):
        if not fired:
            fired.append(True)
            # the racing append lands after the merge read; the
            # pointer hasn't flipped, so the APPEND's own check passes
            mllib_ann.write_ivfpq_index(
                odds, centers, cbs, store, mode="append", batch_id="b2"
            )
        orig(sp, data_dir, gen_at_read, target)

    monkeypatch.setattr(mllib_ann, "_check_no_concurrent_append", hook)
    with _pytest.raises(RuntimeError, match="concurrent append"):
        mllib_ann.compact_ivfpq_index(spark, store)
    monkeypatch.setattr(mllib_ann, "_check_no_concurrent_append", orig)

    # the store is untouched (no pointer flipped, merge discarded) and
    # serves every row including the racing append's
    import os

    assert not os.path.exists(os.path.join(store, "_CURRENT"))
    assert not os.path.exists(os.path.join(store, "v00001"))
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    clean = str(tmp_path / "race_compact_clean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    assert rows(store) == rows(clean)
    # the instructed retry compacts cleanly and changes nothing
    mllib_ann.compact_ivfpq_index(spark, store)
    assert mllib_ann._resolve_data_dir(store).endswith("v00001")
    assert rows(store) == rows(clean)


def test_recall_ladder_clustered_floors(spark):
    """RECALL.md's CLUSTERED-corpus floors as assertions (VERDICT r13
    task #3): on the mixture-of-Gaussians fixture — the geometry real
    embedding models produce — the coarse quantizers capture actual
    structure, so recall floors sit far above the isotropic table's
    (IVF 0.40 -> 0.90, IVF-PQ+rescore5 0.30 -> 0.70).  Raw ADC order
    within a tight cluster stays tie-dominated by construction (the
    codebooks spend their 16 codes separating clusters, not members),
    which is exactly why the production recommendation is
    rescore-over-candidates: the floor pins that the CANDIDATE set is
    right.  Fully deterministic: hash-generated corpus, md5-sampled
    centroids/codebooks."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 2000, dim=64, n_clusters=32, sigma=0.2, seed=7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)

    floors = [
        (similarity.lsh_topk(emb, qs, 64, k=10), 0.90, "lsh"),
        (mllib_ann.ivf_topk(emb, qs, centers, k=10, n_probe=3), 0.90, "ivf"),
        (
            mllib_ann.ivfpq_topk(
                emb, qs, centers, k=10, n_probe=3, codebooks=cbs
            ),
            0.20,
            "ivfpq",
        ),
        (
            mllib_ann.ivfpq_topk(
                emb, qs, centers, k=10, n_probe=3, codebooks=cbs, rescore=5
            ),
            0.70,
            "ivfpq+rescore5",
        ),
        (
            mllib_ann.pq_topk(
                emb, qs, k=10, dim=64, codebooks=cbs, rescore=5
            ),
            0.70,
            "pq+rescore5",
        ),
    ]
    got = {name: recall(df) for df, _floor, name in floors}
    for _df, floor, name in floors:
        assert got[name] >= floor, (name, got[name], floor)
    # the comparative claim itself: clustered IVF-PQ+rescore must beat
    # the isotropic table's best measured value (0.46 at sf0.01) by a
    # wide margin — the regime where the index composition is
    # RECOMMENDED is now measured, not prose
    assert got["ivfpq+rescore5"] >= 0.70 > 0.46


def test_composed_mmr_overlap_clustered_floor(spark, tmp_path):
    """The composed-tail claim, measured where it's recommended
    (VERDICT r13 task #3): on the clustered fixture, MMR fed from the
    RESCORED persisted-index probe must agree with its exact-fed twin
    on >= 75% of picks (measured 0.90; the isotropic raw-rung overlap
    was 0.14 — rung-recall-bounded, as RECALL.md documents), and even
    the raw ADC rung must clear 0.30."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 2000, dim=64, n_clusters=32, sigma=0.2, seed=7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "composed_idx")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)

    def picks(cand):
        return {
            (r["query_id"], r["vec_id"])
            for r in similarity.mmr_rerank(emb, qs, cand, k=8).collect()
        }

    exact_fed = picks(
        similarity.cosine_topk(emb, qs, k=20, dim=64).select(
            "query_id", "vec_id"
        )
    )
    raw_fed = picks(
        mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=20, n_probe=3, codebooks=cbs
        ).select("query_id", "vec_id")
    )
    resc_fed = picks(
        mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=20, n_probe=3, codebooks=cbs,
            rescore=3, corpus=emb,
        ).select("query_id", "vec_id")
    )
    raw_ov = len(raw_fed & exact_fed) / len(exact_fed)
    resc_ov = len(resc_fed & exact_fed) / len(exact_fed)
    assert resc_ov >= 0.75, resc_ov
    assert raw_ov >= 0.30, raw_ov


def test_ivfpq_overwrite_detects_concurrent_compact(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """The review-found gap: a FULL REBUILD (mode='overwrite') racing a
    compaction must also raise — the flip would supersede the rebuild
    with a merge of the pre-overwrite data and the next sweep would
    delete it silently."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "race_overwrite"
    )
    mllib_ann.compact_ivfpq_index(spark, store)  # pointer layout
    orig = mllib_ann._check_pointer_unmoved

    def hook(root, ptr, data_dir):
        mllib_ann.compact_ivfpq_index(spark, store)
        orig(root, ptr, data_dir)

    monkeypatch.setattr(mllib_ann, "_check_pointer_unmoved", hook)
    with _pytest.raises(RuntimeError, match="concurrent compaction"):
        mllib_ann.write_ivfpq_index(emb, centers, cbs, store)


@pytest.mark.soak
def test_ivfpq_append_detects_concurrent_append(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """Two concurrent appends both read max(_gen)+1 and stamp the SAME
    generation — conflict resolution between them is undefined (equal
    _gen ties), so the second writer's post-commit scan must raise
    when it finds foreign rows at its own generation."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "race_appends"
    )
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    a = odds.filter(F.col("vec_id") < 30)
    b = odds.filter(F.col("vec_id") >= 30)
    # append 'a' lands normally at gen 1
    mllib_ann.write_ivfpq_index(
        a, centers, cbs, store, mode="append", batch_id="a"
    )
    # simulate 'b' having read the pre-'a' high-water mark (the race):
    # force its _next_gen to the same generation 'a' used
    monkeypatch.setattr(mllib_ann, "_next_gen", lambda *args: 1)
    with _pytest.raises(RuntimeError, match="concurrent append"):
        mllib_ann.write_ivfpq_index(
            b, centers, cbs, store, mode="append", batch_id="b"
        )
    monkeypatch.undo()
    # recovery per the error's instruction: compact, re-run ONE append
    mllib_ann.compact_ivfpq_index(spark, store)
    mllib_ann.write_ivfpq_index(
        b, centers, cbs, store, mode="append", batch_id="b"
    )
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    clean = str(tmp_path / "race_appends_clean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    assert rows(store) == rows(clean)


def test_subspace_permutation_shapes_and_validation():
    """Interleave is the exact stride pattern; variance-balanced is a
    permutation dealing high-variance dims round-robin; both validate."""
    import pytest as _pytest

    inter = mllib_ann.subspace_permutation(8, 4)
    assert inter == [0, 4, 1, 5, 2, 6, 3, 7]
    v = [float(8 - i) for i in range(8)]  # strictly decreasing
    bal = mllib_ann.subspace_permutation(8, 4, variances=v)
    assert sorted(bal) == list(range(8))
    # snake deal: round 1 deals 0,1,2,3 to subspaces 0..3; round 2
    # deals 4,5,6,7 REVERSED -> subspace j gets {j, 7-j}
    groups = [set(bal[i * 2 : (i + 1) * 2]) for i in range(4)]
    assert groups == [{0, 7}, {1, 6}, {2, 5}, {3, 4}]
    with _pytest.raises(ValueError, match="divisible"):
        mllib_ann.subspace_permutation(10, 4)
    with _pytest.raises(ValueError, match="variances"):
        mllib_ann.subspace_permutation(8, 4, variances=[1.0])
    with _pytest.raises(ValueError, match="permutation"):
        mllib_ann._validate_perm([0, 0, 1], 3)


def test_pq_perm_identity_and_anisotropic_gain(spark):
    """The subspace permutation surface: an identity perm returns
    byte-identical results to perm=None everywhere, and on the
    ANISOTROPIC (PCA-like, decay=0.7) fixture the interleave and
    variance-balanced permutations recover the recall contiguous
    slicing loses (measured 0.70 -> 0.97 at rescore=5; floors with
    margin).  dim_variances must see the decayed spectrum."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 2000, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def rec(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)

    variances = mllib_ann.dim_variances(emb, 64)
    assert variances[0] > 10 * variances[-1] > 0  # decayed spectrum seen

    # identity perm == no perm, exactly
    ident = list(range(64))
    cbs0 = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    assert mllib_ann.pq_train(emb, m=8, ks=16, dim=64, perm=ident) == cbs0
    a = sorted(map(tuple, mllib_ann.pq_topk(
        emb, qs, k=10, dim=64, codebooks=cbs0
    ).collect()))
    b = sorted(map(tuple, mllib_ann.pq_topk(
        emb, qs, k=10, dim=64, codebooks=cbs0, perm=ident
    ).collect()))
    assert a == b

    def r5(perm):
        cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64, perm=perm)
        return rec(mllib_ann.pq_topk(
            emb, qs, k=10, dim=64, codebooks=cbs, perm=perm, rescore=5
        ))

    contiguous = r5(None)
    inter = r5(mllib_ann.subspace_permutation(64, 8))
    bal = r5(mllib_ann.subspace_permutation(64, 8, variances=variances))
    assert inter >= 0.85 and bal >= 0.85, (inter, bal)
    assert inter >= contiguous + 0.10 and bal >= contiguous + 0.10, (
        contiguous, inter, bal,
    )


def test_ivfpq_index_perm_roundtrip(spark, tmp_path):
    """The persisted index with a permutation: sidecar stores/loads the
    perm, the store probe with the loaded perm equals the inline
    ivfpq_topk with the same perm, and a probe WITHOUT the writer's
    perm would score garbage (pinned by the parity, not by accident)."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 300, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    perm = mllib_ann.subspace_permutation(64, 8)
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64, perm=perm)
    store = str(tmp_path / "perm_idx")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store, perm=perm)
    mllib_ann.save_quantizers(store, centers, cbs, perm=perm)
    c2, cb2, p2 = mllib_ann.load_quantizers(store, with_perm=True)
    assert p2 == perm and c2 == centers and cb2 == cbs
    # the legacy two-tuple call must REFUSE to drop a stored perm
    # (probing perm-encoded codes without it is silently garbage)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="with_perm"):
        mllib_ann.load_quantizers(store)
    got = sorted(map(tuple, mllib_ann.ivfpq_index_topk(
        spark, qs, c2, store, k=5, n_probe=4, codebooks=cb2, perm=p2
    ).collect()))
    inline = sorted(map(tuple, mllib_ann.ivfpq_topk(
        emb, qs, centers, k=5, n_probe=4, codebooks=cbs, perm=perm
    ).collect()))
    assert got == inline
    # appends re-encode with the same perm and stay consistent
    more = clustered_embeddings(
        spark, 330, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=0.7
    ).filter(F.col("vec_id") >= 300)
    mllib_ann.write_ivfpq_index(
        more, centers, cbs, store, mode="append", batch_id="b1", perm=perm
    )
    full = clustered_embeddings(
        spark, 330, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    got2 = sorted(map(tuple, mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs, perm=perm
    ).collect()))
    inline2 = sorted(map(tuple, mllib_ann.ivfpq_topk(
        full, qs, centers, k=5, n_probe=4, codebooks=cbs, perm=perm
    ).collect()))
    assert got2 == inline2


def test_ivfpq_topk_default_train_respects_perm(spark):
    """The review-found perm-threading gap: ivfpq_topk with
    codebooks=None must train WITH the perm (a codebook trained on
    contiguous dims scored against permuted encodes is silently
    garbage).  Pinned by equality with the explicit-codebooks path."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 200, dim=64, n_clusters=16, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    perm = mllib_ann.subspace_permutation(64, 8)
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    auto = sorted(map(tuple, mllib_ann.ivfpq_topk(
        emb, qs, centers, k=5, n_probe=4, m=8, ks=16, perm=perm
    ).collect()))
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64, perm=perm)
    explicit = sorted(map(tuple, mllib_ann.ivfpq_topk(
        emb, qs, centers, k=5, n_probe=4, codebooks=cbs, perm=perm
    ).collect()))
    assert auto == explicit


def test_dim_variances_validation(spark):
    """dim mismatches fail loudly instead of skewing the deal."""
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    assert len(mllib_ann.dim_variances(emb, 2)) == 2
    with _pytest.raises(ValueError, match="dim=4"):
        mllib_ann.dim_variances(emb, 4)
    empty = emb.filter(F.col("vec_id") > 99)
    with _pytest.raises(ValueError, match="no non-null"):
        mllib_ann.dim_variances(empty, 2)


@pytest.mark.soak
def test_ivfpq_append_detects_same_batch_concurrent_append(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """The same-batch_id blind spot, closed: a concurrent append that
    reused OUR batch_id lands its rows in OUR partition (they count as
    'mine' in the foreign-batch check), so the writer also reconciles
    the partition's new-generation rows against its checkpointed
    incoming snapshot and raises on divergence."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "race_same_batch"
    )
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    a = odds.filter(F.col("vec_id") < 30)
    b = odds.filter(F.col("vec_id") >= 30)
    # append 'a' lands normally at gen 1 under batch 'x'
    mllib_ann.write_ivfpq_index(
        a, centers, cbs, store, mode="append", batch_id="x"
    )
    # 'b' raced: it read the pre-'a' high-water mark AND reused the
    # same batch_id — its carry re-materializes a's rows at gen 1, so
    # the partition holds more new-gen rows than b wrote
    monkeypatch.setattr(mllib_ann, "_next_gen", lambda *args: 1)
    with _pytest.raises(RuntimeError, match="SAME batch_id"):
        mllib_ann.write_ivfpq_index(
            b, centers, cbs, store, mode="append", batch_id="x"
        )
    monkeypatch.undo()
    # recovery per the error: distinct batch ids, compact, re-run one
    mllib_ann.compact_ivfpq_index(spark, store)
    mllib_ann.write_ivfpq_index(
        b, centers, cbs, store, mode="append", batch_id="y"
    )
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(s):
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=8, n_probe=4, codebooks=cbs
            ).collect()
        )

    clean = str(tmp_path / "race_same_batch_clean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    assert rows(store) == rows(clean)


def test_ivfpq_perm_stamp_guards(spark, tmp_path):
    """The writer stamps the subspace permutation into the store
    (_index_meta.json): probes called WITHOUT a perm adopt it (the
    default call is correct by construction), explicit mismatches
    raise on probe/append/save_quantizers, identity normalizes to
    None, and an overwrite restamps."""
    import os as _os

    import pytest as _pytest

    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 150, dim=16, n_clusters=8, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    perm = mllib_ann.subspace_permutation(16, 4)
    wrong = list(reversed(range(16)))
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    cbs = mllib_ann.pq_train(emb, m=4, ks=8, dim=16, perm=perm)
    store = str(tmp_path / "perm_stamp")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store, perm=perm)
    assert _os.path.exists(_os.path.join(store, "_index_meta.json"))

    def rows(**kw):
        return sorted(map(tuple, mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs, **kw
        ).collect()))

    # probe without perm adopts the stamp — equal to the explicit call
    assert rows() == rows(perm=perm)
    with _pytest.raises(ValueError, match="mismatch"):
        rows(perm=wrong)
    # appends must match the stamped encoding (None and wrong both
    # mean mixed codes)
    more = emb.filter(F.col("vec_id") >= 140)
    for bad in (None, wrong):
        with _pytest.raises(ValueError, match="mismatch"):
            mllib_ann.write_ivfpq_index(
                more, centers, cbs, store,
                mode="append", batch_id="b1", perm=bad,
            )
    # the ADVICE scenario: a sidecar saved without the perm would be
    # loaded as a legacy 2-tuple and defeat the load guard — refuse it
    with _pytest.raises(ValueError, match="mismatch"):
        mllib_ann.save_quantizers(store, centers, cbs)
    with _pytest.raises(ValueError, match="mismatch"):
        mllib_ann.save_quantizers(store, centers, cbs, perm=wrong)
    mllib_ann.save_quantizers(store, centers, cbs, perm=perm)
    assert mllib_ann.load_quantizers(store, with_perm=True)[2] == perm

    # identity normalizes to None everywhere: a store written without
    # a perm accepts identity-perm appends and probes
    cbs0 = mllib_ann.pq_train(emb, m=4, ks=8, dim=16)
    store2 = str(tmp_path / "perm_stamp_id")
    mllib_ann.write_ivfpq_index(emb, centers, cbs0, store2)
    ident = list(range(16))
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") >= 140), centers, cbs0, store2,
        mode="append", batch_id="b1", perm=ident,
    )
    got = mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store2, k=5, n_probe=4, codebooks=cbs0,
        perm=ident,
    )
    assert got.count() > 0

    # an overwrite REDEFINES the encode config and restamps: the
    # stamp is now None, so an unpermuted default probe just works
    got2 = sorted(map(tuple, mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs0
    ).collect()))
    assert got2 == sorted(map(tuple, mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs0,
        perm=ident,
    ).collect()))


def test_read_optional_parquet_message_fallback(spark, tmp_path, monkeypatch):
    """Builds whose AnalysisException carries no error class (condition
    None) still classify a genuinely-missing path as absent via the
    known message shapes instead of raising on the first-append path."""
    from physicsnemo_curator_spark.core import store as core_store

    missing = str(tmp_path / "definitely_missing_store")
    real_exists = core_store.os.path.exists
    # defeat the local-existence fast path so the Spark read runs and
    # raises PATH_NOT_FOUND, then hide the error class
    monkeypatch.setattr(
        core_store.os.path,
        "exists",
        lambda p: True if p == missing else real_exists(p),
    )
    monkeypatch.setattr(core_store, "analysis_condition", lambda exc: None)
    assert mllib_ann._read_optional_parquet(spark, missing) is None


def test_recommended_rescore_calibration():
    """The occupancy rule as pure arithmetic, pinned on the two
    measured regimes from RECALL.md r14: 62 rows/cell (20k x 320
    clusters) -> rescore 5 suffices (measured 0.855); 625 rows/cell
    (clusters held at 32) -> the required 50 exceeds the cap and the
    function REFUSES instead of serving the measured 0.195 collapse."""
    import pytest as _pytest

    ok = {"mean_cell_rows": 62.0, "max_cell_rows": 80}
    assert mllib_ann.recommended_rescore(ok, 10) == 5
    collapsed = {"mean_cell_rows": 625.0, "max_cell_rows": 700}
    with _pytest.raises(ValueError, match="SQ8"):
        mllib_ann.recommended_rescore(collapsed, 10)
    # explicit escalation: the caller owns the k*rescore cost
    assert mllib_ann.recommended_rescore(
        collapsed, 10, max_rescore=None
    ) == 50
    # floor: tiny cells never drop below a real widening multiplier
    assert mllib_ann.recommended_rescore(
        {"mean_cell_rows": 4.0, "max_cell_rows": 5}, 10
    ) == 2
    # worst-case skew via occupancy='max'
    assert mllib_ann.recommended_rescore(
        ok, 10, occupancy="max"
    ) == 7
    with _pytest.raises(ValueError, match="occupancy"):
        mllib_ann.recommended_rescore(ok, 10, occupancy="median")
    with _pytest.raises(ValueError, match="target_recall"):
        mllib_ann.recommended_rescore(ok, 10, target_recall=1.5)


def test_ivfpq_index_topk_auto_rescore(spark, tmp_path):
    """rescore='auto' end to end: on a clustered store whose occupancy
    suits k·rescore the auto-sized probe hits the ladder's measured
    recall floor; on a coarse store (4 cells over the same corpus —
    huge occupancy) it refuses with the SQ8 guidance instead of
    serving collapsed rankings."""
    import pytest as _pytest

    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 2000, dim=64, n_clusters=32, sigma=0.3, seed=7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    # ~32 trained cells over 32 true clusters -> occupancy ~62
    centers = mllib_ann.md5_sample_centroids(emb, k=32)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    store = str(tmp_path / "auto_fine")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
    got = mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=10, n_probe=6, codebooks=cbs,
        rescore="auto", corpus=emb,
    )
    per: dict[int, set] = {}
    for r in got.collect():
        per.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(
        len(per.get(q, set()) & e) / len(e) for q, e in exact.items()
    ) / len(exact)
    assert recall >= 0.70, recall  # ladder measured 0.85; margin

    # 4 cells over the same 2000 rows -> occupancy ~500: refuse
    coarse_centers = mllib_ann.md5_sample_centroids(emb, k=4)
    coarse = str(tmp_path / "auto_coarse")
    mllib_ann.write_ivfpq_index(emb, coarse_centers, cbs, coarse)
    with _pytest.raises(ValueError, match="SQ8"):
        mllib_ann.ivfpq_index_topk(
            spark, qs, coarse_centers, coarse, k=10, n_probe=2,
            codebooks=cbs, rescore="auto", corpus=emb,
        )
    # and a typo'd string mode fails loudly, not as int coercion
    with _pytest.raises(ValueError, match="unknown rescore"):
        mllib_ann.ivfpq_index_topk(
            spark, qs, coarse_centers, coarse, k=10, n_probe=2,
            codebooks=cbs, rescore="atuo", corpus=emb,
        )


def test_rotation_identity_and_perm_equivalence(spark):
    """The rotation surface's exactness contracts: an identity rot is
    byte-identical to rot=None, a permutation MATRIX is
    byte-identical to the same perm (perm_matrix: one 1.0 per column,
    float-exact), both-transforms raises, and non-orthogonal matrices
    are refused."""
    import numpy as _np
    import pytest as _pytest

    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 300, dim=16, n_clusters=8, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = mllib_ann.pq_train(emb, m=4, ks=8, dim=16)

    def rows(**kw):
        return sorted(map(tuple, mllib_ann.pq_topk(
            emb, qs, k=5, dim=16, codebooks=cbs, **kw
        ).collect()))

    ident = [[1.0 if i == j else 0.0 for j in range(16)] for i in range(16)]
    assert rows() == rows(rot=ident)

    # perm-as-matrix equivalence, including trained codebooks
    perm = mllib_ann.subspace_permutation(16, 4)
    pm = mllib_ann.perm_matrix(perm)
    cbs_p = mllib_ann.pq_train(emb, m=4, ks=8, dim=16, perm=perm)
    assert mllib_ann.pq_train(emb, m=4, ks=8, dim=16, rot=pm) == cbs_p
    a = sorted(map(tuple, mllib_ann.pq_topk(
        emb, qs, k=5, dim=16, codebooks=cbs_p, perm=perm
    ).collect()))
    b = sorted(map(tuple, mllib_ann.pq_topk(
        emb, qs, k=5, dim=16, codebooks=cbs_p, rot=pm
    ).collect()))
    assert a == b

    with _pytest.raises(ValueError, match="not both"):
        mllib_ann.pq_topk(
            emb, qs, k=5, dim=16, codebooks=cbs_p, perm=perm, rot=pm
        )
    skew = _np.eye(16); skew[0, 1] = 0.5
    with _pytest.raises(ValueError, match="orthogonal"):
        mllib_ann.pq_topk(
            emb, qs, k=5, dim=16, codebooks=cbs, rot=skew.tolist()
        )
    # givens_rotation is orthogonal and even-dim-only
    g = _np.asarray(mllib_ann.givens_rotation(16))
    assert _np.allclose(g.T @ g, _np.eye(16))
    with _pytest.raises(ValueError, match="even"):
        mllib_ann.givens_rotation(15)


def test_opq_rotation_anisotropic_gain(spark):
    """The learned rotation beats the variance-balanced permutation on
    the decayed fixture (measured: OPQ balanced-init rescore-5 recall
    1.00 / raw 0.53 vs the perm's 0.985 / ~0.375) — the r14 docstring's
    'cheap rotation-free ancestor' now has its descendant.  Floors
    with margin."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 2000, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, qs, k=10, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def rec(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)

    rot, cbs = mllib_ann.opq_train(emb, m=8, ks=16, dim=64)
    import numpy as _np

    r = _np.asarray(rot)
    assert _np.allclose(r.T @ r, _np.eye(64), atol=1e-8)
    raw = rec(mllib_ann.pq_topk(emb, qs, k=10, dim=64, codebooks=cbs, rot=rot))
    r5 = rec(mllib_ann.pq_topk(
        emb, qs, k=10, dim=64, codebooks=cbs, rot=rot, rescore=5
    ))
    assert r5 >= 0.95, r5
    assert raw >= 0.45, raw


def test_ivfpq_index_rot_roundtrip(spark, tmp_path):
    """The persisted index with a learned rotation: writer stamps it,
    probes adopt the stamp, the sidecar stores/loads it, transform
    mismatches raise on append/probe/save, and the legacy loads
    refuse to drop it."""
    import pytest as _pytest

    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 300, dim=16, n_clusters=8, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rot, cbs = mllib_ann.opq_train(emb, m=4, ks=8, dim=16)
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    store = str(tmp_path / "rot_idx")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store, rot=rot)
    mllib_ann.save_quantizers(store, centers, cbs, rot=rot)
    c2, cb2, p2, r2 = mllib_ann.load_quantizers(
        store, with_perm=True, with_rot=True
    )
    assert p2 is None and r2 == rot
    for kw in ({}, {"with_perm": True}):
        with _pytest.raises(ValueError, match="with_rot"):
            mllib_ann.load_quantizers(store, **kw)

    # probe without the transform adopts the stamp == explicit rot
    def rows(**kw):
        return sorted(map(tuple, mllib_ann.ivfpq_index_topk(
            spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs, **kw
        ).collect()))

    assert rows() == rows(rot=rot)
    # parity with the inline path
    inline = sorted(map(tuple, mllib_ann.ivfpq_topk(
        emb, qs, centers, k=5, n_probe=4, codebooks=cbs, rot=rot
    ).collect()))
    assert rows() == inline
    with _pytest.raises(ValueError, match="mismatch"):
        rows(perm=mllib_ann.subspace_permutation(16, 4))
    with _pytest.raises(ValueError, match="mismatch"):
        rows(rot=mllib_ann.givens_rotation(16))
    with _pytest.raises(ValueError, match="mismatch"):
        mllib_ann.write_ivfpq_index(
            emb.filter(F.col("vec_id") >= 290), centers, cbs, store,
            mode="append", batch_id="b1",
        )
    with _pytest.raises(ValueError, match="mismatch"):
        mllib_ann.save_quantizers(store, centers, cbs)
    # appends with the matching rot re-encode consistently
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") >= 290), centers, cbs, store,
        mode="append", batch_id="b1", rot=rot,
    )
    assert rows() == inline  # same rows: the append upserted a subset


def test_lease_acquire_steal_verify(tmp_path):
    """The lease protocol itself: live leases exclude, released ones
    re-acquire, expired ones are stolen with a loud warning, and the
    fencing verify refuses foreign/expired tokens."""
    import time
    import warnings as _warnings

    import pytest as _pytest

    root = str(tmp_path / "leased_store")
    rec = mllib_ann._acquire_lease(root, ttl_s=60)
    with _pytest.raises(RuntimeError, match="leased by"):
        mllib_ann._acquire_lease(root, ttl_s=60)
    mllib_ann._verify_lease(root, rec["token"])
    with _pytest.raises(RuntimeError, match="lost"):
        mllib_ann._verify_lease(root, "not-the-token")
    mllib_ann._release_lease(root, rec["token"])
    rec2 = mllib_ann._acquire_lease(root, ttl_s=0.05)
    time.sleep(0.1)
    with _pytest.warns(UserWarning, match="stealing expired"):
        rec3 = mllib_ann._acquire_lease(root, ttl_s=60)
    assert rec3["token"] != rec2["token"]
    # the expired holder must not pass its commit-point verify
    with _pytest.raises(RuntimeError, match="lost"):
        mllib_ann._verify_lease(root, rec2["token"])
    mllib_ann._release_lease(root, rec3["token"])


@pytest.mark.soak
def test_ivfpq_lease_closes_residual_window(
    spark, tmp_path, sf_correctness_dir, monkeypatch
):
    """The documented optimistic residual window, demonstrated and
    closed: an append whose ENTIRE commit fits inside compaction's
    check-to-flip gap is caught by neither optimistic check — without
    the lease its rows land in the superseded generation and vanish
    at the flip (silent loss, asserted); with lease=True the same
    append raises 'leased by' loudly instead."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "lease_gap"
    )
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    a = odds.filter(F.col("vec_id") < 30)
    b = odds.filter(F.col("vec_id") >= 30)
    mllib_ann.write_ivfpq_index(
        a, centers, cbs, store, mode="append", batch_id="a"
    )
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def served(s):
        return {
            r["vec_id"]
            for r in mllib_ann.ivfpq_index_topk(
                spark, qs, centers, s, k=20, n_probe=4, codebooks=cbs
            ).collect()
        }

    b_ids = {r["vec_id"] for r in b.select("vec_id").collect()}

    # --- WITHOUT the lease: the gap swallows the append silently ---
    real_check = mllib_ann._check_no_concurrent_append

    def gap_append_unleased(spark_, data_dir, gen_at_read, target):
        # the racing append commits entirely inside check->flip: its
        # own pointer check still sees the pre-flip value, so it
        # passes; the no-op'd compact check never sees its rows
        mllib_ann.write_ivfpq_index(
            b, centers, cbs, store, mode="append", batch_id="b"
        )

    monkeypatch.setattr(
        mllib_ann, "_check_no_concurrent_append", gap_append_unleased
    )
    mllib_ann.compact_ivfpq_index(spark, store)
    monkeypatch.undo()
    lost = served(store)
    assert not (lost & b_ids), (
        "batch b should have been silently superseded by the flip"
    )

    # --- WITH the lease: the same interleaving raises loudly ---
    store2 = str(tmp_path / "lease_gap2")
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), centers, cbs, store2
    )
    mllib_ann.write_ivfpq_index(
        a, centers, cbs, store2, mode="append", batch_id="a"
    )
    raised = {}

    def gap_append_leased(spark_, data_dir, gen_at_read, target):
        with _pytest.raises(RuntimeError, match="leased by") as exc:
            mllib_ann.write_ivfpq_index(
                b, centers, cbs, store2,
                mode="append", batch_id="b", lease=True,
            )
        raised["msg"] = str(exc.value)

    monkeypatch.setattr(
        mllib_ann, "_check_no_concurrent_append", gap_append_leased
    )
    mllib_ann.compact_ivfpq_index(spark, store2, lease=True)
    monkeypatch.undo()
    assert "leased by" in raised["msg"]
    # nothing was lost silently: b is absent because its append
    # ERRORED; the post-compact retry lands it and parity holds
    mllib_ann.write_ivfpq_index(
        b, centers, cbs, store2, mode="append", batch_id="b", lease=True
    )
    clean = str(tmp_path / "lease_gap_clean")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, clean)
    assert served(store2) == served(clean)
    # the lease is released after every pass: a fresh acquire works
    rec = mllib_ann._acquire_lease(mllib_ann._local_store_path(store2))
    mllib_ann._release_lease(
        mllib_ann._local_store_path(store2), rec["token"]
    )
    _ = real_check  # silence unused warning


def test_ivfpq_leased_flat_overwrite_survives(
    spark, tmp_path, sf_correctness_dir
):
    """Review-found: a leased rebuild of a FLAT store wipes the store
    root — including the _LEASE record — so the post-pass fencing
    verify raised 'lease was lost' after the write had already
    committed, and every retry failed identically.  The _LEASE file is
    now stashed/restored through the static overwrite exactly like the
    quantizer sidecar."""
    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "leased_flat"
    )
    # full leased rebuild of the flat store: must succeed and release
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store, lease=True)
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=8, n_probe=4, codebooks=cbs
    )
    assert got.count() > 0
    # released: a fresh acquire works immediately
    rec = mllib_ann._acquire_lease(store)
    mllib_ann._release_lease(store, rec["token"])
    # and a leased append right after a leased rebuild also works
    mllib_ann.write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 1), centers, cbs, store,
        mode="append", batch_id="b1", lease=True,
    )


def test_ivfpq_append_fences_before_commit(
    spark, tmp_path, sf_correctness_dir
):
    """Review-found: the leased append's fencing verify ran only AFTER
    its commits, so a holder whose TTL lapsed mid-write still wrote
    into the store while a thief was running.  The verify now runs
    BEFORE the data write: a dead fence token aborts with NOTHING
    written."""
    import pytest as _pytest

    emb, centers, cbs, store = _mini_store(
        spark, sf_correctness_dir, tmp_path, "fence_pre"
    )
    b = emb.filter(F.col("vec_id") % 2 == 1)
    with _pytest.raises(RuntimeError, match="lease.*lost"):
        mllib_ann.write_ivfpq_index(
            b, centers, cbs, store, mode="append", batch_id="zz",
            _fence=(store, "dead-token"),
        )
    # nothing was committed: the batch partition does not exist
    assert mllib_ann._read_batch_partition(spark, store, "zz") is None


def test_semantic_store_validates_batch_id(spark, tmp_path):
    """Review-found: write_semantic_store was the one store without
    the unified batch-id charset guard."""
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="invalid batch_id"):
        mllib_ann.write_semantic_store(
            emb, [[1.0, 0.0]], str(tmp_path / "sem"),
            mode="append", batch_id="a b/c",
        )


def test_ivfpq_index_search_one_call(spark, tmp_path):
    """The consumer-side serving call: quantizers AND the encode
    transform come from the store's own sidecar, so the one-call probe
    equals the fully-explicit one for a rot-encoded store, and the
    sidecar's actionable error surfaces when it was never saved."""
    import pytest as _pytest

    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 300, dim=16, n_clusters=8, sigma=0.3, seed=7, decay=0.7
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rot, cbs = mllib_ann.opq_train(emb, m=4, ks=8, dim=16)
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    store = str(tmp_path / "search_idx")
    mllib_ann.write_ivfpq_index(emb, centers, cbs, store, rot=rot)
    with _pytest.raises(FileNotFoundError, match="save_quantizers"):
        mllib_ann.ivfpq_index_search(spark, qs, store, k=5)
    mllib_ann.save_quantizers(store, centers, cbs, rot=rot)
    got = sorted(map(tuple, mllib_ann.ivfpq_index_search(
        spark, qs, store, k=5, n_probe=4
    ).collect()))
    explicit = sorted(map(tuple, mllib_ann.ivfpq_index_topk(
        spark, qs, centers, store, k=5, n_probe=4, codebooks=cbs, rot=rot
    ).collect()))
    assert got == explicit
    # the rescore path threads corpus/target_recall through
    got_r = mllib_ann.ivfpq_index_search(
        spark, qs, store, k=5, n_probe=4, rescore=2, corpus=emb
    )
    assert got_r.count() > 0


def test_semantic_store_lease(spark, tmp_path):
    """The semantic store's opt-in single-maintainer lease: exclusion
    while held, and a leased probe+ingest pass end to end."""
    import os as _os

    import pytest as _pytest

    from physicsnemo_curator_spark.core import store as core_store
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, 120, dim=16, n_clusters=4, sigma=0.3, seed=7
    ).localCheckpoint()
    centers = mllib_ann.md5_sample_centroids(emb, k=4)
    store = str(tmp_path / "sem_leased")
    mllib_ann.write_semantic_store(
        emb.filter(F.col("vec_id") < 100), centers, store, lease=True
    )
    mr = core_store.maintenance_root(store)
    assert _os.path.isdir(mr)

    batch = emb.filter(F.col("vec_id") >= 100)
    rec = core_store.acquire_lease(mr)
    with _pytest.raises(RuntimeError, match="leased by"):
        mllib_ann.incremental_semantic_dedup(
            spark, batch, centers, store,
            update_store=True, batch_id="b1", lease=True,
        )
    core_store.release_lease(mr, rec["token"])
    out = mllib_ann.incremental_semantic_dedup(
        spark, batch, centers, store,
        threshold=0.5, update_store=True, batch_id="b1", lease=True,
    )
    assert out.count() >= 0  # executes end to end; store updated below
    n = spark.read.parquet(store).count()
    assert n == 120
    rec2 = core_store.acquire_lease(mr)
    core_store.release_lease(mr, rec2["token"])


def test_md5_sample_centroids_counted_matches_unfused(spark, sf_correctness_dir):
    """The fused count+sample pick must return exactly the unfused
    centroids and the exact unfiltered row count — including the
    k > k_floor second-collect path and NULL-vector corpora (NULLs
    count toward n but never win a sample slot)."""
    emb = load_table(spark, sf_correctness_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    nulls = spark.createDataFrame(
        [(990_001, None)], "vec_id long, embedding array<float>"
    )
    corpus = emb.unionByName(nulls)
    n_true = corpus.count()

    # k_floor path (k_of_n returns <= k_floor)
    centers, n = mllib_ann.md5_sample_centroids_counted(
        corpus, lambda n: max(8, n // 250), k_floor=8
    )
    assert n == n_true
    k = max(8, n // 250)
    if k <= 8:
        assert centers == mllib_ann.md5_sample_centroids(corpus, k=k)

    # forced second-collect path: k_of_n > k_floor
    centers2, n2 = mllib_ann.md5_sample_centroids_counted(
        corpus, lambda n: 12, k_floor=8
    )
    assert n2 == n_true
    assert centers2 == mllib_ann.md5_sample_centroids(corpus, k=12)

    # k smaller than k_floor: first-k prefix of the fused sample
    centers3, _ = mllib_ann.md5_sample_centroids_counted(
        corpus, lambda n: 3, k_floor=8
    )
    assert centers3 == mllib_ann.md5_sample_centroids(corpus, k=3)


def test_semantic_store_probe_prunes_partitions(spark, tmp_path, sf_correctness_dir):
    """The incremental semantic probe must BROADCAST the batch side and
    prune the (_batch, cell)-partitioned store scan to the batch's
    cells via a real dynamic-pruning filter — the property that keeps
    a probe proportional to the cells the batch touches at 100 TB."""
    import re

    emb = load_table(spark, sf_correctness_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    centers = mllib_ann.md5_sample_centroids(corpus, k=8)
    store = str(tmp_path / "sem_plan")
    mllib_ann.write_semantic_store(corpus, centers, store)
    out = mllib_ann.incremental_semantic_dedup(
        spark, batch, centers, store, threshold=0.35, dot="arrow"
    )
    out.collect()  # AQE finalizes the plan (and its DPP filters)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any(
        "dynamicpruningexpression(cell" in pf and "IN dynamicpruning" in pf
        for pf in pfs
    ), plan[:1500]
