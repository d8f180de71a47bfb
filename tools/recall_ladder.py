"""Recall ladder: measure recall@k of every ANN strategy vs exact.

Pins the quality story of the similarity family (exact / LSH / IVF /
SQ8 / PQ / IVF-PQ, each with and without the exact re-rank tail) at
the gate parameters, so a quantization regression shows up as a recall
drop in RECALL.md — and fails loudly via the floors asserted in
tests/test_mllib_ann.py.

    python tools/recall_ladder.py [sf_dir ...]

Defaults to sf0.1.  Prints one markdown table row per strategy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import mllib_ann, similarity
from physicsnemo_curator_spark.sources.tables import load_table

K = 10
NQ = 20


def strategies(emb, centers, cbs, cbs_lloyd):
    """name -> thunk returning the strategy's top-K frame (gate
    parameters: 8 md5-sample cells, n_probe=3, m=8, ks=16)."""

    def qs():
        return emb.filter(F.col("vec_id") < NQ).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    return {
        "lsh (8 bands x 4 bits)": lambda: similarity.lsh_topk(
            emb, qs(), 64, k=K
        ),
        "ivf (8 cells, n_probe=3)": lambda: mllib_ann.ivf_topk(
            emb, qs(), centers, k=K, n_probe=3
        ),
        "sq8": lambda: similarity.sq8_topk(emb, qs(), k=K, dim=64),
        "sq8 + rescore=2": lambda: similarity.sq8_topk(
            emb, qs(), k=K, dim=64, rescore=2
        ),
        "pq (m=8, ks=16)": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs
        ),
        "pq + rescore=2": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs, rescore=2
        ),
        "pq + rescore=5": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs, rescore=5
        ),
        "pq lloyd (m=8, ks=16)": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs_lloyd
        ),
        "pq lloyd + rescore=5": lambda: mllib_ann.pq_topk(
            emb, qs(), k=K, dim=64, codebooks=cbs_lloyd, rescore=5
        ),
        "ivfpq (n_probe=3)": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs
        ),
        "ivfpq + rescore=2": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs, rescore=2
        ),
        "ivfpq + rescore=5": lambda: mllib_ann.ivfpq_topk(
            emb, qs(), centers, k=K, n_probe=3, codebooks=cbs, rescore=5
        ),
    }


def recall_table(spark, sf_dir: str) -> dict[str, float]:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
    cbs_lloyd = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64)
    exact = {}
    for r in similarity.cosine_topk(emb, qs, k=K, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    print(f"\n## {sf_dir} ({n} vectors, {len(exact)} queries, k={K})\n")
    print("| strategy | recall@10 | wall s |")
    print("|---|---|---|")
    out = {}
    for name, thunk in strategies(emb, centers, cbs, cbs_lloyd).items():
        t0 = time.perf_counter()
        got = {}
        for r in thunk().collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        wall = time.perf_counter() - t0
        rec = sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)
        out[name] = rec
        print(f"| {name} | {rec:.3f} | {wall:.2f} |")
    return out



# --- clustered-corpus ladder (VERDICT r13 task #3) --------------------
#
#     python tools/recall_ladder.py --clustered [n ...]
#
# Same ladder, same gate parameters, but on the mixture-of-Gaussians
# fixture (sources/synthetic.clustered_embeddings: 32 centers, 64 dims)
# across a per-cluster sigma sweep — the corpus geometry real embedding
# models produce, and the regime where the RECALL.md operating claim
# "IVF-PQ -> MMR is the shape for clustered embeddings" must stop being
# prose.  Also measures the composed-tail overlap (persisted
# ivfpq_index_topk(20) -> mmr_rerank(8) vs the exact-fed twin), the
# r13 methodology.

SIGMAS = (0.1, 0.2, 0.4)


def composed_mmr_overlap(
    spark, emb, centers, cbs, tag: str
) -> dict[str, float]:
    """Overlap of (query, vec) picks between MMR fed from the persisted
    IVF-PQ index probe and MMR fed from exact top-20 — bounded by the
    rung's recall, never improved by the tail.  Two rungs: the raw ADC
    probe and the production recommendation (probe + exact rescore of
    3x the candidates), which converts candidate quality into rank
    quality before the tail."""
    import shutil
    import tempfile

    qs = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    store = tempfile.mkdtemp(prefix=f"pcs_recall_idx_{tag}_")
    shutil.rmtree(store, ignore_errors=True)
    try:
        mllib_ann.write_ivfpq_index(emb, centers, cbs, store)
        exact = similarity.cosine_topk(emb, qs, k=20, dim=64).select(
            "query_id", "vec_id"
        )
        b = {
            (r["query_id"], r["vec_id"])
            for r in similarity.mmr_rerank(emb, qs, exact, k=8).collect()
        }
        out = {}
        for name, kw in (
            ("raw", {}),
            ("rescored", {"rescore": 3, "corpus": emb}),
        ):
            approx = mllib_ann.ivfpq_index_topk(
                spark, qs, centers, store, k=20, n_probe=3,
                codebooks=cbs, **kw,
            ).select("query_id", "vec_id")
            a = {
                (r["query_id"], r["vec_id"])
                for r in similarity.mmr_rerank(
                    emb, qs, approx, k=8
                ).collect()
            }
            out[name] = len(a & b) / len(b) if b else float("nan")
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)


def clustered_tables(spark, spec: str) -> None:
    """``spec`` is ``n`` or ``n:clusters`` (default 32 clusters) — at
    10x rows run BOTH ``20000`` (fixed 32 clusters: members-per-cluster
    grows 10x, the adversarial regime for within-cluster ranking) and
    ``20000:320`` (constant granularity: the realistic topic-growth
    regime, where recall holds)."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    n, _, k = spec.partition(":")
    n, n_clusters = int(n), int(k or 32)
    for sigma in SIGMAS:
        emb = clustered_embeddings(
            spark, n, dim=64, n_clusters=n_clusters, sigma=sigma, seed=7
        ).localCheckpoint()
        qs = emb.filter(F.col("vec_id") < NQ).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        centers = mllib_ann.md5_sample_centroids(emb, k=8)
        cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64)
        cbs_lloyd = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64)
        exact = {}
        for r in similarity.cosine_topk(emb, qs, k=K, dim=64).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        print(
            f"\n## clustered n={n} sigma={sigma} "
            f"({n_clusters} clusters, {len(exact)} queries, k={K})\n"
        )
        print("| strategy | recall@10 | wall s |")
        print("|---|---|---|")
        for name, thunk in strategies(emb, centers, cbs, cbs_lloyd).items():
            t0 = time.perf_counter()
            got = {}
            for r in thunk().collect():
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            wall = time.perf_counter() - t0
            rec = sum(
                len(got.get(q, set()) & e) / len(e)
                for q, e in exact.items()
            ) / len(exact)
            print(f"| {name} | {rec:.3f} | {wall:.2f} |")
        ov = composed_mmr_overlap(
            spark, emb, centers, cbs, f"s{int(sigma * 100)}"
        )
        print(
            f"| ivfpq_index(20) -> mmr(8) overlap vs exact-fed "
            f"| {ov['raw']:.3f} | |"
        )
        print(
            f"| ivfpq_index(20, rescore=3) -> mmr(8) overlap vs exact-fed "
            f"| {ov['rescored']:.3f} | |"
        )


def anisotropic_tables(spark, n: int, decay: float = 0.7) -> None:
    """Subspace-permutation sweep on the ANISOTROPIC (PCA-like,
    ``(1+j)^-decay``-scaled) clustered fixture — the regime where PQ
    subspace assignment matters: contiguous slicing hands the first
    subspace all the variance; the stride interleave and the
    variance-balanced deal (mllib_ann.subspace_permutation) rebalance
    it.  Prints PQ and IVF-PQ, raw and rescore=5, per permutation."""
    from physicsnemo_curator_spark.sources.synthetic import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(
        spark, n, dim=64, n_clusters=32, sigma=0.3, seed=7, decay=decay
    ).localCheckpoint()
    qs = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {}
    for r in similarity.cosine_topk(emb, qs, k=K, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def rec(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(q, set()) & e) / len(e) for q, e in exact.items()
        ) / len(exact)

    centers = mllib_ann.md5_sample_centroids(emb, k=8)
    variances = mllib_ann.dim_variances(emb, 64)
    perms = {
        "contiguous": None,
        "interleave": mllib_ann.subspace_permutation(64, 8),
        "variance-balanced": mllib_ann.subspace_permutation(
            64, 8, variances=variances
        ),
    }
    print(
        f"\n## anisotropic n={n} decay={decay} sigma=0.3 "
        f"(32 clusters, {len(exact)} queries, k={K})\n"
    )
    print("| subspace assignment | pq raw | pq +rescore5 | ivfpq +rescore5 |")
    print("|---|---|---|---|")
    for name, perm in perms.items():
        cbs = mllib_ann.pq_train(emb, m=8, ks=16, dim=64, perm=perm)
        raw = rec(mllib_ann.pq_topk(
            emb, qs, k=K, dim=64, codebooks=cbs, perm=perm
        ))
        r5 = rec(mllib_ann.pq_topk(
            emb, qs, k=K, dim=64, codebooks=cbs, perm=perm, rescore=5
        ))
        i5 = rec(mllib_ann.ivfpq_topk(
            emb, qs, centers, k=K, n_probe=3, codebooks=cbs,
            perm=perm, rescore=5,
        ))
        print(f"| {name} | {raw:.3f} | {r5:.3f} | {i5:.3f} |")
    # the Lloyd-trained rungs: the permutation rows above use the
    # oracle-replayable sample-init trainer, so print Lloyd baselines
    # next to the OPQ learned rotation (which trains Lloyd codebooks
    # inside its alternation) to attribute its gain to the ROTATION,
    # not the refinement
    for name, kw in (
        ("lloyd contiguous", {}),
        ("lloyd variance-balanced", {"perm": perms["variance-balanced"]}),
    ):
        cbs = mllib_ann.pq_train_sample(emb, m=8, ks=16, dim=64, **kw)
        raw = rec(mllib_ann.pq_topk(emb, qs, k=K, dim=64, codebooks=cbs, **kw))
        r5 = rec(mllib_ann.pq_topk(
            emb, qs, k=K, dim=64, codebooks=cbs, rescore=5, **kw
        ))
        i5 = rec(mllib_ann.ivfpq_topk(
            emb, qs, centers, k=K, n_probe=3, codebooks=cbs, rescore=5, **kw
        ))
        print(f"| {name} | {raw:.3f} | {r5:.3f} | {i5:.3f} |")
    for name, init in (
        ("opq rotation (balanced init)", "balanced"),
        ("opq rotation (identity init)", "identity"),
    ):
        rot, cbs = mllib_ann.opq_train(emb, m=8, ks=16, dim=64, init=init)
        raw = rec(mllib_ann.pq_topk(
            emb, qs, k=K, dim=64, codebooks=cbs, rot=rot
        ))
        r5 = rec(mllib_ann.pq_topk(
            emb, qs, k=K, dim=64, codebooks=cbs, rot=rot, rescore=5
        ))
        i5 = rec(mllib_ann.ivfpq_topk(
            emb, qs, centers, k=K, n_probe=3, codebooks=cbs,
            rot=rot, rescore=5,
        ))
        print(f"| {name} | {raw:.3f} | {r5:.3f} | {i5:.3f} |")


if __name__ == "__main__":
    from physicsnemo_curator_spark.session import get_spark

    spark = get_spark(app_name="recall-ladder")
    args = sys.argv[1:]
    if args and args[0] == "--clustered":
        for spec in args[1:] or ["2000"]:
            clustered_tables(spark, spec)
    elif args and args[0] == "--anisotropic":
        for n in [int(a) for a in args[1:]] or [2000]:
            anisotropic_tables(spark, n)
    else:
        for sf_dir in args or ["/root/testdata/sf0.1"]:
            recall_table(spark, sf_dir)
