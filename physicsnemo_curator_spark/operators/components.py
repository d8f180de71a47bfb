"""Distributed connected components + dedup-group assignment.

The last stage of a fuzzy-dedup pipeline: near-duplicate PAIRS (from
MinHash-LSH / SimHash / embedding-LSH, `operators/dedup.py` and
`operators/similarity.py`) are edges of a similarity graph; the
deduplication GROUPS users act on (keep one doc per group) are that
graph's connected components.  The reference curator stops at
per-pair/bucket grouping (it has no graph stage); this closes the gap a
100 TB text pipeline actually needs — transitive closure of the
near-dup relation.

Algorithm: iterative min-label propagation with POINTER JUMPING
(path-halving), the classic PRAM technique (Shiloach-Vishkin style)
re-expressed relationally:

  round:  label(n) <- min(label(n), min over neighbors' labels)   # hop
          label(n) <- label(label(n))                             # jump

The hop step alone converges in O(diameter) rounds; the jump step
(label-of-label join) compresses chains geometrically, giving
O(log diameter) rounds — a 2^10-node path converges in ~10 rounds, not
1024.  Each round is a constant number of key-partitioned shuffles
(neighbor join + min-aggregate + label self-join), all Catalyst-planned
hash joins/aggregates; `localCheckpoint` truncates lineage each round so
the plan doesn't grow (the standard iterative-Spark requirement).

Convergence detection is free: labels only ever decrease, so the global
sum of labels is strictly monotone — when one round leaves the
(sum, count) pair unchanged, it is a fixed point.  The sum is computed
as decimal(38,0), exact for any realistic id range (no int64 overflow
at 10^12 nodes × 10^12 max id).

Scale posture: state per round is one (node, label) row per vertex of
the PAIR graph (near-dup docs only — a sliver of the corpus), shuffled
on node id.  No driver-side state beyond the 2-value convergence probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_groups"]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    *,
    max_iter: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns (node, component) — one row per distinct node appearing in
    any edge, ``component`` = the minimum node id reachable from it.
    Node ids must be a numeric/orderable type.  Self-loops are ignored;
    duplicate and reversed edges are welcome (deduplicated internally).

    ``max_iter`` is a safety bound; with pointer jumping the rounds
    needed are ~log2(diameter), so 50 covers any graph that fits on
    earth.  Raises RuntimeError if the bound is hit without a fixed
    point (indicates non-orderable ids or NaN keys, not scale).
    """
    e = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .filter(F.col("n") != F.col("m"))
        .filter(F.col("n").isNotNull() & F.col("m").isNotNull())
    )
    # symmetrize once; dedup to bound the per-round join width
    und = e.union(e.select(F.col("m").alias("n"), F.col("n").alias("m"))).distinct()
    if checkpoint:
        und = und.localCheckpoint(eager=False)

    # hop-0 initialization: label(n) = min(n, min neighbor) — the same
    # shuffle the old identity init paid for its distinct(), but the
    # result already incorporates the first hop, so typical near-dup
    # graphs (tiny components) converge one full round earlier
    labels = (
        und.groupBy("n")
        .agg(F.min("m").alias("_mn"))
        .select(
            F.col("n").alias("node"),
            F.least(F.col("n"), F.col("_mn")).alias("comp"),
        )
    )

    def _probe(lab: DataFrame) -> tuple:
        # hash the label multiset: works for ANY orderable id type
        # (string UUIDs included) — casting comp to decimal threw
        # under ANSI for non-numeric ids, and silently returned NULL
        # (premature "convergence") with ANSI off.  The decimal sum of
        # per-row hashes cannot overflow or collide across rounds in
        # practice, and equal sums on consecutive rounds with equal
        # row counts is the fixed-point signal.
        row = lab.agg(
            F.sum(
                F.xxhash64(F.col("comp")).cast("decimal(38,0)")
            ).alias("s"),
            F.count(F.lit(1)).alias("c"),
        ).first()
        return (row["s"], row["c"])

    prev = _probe(labels)
    for _ in range(max_iter):
        # hop: min over own label and neighbors' labels
        nbr = (
            und.join(
                labels.select(
                    F.col("node").alias("m"), F.col("comp").alias("mc")
                ),
                "m",
            )
            .select(F.col("n").alias("node"), F.col("mc").alias("comp"))
        )
        hopped = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # jump: label <- label(label).  Every comp value is itself a node
        # id present in the label table, so the self-join is total; min()
        # keeps the smaller of the one-hop and two-hop labels.
        parent = hopped.select(
            F.col("node").alias("comp"), F.col("comp").alias("pc")
        )
        labels = (
            hopped.join(parent, "comp")
            .select("node", F.least("comp", "pc").alias("comp"))
        )
        if checkpoint:
            # eager=False + the probe right below: the probe's action
            # materializes the checkpoint AND computes the convergence
            # pair in ONE job (eager=True spent a separate job per
            # round just filling the checkpoint)
            labels = labels.localCheckpoint(eager=False)
        cur = _probe(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_groups(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    *,
    id_out: str = "doc_id",
    max_iter: int = 50,
    scores: DataFrame | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Near-dup pairs -> dedup groups.

    Returns (``id_out``, component, group_size, keep) for every doc
    that appears in some pair: ``component`` = min doc id of its group
    (the canonical label), ``keep`` = true for exactly one doc per
    group.  Docs in no pair are trivially their own group and are left
    to the caller (an anti-join against this output).

    Default policy keeps the component representative (min id).  Pass
    ``scores`` — a (``id_out``, ``score_col``) frame, e.g. the quality
    score from ``textops.quality_score`` — to keep each group's
    highest-scoring doc instead (ties fall to the lower id), the
    policy real curation runs want: dedup should discard the *worse*
    copies.  Cost is one extra id-keyed join and a per-component
    max-struct aggregate — same shuffle class as the size count.
    """
    comp = connected_components(pairs, src, dst, max_iter=max_iter)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    out = comp.join(sizes, "comp")
    if scores is None:
        return out.select(
            F.col("node").alias(id_out),
            F.col("comp").alias("component"),
            "group_size",
            (F.col("node") == F.col("comp")).alias("keep"),
        )
    scored = out.join(
        scores.select(
            F.col(id_out).alias("node"),
            F.col(score_col).cast("double").alias("_s"),
        ),
        "node",
        "left",
    ).withColumn(
        "_s",
        F.when(
            F.col("_s").isNull() | F.isnan(F.col("_s")),
            F.lit(float("-inf")),  # NaN sorts above every double in
            # Spark and would win the argmax — an unscorable doc must
            # never beat a scored one
        ).otherwise(F.col("_s")),
    )
    # argmax via per-component rank (score desc, id asc): unlike the
    # max-struct trick with an arithmetic id negation, this keeps
    # string ids working and ties deterministic
    w = Window.partitionBy("comp").orderBy(F.desc("_s"), F.asc("node"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .select(
            F.col("node").alias(id_out),
            F.col("comp").alias("component"),
            "group_size",
            (F.col("_rk") == 1).alias("keep"),
        )
    )
