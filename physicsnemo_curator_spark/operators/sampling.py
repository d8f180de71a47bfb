"""Deterministic sampling and dataset-split operators.

A 100 TB curation pipeline needs reproducible subsetting: train/val/test
splits that are stable across reruns and cluster sizes, per-stratum
downsampling (e.g. cap each language or source at a byte budget), and
plain rate sampling for pilot runs.  Spark's ``DataFrame.sample`` is
seed-stable only for a fixed partitioning — repartition the input and
membership changes — so none of these use it.  Instead every operator
here derives membership from a HASH OF THE ROW KEY alone:

    bucket(key) = H(key, seed) mod DENOM        # DENOM = 1_000_000

which is partition-invariant, join-free, shuffle-free (a pure projection
+ filter that Catalyst pushes into the scan), and reproducible on any
cluster shape — the same property the engine's RandomPermutation
operator relies on (``operators/mesh.py``: xxhash64 ordering keys).

Two hash backends, same twin pattern as ``operators/dedup.py``:

- ``hash_fn="xxhash64"`` (default): Spark's 64-bit xxHash, JVM codegen,
  the production path.
- ``hash_fn="arith"``: a Knuth multiplicative hash in plain int64
  arithmetic (``(key mod P) * 2654435761 mod 2^31``), expressible in
  ANSI SQL — the DuckDB-oracle twin.  All intermediates stay below
  2^63 so Spark (silent wrap) and DuckDB (overflow error) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_sample",
    "assign_splits",
    "leakage_free_splits",
    "mixing_weights",
    "temperature_mixing_weights",
]

DENOM = 1_000_000
_P = 1_000_003  # prime > any per-table key cardinality at sf<=100
_KNUTH = 2_654_435_761  # 2^32 * golden ratio conjugate


def hash_bucket(
    key: Column, *, seed: int = 0, hash_fn: str = "xxhash64"
) -> Column:
    """Uniform pseudo-random bucket in ``[0, DENOM)`` from a key column.

    ``arith``: ((key + seed) mod P) * KNUTH mod 2^31 mod DENOM — every
    step is non-negative int64 arithmetic both Spark and DuckDB compute
    identically (max intermediate P * KNUTH ~= 2.66e15 << 2^63).
    """
    if hash_fn == "xxhash64":
        # xxhash64 may return negative int64; pmod normalizes
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(DENOM))
    if hash_fn == "arith":
        k = key.cast("bigint") + F.lit(seed).cast("bigint")
        return (F.pmod(k, F.lit(_P)) * _KNUTH % F.lit(2**31)) % F.lit(DENOM)
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def arith_bucket_sql(key_expr: str, *, seed: int = 0) -> str:
    """The ``hash_fn='arith'`` bucket as an ANSI-SQL string (DuckDB
    oracle twin of :func:`hash_bucket`)."""
    # pmod emulation on the first step — SQL % keeps the sign of the
    # dividend, so a negative key would diverge from Spark's pmod
    return (
        f"((((({key_expr} + {seed}) % {_P}) + {_P}) % {_P})"
        f" * {_KNUTH} % {2**31}) % {DENOM}"
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-bucket falls
    below ``rate``.  Membership depends only on (key, seed) — stable
    across reruns, partitionings, and cluster sizes, and the filter is
    a scan-level projection (no shuffle, no join)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(rate * DENOM)
    return df.filter(
        hash_bucket(F.col(key_col), seed=seed, hash_fn=hash_fn) < cut
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    *,
    default_rate: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. cap over-represented
    languages/sources in a text corpus.  ``fractions`` maps stratum
    value -> keep rate; unlisted strata get ``default_rate``.

    Unlike ``DataFrame.sampleBy`` this is exactly reproducible under
    any partitioning, and the rate lookup compiles to a CASE expression
    (broadcast-free, shuffle-free)."""
    cut = F.lit(int(default_rate * DENOM))
    for value, rate in sorted(fractions.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0,1]")
        cut = F.when(
            F.col(strata_col) == value, F.lit(int(rate * DENOM))
        ).otherwise(cut)
    return df.filter(
        hash_bucket(F.col(key_col), seed=seed, hash_fn=hash_fn) < cut
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Reproducible train/val/test assignment: one ``split_col`` label
    per row by cumulative hash-bucket ranges.  ``weights`` maps label ->
    weight (normalized internally; insertion order fixes the ranges).

    The assignment is a pure projection — an output writer can
    ``partitionBy(split_col)`` to materialize the splits in one pass,
    and a given key keeps its split under appends (new data never moves
    old rows between splits — the property replays/incremental training
    pipelines need)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    b = hash_bucket(F.col(key_col), seed=seed, hash_fn=hash_fn)
    acc = 0.0
    expr = None
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w / total
        cond = b < int(acc * DENOM)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def leakage_free_splits(
    df: DataFrame,
    groups: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """:func:`assign_splits` with the near-dup-leakage guarantee: every
    document of a near-duplicate GROUP lands in the SAME split.  Plain
    per-doc splitting puts two near-copies of the same document in
    train and test with probability ~2·p_train·p_test — the classic
    contamination path that inflates eval numbers; splitting by the
    group's canonical label closes it (Lee et al. 2022's
    dedup-then-split finding, applied at the split instead).

    ``groups`` is ``(id, component)`` from
    ``components.dedup_groups``/``connected_components`` — only docs
    that appear in some near-dup pair need rows; singletons fall back
    to their own id as the split key (``coalesce``), so the two frames
    join once on id (broadcastable when the dup set is small — the
    common case) and the assignment remains a projection after it.

    Stability contract, precisely: the one-split-per-group guarantee
    holds at every snapshot, and a split label is stable under appends
    EXACTLY as far as the group LABELS are — a new member joining an
    existing group lands with it, but a new member whose id sorts
    below the group's current min-id component re-labels the group and
    can migrate it wholesale (and any merge of two groups must move
    one side's docs by definition).  An incremental pipeline that has
    already trained on a split therefore PERSISTS this function's
    output and unions new assignments against it (the store pattern),
    rather than recomputing groups over the grown corpus and trusting
    label stability.  Output keeps a ``component`` column (NULL for
    singletons) so a pipeline can count/audit which rows the guarantee
    actually moved."""
    g = groups.select(
        F.col(id_col).alias("_gid"), F.col("component").alias("component")
    )
    keyed = df.join(g, df[id_col] == g["_gid"], "left").drop("_gid")
    out = assign_splits(
        keyed.withColumn(
            "_split_key", F.coalesce(F.col("component"), F.col(id_col))
        ),
        "_split_key",
        weights,
        seed=seed,
        hash_fn=hash_fn,
        split_col=split_col,
    )
    return out.drop("_split_key")


def _rates_from_shares(per: DataFrame, budget: float | None) -> DataFrame:
    """Shared rate arithmetic for the mixing-weight family: given the
    per-domain frame with ``mass``/``natural_share``/``target_share``,
    derive the feasibility budget (largest single-epoch budget when not
    given: ``min_d mass_d / share_d`` — the scarcest targeted domain
    taken in full) and per-domain sampling rates."""
    w = Window.partitionBy()
    if budget is None:
        feasible = F.when(
            F.col("target_share") > 0, F.col("mass") / F.col("target_share")
        )
        per = per.withColumn("_budget", F.min(feasible).over(w))
    else:
        per = per.withColumn("_budget", F.lit(float(budget)))
    # F.least SKIPS nulls, so a NULL budget (no targeted domain present
    # in the corpus) would silently become rate 1.0 for every domain —
    # coalesce the product to 0 so an unmatched target keeps nothing.
    # mass can be 0 when weight_col sums to zero for a domain; under
    # ANSI that division throws — such a domain contributes nothing
    rate = F.least(
        F.lit(1.0),
        F.coalesce(
            F.when(
                F.col("mass") > 0,
                F.col("target_share") * F.col("_budget") / F.col("mass"),
            ),
            F.lit(0.0),
        ),
    )
    return per.select(
        "domain",
        "mass",
        "natural_share",
        "target_share",
        rate.alias("sample_rate"),
        (rate * F.col("mass")).alias("expected_mass"),
    )


def mixing_weights(
    df: DataFrame,
    *,
    domain_col: str,
    targets: dict[str, float],
    weight_col: str | None = None,
    budget: float | None = None,
) -> DataFrame:
    """Static data-mixing weights: per-domain sampling rates that
    reshape the corpus toward a target token/mass distribution — the
    domain-reweighting step pre-training pipelines run after curation
    (the fixed-weight counterpart of learned schemes like DoReMi).

    Per-domain mass is ``SUM(weight_col)`` (or row count).  *targets*
    maps domain -> share; shares are used as given (normalize upstream
    if they don't sum to 1), domains absent from the map get rate 0.
    With no explicit *budget*, the largest single-epoch-feasible budget
    is used: ``min_d mass_d / share_d`` over targeted domains, the
    point where the scarcest domain is taken in full and nothing needs
    upsampling.  ``rate_d = min(1, share_d * budget / mass_d)``.

    Output (one row per domain):
    ``(domain, mass, natural_share, target_share, sample_rate,
    expected_mass)``.  The whole thing is ONE partial+final aggregate
    over the corpus plus arithmetic on the tiny per-domain frame (a
    single-partition window over O(domains) rows — never the corpus);
    feed the rates into :func:`stratified_sample` for the
    hash-deterministic downsampling pass.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    mass = F.sum(weight_col) if weight_col else F.count("*")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        mass.cast("double").alias("mass")
    )
    expr = None
    for d, s in targets.items():
        cond = F.col("domain") == d
        expr = F.when(cond, float(s)) if expr is None else expr.when(cond, float(s))
    tgt = expr.otherwise(0.0)
    per = per.withColumn("target_share", tgt)
    per = per.withColumn(
        "natural_share", F.col("mass") / F.sum("mass").over(Window.partitionBy())
    )
    return _rates_from_shares(per, budget)


def temperature_mixing_weights(
    df: DataFrame,
    *,
    domain_col: str,
    temperature: float,
    weight_col: str | None = None,
    budget: float | None = None,
) -> DataFrame:
    """Temperature-based domain reweighting: target shares derived
    FROM the corpus as ``share_d ∝ mass_d^(1/T)`` — the multilingual
    sampling scheme (mBERT/XLM-R style) that upweights low-resource
    domains without hand-written targets.  ``T=1`` keeps natural
    proportions; larger ``T`` flattens toward uniform.

    Where :func:`mixing_weights` takes explicit target shares, this
    computes them; the rate arithmetic is identical: with no explicit
    *budget* the largest single-epoch-feasible budget is used
    (``min_d mass_d / share_d`` — the scarcest domain taken in full,
    nothing upsampled), then ``rate_d = min(1, share_d·budget/mass_d)``.
    Output matches :func:`mixing_weights` (one row per domain).

    Plan: one partial+final aggregate over the corpus, then pure
    arithmetic + a single-partition window over the O(domains) frame
    (domains are small by construction — never the corpus)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    mass = F.sum(weight_col) if weight_col else F.count("*")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        mass.cast("double").alias("mass")
    )
    w = Window.partitionBy()
    e = 1.0 / float(temperature)
    # exponent 0.5 routes through sqrt: IEEE requires sqrt correctly
    # rounded (and every engine honors it), while pow is only
    # 1-ulp-accurate on the JVM — T=2, the most common setting, stays
    # bit-reproducible across engines
    powed = F.when(
        F.col("mass") > 0,
        F.sqrt(F.col("mass")) if e == 0.5 else F.pow(F.col("mass"), F.lit(e)),
    )
    per = (
        per.withColumn("_p", F.coalesce(powed, F.lit(0.0)))
        .withColumn("natural_share", F.col("mass") / F.sum("mass").over(w))
        .withColumn("target_share", F.col("_p") / F.sum("_p").over(w))
    )
    return _rates_from_shares(per.drop("_p"), budget)
