#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect), matching how
the driver measures.  Session startup and a warm-up action are excluded
— they amortize to zero on a long-lived cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from physicsnemo_curator_spark.plans.queries import QUERIES
from physicsnemo_curator_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Run-unique tempdir (r15 verdict "What's wrong #2"): fixture dirs
    # and per-process stores are keyed under tempfile.gettempdir() and
    # previously SURVIVED across bench runs, so every official artifact
    # after the first measured the fixture warm path only — the cold
    # build (collect + encode + write) was invisible and run-over-run
    # comparability silently depended on machine history.  Pointing
    # Python's tempfile at a fresh directory makes each bench run pay
    # every gate's cold path exactly once (visible in the "cold" map;
    # the reported min-of-n warm numbers keep their old meaning), and
    # never touches other processes' live fixture dirs.  The dir is
    # removed after the run.  SPARK_GRAFT_SHARED_TMP=1 restores the
    # shared machine tempdir (useful for quick iteration, not for
    # official artifacts).
    import shutil
    import tempfile

    run_tmp = None
    if os.environ.get("SPARK_GRAFT_SHARED_TMP") != "1":
        run_tmp = tempfile.mkdtemp(prefix="pcs_bench_tmp_")
        tempfile.tempdir = run_tmp

    # Size-aware config: AQE's per-stage re-planning pays off from ~tens
    # of GB upward (skew splitting, partition coalescing) but roughly
    # doubles the latency floor of sub-GB interactive queries (measured
    # 9.9 s -> 5.3 s on 8 representative queries at sf0.1 with it off).
    # Engine defaults keep AQE on; the benchmark measures the small-scale
    # regime, so it runs without it.  Shuffle partitions likewise scale
    # with the data: sub-GB inputs want ~8 (task launch overhead
    # dominates; 32 -> 8 measured ~13% faster at sf0.1), while larger
    # scale factors keep one partition per core.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = max(8, min(cpus, int(64 * sf))) if sf > 0 else cpus
    spark = get_spark(
        app_name="pcs-bench",
        shuffle_partitions=shuffle,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).selectExpr("sum(id)").collect()  # warm up JVM/codegen
    # warm the table scans (footer reads + OS page cache) so per-query
    # numbers measure steady-state plan execution, matching how a
    # long-lived cluster would see them
    from physicsnemo_curator_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # Untimed throwaway composite: the scan warm-up alone left the first
    # timed aggregates absorbing ~3 s of executor/codegen cold start
    # (BENCH_NOTES: r04 q_a1 4.99 s vs steady-state ~2.1 s).  One pass
    # through the three dominant physical shapes — partial+final hash
    # aggregate, sort-window, broadcast hash join — warms codegen and
    # the shuffle machinery so position in the suite stops predicting
    # the timing.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    li.groupBy("l_returnflag").agg(
        F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
    ).collect()
    li.select(
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("l_orderkey"))
        .alias("rn")
    ).filter("rn <= 3").collect()
    li.join(
        F.broadcast(load_table(spark, sf_dir, "part")),
        li.l_partkey == F.col("p_partkey"),
    ).groupBy("p_type").count().collect()

    # Host-noise calibration (BENCH_NOTES "Calibration"): the box's
    # wall times swing ±10-25% with co-tenant load (r10: 93.4-127.5 s
    # same-tree, same-day), which previously forced every cross-round
    # comparison through a hand-argued "host noise" caveat.  A pinned
    # Catalyst-only workload — 200M-row range scan into a hash aggregate,
    # fixed 8 partitions, zero I/O, zero Python — is timed before and
    # after the suite; its time moves with host contention but never
    # with repo changes, so round-over-round per-query ratios can be
    # divided by the calibration ratio to separate regression from
    # noise.  min-of-3 per side (min = least-contended estimate; the
    # pre/post spread itself shows within-run drift).
    def _calib_query(lo: int):
        # a FRESH DataFrame per invocation: re-collecting one instance
        # would reuse its stage-1 shuffle map output and time only the
        # final reduce (measured 2.2 s first collect, 0.04 s repeats);
        # varying `lo` also defeats any future plan/result caching
        return spark.range(lo, lo + 200_000_000, 1, 8).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s",
            "avg(id % 97) AS a",
            "count(*) AS n",
        )

    def _calibrate(tag: int) -> float:
        _calib_query(-1).collect()  # untimed: compile the plan shape
        best = float("inf")
        for rep in range(3):
            q = _calib_query(tag * 10 + rep)
            t0 = time.perf_counter()
            q.collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    # Disk-I/O calibration (BENCH_NOTES "Calibration"): the CPU probe
    # above is blind to DISK/page-cache contention, and that blind spot
    # is a measured liability — the official r14 artifact ran +52% with
    # an EQUAL CPU calib, the delta concentrated in fixture-I/O queries
    # (q_dataset_layout 6.33 s vs 1.15 s quiet).  A fixed-size local
    # parquet write+read+delete through Spark — the q_zarr_roundtrip /
    # q_dataset_layout cost class: ~40 MB of incompressible bytes, 4
    # tasks — is timed min-of-3 before and after the suite; its time
    # moves with disk contention but never with repo changes, so
    # fixture-I/O query ratios can be judged against the I/O band the
    # way CPU-bound ratios are judged against the CPU band.
    def _io_payload():
        # uuid() bytes are incompressible, so the written size is the
        # real on-disk size; a fresh frame per call (uuid is
        # nondeterministic anyway) defeats any caching
        return spark.range(500_000, numPartitions=4).selectExpr(
            "id", "repeat(uuid(), 2) AS pad"
        )

    def _calibrate_io(tag: int) -> float:
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix=f"pcs_bench_iocalib{tag}_")
        try:
            warm = os.path.join(base, "warm")
            _io_payload().write.mode("overwrite").parquet(warm)
            spark.read.parquet(warm).count()  # untimed: compile paths
            shutil.rmtree(warm)
            best = float("inf")
            for rep in range(3):
                p = os.path.join(base, f"w{rep}")
                t0 = time.perf_counter()
                _io_payload().write.parquet(p)
                spark.read.parquet(p).count()
                shutil.rmtree(p)
                best = min(best, time.perf_counter() - t0)
            return round(best, 4)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    calib_pre = _calibrate(1)
    calib_io_pre = _calibrate_io(1)

    # Per-query error isolation: one broken query must degrade the
    # artifact (an "err" entry), never abort the run — a bench JSON with
    # partial timings beats no JSON at all.
    timings: dict[str, object] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Warm-repeat failures are recorded separately: the cold timing is
    # still reported (the query IS correct once), but the artifact must
    # distinguish a verified min-of-n warm time from a query whose warm
    # rep crashed — a nondeterminism/caching bug would otherwise be
    # invisible, with the slower cold time silently labeled "warm".
    warm_errors: dict[str, str] = {}
    # SPARK_GRAFT_QUERIES (comma-separated names) restricts the suite —
    # used for targeted scale soaks (e.g. the dedup/ANN family at sf10).
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    only_set = set(only.split(",")) if only else None
    # SPARK_GRAFT_CLEARCACHE=1 drops all cached data between queries:
    # at larger scale factors the suite otherwise ACCUMULATES persisted
    # datasets (shared shingle caches, candidate sets) across 70+
    # queries, and storage-eviction churn inflates late-position
    # queries several-fold (sf1: q_emb_outliers 36 s in-suite vs 2.3 s
    # isolated).  Off by default — at sf0.1 the accumulation is noise
    # and cache reuse across the dedup family is part of the measured
    # design.
    clear_cache = os.environ.get("SPARK_GRAFT_CLEARCACHE") == "1"
    # Warm (min-of-n) reporting: the FIRST invocation of a query pays
    # its one-time codegen/janino compile (measured 6.3 s cold vs 0.7 s
    # warm on q_dedup_exact) — a cost a long-lived cluster pays once per
    # plan shape, not per query.  Queries slower than WARM_FLOOR on the
    # first pass are re-run and the reported time is the min; sub-floor
    # queries are already steady (the suite-level warm-up covers their
    # plan shapes) and skipping their re-run keeps the harness fast.
    # SPARK_GRAFT_REPEATS=1 restores single-pass (cold) timing.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    warm_floor = float(os.environ.get("SPARK_GRAFT_WARM_FLOOR", "0.35"))
    # spec.bench (when set) is the production-path twin of an
    # oracle-reproducible declared query — see QuerySpec.bench.
    for name, spec in QUERIES.items():
        if only_set is not None and name not in only_set:
            continue
        fn = spec.bench or spec.spark
        best = None
        for rep in range(max(1, repeats)):
            # clearCache inside the rep loop: with isolation requested,
            # the warm repeat must rebuild caches too, or min-of-n
            # reports exactly the cache-hit time the flag excludes
            if clear_cache:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001 — record, continue
                if best is None:
                    # cold run failed: the query is broken — record it
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                    timings[name] = {"err": type(exc).__name__}
                else:
                    # warm-repeat failure: keep the cold timing as the
                    # reported value but flag it in the artifact
                    warm_errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
            dt = time.perf_counter() - t0
            if rep == 0:
                cold[name] = round(dt, 4)
            best = dt if best is None else min(best, dt)
            if dt < warm_floor:
                break
        if best is not None:
            timings[name] = round(best, 4)

    # Isolated dedup-family pass (r15 verdict "What's wrong #1"): five
    # queries share one session-persisted pair/shingle frame, so their
    # min-of-n in-suite numbers price a CACHE HIT — the ~2 s
    # signatures→bands→verify build appears in NO reported timing (a
    # sibling paid it outside every timed window).  This companion map
    # re-times each family member with spark.catalog.clearCache()
    # before every rep, so each number is what the query costs STANDING
    # ALONE on a fresh session.  Additions-only: the main map keeps its
    # r15 meaning (within-session reuse is part of the measured
    # design); the suite total does not include these re-runs.
    _DEDUP_FAMILY = (
        "q_dedup_ngram_jaccard",
        "q_dedup_components",
        "q_dedup_representative",
        "q_split_leakage_free",
        "q_minhash_near_dup",
    )
    dedup_isolated: dict[str, float] = {}
    if not clear_cache:  # CLEARCACHE=1 runs are already isolated
        for name in _DEDUP_FAMILY:
            spec = QUERIES.get(name)
            if spec is None or (only_set is not None and name not in only_set):
                continue
            fn = spec.bench or spec.spark
            best = None
            try:
                for _rep in range(max(1, repeats)):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
            except Exception:  # noqa: BLE001 — companion map is advisory
                continue
            dedup_isolated[name] = round(best, 2)
        spark.catalog.clearCache()

    calib_post = _calibrate(2)
    calib_io_post = _calibrate_io(2)
    total = round(sum(t for t in timings.values() if isinstance(t, float)), 4)
    out = {
        "metric": "declared_query_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # fixed-workload host-state probes (see _calibrate /
        # _calibrate_io above): to compare round N vs round M, scale
        # M's CPU-bound per-query times by N.calib/M.calib and
        # fixture-I/O-bound ones by the io ratio (pre/post means)
        # before judging
        "calib": {
            "pre": calib_pre,
            "post": calib_post,
            "io_pre": calib_io_pre,
            "io_post": calib_io_post,
        },
    }
    if errors:
        out["errors"] = errors
    if warm_errors:
        out["warm_errors"] = warm_errors
    if dedup_isolated:
        out["dedup_isolated"] = dedup_isolated
    # Full artifact (warm + cold per query) for the repo's bench notes.
    # Only FULL-suite runs at the DEFAULT scale factor overwrite it —
    # a SPARK_GRAFT_QUERIES-restricted or SF-override soak must not
    # clobber the checked-in sf0.1 reference map (an sf1 soak did
    # exactly that once; restored from git).
    full = dict(out)
    full["cold"] = cold
    full["cpus"] = cpus
    if only_set is None and "SPARK_GRAFT_SF_DIR" not in os.environ:
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_LOCAL.json",
                ),
                "w",
            ) as fh:
                json.dump(full, fh)
        except OSError:
            pass
    spark.stop()
    if run_tmp is not None:
        shutil.rmtree(run_tmp, ignore_errors=True)
    # The driver captures only the LAST 2000 chars of output and parses
    # the JSON line inside that window — r05's 83-query line overran it
    # and the round's bench artifact was unparseable.  Emit the line
    # compact (2-decimal timings), and if it still cannot fit, drop the
    # FASTEST queries from the stdout map (their sum is preserved in
    # "fast_omitted_sum"; per-query detail lives in BENCH_LOCAL.json).
    # Printed after spark.stop() so no shutdown logging can land
    # between the line and EOF.
    budget = int(os.environ.get("SPARK_GRAFT_LINE_BUDGET", "1900"))

    def _line(o: dict) -> str:
        return json.dumps(o, separators=(",", ":"))

    out["queries"] = {
        k: (round(v, 2) if isinstance(v, float) else v)
        for k, v in timings.items()
    }
    # Compact FULL-detail vector: one entry per declared query in
    # QUERIES declaration order (broken queries → null), immune to the
    # fastest-query omission below — so every query's timing survives
    # into the driver artifact even when the named map must shrink to
    # fit the capture window.  "qk" fingerprints the name order
    # (md5 of ",".join(QUERIES)) so a reader can verify alignment
    # against the repo's QUERIES dict; full named detail for default
    # runs also lands in BENCH_LOCAL.json.
    if only_set is None:
        import hashlib

        out["qv"] = [
            round(timings[k], 2) if isinstance(timings.get(k), float) else None
            for k in QUERIES
        ]
        out["qk"] = hashlib.md5(",".join(QUERIES).encode()).hexdigest()[:8]
    if len(_line(out)) > budget:
        ranked = sorted(
            (k for k, v in out["queries"].items() if isinstance(v, float)),
            key=lambda k: out["queries"][k],
        )
        omitted_sum = 0.0
        omitted_n = 0
        out["fast_omitted_sum"] = 0.0
        out["fast_omitted_n"] = 0
        while len(_line(out)) > budget and ranked:
            k = ranked.pop(0)
            omitted_sum += out["queries"].pop(k)
            omitted_n += 1
            out["fast_omitted_sum"] = round(omitted_sum, 2)
            out["fast_omitted_n"] = omitted_n
    print(_line(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
