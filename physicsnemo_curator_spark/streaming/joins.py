"""Stream-stream joins with event-time bounds.

The reference has no streaming engine (SURVEY §1.4); this is the
Structured Streaming capability its as-of/attach patterns map onto when
both sides are unbounded: join click and purchase streams on key with a
time-range predicate, watermarks bounding how much state each side must
keep.  Semantics are checkable in batch — the same join expression over
static frames must produce the same rows (tests do exactly that).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Key-equality join with right_time ∈ [left_time − upper,
    left_time − lower]: "attach the right-side event that happened up
    to `upper_seconds` BEFORE the left event".

    On streaming inputs both sides get watermarks — together with the
    range predicate they bound the join state Spark must retain (rows
    older than watermark + interval are evicted), which is the entire
    scale story of a stream-stream join: state is O(window), never
    O(stream).  On batch inputs the watermark calls are no-ops and the
    join is an ordinary range join, which is how the tests pin parity.
    """
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    lw = (
        left.withWatermark(left_time, left_watermark)
        if left.isStreaming
        else left
    )
    rw = (
        right.withWatermark(right_time, right_watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt >= lt - F.expr(f"INTERVAL {upper_seconds} SECONDS"))
        & (rt <= lt - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)


def _stage_with_flush_rows(
    spark,
    left_dir: str,
    right_dir: str,
    schema: str,
    *,
    work_dir: str,
    on: str,
    left_time: str,
    right_time: str,
    watermark: str,
    lower_seconds: int,
    upper_seconds: int,
    skip: bool,
):
    """Stage both parquet sources under ``work_dir`` (hard links, copy
    fallback — caller inputs are never touched) and append TWO
    flush-row files per side, event time ``max_ts + watermark +
    max(upper, -lower) + margin`` (a negative ``lower`` widens the
    left rows' state expiry beyond ``upper``).  Returns the staged
    dirs plus the flush timestamp (the sink's exclusive event-time
    bound).  ``skip=True`` (completed run) returns the staged dirs and
    ``None``: the sink is read back as-is, so neither the staging nor
    the two full-source max-aggregate jobs run.

    The flush rows carry a NON-NULL join key: on the outer join's
    right side Catalyst pushes ``isnotnull(key)`` into the scan —
    BELOW the watermark node — so a null-keyed flush row would be
    filtered before it could advance the right watermark and the outer
    results would never release.  Any concrete key is safe: the flush
    event time is beyond every real row's interval, so the range
    predicate rules out matches regardless of key collisions."""
    import datetime
    import glob
    import shutil

    from pyspark.sql.types import StringType, TimestampType

    staged_dirs = [
        os.path.join(work_dir, "staged_l"),
        os.path.join(work_dir, "staged_r"),
    ]
    if skip:
        # completed run: the sink is read back as-is; the event-time
        # bound only shapes a query that will not execute, so skip the
        # two full-source max-aggregate jobs
        return staged_dirs[0], staged_dirs[1], None
    delay_s = _interval_seconds(watermark)
    max_ts = None
    for d, tcol in ((left_dir, left_time), (right_dir, right_time)):
        # recursiveFileLookup: nested (non-hive) layouts stage
        # flattened below, so the event-time bound must see their
        # files too — a plain read stops at the top level and a None
        # max_ts would put flush_ts BEFORE every real row, filtering
        # the entire result out of the sink
        row = spark.read.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(d).agg(
            F.max(tcol).alias("m")
        ).collect()[0]
        if row["m"] is not None and (max_ts is None or row["m"] > max_ts):
            max_ts = row["m"]
    if max_ts is None:
        max_ts = datetime.datetime(1970, 1, 2)
    # a left row is outer-releasable once the watermark passes
    # l.ts - lower (the latest right event that could still match), so
    # a NEGATIVE lower widens the required margin beyond `upper`
    flush_ts = max_ts + datetime.timedelta(
        seconds=delay_s + max(upper_seconds, -lower_seconds, 0) + 3600
    )
    staged = []
    for side, d, tcol in (
        ("staged_l", left_dir, left_time),
        ("staged_r", right_dir, right_time),
    ):
        out = os.path.join(work_dir, side)
        staged.append(out)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        # ONE recursive listing for flat AND nested (date-bucketed)
        # layouts — mixed top-level + nested sources must never stage
        # a subset while the event-time bound (recursiveFileLookup
        # read above) sees every row.  Files under metadata/hidden
        # dirs (_temporary from a crashed write, .hive-staging, ...)
        # are skipped exactly as Spark's own path filter skips them —
        # hardlinking them under a clean name would resurrect
        # uncommitted data into the stream.
        all_files = sorted(
            glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        )
        files, hive_dirs = [], set()
        for f in all_files:
            parts = os.path.relpath(f, d).split(os.sep)
            if any(p.startswith(("_", ".")) for p in parts):
                continue
            hive_dirs.update(p for p in parts[:-1] if "=" in p)
            files.append(f)
        if hive_dirs:
            # nested layouts stage flattened losslessly (every column
            # lives IN the files); HIVE-partitioned layouts do NOT —
            # the partition column exists only in the directory name
            # and would silently read back NULL from a flattened copy
            raise ValueError(
                f"outer-join staging found hive-partitioned files "
                f"under {d!r} (partition dirs {sorted(hive_dirs)[:3]}); "
                "the partition column lives in the directory names and "
                "a flattened stage would read it back NULL — rewrite "
                "the source with the partition column materialized in "
                "the files, or use how='inner'"
            )
        if not files:
            # an empty source would stage ZERO data files and the run
            # would "succeed" with a flush-only result — fail loudly
            raise ValueError(
                f"outer-join staging found no *.parquet under {d!r}"
            )
        for i, f in enumerate(files):
            dst = os.path.join(out, f"src-{i:05d}.parquet")
            try:
                os.link(f, dst)
            except OSError:
                shutil.copy2(f, dst)
        fields = spark.read.schema(schema).parquet(d).schema.fields

        def flush_value(f):
            if f.name == tcol:
                return F.lit(flush_ts).cast(TimestampType())
            if f.name == on:
                if isinstance(f.dataType, StringType):
                    return F.lit("__pcs_flush__").cast(f.dataType)
                return F.lit(-1).cast(f.dataType)
            return F.lit(None).cast(f.dataType)

        flush = spark.range(1).select(
            *[flush_value(f).alias(f.name) for f in fields]
        )
        # two files -> two extra micro-batches: the watermark a batch
        # uses comes from the PREVIOUS batch, so one flush batch moves
        # the watermark and the second triggers the outer emission
        for tag in ("flush-a", "flush-b"):
            tmp = os.path.join(work_dir, f"_{side}_{tag}")
            flush.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
            shutil.move(part, os.path.join(out, f"zz-{tag}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)
    return staged[0], staged[1], flush_ts


_INTERVAL_UNITS = {
    "millisecond": 0.001,
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _interval_seconds(text: str) -> float:
    """Seconds in a watermark interval string ('2 hours', '1.5 hours',
    '500 milliseconds') — the CalendarInterval units withWatermark
    accepts; a malformed string ('60days', '2') or unknown unit fails
    with the supported format/list, not a bare ValueError from
    split/int."""
    try:
        n_text, unit = text.split()
        n = float(n_text)
    except ValueError:
        raise ValueError(
            f"malformed watermark interval {text!r}; expected "
            "'<number> <unit>' with a space, e.g. '2 hours'"
        ) from None
    unit = unit.rstrip("s")
    if unit not in _INTERVAL_UNITS:
        raise ValueError(
            f"unsupported watermark unit {unit!r}; expected one of "
            f"{sorted(_INTERVAL_UNITS)}"
        )
    return n * _INTERVAL_UNITS[unit]


def run_interval_join_stream(
    spark,
    left_dir: str,
    right_dir: str,
    schema: str,
    select_cols: dict[str, str],
    *,
    work_dir: str,
    on: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Drive :func:`interval_join` through a REAL Structured Streaming
    run: both sides are ``readStream`` parquet sources consumed one
    file per micro-batch (so join state genuinely accumulates and
    matches across batches), the inner join emits in APPEND mode, and
    the result lands executor-side in a parquet sink — the production
    shape, no driver-side collection.  Returns the sink read back as a
    batch frame.

    ``select_cols`` maps output name → qualified column (``'l.x'`` /
    ``'r.y'``) because both sides usually share a schema.  An inner
    stream-stream join emits a match as soon as both rows have
    arrived; the watermark only bounds retained state, so with a
    watermark covering the fixture's full event-time span the output
    is exactly the batch join (tight watermarks trade completeness on
    late data for bounded state — the tests pin both regimes).  A
    COMPLETED run (same ``work_dir``) is reused; a crashed partial run
    is detected by the missing ``_DONE`` marker and rebuilt from
    scratch, so a retry can never silently return a subset.

    ``state_partitions`` right-sizes the join's state stores: a
    stateful query pins ``spark.sql.shuffle.partitions`` into its
    checkpoint at first start, and every micro-batch then runs that
    many state tasks PER SIDE regardless of data volume — measured
    13.5 s → 3.3 s on a small fixture going 32 → 4.  Size it to key
    cardinality (up at 100 TB, down for small keyed streams); None
    keeps the session setting.  The setting is scoped to a CLONED
    session (``spark.newSession()``: same SparkContext, isolated
    SQLConf), so concurrent batch queries on the caller's session
    never see the reduced partition count.

    ``how='left_outer'`` adds the unmatched-left rows (right columns
    NULL); ``how='full_outer'`` adds unmatched rows from BOTH sides
    (the flush margin covers both expiries: a left row waits for the
    watermark to pass ``l.ts - lower``, a right row for
    ``r.ts + upper``).  Outer emission is WATERMARK-DRIVEN: Spark releases an
    unmatched row only when the watermark passes its state expiry, and
    a file stream that simply runs dry never advances that far — so
    the runner stages both sources into ``work_dir`` (hard-linked, the
    inputs are never mutated) and appends two FLUSH rows per side
    whose event time sits beyond every real row's state expiry; two
    extra micro-batches carry the watermark past it (the watermark a
    batch uses is computed from the PREVIOUS batch, hence two).  Flush
    rows carry a NON-null sentinel key — a null key would be removed
    by the isnotnull pushdown below the watermark node (see
    ``_stage_with_flush_rows``) — but can never match: their event
    time is outside every real row's interval.  They are excluded from
    the sink by an event-time bound, so the result is exactly the
    batch left join."""
    import shutil

    sess = spark.newSession() if state_partitions is not None else spark
    if state_partitions is not None:
        sess.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join how={how!r}")
    sink = os.path.join(work_dir, "sink")
    ckpt = os.path.join(work_dir, "ckpt")
    done = os.path.join(work_dir, "_DONE")
    flush_bound = None
    if how != "inner":
        left_dir, right_dir, flush_bound = _stage_with_flush_rows(
            sess,
            left_dir,
            right_dir,
            schema,
            work_dir=work_dir,
            on=on,
            left_time=left_time,
            right_time=right_time,
            watermark=watermark,
            lower_seconds=lower_seconds,
            upper_seconds=upper_seconds,
            skip=os.path.exists(done),
        )
    left = (
        sess.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(left_dir)
    )
    right = (
        sess.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(right_dir)
    )
    joined = interval_join(
        left,
        right,
        on=on,
        left_time=left_time,
        right_time=right_time,
        lower_seconds=lower_seconds,
        upper_seconds=upper_seconds,
        left_watermark=watermark,
        right_watermark=watermark,
        how=how,
    )
    if flush_bound is not None:
        # event-time predicates, stream-safe: drop the flush rows
        # (their unmatched emissions) from the sink.  full_outer rows
        # can be null on EITHER side, so each bound admits nulls — a
        # real unmatched-right row has l.<time> null, not < bound
        lt = F.col(f"l.{left_time}")
        cond = lt < F.lit(flush_bound)
        if how == "full_outer":
            rt = F.col(f"r.{right_time}")
            cond = (lt.isNull() | (lt < F.lit(flush_bound))) & (
                rt.isNull() | (rt < F.lit(flush_bound))
            )
        joined = joined.filter(cond)
    joined = joined.select(
        *[F.col(src).alias(name) for name, src in select_cols.items()]
    )
    if not os.path.exists(done):
        # debris from an aborted earlier attempt must not mix with
        # (or masquerade as) a completed run
        os.makedirs(work_dir, exist_ok=True)
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        with open(done, "w") as f:
            f.write("ok")
    # explicit schema: a legitimately empty join leaves a sink with
    # metadata only, which schema inference would refuse to read
    return spark.read.schema(joined.schema).parquet(sink)
