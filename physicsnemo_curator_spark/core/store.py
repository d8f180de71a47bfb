"""Shared primitives for batch-partitioned persisted stores.

Four stores converged on the same hard-won conventions by copy — the
MinHash band store (``operators/dedup.py``), the semantic-dedup vector
store and the IVF-PQ code index (``operators/mllib_ann.py``), and the
split-assignment store (``operators/sampling.py``).  This module is
those conventions extracted once:

- **Batch ids are partition directory names**, so they get a safe
  charset up front (:func:`validate_batch_id`) and are always
  addressed BY PATH (:func:`batch_dir` / :func:`read_batch`): Spark's
  partition-value type inference canonicalizes numeric-looking names
  (``'007'`` reads back as integer ``7``), so a ``_batch`` value
  filter silently matches nothing — path addressing sidesteps the
  inference entirely and gives fresh batch names a one-existence-check
  fast path instead of a Spark job.
- **"Absent" is an expected state, "broken" is not**
  (:func:`read_optional_parquet`): only the missing-path /
  nothing-to-infer-a-schema-from error conditions read as None —
  matched by the STABLE error class via
  :func:`~physicsnemo_curator_spark.core.errors.analysis_condition`,
  with the known message shapes as the fallback for builds that
  attach no condition — because AnalysisException also covers
  schema-level corruption, and treating THAT as "absent" would
  silently drop an upsert carry or serve superseded rows.
- **Appends are dynamic partition overwrites**
  (:func:`write_batch_partitioned`): re-running a batch replaces its
  own partitions (idempotent ingestion) instead of double-appending,
  and an invalid mode string raises instead of falling through to a
  STATIC overwrite that would wipe every other batch.
- **A partition rewrite is only an upsert with a carry**
  (:func:`carry_surviving`): dynamic overwrite replaces every
  partition the incoming rows touch, which would DELETE same-batch
  rows of keys a partial re-run did not carry (found independently by
  the IVF-PQ randomized lifecycle test and the split store's code
  review) — the carry anti-joins the stored batch against the
  incoming key set and MATERIALIZES before the write, because Spark
  refuses a write whose plan still scans the destination.

The IVF-PQ index's generation-pointer protocol, ``_gen`` conflict
order, tombstones, and maintenance lease stay in ``mllib_ann`` — they
are index-serving concerns, not batch-store plumbing; the narrower
stores' docstrings point there when a caller needs latest-write-wins
serving.
"""

from __future__ import annotations

import os
import re

from physicsnemo_curator_spark.core.errors import analysis_condition

__all__ = [
    "validate_batch_id",
    "batch_dir",
    "try_local_path",
    "read_optional_parquet",
    "read_batch",
    "write_batch_partitioned",
    "carry_surviving",
]

_BATCH_ID_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._:-]*")


def validate_batch_id(batch_id: str, *, reserved: tuple[str, ...] = ()) -> None:
    """Batch names are labels for partition layout/idempotency, NOT
    ordering keys — but they become partition directory names, so
    enforce a safe charset up front; ``reserved`` names (e.g. the
    IVF-PQ compactor's ``'compacted'``) raise too."""
    if batch_id in reserved:
        raise ValueError(
            f"batch_id {batch_id!r} is reserved for store maintenance"
        )
    if not _BATCH_ID_RE.fullmatch(batch_id):
        raise ValueError(
            f"invalid batch_id {batch_id!r}: must start alphanumeric "
            "and contain only [A-Za-z0-9._:-] (it names a partition "
            "directory)"
        )


def batch_dir(store: str, batch_id: str) -> str:
    """The ``_batch=<id>`` partition directory for one batch.  The only
    character in the validated charset that Spark percent-escapes in
    partition directory names is ``:``."""
    return os.path.join(store, "_batch=" + batch_id.replace(":", "%3A"))


def try_local_path(store: str) -> str | None:
    """The local filesystem path behind a store location, or None for
    a non-file scheme (``s3a://``, ``hdfs://``, …).  Parquet data
    always goes through Spark, which accepts any Hadoop-FS URI; only
    metadata/existence fast paths are filesystem-specific, and each
    caller degrades differently on None — so the decision belongs to
    them, not here."""
    if store.startswith("file://"):
        return store[len("file://"):]
    if "://" in store:
        return None
    return store


def read_optional_parquet(spark, path: str):
    """Read a parquet path that legitimately may not exist yet (a
    store's batch partition, a tombstone set): None when missing — a
    local-path existence fast path avoids the Spark job entirely, and
    a scheme'd path falls back to read-and-catch.  ONLY the
    missing-path / nothing-to-infer-a-schema-from error conditions are
    swallowed (see the module docstring for why the classification is
    this strict); everything else propagates."""
    from pyspark.errors import AnalysisException

    local = try_local_path(path)
    if local is not None and not os.path.exists(local):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        cond = analysis_condition(exc)
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            return None
        if cond is None and (
            "PATH_NOT_FOUND" in str(exc)
            or "Path does not exist" in str(exc)
            or "Unable to infer schema" in str(exc)
        ):
            # builds predating error classes (no getCondition /
            # getErrorClass, or a server that attached none): fall
            # back to the known message shapes so a genuinely-absent
            # scheme'd store path still reads as "not written yet"
            return None
        raise


def read_batch(spark, store: str, batch_id: str):
    """The stored rows of ONE ``_batch=<id>`` partition, addressed by
    its DIRECTORY, or None when the batch was never written.  Note the
    partition columns themselves are not in the result (the directory
    is below them) — callers re-attach ``_batch`` as a literal when
    they need it."""
    return read_optional_parquet(spark, batch_dir(store, batch_id))


def write_batch_partitioned(
    df,
    path: str,
    *,
    mode: str,
    partition_cols: tuple[str, ...] = ("_batch",),
    repartition_cols: tuple[str, ...] | None = None,
) -> None:
    """The shared store write: ``mode='append'`` is a DYNAMIC partition
    overwrite (only the partitions the incoming rows touch are
    replaced — idempotent batch re-runs), ``mode='overwrite'`` a
    static one (the whole path).  Any other string raises — falling
    through to a static overwrite would silently wipe every previously
    appended batch.  ``repartition_cols`` aligns tasks with output
    partitions where the caller wants one file per partition instead
    of one per upstream task (the high-cardinality-partition stores;
    low-cardinality stores skip it so a big batch keeps its write
    parallelism)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(
            f"unknown store write mode {mode!r}; expected 'overwrite' "
            "or 'append'"
        )
    if repartition_cols:
        df = df.repartition(*repartition_cols)
    (
        df.write.mode("overwrite")
        .option(
            "partitionOverwriteMode",
            "dynamic" if mode == "append" else "static",
        )
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def carry_surviving(prev, incoming_keys, key_col: str):
    """The upsert carry: rows of the stored batch whose key the
    incoming (re-)run did NOT produce, materialized so the caller's
    dynamic overwrite can rewrite the very partition this reads
    (Spark refuses a write whose plan still scans the destination;
    one batch partition, small).  ``incoming_keys`` must be the SAME
    materialized snapshot the caller writes — a non-deterministic
    input plan re-evaluated per consumer could carry a key the write
    also produced (duplicate) or drop one it didn't (deletion)."""
    return prev.join(incoming_keys, key_col, "left_anti").localCheckpoint()
