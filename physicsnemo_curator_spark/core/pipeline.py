"""Immutable, lazy pipeline builder with resumable execution.

Parity map to the reference (``core/base.py``):

- ``Pipeline`` immutable builder whose ``.transform()`` / ``.write()``
  return new pipelines (reference ``core/base.py:387-502``) — here the
  spec is data (name + params per stage) and ``build()`` assembles the
  lazy DataFrame; Catalyst replaces the generator chain.
- Config-hash identity: the pipeline's identity is the SHA-256 of its
  canonical serialized spec (reference ``core/pipeline_store.py:
  471-516``), which keys the resume manifest.
- Resume: completed partitions are skipped on re-run (reference
  ``core/base.py:597-602``, ``test_checkpoint.py`` semantics) via the
  manifest table instead of SQLite.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from physicsnemo_curator_spark.core import registry
from physicsnemo_curator_spark.core.manifest import Manifest


@dataclass(frozen=True)
class Stage:
    name: str
    params: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.name, "params": self.params}


@dataclass(frozen=True)
class RunResult:
    spec_hash: str
    written: list[str]
    rows: int
    skipped_partitions: list[Any]
    wall_time_s: float


@dataclass(frozen=True)
class Pipeline:
    source: Stage
    transforms: tuple[Stage, ...] = ()
    sink: Stage | None = None

    # -- construction (immutable builder) ---------------------------------

    @classmethod
    def read(cls, name: str, **params: Any) -> Pipeline:
        return cls(source=Stage(name, params))

    def transform(self, name: str, **params: Any) -> Pipeline:
        return Pipeline(self.source, (*self.transforms, Stage(name, params)), self.sink)

    def write(self, name: str, **params: Any) -> Pipeline:
        return Pipeline(self.source, self.transforms, Stage(name, params))

    # -- identity ----------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return {
            "version": 1,
            "source": self.source.to_dict(),
            "transforms": [t.to_dict() for t in self.transforms],
            "sink": self.sink.to_dict() if self.sink else None,
        }

    @property
    def spec_hash(self) -> str:
        canonical = json.dumps(self.to_dict(), sort_keys=True, default=str)
        return hashlib.sha256(canonical.encode()).hexdigest()

    # -- lazy plan ----------------------------------------------------------

    def build(self, spark: SparkSession) -> DataFrame:
        """Assemble the lazy DataFrame (no execution — Catalyst plans)."""
        df = registry.get_source(self.source.name)(spark, **self.source.params)
        for t in self.transforms:
            df = registry.get_transform(t.name)(df, **t.params)
        return df

    # -- actions -------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        *,
        resume: bool = False,
        partition_col: str | None = None,
        manifest_dir: str | None = None,
    ) -> RunResult:
        """Execute source → transforms → sink.

        With ``resume=True`` and a ``partition_col``, partitions already
        recorded in the manifest for this spec-hash are filtered out
        before the write (reference checkpoint fast path,
        ``core/base.py:597-602``) and newly completed ones recorded
        after — failed/missing partitions re-run on the next invocation
        because they were never marked.
        """
        if self.sink is None:
            raise ValueError("pipeline has no sink; call .write(...) first")
        t0 = time.perf_counter()
        df = self.build(spark)

        skipped: list[Any] = []
        manifest: Manifest | None = None
        if resume:
            if not (partition_col and manifest_dir):
                raise ValueError("resume=True requires partition_col and manifest_dir")
            manifest = Manifest(manifest_dir, self.spec_hash)
            done = manifest.completed()
            if done:
                skipped = sorted(done)
                df = df.filter(~df[partition_col].isin(list(done)))

        pending: list[Any] = []
        if manifest is not None:
            pending = [
                r[0] for r in df.select(partition_col).distinct().collect()
            ]
            if not pending:
                return RunResult(self.spec_hash, [], 0, skipped, time.perf_counter() - t0)

        # count + write must not execute the plan twice: pin the result
        # once (spills to disk if needed), run both actions against the
        # materialization, release.  On a 100 TB input the recompute
        # would double the job.
        df = df.persist()
        try:
            rows = df.count()
            written = registry.get_sink(self.sink.name)(df, **self.sink.params)
        finally:
            df.unpersist()
        if manifest is not None:
            manifest.mark_completed(pending)
        return RunResult(
            self.spec_hash, written, rows, skipped, time.perf_counter() - t0
        )

    # -- serialization (YAML round-trip) --------------------------------------

    def save(self, path: str) -> None:
        from physicsnemo_curator_spark.core.serialization import save_pipeline

        save_pipeline(self, path)

    @classmethod
    def load(cls, path: str) -> Pipeline:
        from physicsnemo_curator_spark.core.serialization import load_pipeline

        return load_pipeline(path)
