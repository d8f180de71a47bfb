"""Resume manifest: which partitions of a pipeline run are complete.

Replaces the reference's SQLite checkpoint store (reference
``core/pipeline_store.py:493-516,1035-1059``): a tiny JSON-lines ledger
keyed by the pipeline's spec-hash.  Semantics mirrored from
``test/core/test_checkpoint.py``: completed partitions are skipped on
re-run; anything not marked (failed / interrupted) re-runs; a different
spec-hash is a different pipeline and shares nothing.

At cluster scale this would be a Delta/Iceberg table; a JSON ledger on
shared storage keeps the same append-only, idempotent contract without
extra dependencies (each mark is one atomic append; duplicate marks are
harmless because completion is a set union).
"""

from __future__ import annotations

import json
import os
from typing import Any


class Manifest:
    def __init__(self, manifest_dir: str, spec_hash: str) -> None:
        os.makedirs(manifest_dir, exist_ok=True)
        self.path = os.path.join(manifest_dir, f"{spec_hash}.manifest.jsonl")
        self.spec_hash = spec_hash

    @staticmethod
    def _canon(v: Any) -> Any:
        """Canonical (string) partition key.

        Dates, timestamps, and decimals are not JSON-serializable —
        json.dumps would crash AFTER the sink already wrote, leaving a
        successful write unmarked (duplicated output on the retry).
        Every non-null value is stored as its string form, and the
        resume filter compares the partition column CAST TO STRING, so
        any partition type round-trips (Spark's cast-to-string and
        Python's str agree for date/timestamp/int/float)."""
        if v is None or isinstance(v, str):
            return v
        return str(v)

    def completed(self) -> set[Any]:
        done: set[Any] = set()
        if not os.path.exists(self.path):
            return done
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                done.update(self._canon(v) for v in rec.get("partitions", []))
        return done

    def mark_completed(self, partitions: list[Any]) -> None:
        if not partitions:
            return
        with open(self.path, "a") as f:
            f.write(
                json.dumps(
                    {"partitions": [self._canon(v) for v in partitions]}
                )
                + "\n"
            )

    def reset(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
