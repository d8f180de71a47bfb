"""Warehouse housekeeping: manifests, metrics, output retention.

Parity with the reference's cache management (reference ``core/cache.py:
53-427``: ``list_databases``, ``remove_older_than``, size accounting) —
here the artifacts are manifest ledgers, the metrics table, and
pipeline output directories instead of SQLite checkpoint DBs.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class ArtifactInfo:
    path: str
    kind: str  # manifest | metrics | output
    n_bytes: int
    modified_epoch: float


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def list_artifacts(warehouse_dir: str) -> list[ArtifactInfo]:
    """Inventory everything under the warehouse dir (≙ list_databases)."""
    out: list[ArtifactInfo] = []
    if not os.path.isdir(warehouse_dir):
        return out
    for entry in sorted(os.listdir(warehouse_dir)):
        p = os.path.join(warehouse_dir, entry)
        if entry.endswith(".manifest.jsonl"):
            kind = "manifest"
            size = os.path.getsize(p)
        elif entry in ("pipeline_runs", "index_results", "stage_results"):
            # ALL three MetricsStore tables are run history — the
            # retention default promises to keep them
            kind = "metrics"
            size = _dir_size(p)
        elif os.path.isdir(p):
            kind = "output"
            size = _dir_size(p)
        else:
            kind = "output"
            size = os.path.getsize(p)
        out.append(ArtifactInfo(p, kind, size, os.path.getmtime(p)))
    return out


def total_size(warehouse_dir: str) -> int:
    return sum(a.n_bytes for a in list_artifacts(warehouse_dir))


def remove_older_than(
    warehouse_dir: str,
    max_age_seconds: float,
    *,
    kinds: tuple[str, ...] = ("manifest", "output"),
    dry_run: bool = False,
) -> list[str]:
    """Delete artifacts not modified within ``max_age_seconds``
    (≙ remove_older_than retention).  Metrics are kept by default —
    they are the run history.  Returns the removed (or would-remove)
    paths."""
    cutoff = time.time() - max_age_seconds
    removed: list[str] = []
    for a in list_artifacts(warehouse_dir):
        if a.kind in kinds and a.modified_epoch < cutoff:
            removed.append(a.path)
            if not dry_run:
                if os.path.isdir(a.path):
                    shutil.rmtree(a.path)
                else:
                    os.remove(a.path)
    return removed
