"""Smoke tests: the example pipelines run end-to-end on tiny data.

Each example is a user-facing composition of many operators; rot here
means the README story is broken even if unit tests stay green.  Run
as subprocesses (their own SparkSession) on sf0.001 to stay fast.
"""

from __future__ import annotations

import os
import pytest
import subprocess

# every test here is a multi-minute soak (subprocess example runs /
# hypothesis property sweeps) — opt-in, see conftest
pytestmark = pytest.mark.soak
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(script: str, *args: str) -> str:
    # 1200 s: the examples finish in ~1-2 min alone, but these
    # subprocesses share the box with the suite's own SparkSession (and
    # whatever else the host runs) — 600 s produced pure-contention
    # timeouts on otherwise-green runs.  The timeout still catches
    # hangs; correctness is the rc + stdout asserts.
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF, *args],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_curate_documents_example(tmp_path):
    stdout = _run("curate_documents.py", str(tmp_path / "out"))
    assert "chunks (partitioned by split)" in stdout
    assert "raw ->" in stdout


def test_incremental_ingest_example(tmp_path):
    stdout = _run("incremental_ingest.py", str(tmp_path / "work"))
    assert "curated rows written" in stdout
    assert "batch 2:" in stdout
    assert "split store:" in stdout and "duplicates=0" in stdout


def test_similarity_search_example(tmp_path):
    stdout = _run("similarity_search.py")
    assert "ivfpq-idx" in stdout
    assert "mmr diversified rows" in stdout


def test_da_gfs_stats_example(tmp_path):
    # arg convention differs: (mirror_dir, out_dir), no sf_dir
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "da_gfs_stats.py"),
            str(tmp_path / "mirror"),
            str(tmp_path / "out"),
        ],
        capture_output=True,
        text=True,
        timeout=1200,  # same contention headroom as _run
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "14 stat arrays" in out.stdout
    assert "cells re-read" in out.stdout


def test_crawl_ingest_example(tmp_path):
    stdout = _run("crawl_ingest.py", str(tmp_path / "work"))
    assert "curated rows written" in stdout
    # the second snapshot must have deduped its overlap with the first
    import re

    snaps = re.findall(r"snapshot \S+: (\d+) scanned, (\d+) new urls", stdout)
    assert len(snaps) == 2
    assert int(snaps[0][0]) == int(snaps[0][1])  # first: everything new
    assert int(snaps[1][1]) < int(snaps[1][0])  # second: overlap dropped


def test_curate_media_example(tmp_path):
    stdout = _run("curate_media.py", str(tmp_path / "work"))
    assert "media lake: " in stdout
    assert "features[video]:" in stdout
    assert "unique after dedup" in stdout


def test_curate_web_example(tmp_path):
    stdout = _run("curate_web.py", str(tmp_path / "work"))
    assert "robots filter: " in stdout
    assert "boilerplate gate: " in stdout
    assert "bpe merges:" in stdout
    assert "round-trip verified" in stdout


def test_stream_events_example(tmp_path):
    stdout = _run("stream_events.py", str(tmp_path / "work"))
    assert "running stats per event_type" in stdout
    assert "purchase" in stdout
    assert "attributed purchases" in stdout


def test_contrastive_dataset_example():
    stdout = _run("contrastive_dataset.py")
    assert "after SemDeDup:" in stdout
    assert "hard negatives:" in stdout
    assert "curated-vs-raw drift:" in stdout
