"""Run metrics: the engine's replacement for the reference's SQLite
metrics store.

The reference persists per-index wall time / memory / stage breakdowns
into SQLite (reference ``core/pipeline_store.py:541-626``) and
aggregates them for the dashboard (``dashboard/data.py:34-332``).  On
Spark, task-level metrics already live in the event log / UI; what the
engine still owns is the *run ledger*: one record per pipeline
execution (spec hash, rows, wall time, outputs), appended to a parquet
table that Spark SQL can query — the ``pipeline_runs`` /
``index_results`` analogue with the WAL concurrency problem deleted.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

RUN_SCHEMA = (
    "run_id string, spec_hash string, rows long, wall_time_s double, "
    "written array<string>, skipped long, finished_at_epoch long"
)


class MetricsStore:
    def __init__(self, metrics_dir: str) -> None:
        self.path = os.path.join(metrics_dir, "pipeline_runs")

    def record(self, spark: SparkSession, result) -> str:
        """Append one run record (RunResult-shaped)."""
        run_id = uuid.uuid4().hex[:12]
        rec = asdict(result)
        row = (
            run_id,
            rec["spec_hash"],
            rec["rows"],
            float(rec["wall_time_s"]),
            rec["written"],
            len(rec["skipped_partitions"]),
            int(time.time()),
        )
        spark.createDataFrame([row], RUN_SCHEMA).write.mode("append").parquet(
            self.path
        )
        return run_id

    def runs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def summary(self, spark: SparkSession) -> DataFrame:
        """Totals/means per spec hash (reference ``PipelineMetrics.summary``,
        ``core/pipeline_store.py:208-238``)."""
        from pyspark.sql import functions as F

        return self.runs(spark).groupBy("spec_hash").agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("rows").alias("total_rows"),
            F.avg("wall_time_s").alias("avg_wall_time_s"),
            F.sum("wall_time_s").alias("total_wall_time_s"),
            F.max("finished_at_epoch").alias("last_run_epoch"),
        )
