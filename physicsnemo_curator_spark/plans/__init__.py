"""Declared correctness queries (SURVEY.md §2.9) with DuckDB oracles."""

from physicsnemo_curator_spark.plans.queries import QUERIES

__all__ = ["QUERIES"]
