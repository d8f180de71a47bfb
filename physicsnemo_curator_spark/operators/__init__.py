"""Operator library: each module re-expresses one family of reference
operators (SURVEY.md §2) as Spark DataFrame transforms."""
