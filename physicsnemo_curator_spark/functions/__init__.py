"""Column-expression kernels (JVM-side, codegen-friendly).

Everything here returns :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` so it stays inside WholeStageCodegen — the
Spark replacement for the reference's vectorized torch/numpy/Rust
kernels (SURVEY.md §2.4).
"""
