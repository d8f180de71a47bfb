"""physicsnemo_curator_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
NVIDIA/physicsnemo-curator (reference at /root/reference, studied for
*behavior only*), re-expressed Spark-first:

- The reference's ``Source -> Filter* -> Sink`` lazy generator pipeline
  (reference ``core/base.py:387-553``) becomes a lazy Catalyst logical
  plan: ``reader -> DataFrame transforms -> writer``.
- Its per-worker partial statistics with Chan/Welford merge (reference
  ``domains/mesh/filters/stats.py:675-837``) become built-in Catalyst
  partial/final aggregates (``avg/var_pop/skewness/kurtosis``).
- Its process-pool/dask backends, shard files and gather pass collapse
  into Spark's scheduler + shuffle.

Packages:
    core        pipeline builder, registry, YAML serialization, manifest
    functions   scalar/array/text column-expression kernels (JVM-side)
    operators   stats, dedup, similarity, text, mesh, grid, quality ops
    sources     readers (parquet/csv/json/binary/multimodal/synthetic)
    sinks       writers (parquet/partitioned/netcdf/zarr adapters)
    streaming   structured-streaming variants of the stateful operators
    plans       declared correctness queries (SURVEY.md §2.9) + oracles
"""

from physicsnemo_curator_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "__version__"]
