"""Component registry: names → source/transform/sink factories.

Parity with the reference's registry (reference ``core/registry.py:
26-273``): components register under short names, pipelines refer to
them by name, and availability is checked at lookup.  In Spark terms a
*source* builds a DataFrame, a *transform* maps DataFrame → DataFrame,
and a *sink* consumes a DataFrame and returns written paths — the
reference's ``Source[T] / Filter[T] / Sink[T]`` triple
(``core/base.py:77-354``) with the item stream replaced by a Catalyst
plan.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

SourceFactory = Callable[..., DataFrame]  # (spark, **params) -> DataFrame
TransformFactory = Callable[..., DataFrame]  # (df, **params) -> DataFrame
SinkFactory = Callable[..., list[str]]  # (df, **params) -> written paths

_SOURCES: dict[str, SourceFactory] = {}
_TRANSFORMS: dict[str, TransformFactory] = {}
_SINKS: dict[str, SinkFactory] = {}


class UnknownComponentError(KeyError):
    pass


def register_source(name: str) -> Callable[[SourceFactory], SourceFactory]:
    def deco(fn: SourceFactory) -> SourceFactory:
        _SOURCES[name] = fn
        return fn

    return deco


def register_transform(name: str) -> Callable[[TransformFactory], TransformFactory]:
    def deco(fn: TransformFactory) -> TransformFactory:
        _TRANSFORMS[name] = fn
        return fn

    return deco


def register_sink(name: str) -> Callable[[SinkFactory], SinkFactory]:
    def deco(fn: SinkFactory) -> SinkFactory:
        _SINKS[name] = fn
        return fn

    return deco


def _lookup(table: dict[str, Any], kind: str, name: str) -> Any:
    try:
        return table[name]
    except KeyError:
        raise UnknownComponentError(
            f"unknown {kind} {name!r}; registered: {sorted(table)}"
        ) from None


def get_source(name: str) -> SourceFactory:
    return _lookup(_SOURCES, "source", name)


def get_transform(name: str) -> TransformFactory:
    return _lookup(_TRANSFORMS, "transform", name)


def get_sink(name: str) -> SinkFactory:
    return _lookup(_SINKS, "sink", name)


def registered() -> dict[str, list[str]]:
    return {
        "sources": sorted(_SOURCES),
        "transforms": sorted(_TRANSFORMS),
        "sinks": sorted(_SINKS),
    }


# ---------------------------------------------------------------------------
# Built-in components (native Spark formats; scientific formats register
# from physicsnemo_curator_spark.sources / .sinks on import)
# ---------------------------------------------------------------------------


@register_source("parquet")
def _parquet_source(spark: SparkSession, *, path: str, **options: Any) -> DataFrame:
    return spark.read.options(**options).parquet(path)


@register_source("csv")
def _csv_source(spark: SparkSession, *, path: str, **options: Any) -> DataFrame:
    options.setdefault("header", "true")
    return spark.read.options(**options).csv(path)


@register_source("json")
def _json_source(spark: SparkSession, *, path: str, **options: Any) -> DataFrame:
    return spark.read.options(**options).json(path)


@register_source("vtk_mesh")
def _vtk_mesh_source(spark: SparkSession, *, path: str, **options: Any) -> DataFrame:
    """VTK directory via the Python DataSource (partition-per-file scan with
    field-filter pushdown — sources/mesh_datasource.py)."""
    from ..sources import mesh_datasource

    mesh_datasource.register(spark)
    return spark.read.format("vtk_mesh").options(**options).load(path)


@register_transform("select")
def _select(df: DataFrame, *, columns: list[str]) -> DataFrame:
    """FieldSelectFilter include-mode (reference field_select.py:61-227)."""
    return df.select(*columns)


@register_transform("drop")
def _drop(df: DataFrame, *, columns: list[str]) -> DataFrame:
    """FieldSelectFilter exclude-mode."""
    return df.drop(*columns)


@register_transform("filter")
def _filter(df: DataFrame, *, condition: str) -> DataFrame:
    return df.filter(condition)


@register_transform("sql_expr")
def _sql_expr(df: DataFrame, *, exprs: list[str]) -> DataFrame:
    return df.selectExpr(*exprs)


@register_transform("cast_precision")
def _cast_precision(df: DataFrame, *, dtype: str = "float", columns: list[str] | None = None) -> DataFrame:
    """PrecisionFilter (reference precision.py:94-289): cast every float
    column (or the listed ones) to the target floating dtype."""
    from pyspark.sql import functions as F

    targets = columns or [c for c, t in df.dtypes if t in ("double", "float")]
    for c in targets:
        df = df.withColumn(c, F.col(c).cast(dtype))
    return df


@register_transform("with_literals")
def _with_literals(df: DataFrame, *, values: dict[str, Any], overwrite: bool = True) -> DataFrame:
    """GlobalDataFilter (reference global_data.py:51-160)."""
    from pyspark.sql import functions as F

    for k, v in values.items():
        if not overwrite and k in df.columns:
            continue
        df = df.withColumn(k, F.lit(v))
    return df


@register_transform("repartition")
def _repartition(df: DataFrame, *, num: int | None = None, columns: list[str] | None = None) -> DataFrame:
    """Explicit co-location (reference partition_indices constraints,
    core/base.py:133-155): declare grouping instead of bin-packing."""
    args: list[Any] = []
    if num is not None:
        args.append(num)
    if columns:
        args.extend(columns)
    return df.repartition(*args)


@register_sink("parquet")
def _parquet_sink(
    df: DataFrame,
    *,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: Any,
) -> list[str]:
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return [path]


@register_sink("csv")
def _csv_sink(df: DataFrame, *, path: str, mode: str = "overwrite", **options: Any) -> list[str]:
    options.setdefault("header", "true")
    df.write.mode(mode).options(**options).csv(path)
    return [path]


@register_sink("json")
def _json_sink(df: DataFrame, *, path: str, mode: str = "overwrite", **options: Any) -> list[str]:
    df.write.mode(mode).options(**options).json(path)
    return [path]
