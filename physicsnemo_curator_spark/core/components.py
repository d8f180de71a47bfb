"""Operator-library registrations: expose the operator packs as named
pipeline transforms (reference registers its filters the same way,
``core/registry.py:101-150``).  Importing this module populates the
registry; ``physicsnemo_curator_spark.core`` imports it lazily via
``ensure_registered()``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from physicsnemo_curator_spark.core.registry import (
    register_sink,
    register_source,
    register_transform,
)
from physicsnemo_curator_spark.operators import dedup, similarity, stats, textops

_REGISTERED = True  # import side effect is the registration


def ensure_registered() -> None:  # idempotent hook for explicit callers
    return None


@register_transform("moment_stats")
def _moment_stats(df: DataFrame, *, group_cols: list[str], value_col: str, **kw: Any) -> DataFrame:
    return stats.moment_stats(df, group_cols, value_col, **kw)


@register_transform("elementwise_stats")
def _elementwise_stats(df: DataFrame, *, cell_cols: list[str], value_col: str) -> DataFrame:
    return stats.elementwise_stats(df, cell_cols, value_col)


@register_transform("welford_state")
def _welford_state(df: DataFrame, *, group_cols: list[str], value_col: str) -> DataFrame:
    return stats.welford_state(df, group_cols, value_col)


@register_transform("spatial_mean")
def _spatial_mean(df: DataFrame, *, id_col: str, field_col: str, value_col: str) -> DataFrame:
    return stats.spatial_mean(df, id_col, field_col, value_col)


@register_transform("dedup_exact")
def _dedup_exact(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return dedup.dedup_exact(df, text_col, id_col)


@register_transform("minhash_near_dup")
def _minhash_near_dup(df: DataFrame, **kw: Any) -> DataFrame:
    return dedup.minhash_near_duplicates(df, **kw)


@register_transform("simhash")
def _simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return dedup.simhash(df, text_col, id_col)


@register_transform("text_features")
def _text_features(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    return textops.with_text_features(df, text_col)


@register_transform("lsh_buckets")
def _lsh_buckets(df: DataFrame, *, dim: int, **kw: Any) -> DataFrame:
    return similarity.lsh_buckets(df, dim, **kw)


@register_transform("sessionize")
def _sessionize(df: DataFrame, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import timeseries

    return timeseries.sessionize(df, **kw)


@register_transform("coarsen_grid")
def _coarsen_grid(df: DataFrame, *, factor: int) -> DataFrame:
    from physicsnemo_curator_spark.operators import grid

    return grid.coarsen(df, factor)


@register_transform("grid_anomaly")
def _grid_anomaly(df: DataFrame) -> DataFrame:
    from physicsnemo_curator_spark.operators import grid

    return grid.anomaly(df)


@register_transform("simhash_near_dup")
def _simhash_near_dup(df: DataFrame, **kw: Any) -> DataFrame:
    return dedup.simhash_near_duplicates(df, **kw)


@register_transform("tessellate_fan")
def _tessellate_fan(df: DataFrame, *, vs_col: str = "vs") -> DataFrame:
    from physicsnemo_curator_spark.operators import mesh

    return mesh.tessellate_fan(df, vs_col)


@register_transform("redact_pii")
def _redact_pii(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumn(text_col, textops.redact_pii(F.col(text_col)))


@register_transform("chunk_documents")
def _chunk_documents(df: DataFrame, **kw: Any) -> DataFrame:
    return textops.chunk_documents(df, **kw)


@register_transform("repetition_ratio")
def _repetition_ratio(df: DataFrame, **kw: Any) -> DataFrame:
    return textops.repetition_ratio(df, **kw)


@register_transform("remove_duplicate_spans")
def _remove_duplicate_spans(df: DataFrame, **kw: Any) -> DataFrame:
    return textops.remove_duplicate_spans(df, **kw)


@register_transform("semantic_dedup")
def _semantic_dedup(df: DataFrame, *, centers: list, **kw: Any) -> DataFrame:
    """YAML form carries the coarse-quantizer centroids inline (the
    trained-model path stays programmatic)."""
    from physicsnemo_curator_spark.operators import mllib_ann

    return mllib_ann.semantic_dedup(df, centers, **kw)


@register_transform("value_histograms")
def _value_histograms(
    df: DataFrame, *, group_cols: list, value_col: str, lo: float, hi: float, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sketches

    return sketches.value_histograms(df, group_cols, value_col, lo=lo, hi=hi, **kw)


@register_transform("mixing_weights")
def _mixing_weights(df: DataFrame, *, domain_col: str, targets: dict, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import sampling

    return sampling.mixing_weights(df, domain_col=domain_col, targets=targets, **kw)


@register_transform("hash_sample")
def _hash_sample(df: DataFrame, *, key_col: str, rate: float, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import sampling

    return sampling.hash_sample(df, key_col, rate, **kw)


@register_transform("stratified_sample")
def _stratified_sample(
    df: DataFrame, *, strata_col: str, fractions: dict, key_col: str, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sampling

    return sampling.stratified_sample(df, strata_col, fractions, key_col, **kw)


@register_transform("assign_splits")
def _assign_splits(
    df: DataFrame, *, key_col: str, weights: dict, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sampling

    return sampling.assign_splits(df, key_col, weights, **kw)


@register_transform("dedup_groups")
def _dedup_groups(df: DataFrame, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import components as cc

    return cc.dedup_groups(df, **kw)


@register_transform("pack_sequences")
def _pack_sequences(df: DataFrame, *, budget: int, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators.packing import pack_sequences

    return pack_sequences(df, budget=budget, **kw)


@register_transform("validate")
def _validate(df: DataFrame, *, rules: list) -> DataFrame:
    """Rules as YAML-friendly dicts: {kind, column, params?}."""
    from physicsnemo_curator_spark.operators import validation as V

    rs = [
        V.Rule(r["kind"], r["column"], tuple(r.get("params", ())))
        for r in rules
    ]
    return V.validate(df, rs)


@register_transform("profile")
def _profile(
    df: DataFrame, *, columns: list | None = None, distinct: str = "approx"
) -> DataFrame:
    from physicsnemo_curator_spark.operators import validation as V

    return V.profile(df, columns, distinct=distinct)


@register_transform("substring_dup_stats")
def _substring_dup_stats(df: DataFrame, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import textops

    return textops.duplicated_substring_stats(df, **kw)


@register_transform("remove_duplicated_substrings")
def _remove_duplicated_substrings(df: DataFrame, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.operators import textops

    return textops.remove_duplicated_substrings(df, **kw)


@register_transform("temperature_mixing_weights")
def _temperature_mixing_weights(
    df: DataFrame, *, domain_col: str, temperature: float, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sampling

    return sampling.temperature_mixing_weights(
        df, domain_col=domain_col, temperature=temperature, **kw
    )


@register_transform("bloom_filters")
def _bloom_filters(
    df: DataFrame, *, group_cols: list, key_col: str, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sketches

    return sketches.bloom_filters(df, group_cols, key_col, **kw)


@register_transform("cms_sketches")
def _cms_sketches(
    df: DataFrame, *, group_cols: list, key_col: str, **kw: Any
) -> DataFrame:
    from physicsnemo_curator_spark.operators import sketches

    return sketches.cms_sketches(df, group_cols, key_col, **kw)


# --- round-7 additions: ImageData source, multimodal PNG kernels, HDF5 sink


@register_source("image_data")
def _image_data_source(spark, *, path: str, table: str = "grid", **kw: Any):
    """Structured-grid scan (XML .vti ImageData + legacy
    STRUCTURED_POINTS, sources/vtk.py::read_image_data); ``table``
    picks grid / cell_grid / meta."""
    from physicsnemo_curator_spark.sources.vtk import read_image_data

    tables = read_image_data(spark, path, **kw)
    if table not in tables:
        raise ValueError(
            f"unknown image_data table {table!r}: {sorted(tables)}"
        )
    return tables[table]


@register_transform("resize_images")
def _resize_images(df: DataFrame, *, width: int, height: int, **kw: Any) -> DataFrame:
    """Nearest-neighbor image resize (raw planes + real PNG decode,
    sources/multimodal.py)."""
    from physicsnemo_curator_spark.sources import multimodal

    return multimodal.resize_images(df, width=width, height=height, **kw)


@register_transform("extract_media_features")
def _extract_media_features(df: DataFrame, **kw: Any) -> DataFrame:
    from physicsnemo_curator_spark.sources import multimodal

    return multimodal.extract_features(df, **kw)


@register_sink("hdf5_per_variable_year")
def _hdf5_sink(df: DataFrame, *, path: str, **kw: Any) -> list:
    """Chunked+deflate HDF5 per (variable, year) — the NetCDF4Sink
    HDF5 half (sinks/scientific.py::write_hdf5_per_variable_year)."""
    from physicsnemo_curator_spark.sinks.scientific import (
        write_hdf5_per_variable_year,
    )

    write_hdf5_per_variable_year(df, path, **kw)
    return [path]


@register_transform("bigram_logprob")
def _bigram_logprob(df: DataFrame, **kw: Any) -> DataFrame:
    """CCNet/KenLM-style bigram-LM perplexity signal
    (operators/textops.py::bigram_logprob)."""
    from physicsnemo_curator_spark.operators import textops

    return textops.bigram_logprob(df, **kw)


# --- round-8 additions: binary-codec sources, named dataset sources,
# and the remaining scientific sinks


@register_source("d3plot")
def _d3plot_source(spark, *, path: str, table: str = "nodes", **kw: Any):
    """LS-DYNA d3plot scan (sources/d3plot.py::read_d3plot); ``table``
    picks nodes / shells / states."""
    from physicsnemo_curator_spark.sources.d3plot import read_d3plot

    tables = read_d3plot(spark, path, **kw)
    if table not in tables:
        raise ValueError(f"unknown d3plot table {table!r}: {sorted(tables)}")
    return tables[table]


@register_source("aselmdb")
def _aselmdb_source(spark, *, path: str, **kw: Any):
    """ASE-LMDB structure scan (sources/aselmdb.py::read_aselmdb)."""
    from physicsnemo_curator_spark.sources.aselmdb import read_aselmdb

    return read_aselmdb(spark, path, **kw)


@register_source("openradioss")
def _openradioss_source(
    spark, *, path: str, table: str = "points", **kw: Any
):
    """OpenRadioss per-run timestep-stack assembly
    (sources/openradioss.py::read_openradioss); ``table`` picks
    points / cells / displacements / trajectory / point_data /
    cell_data / globals."""
    from physicsnemo_curator_spark.sources.openradioss import read_openradioss

    tables = read_openradioss(spark, path, **kw)
    if table not in tables:
        raise ValueError(
            f"unknown openradioss table {table!r}: {sorted(tables)}"
        )
    return tables[table]


@register_source("drivaerml")
def _drivaerml_source(spark, *, path: str, table: str = "points", **kw: Any):
    """DrivAerML local-layout scan incl. split-part volume reassembly
    (sources/datasets.py::read_drivaerml)."""
    from physicsnemo_curator_spark.sources.datasets import read_drivaerml

    tables = read_drivaerml(spark, path, **kw)
    if table not in tables:
        raise ValueError(
            f"unknown drivaerml table {table!r}: {sorted(tables)}"
        )
    return tables[table]


@register_source("ahmedml")
def _ahmedml_source(spark, *, path: str, table: str = "points", **kw: Any):
    """AhmedML local-layout scan (sources/datasets.py::read_ahmedml)."""
    from physicsnemo_curator_spark.sources.datasets import read_ahmedml

    tables = read_ahmedml(spark, path, **kw)
    if table not in tables:
        raise ValueError(f"unknown ahmedml table {table!r}: {sorted(tables)}")
    return tables[table]


@register_sink("netcdf_per_variable_year")
def _netcdf_sink(df: DataFrame, *, path: str, **kw: Any) -> list:
    """Classic NetCDF-3 per (variable, year)
    (sinks/scientific.py::write_netcdf_per_variable_year)."""
    from physicsnemo_curator_spark.sinks.scientific import (
        write_netcdf_per_variable_year,
    )

    write_netcdf_per_variable_year(df, path, **kw)
    return [path]


@register_sink("grid_zarr")
def _grid_zarr_sink(df: DataFrame, *, path: str, **kw: Any) -> list:
    """Zarr-v2 grid store, task-side chunk writes
    (sinks/zarr_store.py::write_grid_zarr)."""
    from physicsnemo_curator_spark.sinks.zarr_store import write_grid_zarr

    write_grid_zarr(df, path, **kw)
    return [path]
