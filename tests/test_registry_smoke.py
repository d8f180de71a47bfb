"""Registry completeness smoke: every registered transform builds and
executes through the Pipeline path with representative params.

Catches signature drift between operator functions and their registry
wrappers — each transform must run on an appropriate input table.
"""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.core import components  # noqa: F401
from physicsnemo_curator_spark.core.registry import get_transform, registered
from physicsnemo_curator_spark.sources.synthetic import random_grid
from physicsnemo_curator_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _grid(spark, sf_dir):
    return random_grid(spark, n_times=2, n_lat=3, n_lon=3)


def _embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _cells(spark, sf_dir):
    return spark.createDataFrame(
        [(0, 0, [0, 1, 2, 3]), (0, 1, [1, 2, 3])], ["mesh_id", "cell_id", "vs"]
    )


# transform name -> (input builder, params)
CASES = {
    "select": (_lineitem, {"columns": ["l_orderkey", "l_quantity"]}),
    "drop": (_lineitem, {"columns": ["l_comment"] if False else ["l_tax"]}),
    "filter": (_lineitem, {"condition": "l_quantity > 10"}),
    "sql_expr": (_lineitem, {"exprs": ["l_orderkey", "l_quantity * 2 AS qty2"]}),
    "cast_precision": (_lineitem, {"dtype": "float"}),
    "with_literals": (_lineitem, {"values": {"rho": 1.225}}),
    "repartition": (_lineitem, {"num": 4, "columns": ["l_returnflag"]}),
    "moment_stats": (_lineitem, {"group_cols": ["l_returnflag"], "value_col": "l_quantity"}),
    "elementwise_stats": (_lineitem, {"cell_cols": ["l_returnflag"], "value_col": "l_quantity"}),
    "welford_state": (_lineitem, {"group_cols": ["l_returnflag"], "value_col": "l_quantity"}),
    "spatial_mean": (
        lambda s, d: _lineitem(s, d).selectExpr(
            "l_returnflag AS id", "l_linestatus AS field", "l_quantity AS value"
        ),
        {"id_col": "id", "field_col": "field", "value_col": "value"},
    ),
    "dedup_exact": (_docs, {}),
    "minhash_near_dup": (_docs, {"threshold": 0.8}),
    "simhash": (_docs, {}),
    "simhash_near_dup": (_docs, {"max_hamming": 4}),
    "text_features": (_docs, {}),
    "lsh_buckets": (_embeddings, {"dim": 64, "n_bits": 4}),
    "sessionize": (_events, {"gap_seconds": 1800}),
    "coarsen_grid": (_grid, {"factor": 3}),
    "grid_anomaly": (_grid, {}),
    "tessellate_fan": (_cells, {}),
    "redact_pii": (_docs, {}),
    "chunk_documents": (_docs, {"max_tokens": 32, "overlap": 4}),
    "repetition_ratio": (_docs, {"n": 2}),
    "remove_duplicate_spans": (_docs, {"span_words": 8, "min_df": 2}),
    "semantic_dedup": (
        _embeddings,
        {
            "centers": [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62],
            "threshold": 0.9,
        },
    ),
    "value_histograms": (
        _lineitem,
        {"group_cols": ["l_returnflag"], "value_col": "l_quantity",
         "lo": 0.0, "hi": 64.0, "n_bins": 16},
    ),
    "mixing_weights": (
        _docs,
        {"domain_col": "lang", "targets": {"en": 0.5, "de": 0.5}},
    ),
    "hash_sample": (_docs, {"key_col": "doc_id", "rate": 0.5}),
    "stratified_sample": (
        _docs,
        {"strata_col": "lang", "fractions": {"en": 0.5}, "key_col": "doc_id"},
    ),
    "assign_splits": (
        _docs,
        {"key_col": "doc_id", "weights": {"train": 0.9, "val": 0.1}},
    ),
    "dedup_groups": (
        lambda s, d: s.createDataFrame([(1, 2), (2, 3)], "a long, b long"),
        {},
    ),
    "validate": (
        _docs,
        {"rules": [
            {"kind": "not_null", "column": "doc_id"},
            {"kind": "in_range", "column": "n_chars", "params": [0, 10**9]},
        ]},
    ),
    "profile": (_docs, {"columns": ["doc_id", "lang"]}),
    "pack_sequences": (
        lambda s, d: _docs(s, d).selectExpr(
            "doc_id", "n_chars / 5 AS n_tokens"
        ),
        {"budget": 256, "n_buckets": 2},
    ),
    "substring_dup_stats": (_docs, {"min_tokens": 8, "min_count": 2}),
    "remove_duplicated_substrings": (
        _docs, {"min_tokens": 8, "min_count": 2}
    ),
    "temperature_mixing_weights": (
        _docs, {"domain_col": "lang", "temperature": 2.0}
    ),
    "bloom_filters": (
        _docs,
        {"group_cols": ["lang"], "key_col": "doc_id", "n_bits": 1024},
    ),
    "cms_sketches": (
        _docs,
        {"group_cols": ["lang"], "key_col": "doc_id",
         "depth": 3, "width": 128},
    ),
    "bigram_logprob": (_docs, {"k": 0.5}),
    "resize_images": (
        lambda s, d: __import__(
            "physicsnemo_curator_spark.sources.multimodal",
            fromlist=["synthetic_media"],
        ).synthetic_media(s, n=6),
        {"width": 4, "height": 4},
    ),
    "extract_media_features": (
        lambda s, d: __import__(
            "physicsnemo_curator_spark.sources.multimodal",
            fromlist=["synthetic_media"],
        ).synthetic_media(s, n=6),
        {"dim": 4},
    ),
}


def test_every_registered_transform_has_a_case():
    missing = set(registered()["transforms"]) - set(CASES)
    assert not missing, f"registered transforms without smoke case: {missing}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_transform_executes(spark, sf_correctness_dir, name):
    builder, params = CASES[name]
    df = builder(spark, sf_correctness_dir)
    out = get_transform(name)(df, **params)
    assert out.count() >= 0
