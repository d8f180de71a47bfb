"""Differential oracle harness: every declared query vs DuckDB.

Mirrors the driver's t2 check (row-count + column names + order-
insensitive values) so a failure here predicts a CORRECTNESS_r{N}
failure.  The reference's analogous pattern is its Rust-vs-Python
parser equivalence suite (reference test/domains/mesh/test_vtk_rust.py)
— two independent implementations must agree exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from physicsnemo_curator_spark.plans.queries import QUERIES
from physicsnemo_curator_spark.sources.tables import TABLE_NAMES

ORACLE_NAMES = [n for n, s in QUERIES.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in QUERIES.items() if not s.oracle]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(rows, colnames):
    """Sort columns by name, canonicalize values, sort rows — the same
    shape an order-insensitive value hash would consume."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        # stringify everything so mixed None/int/str columns still sort
        if v is None:
            return "\x00null"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # near-bitwise: queries round on both sides, so rounded
            # decimals should convert to identical doubles
            return f"{v:.15g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def _assert_driver_hashable(sdf, name):
    """The driver canonicalizes results via pandas ``sort_values`` +
    hash, which raises ``TypeError: unhashable type`` on list/dict
    cells — a query can be locally green yet red at the gate (the
    r05 q_text_token_ids failure).  Declared queries must therefore
    emit only scalar columns; join arrays into strings (the q_arr1
    ``array_join`` pattern)."""
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: columns {bad} are array/map/struct-typed — the "
        "driver's pandas canonicalization cannot hash them; emit "
        "array_join(...) strings instead"
    )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_correctness_dir, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_correctness_dir)
    _assert_driver_hashable(sdf, name)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_correctness_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != oracle {len(duck_rows)}"
    )
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {sorted(spark_cols)} != oracle {sorted(duck_cols)}"
    )
    s_n = _normalize(spark_rows, spark_cols)
    d_n = _normalize(duck_rows, duck_cols)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_n, d_n)) if a != b
    ][:5]
    assert s_n == d_n, f"{name}: first value mismatches: {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_correctness_dir, name):
    df = QUERIES[name].spark(spark, sf_correctness_dir)
    _assert_driver_hashable(df, name)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    mod_spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_token_count_sql_fragment_matches_spark_on_edge_whitespace(spark):
    """The oracles' token-count SQL must agree with ws_token_count on
    text with edge tabs/newlines — DuckDB's trim() strips SPACES only,
    so the naive trim-then-split fragment counted phantom tokens for
    '\\t\\n'-edged text (latent: the shipped corpora have no such docs,
    but the WET ingest path produces them)."""
    import duckdb
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators.textops import ws_token_count

    cases = ["", "  \t\n  ", "a\n", "\tx y\n", "a  b\tc", "plain text"]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "i long, text string")
    got_spark = {
        r.i: r.n for r in sdf.select("i", ws_token_count(F.col("text")).alias("n")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    for i, t in enumerate(cases):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    # the exact fragment the oracles embed
    frag = (
        "CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0 "
        "ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) END"
    )
    got_duck = dict(con.execute(f"SELECT i, {frag} FROM t").fetchall())
    assert got_spark == got_duck, (got_spark, got_duck)


def test_driver_order_in_sync():
    # the rotation list must stay a bijection with QUERIES — a typo'd
    # or forgotten name would silently drop a query from the driver gate
    from physicsnemo_curator_spark.plans.queries import _ordered

    assert list(_ordered()) and len(_ordered()) == len(QUERIES)
