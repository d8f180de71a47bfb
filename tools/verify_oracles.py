#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every declared query via ``__spark_entry__.queries()`` at sf0.01 and the
matching DuckDB oracle from ``oracle_sql()``, canonicalizes both results the
same way the driver does (columns sorted by name, rows sorted by all columns,
values rounded), and reports rows / schema / value-hash matches per query.

Usage: python tools/verify_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            s = s.round(6)
        parts.append(s.astype(str).str.cat(sep="\x1f") if len(s) else "")
    return hashlib.md5("\x1e".join(parts).encode()).hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entry
    from physicsnemo_curator_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                sc, oc = _canon(sdf), _canon(odf)
                row["rows_match"] = len(sc) == len(oc)
                row["schema_match"] = list(sc.columns) == list(oc.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _hash(sc) == _hash(oc)
                )
                row["spark_rows"], row["oracle_rows"] = len(sc), len(oc)
                if not row["schema_match"]:
                    row["cols"] = [list(sc.columns), list(oc.columns)]
            else:
                row["rows_match"] = len(sdf) >= 0
                row["spark_rows"] = len(sdf)
                row["hash_match"] = None
            row["err"] = None
        except Exception as exc:  # noqa: BLE001
            row = {"rows_match": False, "hash_match": False,
                   "err": f"{type(exc).__name__}: {exc}"}
        row["sec"] = round(time.time() - t0, 2)
        ok = row.get("hash_match") in (True, None) and row["err"] is None \
            and row.get("rows_match")
        n_pass += bool(ok)
        n_fail += not ok
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name} ({row['sec']}s)"
              + (f" err={row['err']}" if row["err"] else "")
              + (f" cols={row.get('cols')}" if "cols" in row else ""))
        results[name] = row

    print(f"\n{n_pass} pass / {n_fail} fail")
    with open("/tmp/verify_oracles.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
