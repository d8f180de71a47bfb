"""ASE-LMDB source: pure-Python LMDB walker/writer round-trips + the
one-partition-per-file Spark scan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from physicsnemo_curator_spark.sources.aselmdb import (
    LmdbReader,
    decode_ase_row,
    decode_ndarray_markers,
    encode_ase_row,
    encode_ndarray_markers,
    lmdb_items,
    read_aselmdb,
    to_atomic_tables,
    write_aselmdb,
    write_lmdb,
)


def test_lmdb_roundtrip_multipage_and_overflow(tmp_path):
    """Hundreds of keys force leaf splits + a branch level; a >2 KB
    value forces an overflow page; everything reads back bytewise."""
    path = str(tmp_path / "t.lmdb")
    items = {f"k{i:05d}".encode(): f"value-{i}".encode() * 3 for i in range(700)}
    items[b"big"] = bytes(range(256)) * 40  # 10240 B -> overflow pages
    write_lmdb(path, items)

    back = dict(lmdb_items(path))
    assert back == items
    # memcmp key order
    keys = [k for k, _ in lmdb_items(path)]
    assert keys == sorted(items)

    r = LmdbReader.open(path)
    assert r.entries == len(items)


def test_lmdb_page_size_probe(tmp_path):
    path = str(tmp_path / "t8k.lmdb")
    items = {b"a": b"1", b"b": b"2" * 5000}
    write_lmdb(path, items, page_size=8192)
    r = LmdbReader.open(path)
    assert r.psize == 8192
    assert dict(r.items()) == items


def test_lmdb_empty_db(tmp_path):
    path = str(tmp_path / "empty.lmdb")
    write_lmdb(path, {})
    assert list(lmdb_items(path)) == []


def test_ndarray_marker_roundtrip():
    row = {
        "numbers": np.array([1, 8, 1], dtype=np.int64),
        "positions": np.arange(9, dtype=np.float64).reshape(3, 3),
        "pbc": np.array([True, False, True]),
        "energy": -76.4,
        "nested": {"w": np.array([0.5], dtype=np.float32)},
    }
    enc = encode_ndarray_markers(row)
    assert enc["numbers"] == {
        "__ndarray__": [[3], "int64", [1, 8, 1]]
    }
    dec = decode_ndarray_markers(enc)
    np.testing.assert_array_equal(dec["positions"], row["positions"])
    assert dec["positions"].shape == (3, 3)
    assert dec["energy"] == -76.4

    blob = encode_ase_row(row)
    out = decode_ase_row(blob)
    np.testing.assert_array_equal(out["numbers"], row["numbers"])
    np.testing.assert_array_equal(out["nested"]["w"], row["nested"]["w"])


def _water_rows(n: int, offset: float = 0.0):
    rows = []
    for i in range(n):
        rows.append(
            {
                "numbers": np.array([8, 1, 1], dtype=np.int64),
                "positions": (
                    np.array(
                        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]]
                    )
                    + offset
                    + i
                ),
                "forces": np.full((3, 3), 0.1 * i),
                "pbc": np.array([False, False, False]),
                "cell": np.zeros((3, 3)),
                "energy": -76.4 - i,
            }
        )
    return rows


def test_read_aselmdb_spark_scan(spark, tmp_path):
    """Two shard files → one partition each; reserved keys skipped;
    values survive the zlib+JSON+marker decode exactly."""
    write_aselmdb(str(tmp_path / "a.aselmdb"), _water_rows(4))
    write_aselmdb(str(tmp_path / "b.aselmdb"), _water_rows(3, offset=100.0))

    structs = read_aselmdb(spark, str(tmp_path))
    assert structs.rdd.getNumPartitions() == 2
    pdf = structs.orderBy("path", "row_id").toPandas()
    assert len(pdf) == 7  # nextid/metadata rows skipped
    assert set(pdf.natoms) == {3}
    assert pdf.row_id.tolist() == [1, 2, 3, 4, 1, 2, 3]
    first = pdf.iloc[0]
    assert list(first.numbers) == [8, 1, 1]
    np.testing.assert_allclose(
        np.array([list(p) for p in first.positions])[1, 0], 0.96
    )
    assert first.energy == -76.4


def test_to_atomic_tables(spark, tmp_path):
    write_aselmdb(str(tmp_path / "a.aselmdb"), _water_rows(5))
    structs = read_aselmdb(spark, str(tmp_path))
    systems, atoms = to_atomic_tables(structs)
    assert systems.count() == 5
    assert atoms.count() == 15
    # per-system atom counts match natoms
    chk = (
        atoms.groupBy("system_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(systems, "system_id")
        .filter(F.col("n") != F.col("natoms"))
    )
    assert chk.count() == 0
    # forces decoded per-atom
    row = atoms.filter(F.col("z") == 8).first()
    assert len(row["pos"]) == 3
