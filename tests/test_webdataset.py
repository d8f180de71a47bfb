"""WebDataset-style tar/zip shard source+sink (sources/webdataset.py):
distributed round trips, byte-reproducible shards, sample grouping."""

from __future__ import annotations

import glob
import os
import tarfile

import pytest

from physicsnemo_curator_spark.sources.webdataset import (
    group_samples,
    read_webdataset,
    read_zip_shards,
    split_member_name,
    write_webdataset,
)


def _entries_df(spark, n=40):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        rows.append((None, key, "txt", f"text-{i}".encode()))
        rows.append((None, key, "cls", str(i % 5).encode()))
        if i % 3 == 0:
            rows.append((None, key, "seg.png", b"\x89FAKE" + bytes([i])))
    return spark.createDataFrame(
        rows, "shard string, key string, ext string, payload binary"
    )


def test_split_member_name():
    assert split_member_name("000123.jpg") == ("000123", "jpg")
    assert split_member_name("a/b/000123.seg.png") == (
        "a/b/000123", "seg.png")


def test_tar_round_trip_and_grouping(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        _entries_df(spark), out, n_shards=4
    ).collect()
    assert len(manifest) == 4
    assert sum(m["n_samples"] for m in manifest) == 40
    assert sum(m["n_entries"] for m in manifest) == 40 * 2 + 14
    back = read_webdataset(spark, out)
    assert back.count() == 40 * 2 + 14
    rows = {(r["key"], r["ext"]): bytes(r["payload"])
            for r in back.collect()}
    assert rows[("000007", "txt")] == b"text-7"
    assert rows[("000006", "seg.png")] == b"\x89FAKE\x06"
    grouped = {r["key"]: r for r in group_samples(back).collect()}
    assert len(grouped) == 40
    g = grouped["000009"]
    assert g["n_entries"] == 3
    assert set(g["entries"].keys()) == {"txt", "cls", "seg.png"}
    assert bytes(g["entries"]["cls"]) == b"4"


def test_shards_are_byte_reproducible(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _entries_df(spark, 25)
    write_webdataset(df, a, n_shards=3).collect()
    write_webdataset(df, b, n_shards=3).collect()
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name
    # entries inside a shard are sorted by (key, ext) with zeroed
    # metadata — the reproducibility contract
    with tarfile.open(os.path.join(a, sorted(os.listdir(a))[0])) as tf:
        names = [m.name for m in tf]
        assert names == sorted(names)
        assert all(m.mtime == 0 and m.uid == 0 for m in tf)


def test_zip_round_trip(spark, tmp_path):
    out = str(tmp_path / "zips")
    df = _entries_df(spark, 12)
    m = write_webdataset(
        df, out, n_shards=2, archive="zip"
    ).collect()
    assert {r["shard"] for r in m} <= {
        "shard-000000.zip", "shard-000001.zip"
    }
    back = read_zip_shards(spark, out)
    assert back.count() == df.count()
    rows = {(r["key"], r["ext"]): bytes(r["payload"])
            for r in back.collect()}
    assert rows[("000011", "txt")] == b"text-11"


def test_caller_shard_column(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "byid")
    df = _entries_df(spark, 20).withColumn(
        "sid", F.col("key").cast("long") % 2
    )
    m = write_webdataset(
        df, out, shard_col="sid", n_shards=2
    ).collect()
    assert sorted(r["shard"] for r in m) == [
        "shard-000000.tar", "shard-000001.tar"
    ]
    with tarfile.open(os.path.join(out, "shard-000001.tar")) as tf:
        keys = {split_member_name(mm.name)[0] for mm in tf}
    assert all(int(k) % 2 == 1 for k in keys)


def test_bad_archive_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="archive"):
        write_webdataset(
            _entries_df(spark, 2), str(tmp_path / "x"), archive="7z"
        )


def test_glob_filters_foreign_files(spark, tmp_path):
    out = str(tmp_path / "mixed")
    write_webdataset(_entries_df(spark, 6), out, n_shards=1).collect()
    with open(os.path.join(out, "README.md"), "w") as fh:
        fh.write("not a shard")
    assert read_webdataset(spark, out).count() == 12 + 2
    assert len(glob.glob(os.path.join(out, "*.tar"))) == 1


# ---------------------------------------------------------------------------
# review-pass regressions


def test_split_member_name_dotted_paths():
    assert split_member_name("./000123.txt") == ("./000123", "txt")
    assert split_member_name("v1.2/000123.txt") == ("v1.2/000123", "txt")
    assert split_member_name("nodot") == ("nodot", "")


def test_group_samples_keeps_per_shard_keys(spark, tmp_path):
    """Independently-produced shards restart numbering — identical
    keys in different shards must stay separate samples."""
    import io
    import tarfile

    def shard(n):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            info = tarfile.TarInfo(name="000000.txt")
            payload = f"from-shard-{n}".encode()
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        return buf.getvalue()

    out = tmp_path / "dup"
    out.mkdir()
    for n in range(2):
        (out / f"s{n}.tar").write_bytes(shard(n))
    grouped = group_samples(read_webdataset(spark, str(out))).collect()
    assert len(grouped) == 2  # one sample per (shard, key)
    assert {bytes(r["entries"]["txt"]) for r in grouped} == {
        b"from-shard-0", b"from-shard-1",
    }


def test_single_shuffle_write_plan(spark, tmp_path):
    from physicsnemo_curator_spark.sources.webdataset import (
        write_webdataset as _w,
    )

    df = _entries_df(spark, 10)
    # build the manifest plan without collecting: exactly ONE
    # Exchange (the groupBy co-location) — no redundant repartition
    manifest = _w(df, str(tmp_path / "p"), n_shards=2)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_shard_byte_budget_guard(spark, tmp_path):
    """A shard whose payloads exceed max_shard_bytes must fail LOUDLY
    naming the n_shards knob (the archive is buffered whole in task
    memory), before any archive bytes are built; a budget that fits
    passes unchanged."""
    df = _entries_df(spark, 6)
    with pytest.raises(Exception, match="n_shards"):
        write_webdataset(
            df, str(tmp_path / "small"), n_shards=1, max_shard_bytes=10
        ).collect()
    m = write_webdataset(
        df, str(tmp_path / "ok"), n_shards=1, max_shard_bytes=1 << 20
    ).collect()
    assert len(m) == 1 and m[0]["n_entries"] == 14
    with pytest.raises(ValueError, match="positive"):
        write_webdataset(df, str(tmp_path / "neg"), max_shard_bytes=0)
