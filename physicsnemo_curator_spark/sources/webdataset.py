"""WebDataset-style sharded archive ingestion and writing — tar (and
zip) shards of keyed multimodal samples.

The de-facto layout for large-scale multimodal training corpora:
samples live in POSIX tar shards, one file per modality, grouped by
the basename up to the FIRST dot (``000123.jpg`` + ``000123.txt`` +
``000123.json`` = one sample; extensions may be dotted, e.g.
``000123.seg.png``).  The repo maps this onto Spark the way every
custom source here works:

- **read**: ``binaryFile`` over the shard glob, then a tar walk per
  shard inside Arrow-batched ``mapInPandas`` — one task per shard,
  the natural parallel unit (shards are sized for sequential read;
  at 100 TB the scan is embarrassingly parallel and nothing
  shuffles).
- **group**: ``group_samples`` pivots a shard scan into one row per
  sample with an ``entries`` map<ext, payload> — a single hash
  aggregation on the sample key.
- **write**: deterministic shard assignment (xxhash of the key mod
  shard count, or a caller column), one ``applyInPandas`` task per
  shard writing a BYTE-REPRODUCIBLE archive: entries sorted by
  (key, ext), zeroed mtime/uid/gid, fixed mode — re-running the
  pipeline re-creates identical shard bytes, which is what makes
  corpus diffs and resumable uploads possible.

Archives are stdlib ``tarfile``/``zipfile`` (public formats); no
sample payload is ever decoded here — route payloads through
``sources/multimodal.py`` operators afterwards.
"""

from __future__ import annotations

import io
import os
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENTRY_SCHEMA = "shard string, key string, ext string, payload binary"


def split_member_name(name: str) -> tuple[str, str]:
    """WebDataset naming: key = path up to the first dot AFTER the
    last slash, ext = everything after it (``a/b.v1/000123.seg.png``
    -> ``a/b.v1/000123``, ``seg.png``) — dots in directory names and
    ``./``-prefixed tar members must not truncate the key."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        return name, ""
    return name[:dot], name[dot + 1 :]


def read_webdataset(
    spark: SparkSession, path: str, *, glob: str = "*.tar"
) -> DataFrame:
    """Scan tar shards into (shard, key, ext, payload) rows — one
    task per shard file."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def walk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content))
                ) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = split_member_name(m.name)
                        rows.append(
                            (shard, key, ext, tf.extractfile(m).read())
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "payload"]
            )

    return files.mapInPandas(walk, ENTRY_SCHEMA)


def read_zip_shards(
    spark: SparkSession, path: str, *, glob: str = "*.zip"
) -> DataFrame:
    """Zip twin of :func:`read_webdataset` (same output schema)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def walk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        key, ext = split_member_name(info.filename)
                        rows.append(
                            (shard, key, ext, zf.read(info))
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "payload"]
            )

    return files.mapInPandas(walk, ENTRY_SCHEMA)


def group_samples(entries: DataFrame) -> DataFrame:
    """One row per sample: (shard, key, n_entries, entries
    map<ext, binary>) — a single hash aggregation.  Grouping is on
    (shard, key): WebDataset keys are only guaranteed unique WITHIN
    a shard (independently-produced shards commonly restart
    numbering at 000000)."""
    return entries.groupBy("shard", "key").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("ext", "payload")))
        ).alias("entries"),
    )


def _deterministic_tar(rows: list[tuple[str, str, bytes]]) -> bytes:
    """Byte-reproducible USTAR archive: sorted entries, zeroed
    timestamps/ownership, fixed mode."""
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        for key, ext, payload in sorted(rows, key=lambda r: (r[0], r[1])):
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _deterministic_zip(
    rows: list[tuple[str, str, bytes]], *, compress: bool
) -> bytes:
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, mode="w", compression=method) as zf:
        for key, ext, payload in sorted(rows, key=lambda r: (r[0], r[1])):
            info = zipfile.ZipInfo(
                filename=f"{key}.{ext}", date_time=(1980, 1, 1, 0, 0, 0)
            )
            info.external_attr = 0o644 << 16
            info.compress_type = method
            zf.writestr(info, payload)
    return buf.getvalue()


def write_webdataset(
    entries: DataFrame,
    path: str,
    *,
    n_shards: int = 8,
    prefix: str = "shard",
    shard_col: str | None = None,
    archive: str = "tar",
    zip_compress: bool = True,
    max_shard_bytes: int = 4 << 30,
) -> DataFrame:
    """Distributed shard writer: assign each SAMPLE (key) to a shard
    — ``xxhash64(key) mod n_shards`` by default, or a caller-supplied
    column — co-locate each shard's entries with one shuffle, and
    write one byte-reproducible archive per shard from inside the
    task.  Returns the manifest (shard, n_samples, n_entries,
    n_bytes) — metadata only; payloads never visit the driver.

    ``max_shard_bytes`` (default 4 GiB) is a LOUD per-shard budget:
    each shard's archive is buffered whole in task memory before the
    atomic publish, so at 100 TB a mis-sized ``n_shards`` silently
    turns into multi-GiB task buffers and executor OOMs.  The task
    estimates the buffered archive size (payload bytes plus ~1 KiB
    per-entry container framing) BEFORE building it and raises naming
    the knobs — raise ``n_shards`` (or pass a finer ``shard_col``)
    rather than this limit; stdlib zipfile handles ZIP64 transparently
    but the in-memory buffering is the real bound."""
    if archive not in ("tar", "zip"):
        raise ValueError(f"unknown archive format {archive!r}")
    if max_shard_bytes <= 0:
        raise ValueError("max_shard_bytes must be positive")
    os.makedirs(path, exist_ok=True)
    suffix = "tar" if archive == "tar" else "zip"
    if shard_col is None:
        assigned = entries.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col("key")), F.lit(n_shards))
        )
    else:
        assigned = entries.withColumn(
            "_shard", F.col(shard_col).cast("long")
        )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["_shard"].iloc[0])
        # estimate the BUFFERED archive size, not just payload bytes:
        # per-entry container overhead dominates for small-sample
        # shards (tar: 512-byte header + up-to-511-byte block padding
        # per entry; zip: local header + central-directory entry) — a
        # 4M-entry shard of 100-byte payloads is ~0.4 GB payload but
        # >2 GB of tar framing; long key/ext names count twice (zip
        # stores each name in both the local and central headers, tar
        # spills >100-char names into a pax extension block)
        est_bytes = (
            int(pdf["payload"].map(len).sum())
            + 1024 * len(pdf)
            + 2
            * int(
                (
                    pdf["key"].astype(str).map(len)
                    + pdf["ext"].astype(str).map(len)
                    + 1
                ).sum()
            )
        )
        if est_bytes > max_shard_bytes:
            raise ValueError(
                f"shard {shard_id} holds ~{est_bytes} archive bytes "
                f"({len(pdf)} entries incl. per-entry container "
                f"overhead), over the {max_shard_bytes}-byte per-shard "
                "budget; the archive is buffered whole in task memory "
                "— raise n_shards (or pass a finer shard_col) so "
                "shards shrink, or raise max_shard_bytes only if the "
                "executors have the headroom"
            )
        rows = [
            (str(k), str(e), bytes(p))
            for k, e, p in zip(pdf["key"], pdf["ext"], pdf["payload"])
        ]
        if archive == "tar":
            blob = _deterministic_tar(rows)
        else:
            blob = _deterministic_zip(rows, compress=zip_compress)
        name = f"{prefix}-{shard_id:06d}.{suffix}"
        tmp = os.path.join(path, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(path, name))  # atomic publish
        return pd.DataFrame(
            {
                "shard": [name],
                "n_samples": [pdf["key"].nunique()],
                "n_entries": [len(rows)],
                "n_bytes": [len(blob)],
            }
        )

    # groupBy alone provides the per-shard co-location shuffle — an
    # explicit repartition first would shuffle every payload byte a
    # second time for nothing
    manifest = assigned.groupBy("_shard").applyInPandas(
        write_shard,
        "shard string, n_samples long, n_entries long, n_bytes long",
    )
    return manifest
