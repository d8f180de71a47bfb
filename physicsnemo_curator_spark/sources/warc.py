"""WARC / WET reader — Common Crawl's on-disk format (ISO 28500).

The 100 TB text-curation path starts from web crawl archives: Common
Crawl ships ~90k gzip'd WET files per snapshot, each a concatenation
of WARC records (``WARC/1.0`` header block + payload) holding one
extracted-text document per ``conversion`` record.  The format is a
small public spec, so this module parses it with stdlib ``gzip`` +
bytes only (no warcio), and writes fixture/export files the same way.

Spark-side, :func:`read_wet` scans a file list task-per-file via
``mapInPandas`` into the engine's ``documents``-shaped schema
``(doc_id, text, lang, source, n_chars)`` — so the whole curation
family (span dedup, MinHash/SimHash/semantic dedup, quality, mixing,
chunking, packing) composes directly on crawl input.  The archive's
own file granularity (~150 MB gzip per WET) is the right task size;
the driver ships only paths.

Record layout (ISO 28500 / WARC 1.0): ``WARC/1.0\\r\\n`` then
``Name: value`` header lines, a blank line, ``Content-Length`` bytes
of payload, and ``\\r\\n\\r\\n``.  Mandatory headers: WARC-Type,
WARC-Record-ID, WARC-Date, Content-Length; WET conversion records add
WARC-Target-URI and WARC-Refers-To.
"""

from __future__ import annotations

import gzip
import io
from typing import Any

_CRLF = b"\r\n"


def write_wet(
    path: str,
    records: list[dict[str, Any]],
    *,
    compress: bool = True,
    warcinfo: str = "software: physicsnemo-curator-spark",
) -> None:
    """Write a WET file: one ``warcinfo`` record then one
    ``conversion`` record per entry (``uri``, ``text``, optional
    ``date``, ``record_id``).  Output opens with any WARC reader."""
    out = io.BytesIO()

    def _record(rtype: str, headers: dict[str, str], payload: bytes) -> None:
        out.write(b"WARC/1.0" + _CRLF)
        base = {"WARC-Type": rtype, **headers, "Content-Length": str(len(payload))}
        for k, v in base.items():
            out.write(f"{k}: {v}".encode() + _CRLF)
        out.write(_CRLF)
        out.write(payload)
        out.write(_CRLF + _CRLF)

    _record(
        "warcinfo",
        {
            "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "Content-Type": "application/warc-fields",
        },
        warcinfo.encode(),
    )
    for i, r in enumerate(records):
        _record(
            "conversion",
            {
                "WARC-Record-ID": r.get(
                    "record_id", f"<urn:uuid:{i:08d}-0000-0000-0000-000000000000>"
                ),
                "WARC-Date": r.get("date", "2024-01-01T00:00:00Z"),
                "WARC-Target-URI": r["uri"],
                "Content-Type": "text/plain",
            },
            r["text"].encode("utf-8"),
        )
    raw = out.getvalue()
    with open(path, "wb") as fh:
        fh.write(gzip.compress(raw) if compress else raw)


def parse_warc(data: bytes) -> list[dict[str, Any]]:
    """Parse raw (already-decompressed) WARC bytes into records:
    ``{"type", "headers", "payload"}``.  Content-Length-driven, so
    payloads containing blank lines or ``WARC/1.0`` text can't confuse
    the scanner."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC record at byte {pos}")
        hdr_end = data.index(_CRLF + _CRLF, pos)
        lines = data[pos:hdr_end].split(_CRLF)
        headers: dict[str, str] = {}
        lower: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip()] = v.strip()
            lower[k.strip().lower()] = v.strip()
        # ISO 28500 header field names are case-insensitive
        clen = int(lower["content-length"])
        body_start = hdr_end + 4
        payload = data[body_start : body_start + clen]
        records.append(
            {
                "type": lower.get("warc-type", ""),
                "headers": headers,
                "lower": lower,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return records


def read_wet_file(path: str) -> list[dict[str, Any]]:
    """Decode one WET file (gzip or plain) into conversion documents:
    ``{"uri", "date", "text"}``."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    docs = []
    for r in parse_warc(raw):
        if r["type"] != "conversion":
            continue
        docs.append(
            {
                "uri": r["lower"].get("warc-target-uri", ""),
                "date": r["lower"].get("warc-date", ""),
                "text": r["payload"].decode("utf-8", "replace"),
            }
        )
    return docs


def read_wet(spark, paths: list[str], *, lang_id: bool = True, keep_uri: bool = False):
    """Task-per-file Spark scan over WET files into the engine's
    ``documents`` schema ``(doc_id, text, lang, source, n_chars)``.

    ``doc_id`` is ``xxhash64(uri, date)`` — stable across re-scans and
    partition layouts, so downstream dedup stores and split assignment
    key on it safely.  ``keep_uri=True`` retains the raw target URI as
    a ``uri`` column — URL-level incremental dedup (the Bloom-store
    workflow) keys on the URI itself, which the hashed doc_id cannot
    recover.  ``lang`` comes from the engine's n-gram
    heuristic (``textops.lang_id``) applied as a column expression
    AFTER the scan (``lang_id=False`` skips it); ``source`` is the
    target URI's host.  At crawl scale the file list is the only
    driver-side state; ~90k files fan out as ~90k tasks.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    inv = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")
    inv = inv.repartition(max(1, len(paths)))

    def _scan(pdfs):
        for pdf in pdfs:
            for path in pdf["path"]:
                docs = read_wet_file(path)
                if docs:
                    yield pd.DataFrame(docs)

    long = inv.mapInPandas(_scan, "uri string, date string, text string")
    # scheme and host are case-insensitive (RFC 3986): match any-case
    # scheme and lowercase the host so one site is one source group
    host = F.lower(F.regexp_extract("uri", r"(?i)^[a-z][a-z0-9+.-]*://([^/]+)", 1))
    out = long.select(
        F.xxhash64("uri", "date").alias("doc_id"),
        "text",
        host.alias("source"),
        F.length("text").alias("n_chars"),
        "uri",
    )
    if lang_id:
        from physicsnemo_curator_spark.operators import textops

        out = out.withColumn("lang", textops.lang_id(F.col("text")))
    else:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    if keep_uri:
        cols.append("uri")
    return out.select(*cols)
