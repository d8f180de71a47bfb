"""WARC/WET codec + Spark scan tests (ISO 28500, Common Crawl WET)."""

from __future__ import annotations

import gzip

import pytest

from physicsnemo_curator_spark.sources.warc import (
    parse_warc,
    read_wet,
    read_wet_file,
    write_wet,
)

DOCS = [
    {"uri": "https://example.com/a", "text": "the quick brown fox\njumps"},
    {
        "uri": "https://example.org/b",
        "text": "WARC/1.0\r\n\r\nlooks like a record but is payload",
    },
    {"uri": "https://example.com/c", "text": "unicode éè 中文"},
]


def test_wet_round_trip_gzip_and_plain(tmp_path):
    for compress in (True, False):
        p = str(tmp_path / f"f{compress}.warc.wet.gz")
        write_wet(p, DOCS, compress=compress)
        docs = read_wet_file(p)
        assert [d["uri"] for d in docs] == [d["uri"] for d in DOCS]
        # Content-Length framing survives payloads containing CRLFs and
        # literal "WARC/1.0" text
        assert [d["text"] for d in docs] == [d["text"] for d in DOCS]


def test_parse_warc_record_structure(tmp_path):
    p = str(tmp_path / "f.wet.gz")
    write_wet(p, DOCS)
    with open(p, "rb") as fh:
        raw = gzip.decompress(fh.read())
    recs = parse_warc(raw)
    assert [r["type"] for r in recs] == ["warcinfo"] + ["conversion"] * 3
    assert recs[1]["headers"]["WARC-Target-URI"] == "https://example.com/a"
    assert int(recs[1]["headers"]["Content-Length"]) == len(recs[1]["payload"])
    with pytest.raises(ValueError, match="malformed"):
        parse_warc(b"NOT A WARC")


def test_read_wet_spark_scan(spark, tmp_path):
    p1 = str(tmp_path / "shard1.warc.wet.gz")
    p2 = str(tmp_path / "shard2.warc.wet.gz")
    write_wet(p1, DOCS[:2])
    write_wet(p2, DOCS[2:])
    df = read_wet(spark, [p1, p2])
    rows = {r["source"]: r for r in df.collect()}
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert len(rows) >= 2 and "example.org" in rows
    assert rows["example.org"]["n_chars"] == len(DOCS[1]["text"])
    # doc_id is stable across re-scans (hash of uri+date, not position)
    again = {r["source"]: r["doc_id"] for r in read_wet(spark, [p2, p1]).collect()}
    for k, r in rows.items():
        assert again[k] == r["doc_id"]


def test_read_wet_feeds_curation_ops(spark, tmp_path):
    """The scan output is documents-shaped: the dedup family runs on it
    unchanged."""
    from physicsnemo_curator_spark.operators import dedup

    p = str(tmp_path / "s.warc.wet.gz")
    write_wet(p, DOCS + [{"uri": "https://dup.com/x", "text": DOCS[0]["text"]}])
    df = read_wet(spark, [p], lang_id=False)
    groups = dedup.exact_duplicates(df).collect()
    assert any(r["group_size"] == 2 for r in groups)


def test_parse_warc_case_insensitive_headers():
    """ISO 28500 header names are case-insensitive; odd-cased but valid
    records must parse, and their documents must survive the scan."""
    body = b"hello world"
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: conversion\r\n"
        b"WARC-RECORD-ID: <urn:uuid:1>\r\n"
        b"warc-target-uri: HTTP://Example.COM/x\r\n"
        b"content-length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    (rec,) = parse_warc(raw)
    assert rec["type"] == "conversion"
    assert int(rec["lower"]["content-length"]) == len(body)


def test_read_wet_host_normalization(spark, tmp_path):
    """Uppercase scheme/host map to one lowercase source group."""
    p = str(tmp_path / "h.wet.gz")
    write_wet(
        p,
        [
            {"uri": "HTTP://Example.COM/a", "text": "x"},
            {"uri": "http://example.com/b", "text": "y"},
        ],
    )
    df = read_wet(spark, [p], lang_id=False)
    rows = df.select("source").distinct().collect()
    assert [r["source"] for r in rows] == ["example.com"]
