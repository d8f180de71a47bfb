#!/usr/bin/env python
"""Web-curation example: raw HTML pages to a tokenized training set.

The full crawl-side stack added around the text family, end to end:

    synthetic HTML pages (one per document, with scripts, comments,
    nav anchors, tracking-parameter URLs)
      → robots.txt politeness filter (RFC 9309 longest-match,
        broadcast robots join)
      → URL normalization (dedup keys: lowercase authority, default
        ports, utm/gclid stripping) + host/domain split
      → HTML text extraction (whole-stage-codegen regexp chain:
        script/style/comment removal, entities, link density)
      → boilerplate gate (link-heavy pages dropped)
      → Unicode normalization (invisible strip + NFC — composed and
        decomposed spellings get one dedup key)
      → exact dedup on the normalized text
      → BPE tokenizer training over the surviving corpus +
        encoding to token arrays
      → WebDataset tar shard export (byte-reproducible archives).

Usage: python examples/curate_web.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.operators.bpe import (  # noqa: E402
    bpe_tokenize,
    train_bpe,
)
from physicsnemo_curator_spark.operators.textops import (  # noqa: E402
    normalize_text,
)
from physicsnemo_curator_spark.operators.webtext import (  # noqa: E402
    extract_web_text,
    filter_robots,
    with_normalized_urls,
)
from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.sources import webdataset as wds  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pcs_curate_web"
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    spark = get_spark(app_name="pcs-curate-web", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # ---- synthetic crawl: one page per document; every 7th page is
    # a link-farm, every 5th URL points at a disallowed path
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Site"),
            (F.col("doc_id") % 6).cast("string"),
            F.lit(".Example.COM:80"),
            F.when(F.col("doc_id") % 5 == 0, "/private/p")
            .otherwise("/articles/a"),
            F.lit("?utm_source=feed&id="),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit("<body><ul>"),
                F.lit('<li><a href="/1">one</a></li>' * 12),
                F.lit("</ul><p>tiny</p></body>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(
                    "<html><head><title>Page</title><script>nav()"
                    "</script></head><body><p>"
                ),
                F.regexp_replace("text", "[<>&]", ""),
                F.lit('</p><a href="/next">next</a></body></html>'),
            )
        )
        .alias("html"),
    )

    # ---- politeness: every host disallows /private
    robots = spark.createDataFrame(
        [(f"site{i}.example.com", "User-agent: *\nDisallow: /private\n")
         for i in range(6)],
        "host string, robots_txt string",
    )
    polite = filter_robots(
        with_normalized_urls(pages), robots, url_col="url_norm"
    )
    n_polite = polite.count()
    print(f"robots filter: {n_docs} pages -> {n_polite} allowed")

    # ---- extract + boilerplate gate + unicode canonicalization
    extracted = extract_web_text(polite, html_col="html")
    prose = extracted.filter(F.col("link_density") < 0.5)
    n_prose = prose.count()
    print(f"boilerplate gate: {n_polite} -> {n_prose} prose pages")
    canon = normalize_text(prose, text_col="text")

    # ---- exact dedup on the canonical text
    uniq = canon.dropDuplicates(["text_norm"])
    print(f"exact dedup: {n_prose} -> {uniq.count()} unique")

    # ---- tokenizer: train BPE on the survivors, encode them
    sample = uniq.select(
        "doc_id", F.substring("text_norm", 1, 200).alias("text")
    )
    merges = train_bpe(sample, n_merges=8)
    print(
        "bpe merges:",
        " ".join(f"{m['a']}+{m['b']}" for m in merges[:5]),
        f"... corpus {merges[-1]['n_tokens']} tokens",
    )
    encoded = bpe_tokenize(sample, merges)

    # ---- export as WebDataset shards
    entries = encoded.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        F.lit("txt").alias("ext"),
        F.col("text").cast("binary").alias("payload"),
    ).unionByName(
        encoded.select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
            F.lit("tok").alias("ext"),
            F.to_json(F.struct("tokens")).cast("binary").alias("payload"),
        )
    )
    shard_dir = os.path.join(work, "shards")
    manifest = wds.write_webdataset(entries, shard_dir, n_shards=4)
    total = sum(r["n_entries"] for r in manifest.collect())
    back = wds.read_webdataset(spark, shard_dir).count()
    assert back == total
    print(f"webdataset export: {total} entries across 4 shards, "
          f"round-trip verified")
    spark.stop()


if __name__ == "__main__":
    main()
