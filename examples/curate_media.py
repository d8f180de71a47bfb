#!/usr/bin/env python
"""Media-curation example: the multimodal codec pack end-to-end.

Builds a small mixed media lake from the ``documents`` fixture using
the repo's REAL encoders — JPEG images (baseline + 12-bit), PNG,
WAV / IMA-ADPCM / FLAC audio, and videos in all three container
families (AVI MJPEG + uncompressed DIB, ISO BMFF MP4 'raw ',
Matroska lossless V_MJPEG) — then curates it the way a
training-data pipeline would:

    binary payloads
      → strict feature extraction (every payload decoded for real:
        pixel stats for images, sample-rate/RMS/ZCR for audio)
      → image resize to a training resolution (decode → gather →
        re-encode, 12-bit depth preserved)
      → video frame sampling (container parse, every-Nth frame,
        skipped frames never entropy-decoded)
      → exact frame-level dedup (hash-agg on decoded frame bytes)
      → per-kind summary.

Every stage is an Arrow-batched mapInPandas kernel over an opaque
binary column + typed metadata — the schema/partitioning story that
scales to a real media lake: one task per payload batch, throughput
∝ file count.

Usage: python examples/curate_media.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from physicsnemo_curator_spark.session import get_spark  # noqa: E402
from physicsnemo_curator_spark.operators import imagehash  # noqa: E402
from physicsnemo_curator_spark.sources import probe  # noqa: E402
from physicsnemo_curator_spark.sources import (  # noqa: E402
    avi,
    bmp,
    flac,
    gif,
    jpeg,
    mkv,
    mp4,
    png,
    tiff,
    wav,
)
from physicsnemo_curator_spark.sources import multimodal as mm  # noqa: E402
from physicsnemo_curator_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pcs_curate_media"
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    spark = get_spark(app_name="pcs-curate-media", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "n_chars")
        .filter("doc_id < 60")
    )

    # ---- build the media lake executor-side: deterministic payloads
    # through the real encoders (one mapInPandas batch per partition)
    def build(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                h = hashlib.md5(text.encode()).hexdigest()
                img = np.frombuffer(
                    h.encode(), dtype=np.uint8
                ).reshape(4, 8)
                k = int(doc_id) % 12
                if k == 0:
                    payload = jpeg.encode_jpeg(img, quality=90)
                    kind, w, hh = "image", 8, 4
                elif k == 1:
                    payload = png.encode_png(img)
                    kind, w, hh = "image", 8, 4
                elif k == 2:
                    sig = np.sin(np.arange(400 + n_chars % 300) / 9.0)
                    payload = wav.encode_wav(sig, 8000)
                    kind, w, hh = "audio", None, None
                elif k == 3:
                    sig = np.sin(np.arange(400 + n_chars % 300) / 9.0)
                    payload = flac.encode_flac(sig, 8000)
                    kind, w, hh = "audio", None, None
                elif k == 4:
                    frames = [img, img, 255 - img, img]  # dup frames!
                    payload = avi.encode_avi(frames, fps=8, codec="raw")
                    kind, w, hh = "video", None, None
                elif k == 5:
                    frames = [img, 255 - img]
                    payload = avi.encode_avi(
                        frames, fps=8, codec="mjpeg", quality=90
                    )
                    kind, w, hh = "video", None, None
                elif k == 6:
                    frames = [img, 255 - img, img]
                    payload = mp4.encode_mp4(frames, fps=8, codec="raw")
                    kind, w, hh = "video", None, None
                elif k == 7:
                    frames = [img, 255 - img]
                    payload = mkv.encode_mkv(
                        frames, fps=8, codec="mjpeg_lossless"
                    )
                    kind, w, hh = "video", None, None
                elif k == 8:
                    payload = bmp.encode_bmp(img)
                    kind, w, hh = "image", 8, 4
                elif k == 9:
                    payload = tiff.encode_tiff(img, compression="lzw")
                    kind, w, hh = "image", 8, 4
                elif k == 10:
                    # animated GIF rides the video-container dispatch
                    payload = gif.encode_gif([img, 255 - img], delay_cs=12)
                    kind, w, hh = "video", None, None
                else:
                    # crawled DASH/HLS video: a fragmented-MP4 init
                    # segment + separately-"downloaded" media segments,
                    # reassembled (sequence renumbering included) into
                    # one parseable stream before it enters the lake
                    stream = mp4.encode_fmp4(
                        [img, 255 - img, img],
                        fps=8,
                        codec="raw",
                        samples_per_fragment=2,
                    )
                    spans = list(
                        mp4._walk_boxes_spans(stream, 0, len(stream))
                    )
                    init_end = next(
                        e for f, _s, _b, e in spans if f == b"moov"
                    )
                    seg_starts = [s for f, s, _b, _e in spans
                                  if f == b"styp"]
                    segs = [
                        stream[a:b]
                        for a, b in zip(
                            seg_starts, seg_starts[1:] + [len(stream)]
                        )
                    ]
                    payload = mp4.assemble_fmp4_segments(
                        stream[:init_end], segs
                    )
                    kind, w, hh = "video", None, None
                rows.append(
                    (int(doc_id), kind, payload, w, hh, len(payload))
                )
                if k == 1:
                    # plant a cross-format twin: the SAME pixels as a
                    # BMP — the perceptual near-dup sweep must pair it
                    # with the PNG row (both lossless -> hamming 0)
                    twin = bmp.encode_bmp(img)
                    rows.append(
                        (
                            int(doc_id) + 1_000_000, "image", twin,
                            8, 4, len(twin),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "n_bytes",
                ],
            )

    media = docs.mapInPandas(build, mm.MEDIA_SCHEMA).cache()
    counts = {
        r["kind"]: r["n"]
        for r in media.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    print(f"media lake: {counts}")

    # ---- header-only probe first: format census without a single
    # decode (the cheap routing pass a 100 TB lake runs before
    # scheduling any expensive work)
    census = (
        probe.with_media_probe(media)
        .groupBy("format")
        .agg(F.count("*").alias("n"))
        .orderBy("format")
        .collect()
    )
    print(
        "probe census: "
        + ", ".join(f"{r['format']}={r['n']}" for r in census)
    )

    # ---- strict feature extraction: every payload REALLY decoded
    feats = mm.extract_features(media, dim=8, strict=True)
    summary = (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.element_at("feature", 4)), 4).alias("f4_mean"),
        )
        .orderBy("kind")
        .collect()
    )
    for r in summary:
        print(f"features[{r['kind']}]: n={r['n']} mean(f4)={r['f4_mean']}")

    # ---- resize the images to a training resolution
    images = media.filter("kind = 'image'")
    resized = mm.resize_images(images, width=4, height=4, strict=True)
    n_resized = resized.count()
    print(f"resized {n_resized} images to 4x4")

    # ---- explode videos into sampled frames, dedup exact frames
    frames = mm.sample_frames(media, every_n=1)
    n_frames = frames.count()
    uniq = (
        frames.select(F.md5("payload").alias("frame_hash"))
        .agg(F.countDistinct("frame_hash").alias("u"))
        .collect()[0]["u"]
    )
    print(f"video frames: {n_frames} total, {uniq} unique after dedup")

    # ---- perceptual near-dup sweep through the shared banded
    # hamming join: every planted PNG/BMP twin (same pixels, two
    # formats) must pair at hamming 0; the doc-unique videos must NOT
    # pair each other
    img_pairs = imagehash.image_near_duplicates(
        images, method="phash", max_hamming=3, n_bands=4
    )
    n_twins = images.filter("media_id >= 1000000").count()
    n_img_pairs = img_pairs.count()
    vid_pairs = imagehash.video_near_duplicates(
        media.filter("kind = 'video'"), max_hamming=3, n_bands=4
    )
    print(
        f"near-dup sweep: {n_img_pairs} image pairs "
        f"(>= {n_twins} planted cross-format twins), "
        f"{vid_pairs.count()} video pairs among unique videos"
    )
    assert n_img_pairs >= n_twins

    # ---- stamp provenance metadata into every container that can
    # carry it (PNG tEXt, JPEG EXIF+COM, WAV INFO, FLAC
    # VORBIS_COMMENT, ...) and read it back through the unified
    # operator — corrupt/untaggable payloads pass through untouched
    stamped = mm.stamp_media_tags(
        media, {"software": "pcs-curate", "comment": "curated"}
    )
    tagged = mm.with_media_tags(stamped)
    n_tagged = tagged.filter("tag_software = 'pcs-curate'").count()
    print(f"provenance stamped into {n_tagged} payloads")
    assert n_tagged > 0

    # ---- export the curated lake as WebDataset tar shards: one
    # byte-reproducible archive per task, sample key = media_id
    from physicsnemo_curator_spark.sources import webdataset as wds

    entries = stamped.select(
        F.lpad(F.col("media_id").cast("string"), 8, "0").alias("key"),
        F.col("kind").alias("ext"),
        "payload",
    )
    shard_dir = os.path.join(work, "shards")
    manifest = wds.write_webdataset(entries, shard_dir, n_shards=4)
    for r in manifest.orderBy("shard").collect():
        print(
            f"shard {r['shard']}: {r['n_samples']} samples, "
            f"{r['n_bytes']} bytes"
        )
    back = wds.read_webdataset(spark, shard_dir)
    assert back.count() == stamped.count()
    print(f"webdataset round trip: {back.count()} entries")

    out = os.path.join(work, "curated")
    feats.write.mode("overwrite").partitionBy("kind").parquet(out)
    print(f"curated features written to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
