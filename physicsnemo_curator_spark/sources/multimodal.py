"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface: binary payloads ride through the pipeline as
``BINARY`` columns with a typed metadata struct; decode / feature
extraction run as Arrow-batched ``mapInPandas`` UDFs.  The actual codec
libraries (PIL/ffmpeg/torchaudio) are not in this container, so the
decode kernel is import-gated: with no codec available it either raises
``NotImplementedError`` (strict) or produces a deterministic fake
feature vector (plumbing mode) — the Spark-side schema, batching and
partitioning are real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<double>"


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content)
    — the ``binaryFile`` reader is the scan half of every custom-format
    source (reference VTK/d3plot readers parse per file the same way)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def synthetic_media(spark: SparkSession, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    def gen(ids):
        rows = []
        for i in ids:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
            rows.append(
                (i, ["image", "audio", "video"][i % 3], payload, 16, 16, len(payload))
            )
        return rows

    return spark.createDataFrame(gen(range(n)), MEDIA_SCHEMA)


def extract_features(media: DataFrame, *, dim: int = 8, strict: bool = False) -> DataFrame:
    """Decode + featurize each payload via Arrow-batched mapInPandas.

    With a codec installed this is where PIL/ffmpeg decode runs; without
    one, strict=True raises NotImplementedError (the honest stub) and
    strict=False emits a deterministic digest-derived vector so the
    distributed plumbing (schema, batch shape, partitioning) is testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict and not HAS_PIL:
                raise NotImplementedError(
                    "no media codec installed in this environment; "
                    "install PIL/ffmpeg or run with strict=False"
                )
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [b / 255.0 for b in digest[:dim]]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_summary(features: DataFrame) -> DataFrame:
    """Per-kind accounting of payload volume — the scan-side projection
    is pure column math, no Python."""
    return features.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg(F.element_at("feature", 1)).alias("avg_f0"),
    )
