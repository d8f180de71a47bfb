"""Multimodal plumbing: binary payload columns, Arrow-batched feature
extraction, strict-stub behavior (north star; codecs absent here)."""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.sources import multimodal as mm


def test_feature_extraction_plumbing(spark):
    media = mm.synthetic_media(spark, n=24)
    feats = mm.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 24
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_media_summary_counts(spark):
    media = mm.synthetic_media(spark, n=24)
    summary = {r["kind"]: r["n_items"] for r in mm.media_summary(mm.extract_features(media)).collect()}
    assert summary == {"image": 8, "audio": 8, "video": 8}


@pytest.mark.skipif(mm.HAS_PIL, reason="codec installed; strict path decodes")
def test_strict_stub_raises_without_codec(spark):
    media = mm.synthetic_media(spark, n=4)
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_binary_file_reader(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"blob_{i}.bin").write_bytes(bytes([i]) * 100)
    df = mm.read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = df.select("length").collect()
    assert [r["length"] for r in rows] == [100, 100, 100]
