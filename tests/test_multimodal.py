"""Multimodal plumbing: real Spark schema/batching, stubbed codec."""

from martial_arts_ocr_spark.multimodal import (
    extract_media_features,
    synth_media,
)


def test_media_features_roundtrip(spark):
    media = synth_media(spark, 30)
    feats = extract_media_features(media, num_partitions=2)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    assert all(r.decode_ok for r in rows.values())
    assert all(len(r.features) == 8 for r in rows.values())
    assert "content" not in feats.columns          # binary pruned

    # determinism: same content → same features
    feats2 = {r.media_id: r.features
              for r in extract_media_features(media, num_partitions=4).collect()}
    assert {k: v.features for k, v in rows.items()} == feats2


def test_media_empty_content_flagged(spark):
    media = synth_media(spark, 3).limit(3)
    import pyspark.sql.functions as F

    nulled = media.withColumn(
        "content",
        F.when(F.col("media_id") == 0, F.lit(None)).otherwise(F.col("content")),
    )
    rows = {r.media_id: r for r in
            extract_media_features(nulled).collect()}
    assert rows[0].decode_ok is False
    assert rows[0].features is None
    assert rows[1].decode_ok is True
