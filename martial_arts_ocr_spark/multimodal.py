"""Multimodal column plumbing: binary media columns with typed metadata.

Images/audio/video are opaque ``binary`` columns + a typed metadata struct;
decode/feature-extraction run as Arrow-batched ``mapInPandas`` stages with
real schemas, partitioning, and batch shapes. The actual codec step is
STUBBED (no image/audio libraries in this container — clearly marked
below); everything Spark-side is real and tested.

The reference analogue is the image-region crop/extract path
(``/root/reference/src/martial_arts_ocr/pipeline/extraction_service.py:
44-144`` + ``utils/image/ops/extract.py``): regions of a binary raster →
typed records; here media bytes → typed feature rows.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("decode_ok", T.BooleanType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def decode_media(content: bytes, media_type: str) -> dict:
    """STUB — real decode requires PIL/cv2/ffmpeg, absent in this container.

    Deterministic fake: 8 float features derived from a content hash, so
    the downstream plumbing (schema, batching, joins, ANN over features)
    is exercised with stable values. Swap this function for the real
    decoder on a cluster with codec libraries installed.
    """
    if not content:
        raise NotImplementedError("empty media content")
    digest = hashlib.sha256(content).digest()
    feats = [
        int.from_bytes(digest[i:i + 4], "little") / 2**32
        for i in range(0, 32, 4)
    ]
    return {"decode_ok": True, "features": feats}


def media_feature_batch(iterator):
    """mapInPandas worker: media rows → feature rows (Arrow-batched)."""
    for pdf in iterator:
        out = []
        for mid, mtype, content in zip(
            pdf["media_id"], pdf["media_type"], pdf["content"]
        ):
            raw = bytes(content) if content is not None else b""
            h = hashlib.sha256(raw).hexdigest() if raw else ""
            try:
                dec = decode_media(raw, mtype)
                ok, feats = dec["decode_ok"], dec["features"]
            except NotImplementedError:
                ok, feats = False, None
            out.append((int(mid), mtype, len(raw), h, ok, feats))
        yield pd.DataFrame(
            out, columns=["media_id", "media_type", "n_bytes",
                          "content_hash", "decode_ok", "features"],
        )


def extract_media_features(media: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """media table → feature table; binary column dropped in the output
    (same pruning discipline as the html column in the extraction job)."""
    df = media.select("media_id", "media_type", "content")
    if num_partitions:
        df = df.repartition(num_partitions, F.col("media_id"))
    return df.mapInPandas(media_feature_batch, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (seeded bytes)."""
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append((
            i, f"https://media.example.com/{i}", mtype,
            bytearray(content),
            {"mime": f"{mtype}/x-fake", "width": 64 if mtype == "image" else None,
             "height": 64 if mtype == "image" else None,
             "duration_ms": 1000 * i if mtype != "image" else None},
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
