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


# --- real codec: binary PPM (P6) — pure stdlib + numpy ---------------------------
#
# One genuinely decodable image format so the decode → feature-extract →
# resize → frame-sample plumbing runs REAL pixel math end-to-end in this
# container; JPEG/PNG/audio/video codecs remain behind the labeled stub
# below (no PIL/cv2/ffmpeg here).

_PPM_MAGIC = b"P6"


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Solid-color binary PPM (the deterministic synthetic image)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def decode_ppm(content: bytes):
    """Parse one binary PPM frame → (width, height, HxWx3 uint8 array,
    bytes_consumed). Raises ValueError on malformed input."""
    import numpy as np

    if not content.startswith(_PPM_MAGIC):
        raise ValueError("not a P6 ppm")
    # header = magic, width, height, maxval — whitespace-separated tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos:pos + 1].isspace():
            pos += 1
        if content[pos:pos + 1] == b"#":              # comment line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1                                          # single ws after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported ppm")
    n = w * h * 3
    raw = content[pos:pos + n]
    if len(raw) < n:
        raise ValueError("truncated ppm")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return w, h, arr, pos + n


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize via index maps (real pixel op, no PIL)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def sample_frames(content: bytes, every_k: int = 2) -> list:
    """Frame-sample a 'video' = concatenated PPM frames: decode
    sequentially, keep every k-th frame (real parsing, bounded work)."""
    frames, pos = [], 0
    idx = 0
    while pos < len(content) and content[pos:pos + 2] == _PPM_MAGIC:
        w, h, arr, consumed = decode_ppm(content[pos:])
        if idx % every_k == 0:
            frames.append(arr)
        pos += consumed
        idx += 1
    return frames


def decode_media(content: bytes, media_type: str) -> dict:
    """Decode a media blob into 8 float features.

    PPM images (and PPM-frame 'videos') decode for REAL: features are
    [width, height, mean_r, mean_g, mean_b, grayscale std, aspect,
    n_frames] from actual pixels. Every other format is a STUB — real
    decode requires PIL/cv2/ffmpeg, absent in this container — yielding
    deterministic hash-derived features so downstream plumbing (schema,
    batching, joins, ANN over features) still runs with stable values.
    Swap the stub arm for real decoders on a cluster with codec libs.
    """
    import numpy as np

    if not content:
        raise NotImplementedError("empty media content")
    if content.startswith(_PPM_MAGIC):
        if media_type == "video":
            frames = sample_frames(content, every_k=1)
            arr, n_frames = frames[0], len(frames)
        else:
            _w, _h, arr, _ = decode_ppm(content)
            n_frames = 1
        h, w = arr.shape[:2]
        means = arr.reshape(-1, 3).mean(axis=0)
        gray = arr.astype(np.float64).mean(axis=2)
        feats = [float(w), float(h), float(means[0]), float(means[1]),
                 float(means[2]), float(gray.std()), float(w) / float(h),
                 float(n_frames)]
        return {"decode_ok": True, "features": feats}
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
