"""Multimodal column plumbing: binary media columns with typed metadata.

Images/audio/video are opaque ``binary`` columns + a typed metadata struct;
decode/feature-extraction run as Arrow-batched ``mapInPandas`` stages with
real schemas, partitioning, and batch shapes. TWO codecs decode for real
with pure stdlib + numpy — binary PPM images (incl. concatenated-frame
"video") and RIFF/WAVE PCM-16 audio; compressed formats (JPEG/PNG/MP3/
MP4) are STUBBED (no PIL/cv2/ffmpeg in this container — clearly marked
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
    T.StructField("media_id", T.LongType(), True),   # null = id unparseable
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("decode_ok", T.BooleanType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])

# the UDF-internal schema carries media_id as a STRING: Spark's
# Arrow→pandas conversion of a nullable long column coerces to float64
# whenever a null shares the batch, silently corrupting ids ≥ 2^53
# BEFORE user code runs (round-5 second-pass review find, confirmed by
# repro) — strings round-trip losslessly and extract_media_features
# casts back to long at the boundary
_FEATURE_SCHEMA_RAW = T.StructType(
    [T.StructField("media_id", T.StringType(), True)]
    + FEATURE_SCHEMA.fields[1:]
)


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


def decode_ppm(content: bytes, start_at: int = 0):
    """Parse one binary PPM frame beginning at ``start_at`` → (width,
    height, HxWx3 uint8 array, bytes_consumed_from_start_at). Raises
    ValueError on malformed input.

    The offset parameter (review fix) lets frame iterators walk
    concatenated-frame blobs WITHOUT per-frame ``content[pos:]`` slices —
    the old slicing was O(L²/frame_size) byte copying, a DoS path through
    the never-fail media UDF on blobs of many tiny frames. The pixel
    array is a zero-copy view into ``content`` (``np.frombuffer`` with
    offset/count)."""
    import numpy as np

    if not content.startswith(_PPM_MAGIC, start_at):
        raise ValueError("not a P6 ppm")
    # header = magic, width, height, maxval — whitespace-separated tokens
    pos, fields = start_at + 2, []
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
    if len(content) - pos < n:
        raise ValueError("truncated ppm")
    arr = np.frombuffer(content, dtype=np.uint8, count=n,
                        offset=pos).reshape(h, w, 3)
    return w, h, arr, pos + n - start_at


# --- real codec: WAV (RIFF/PCM-16) — pure stdlib + numpy --------------------------
#
# One genuinely decodable AUDIO format (RIFF header is a fixed struct
# layout; no codec library needed), so the audio modality also runs real
# sample math end-to-end. Compressed audio stays behind the labeled stub.

_RIFF_MAGIC = b"RIFF"


def encode_wav_pcm16(sample_rate: int, channels: int,
                     samples: bytes) -> bytes:
    """Minimal RIFF/WAVE container around raw little-endian int16 PCM
    (``samples`` = interleaved frames as bytes)."""
    import struct

    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels,
                      sample_rate, byte_rate, channels * 2, 16)
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(content: bytes):
    """Parse RIFF/WAVE PCM-16 → (sample_rate, n_channels, int16 array of
    interleaved samples). Raises ValueError on malformed/non-PCM input."""
    import struct

    import numpy as np

    if not content.startswith(_RIFF_MAGIC) or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(content)
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", content, pos)
        pos += 8
        chunk = content[pos:pos + size]
        if cid == b"fmt ":
            if size < 16 or len(chunk) < 16:
                raise ValueError("short fmt chunk")
            fmt_tag, channels, sample_rate, _br, _ba, bits = (
                struct.unpack_from("<HHIIHH", chunk)
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only PCM-16 supported")
            if channels == 0:
                # a zero-channel fmt chunk would divide-by-zero downstream
                raise ValueError("zero channels")
        elif cid == b"data":
            if len(chunk) < size:
                # declared size exceeds available bytes: a truncated blob
                # must flag the row, not pass half the samples off as a
                # clean decode (review fix — the PPM codec already raised
                # for the same defect)
                raise ValueError("truncated data chunk")
            data = chunk
        pos += size + (size & 1)                      # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    usable = len(data) - (len(data) % 2)
    arr = np.frombuffer(data[:usable], dtype="<i2")
    return sample_rate, channels, arr


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize via index maps (real pixel op, no PIL)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def sample_frames(content: bytes, every_k: int = 2) -> list:
    """Frame-sample a 'video' = concatenated PPM frames: decode
    sequentially, keep every k-th frame. Linear in blob size: frames are
    parsed in place via decode_ppm's offset parameter and the kept arrays
    are zero-copy views into ``content`` (no per-frame slicing)."""
    frames, pos = [], 0
    idx = 0
    n = len(content)
    while pos < n and content.startswith(_PPM_MAGIC, pos):
        _w, _h, arr, consumed = decode_ppm(content, pos)
        if idx % every_k == 0:
            frames.append(arr)
        pos += consumed
        idx += 1
    return frames


def decode_media(content: bytes, media_type: str,
                 digest: bytes | None = None) -> dict:
    """Decode a media blob into 8 float features.

    PPM images (and PPM-frame 'videos') decode for REAL: features are
    [width, height, mean_r, mean_g, mean_b, grayscale std, aspect,
    n_frames] from actual pixels. RIFF/WAVE PCM-16 audio also decodes for
    REAL: [sample_rate, channels, n_samples, duration_s, rms, peak, zero
    crossings, 0] from actual samples. Every other format is a STUB — real
    decode requires PIL/cv2/ffmpeg, absent in this container — yielding
    deterministic hash-derived features so downstream plumbing (schema,
    batching, joins, ANN over features) still runs with stable values.
    Swap the stub arm for real decoders on a cluster with codec libs.

    ``decode_ok`` means REAL decode: the stub arm returns features with
    ``decode_ok=False`` so consumers can never mistake hash-noise for
    pixel/sample statistics (self-review fix — the flag previously said
    True for stubs). ``digest`` lets the caller pass an already-computed
    sha256 so stub rows aren't hashed twice.
    """
    import numpy as np

    if not content:
        raise NotImplementedError("empty media content")
    # each codec arm is gated on magic AND a compatible DECLARED type
    # (review fix): a mislabeled blob (media_type='image' wearing RIFF
    # bytes) previously got cross-modal features with decode_ok=True —
    # exactly the mistaken-features confusion the flag exists to prevent.
    # Mismatches fall through to the stub arm with decode_ok=False.
    if content.startswith(_RIFF_MAGIC) and media_type == "audio":
        sr, ch, arr = decode_wav(content)
        x = arr.astype(np.float64) / 32768.0
        n = len(arr)
        zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
        feats = [float(sr), float(ch), float(n),
                 (n / ch) / sr if sr else 0.0,
                 float(np.sqrt((x * x).mean())) if n else 0.0,
                 float(np.abs(x).max()) if n else 0.0,
                 float(zc), 0.0]
        return {"decode_ok": True, "features": feats}
    if content.startswith(_PPM_MAGIC) and media_type in ("image", "video"):
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
    digest = digest or hashlib.sha256(content).digest()
    feats = [
        int.from_bytes(digest[i:i + 4], "little") / 2**32
        for i in range(0, 32, 4)
    ]
    return {"decode_ok": False, "features": feats}


def media_feature_batch(iterator):
    """mapInPandas worker: media rows → feature rows (Arrow-batched).

    Never raises: one malformed blob (a WebP wearing RIFF magic, a garbage
    PPM header, a truncated frame) must flag its own row, not abort the
    Spark task — the same never-fail contract as the extraction kernel."""
    for pdf in iterator:
        out = []
        for mid, mtype, content in zip(
            pdf["media_id"], pdf["media_type"], pdf["content"]
        ):
            # the try covers ROW ASSEMBLY too (review fix): a null
            # media_id arriving as NaN made int(mid) raise OUTSIDE the old
            # decode-only try, aborting the task — the exact failure the
            # never-fail contract forbids
            try:
                raw = bytes(content) if content is not None else b""
                dg = hashlib.sha256(raw).digest() if raw else b""
                try:
                    dec = decode_media(raw, mtype, digest=dg)
                    ok, feats = dec["decode_ok"], dec["features"]
                except Exception:
                    ok, feats = False, None
                # media_id rides as the STRING it arrived as (see
                # _FEATURE_SCHEMA_RAW: the long→float64 Arrow/pandas
                # coercion corrupts ≥2^53 ids before this code runs);
                # str(int(...)) both validates and canonicalizes it
                row = (str(int(mid)), str(mtype), len(raw),
                       dg.hex() if dg else "", ok, feats)
            except Exception:
                # NULL media_id, not a shared -1 sentinel: multiple bad
                # rows collapsing onto one key would conflate unrelated
                # flagged rows under any downstream groupBy/join/dedup on
                # media_id (round-4 ADVICE); nulls drop out of equi-joins
                # and are an explicit "id unknown" for group-bys to filter
                row = (None, str(mtype) if mtype is not None else "",
                       0, "", False, None)
            out.append(row)
        yield pd.DataFrame(
            out, columns=["media_id", "media_type", "n_bytes",
                          "content_hash", "decode_ok", "features"],
        )


def extract_media_features(media: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """media table → feature table; binary column dropped in the output
    (same pruning discipline as the html column in the extraction job).

    media_id crosses the UDF boundary as a STRING both ways (cast here,
    cast back below): Spark's Arrow→pandas conversion would otherwise
    hand the worker a float64 column whenever a null id shares a batch,
    corrupting valid ids ≥ 2^53 before user code could intervene."""
    df = media.select(
        F.col("media_id").cast("string").alias("media_id"),
        "media_type", "content",
    )
    if num_partitions:
        df = df.repartition(num_partitions, F.col("media_id"))
    out = df.mapInPandas(media_feature_batch, schema=_FEATURE_SCHEMA_RAW)
    return out.withColumn("media_id", F.col("media_id").cast("long"))


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
