"""Multimodal queries over real (PPM) pixel decoding, oracle-checked.

The media table is synthesized ON EXECUTORS from `documents` doc_ids
(solid-color PPM images whose size/color are doc_id arithmetic), decoded
back by the REAL codec path (multimodal.decode_ppm — actual pixel math),
so width/height/channel means are exact SQL. Same encode→decode roundtrip
discipline as extract_roundtrip: the generator and the decoder being
inverse IS the check.

Reference analogue: the crop/extract media path
(``/root/reference/src/martial_arts_ocr/pipeline/extraction_service.py:
44-144``) — binary raster in, typed records out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from martial_arts_ocr_spark.queries.tables import base_table

from ..multimodal import decode_media, encode_ppm


def _synth_media(spark, sf_dir: str, make_content):
    """Shared synthesis scaffold for the three media modalities: documents
    scan -> doc_id -> repartition(8, doc_id) -> mapInPandas emitting
    (media_id, content) with content = make_content(doc_id). One copy of
    the plumbing (partitioning, schema, batch loop) so a layout change
    cannot be applied to one modality and silently missed on another
    (round-4 review: this existed as three diverging copies)."""
    d = base_table(spark, sf_dir, "documents").select("doc_id")

    def gen(iterator):
        for pdf in iterator:
            rows = [(int(did), make_content(int(did))) for did in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return d.repartition(8, "doc_id").mapInPandas(
        gen, "media_id long, content binary"
    )


def _media_from_documents(spark, sf_dir: str):
    def image(did):
        w, h = 16 + did % 16, 8 + did % 8
        rgb = ((did * 7) % 256, (did * 13) % 256, (did * 29) % 256)
        return encode_ppm(w, h, rgb)

    return _synth_media(spark, sf_dir, image)


def q_media_features(spark, sf_dir):
    """PPM decode → per-image features; binary pruned after the UDF (the
    html-column discipline). Solid-color synthesis makes every feature
    integer-exact in SQL."""
    media = _media_from_documents(spark, sf_dir)

    def feats(iterator):
        for pdf in iterator:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                dec = decode_media(bytes(content), "image")
                f = dec["features"]
                rows.append((int(mid), int(f[0]), int(f[1]),
                             round(f[2], 4), round(f[3], 4), round(f[4], 4)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
            ])

    return media.mapInPandas(
        feats,
        "media_id long, width long, height long, mean_r double, "
        "mean_g double, mean_b double",
    ).orderBy("media_id")


ORACLE_MEDIA_FEATURES = """
SELECT doc_id AS media_id,
       CAST(16 + doc_id % 16 AS BIGINT) AS width,
       CAST(8 + doc_id % 8 AS BIGINT) AS height,
       CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 29) % 256 AS DOUBLE) AS mean_b
FROM documents ORDER BY media_id
"""


# --- real WAV/PCM audio path --------------------------------------------------

def _wav_from_documents(spark, sf_dir: str):
    """Square-wave PCM-16 WAVs synthesized on executors from doc_ids: a
    full-scale alternating ±a waveform makes rms == peak == a and every
    adjacent sample a zero crossing — all integer-exact in SQL."""
    import numpy as np

    from ..multimodal import encode_wav_pcm16

    def wav(did):
        sr = 8000 * (1 + did % 3)
        n = 64 + did % 64
        a = 500 + (did * 37) % 30000
        wave = np.empty(n, dtype="<i2")
        wave[0::2] = a
        wave[1::2] = -a
        return encode_wav_pcm16(sr, 1, wave.tobytes())

    return _synth_media(spark, sf_dir, wav)


def q_audio_features(spark, sf_dir):
    """WAV decode → per-clip features via the real RIFF/PCM parser
    (multimodal.decode_wav); binary pruned after the UDF. All outputs are
    integers (amplitude recovered un-divided) so no float-rounding-tie
    hazards exist between Python and DuckDB."""
    media = _wav_from_documents(spark, sf_dir)

    def feats(iterator):
        for pdf in iterator:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                dec = decode_media(bytes(content), "audio")
                f = dec["features"]
                rows.append((int(mid), int(f[0]), int(f[2]),
                             int(round(f[4] * 32768)),
                             int(round(f[5] * 32768)), int(f[6])))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "rms_amp",
                "peak_amp", "zero_crossings",
            ])

    return media.mapInPandas(
        feats,
        "media_id long, sample_rate long, n_samples long, rms_amp long, "
        "peak_amp long, zero_crossings long",
    ).orderBy("media_id")


ORACLE_AUDIO_FEATURES = """
SELECT doc_id AS media_id,
       CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
       CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
       CAST(500 + (doc_id * 37) % 30000 AS BIGINT) AS rms_amp,
       CAST(500 + (doc_id * 37) % 30000 AS BIGINT) AS peak_amp,
       CAST(63 + doc_id % 64 AS BIGINT) AS zero_crossings
FROM documents ORDER BY media_id
"""


# --- real video path (concatenated PPM frames) ---------------------------------

def _video_from_documents(spark, sf_dir: str):
    """Per doc_id: (1 + doc_id % 4) solid-color PPM frames concatenated —
    frame k's red channel is (doc_id * 11 + k) % 256, so frame count and
    first-frame means are doc_id arithmetic."""
    def video(did):
        return b"".join(
            encode_ppm(8, 4, ((did * 11 + k) % 256, 10, 20))
            for k in range(1 + did % 4)
        )

    return _synth_media(spark, sf_dir, video)


def q_video_features(spark, sf_dir):
    """Frame-sampled video decode via the real PPM frame parser
    (multimodal.sample_frames): frame count + first/last sampled frame red
    means, all doc_id-exact in SQL."""
    from ..multimodal import sample_frames

    media = _video_from_documents(spark, sf_dir)

    def feats(iterator):
        for pdf in iterator:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames = sample_frames(bytes(content), every_k=2)
                rows.append((
                    int(mid), len(frames),
                    int(frames[0][0, 0, 0]), int(frames[-1][0, 0, 0]),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_sampled", "first_red", "last_red",
            ])

    return media.mapInPandas(
        feats,
        "media_id long, n_sampled long, first_red long, last_red long",
    ).orderBy("media_id")


# frames k = 0..doc_id%4; sampled = even k; n_sampled = floor(n/2)+n%2 with
# n = 1 + doc_id%4; last sampled index = 2*(n_sampled-1)
ORACLE_VIDEO_FEATURES = """
WITH v AS (
  SELECT doc_id, 1 + doc_id % 4 AS n_frames FROM documents
)
SELECT doc_id AS media_id,
       CAST((n_frames + 1) // 2 AS BIGINT) AS n_sampled,
       CAST((doc_id * 11) % 256 AS BIGINT) AS first_red,
       CAST((doc_id * 11 + 2 * ((n_frames + 1) // 2 - 1)) % 256 AS BIGINT)
         AS last_red
FROM v ORDER BY media_id
"""


QUERIES = {
    "media_features": q_media_features,
    "audio_features": q_audio_features,
    "video_features": q_video_features,
}

ORACLES = {
    "media_features": ORACLE_MEDIA_FEATURES,
    "audio_features": ORACLE_AUDIO_FEATURES,
    "video_features": ORACLE_VIDEO_FEATURES,
}
