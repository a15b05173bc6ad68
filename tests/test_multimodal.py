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
    # synth_media blobs are stub-arm content: features emitted (plumbing
    # runs) but decode_ok=False — the flag means REAL codec decode only
    assert not any(r.decode_ok for r in rows.values())
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
    assert rows[0].features is None                # empty → no features
    assert rows[1].decode_ok is False              # stub → flagged, but
    assert len(rows[1].features) == 8              # features still emitted


def test_malformed_blobs_flag_rows_not_kill_job(spark):
    """One bad blob must flag its own row, never abort the task: a WebP
    wearing RIFF magic, a garbage PPM header, a zero-channel WAV, and a
    truncated real WAV all yield decode_ok=False rows (self-review fix:
    ValueError/ZeroDivisionError used to escape the UDF)."""
    import numpy as np

    from martial_arts_ocr_spark.multimodal import (
        MEDIA_SCHEMA,
        encode_wav_pcm16,
    )

    webp = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\0" * 12
    bad_ppm = b"P6\nnot numbers\n255\n" + b"\0" * 9
    zero_ch = encode_wav_pcm16(16000, 0, b"")
    good = encode_wav_pcm16(16000, 1,
                            np.array([5, -5], dtype="<i2").tobytes())
    rows_in = [
        (0, "u0", "audio", bytearray(webp), {"mime": "audio/x", "width": None, "height": None, "duration_ms": None}),
        (1, "u1", "image", bytearray(bad_ppm), {"mime": "image/x", "width": None, "height": None, "duration_ms": None}),
        (2, "u2", "audio", bytearray(zero_ch), {"mime": "audio/x", "width": None, "height": None, "duration_ms": None}),
        (3, "u3", "audio", bytearray(good[:20]), {"mime": "audio/x", "width": None, "height": None, "duration_ms": None}),
        (4, "u4", "audio", bytearray(good), {"mime": "audio/x", "width": None, "height": None, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows_in, schema=MEDIA_SCHEMA)
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert [rows[i].decode_ok for i in range(5)] == [
        False, False, False, False, True
    ]
    assert rows[4].features[0] == 16000.0


def test_ppm_codec_real_pixels():
    """The PPM arm is a REAL decoder: pixel values round-trip exactly."""
    import numpy as np

    from martial_arts_ocr_spark.multimodal import (
        decode_media, decode_ppm, encode_ppm, resize_nearest, sample_frames)

    blob = encode_ppm(6, 4, (10, 200, 30))
    w, h, arr, consumed = decode_ppm(blob)
    assert (w, h, consumed) == (6, 4, len(blob))
    assert arr.shape == (4, 6, 3)
    assert (arr[2, 3] == np.array([10, 200, 30])).all()

    f = decode_media(blob, "image")["features"]
    assert f[:5] == [6.0, 4.0, 10.0, 200.0, 30.0]
    assert f[5] == 0.0 and f[7] == 1.0            # solid → zero std, 1 frame

    small = resize_nearest(arr, 3, 2)
    assert small.shape == (2, 3, 3) and (small == arr[0, 0]).all()

    video = encode_ppm(2, 2, (1, 2, 3)) + encode_ppm(2, 2, (4, 5, 6)) \
        + encode_ppm(2, 2, (7, 8, 9))
    frames = sample_frames(video, every_k=2)      # frames 0 and 2
    assert len(frames) == 2
    assert frames[1][0, 0, 0] == 7
    fv = decode_media(video, "video")["features"]
    assert fv[7] == 3.0                           # all frames counted


def test_ppm_comment_header_and_truncation():
    import pytest

    from martial_arts_ocr_spark.multimodal import decode_ppm, encode_ppm

    blob = b"P6\n# a comment\n3 2\n255\n" + bytes((9, 9, 9)) * 6
    w, h, arr, _ = decode_ppm(blob)
    assert (w, h) == (3, 2) and arr[1, 2, 0] == 9
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(4, 4, (1, 1, 1))[:-5])


def test_wav_roundtrip_and_features():
    import numpy as np
    import pytest

    from martial_arts_ocr_spark.multimodal import (decode_media, decode_wav,
                                                   encode_wav_pcm16)

    wave = np.array([1000, -1000, 1000, -1000, 500], dtype="<i2")
    blob = encode_wav_pcm16(16000, 1, wave.tobytes())
    sr, ch, arr = decode_wav(blob)
    assert (sr, ch) == (16000, 1)
    assert np.array_equal(arr, wave)
    f = decode_media(blob, "audio")["features"]
    assert f[0] == 16000.0 and f[1] == 1.0 and f[2] == 5.0
    assert f[6] == 4.0                       # four sign changes
    assert round(f[5] * 32768) == 1000       # peak amplitude recovered
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")          # missing fmt/data
    with pytest.raises(ValueError):
        decode_wav(blob[:20])                # truncated


def test_truncated_wav_data_chunk_flags_row():
    """A data chunk whose declared size exceeds the available bytes must
    raise (review fix: it previously passed half the samples off as a
    clean decode while the PPM codec raised for the same defect)."""
    import numpy as np
    import pytest

    from martial_arts_ocr_spark.multimodal import (decode_media, decode_wav,
                                                   encode_wav_pcm16)

    wave = np.array([1000, -1000, 1000, -1000, 500], dtype="<i2")
    blob = encode_wav_pcm16(16000, 1, wave.tobytes())[:-3]
    with pytest.raises(ValueError):
        decode_wav(blob)
    with pytest.raises(ValueError):     # decode_media propagates; the
        decode_media(blob, "audio")     # never-fail batch wrapper flags it


def test_mislabeled_media_type_is_not_a_real_decode():
    """A valid WAV declared as 'image' (and a valid PPM declared as
    'audio') must take the stub arm with decode_ok=False — cross-modal
    features with decode_ok=True defeat the flag's purpose (review fix)."""
    import numpy as np

    from martial_arts_ocr_spark.multimodal import (decode_media, encode_ppm,
                                                   encode_wav_pcm16)

    wav = encode_wav_pcm16(8000, 1, np.array([1, -1], dtype="<i2").tobytes())
    ppm = encode_ppm(4, 4, (10, 20, 30))
    assert decode_media(wav, "image")["decode_ok"] is False
    assert decode_media(ppm, "audio")["decode_ok"] is False
    # consistent declarations still decode for real
    assert decode_media(wav, "audio")["decode_ok"] is True
    assert decode_media(ppm, "image")["decode_ok"] is True
    assert decode_media(ppm + ppm, "video")["decode_ok"] is True


def test_frame_walk_is_linear_not_quadratic():
    """10k minimal frames must sample in well under a second — the old
    content[pos:] per-frame slice was O(L²/frame) memcpy, a DoS path
    through the never-fail UDF (review fix)."""
    import time

    from martial_arts_ocr_spark.multimodal import encode_ppm, sample_frames

    frame = encode_ppm(1, 1, (9, 9, 9))
    blob = frame * 10_000
    t0 = time.time()
    frames = sample_frames(blob, every_k=2)
    dt = time.time() - t0
    assert len(frames) == 5_000
    assert dt < 1.0, dt


def test_null_media_id_flags_row_not_task(spark):
    """A NULL media_id must produce a flagged NULL-id row, not abort the
    Spark task (review fix: int(mid) sat outside the never-fail try).
    Round-4 ADVICE: the flagged id is NULL, not a shared -1 sentinel —
    two unrelated bad rows must not collapse onto one key under any
    downstream groupBy/join/dedup on media_id."""
    import pandas as pd

    from martial_arts_ocr_spark.multimodal import media_feature_batch

    pdf = pd.DataFrame({
        "media_id": [1, None, None],
        "media_type": ["image", "image", "audio"],
        "content": [b"", None, b"xx"],
    })
    out = pd.concat(list(media_feature_batch(iter([pdf]))))
    ids = list(out["media_id"])
    # the batch-level id is the lossless STRING leg of the round trip
    assert ids[0] == "1" and ids[1] is None and ids[2] is None
    assert list(out["decode_ok"]) == [False, False, False]
    # and the null-id rows still flow through Spark's schema (nullable)
    df = spark.createDataFrame(
        pdf, "media_id long, media_type string, content binary")
    from martial_arts_ocr_spark.multimodal import extract_media_features
    rows = extract_media_features(df).collect()
    assert sorted(r.media_id is None for r in rows) == [False, True, True]


def test_null_in_batch_does_not_float_corrupt_big_ids(spark):
    """Round-5 review find (both passes): a None media_id sharing an
    Arrow batch coerced the long column to float64 — on the OUTPUT side
    (pandas inference) AND the INPUT side (Spark's Arrow→pandas
    conversion, corrupting ids >= 2^53 before user code ran). media_id
    now crosses the UDF as a lossless string both ways; this pins the
    worst case — the big id and the null in the SAME partition/batch."""
    import pandas as pd

    from martial_arts_ocr_spark.multimodal import (
        extract_media_features,
        media_feature_batch,
    )

    big = 9007199254740993            # 2^53 + 1: not float64-representable
    pdf = pd.DataFrame({
        "media_id": [str(big), None],
        "media_type": ["image", "image"],
        "content": [b"", None],
    })
    out = pd.concat(list(media_feature_batch(iter([pdf]))))
    assert out["media_id"].iloc[0] == str(big)
    assert out["media_id"].iloc[1] is None
    # end-to-end through Spark/Arrow with BOTH rows forced into ONE batch
    # (the second-pass repro: separate partitions masked the input-side
    # coercion)
    df = spark.createDataFrame(
        [(big, "image", bytearray(b"x")), (None, "image", None)],
        "media_id long, media_type string, content binary").coalesce(1)
    got = {r.media_id for r in extract_media_features(df).collect()}
    assert big in got and None in got, got
