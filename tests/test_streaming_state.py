"""Custom stateful streaming operator: running totals survive across
micro-batches (state carried by applyInPandasWithState)."""

from martial_arts_ocr_spark.fixtures.gen_pages import pages_pandas
from martial_arts_ocr_spark.streaming import (
    extract_stream,
    host_running_totals,
    read_pages_stream,
)


def test_state_accumulates_across_batches(spark, tmp_path):
    path = str(tmp_path / "pages")
    pdf = pages_pandas(40)
    # two separate files → two micro-batches under maxFilesPerTrigger=1
    spark.createDataFrame(pdf.iloc[:20]).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    spark.createDataFrame(pdf.iloc[20:]).coalesce(1) \
        .write.mode("append").parquet(path)

    totals = host_running_totals(
        extract_stream(read_pages_stream(spark, path, max_files_per_trigger=1))
    )
    q = (
        totals.writeStream.format("memory").queryName("tot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM tot").collect()
    q.stop()
    # update mode re-emits per batch; the LAST emission per host is the
    # running total — it must equal the batch-side ground truth
    last = {}
    for r in rows:
        last[r.host] = (r.n_docs, r.n_chars, r.n_failed)   # later rows win
    import collections

    truth = collections.Counter()
    pdf2 = pdf.copy()
    pdf2["host"] = pdf2["url"].str.extract(r"://([^/]+)")
    for h, grp in pdf2.groupby("host"):
        truth[h] = len(grp)
    assert {h: v[0] for h, v in last.items()} == dict(truth)
    assert all(v[2] == 0 for v in last.values())


def test_dedup_stream_flags_cross_and_in_batch_dups(spark, tmp_path):
    """Streaming exact-dedup: first occurrence passes, replays across
    LATER micro-batches and duplicates WITHIN a batch both flag, and
    ordering of unique content is first-writer-wins per group state."""
    import pandas as pd

    from martial_arts_ocr_spark.streaming import dedup_stream

    path = str(tmp_path / "docs")
    b1 = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha", "beta", "gamma", "alpha"],   # in-batch dup
    })
    b2 = pd.DataFrame({
        "doc_id": [4, 5, 6],
        "text": ["beta", "delta", "delta"],   # cross-batch + in-batch dup
    })
    spark.createDataFrame(b1).coalesce(1).write.mode(
        "overwrite").parquet(path)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        dedup_stream(stream).writeStream.format("memory")
        .queryName("dedup").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = {r.doc_id: r.is_dup for r in
            spark.sql("SELECT * FROM dedup").collect()}
    q.stop()
    assert rows == {0: False, 1: False, 2: False, 3: True,
                    4: True, 5: False, 6: True}
