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
