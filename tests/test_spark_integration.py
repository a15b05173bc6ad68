"""Spark integration: mapInPandas output ≡ kernel output, byte-identical;
partitioning/pruning plan shape checks (SURVEY §5.2 item 3)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from martial_arts_ocr_spark.engine.job import (
    detect_hot_hosts,
    run_extract,
    with_host,
    with_salted_key,
)
from martial_arts_ocr_spark.fixtures.gen_pages import (
    HOT_HOST,
    generate_pages,
    pages_pandas,
)
from martial_arts_ocr_spark.kernel.pipeline import extract_document

N = 80


@pytest.fixture(scope="module")
def extracted(spark):
    pdf = pages_pandas(N)
    pages = with_host(spark.createDataFrame(pdf))
    out = run_extract(pages, num_partitions=4)
    return {r.url: r for r in out.collect()}


def test_spark_equals_kernel_bytewise(spark, extracted):
    """The north-rule invariant: per-url text from the distributed job is
    byte-identical to the pure kernel run on the driver."""
    for row in generate_pages(N):
        kernel_row = extract_document(row["url"], row["html"], row["lang"])
        spark_row = extracted[row["url"]]
        assert spark_row.text == kernel_row["text"], row["url"]
        assert spark_row.n_blocks == kernel_row["n_blocks"]
        assert spark_row.romaji == kernel_row["romaji"]


def test_all_rows_present_and_completed(extracted):
    assert len(extracted) == N
    assert all(r.status == "completed" for r in extracted.values())


def test_hot_host_detected(spark):
    pages = with_host(spark.createDataFrame(pages_pandas(200)))
    hot = detect_hot_hosts(pages, sample_fraction=1.0, threshold=0.2)
    assert hot == [HOT_HOST]


def test_salting_splits_hot_host(spark):
    pages = with_host(spark.createDataFrame(pages_pandas(200)))
    salted = with_salted_key(pages, [HOT_HOST], salt_buckets=4)
    keys = [
        r.part_key
        for r in salted.select("part_key").distinct().collect()
    ]
    hot_keys = [k for k in keys if k.startswith(HOT_HOST + "#")]
    assert len(hot_keys) >= 2          # hot host split into several buckets
    assert HOT_HOST not in keys        # raw hot key no longer present


def test_html_column_pruned_from_output(spark):
    pages = with_host(spark.createDataFrame(pages_pandas(10)))
    out = run_extract(pages, num_partitions=2)
    assert "html" not in out.columns


def test_plan_has_single_shuffle(spark):
    """The extraction plan must contain exactly one exchange (the explicit
    host repartition) — no hidden extra shuffles before the UDF."""
    pages = with_host(spark.createDataFrame(pages_pandas(10)))
    out = run_extract(pages, num_partitions=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_parquet_scan_prunes_html_for_metadata_query(spark, tmp_path):
    """Column pruning reaches the parquet scan: a query over extracted
    metadata must not read the text column it doesn't use."""
    pdf = pages_pandas(20)
    pages = with_host(spark.createDataFrame(pdf))
    out_path = str(tmp_path / "extracted")
    run_extract(pages, num_partitions=2).write.parquet(out_path)
    meta = (
        spark.read.parquet(out_path)
        .groupBy("lang_detected").agg(F.count(F.lit(1)).alias("n"))
    )
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    # the scan schema must include lang_detected and exclude text/segments
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "lang_detected" in m.group(1)
    assert "text" not in m.group(1)


def test_flagship_quality_margin(spark):
    """The flagship oracle's quality arm assumes consensus confidence ≥0.8
    on template pages (kernel/pipeline.py A5 staircase) so quality reduces
    to the n_words≥50 test. Pin the margin: min confidence ≥0.85 and
    lang_detected constant 'en' over the sf0.001 corpus."""
    from martial_arts_ocr_spark.queries.extraction import (
        _pages_from_documents,
    )

    pages = _pages_from_documents(spark, "/root/testdata/sf0.001")
    out = run_extract(pages.select("url", "html", "lang"), num_partitions=4)
    agg = out.agg(
        F.min("confidence").alias("min_conf"),
        F.count_distinct("lang_detected").alias("n_langs"),
        F.min("lang_detected").alias("lang"),
        F.count_distinct("status").alias("n_status"),
    ).collect()[0]
    assert agg["min_conf"] >= 0.85, agg
    assert agg["n_langs"] == 1 and agg["lang"] == "en"
    assert agg["n_status"] == 1


def test_host_regex_scheme_case_and_userinfo(spark):
    """HOST_RE edge cases from real crawls (self-review fix): uppercase
    schemes must not collapse every row to host '' (artificial skew) and
    userinfo must not leak into the partition key."""
    rows = [
        ("HTTP://Example.com/x", "Example.com"),
        ("https://user@example.com/p", "example.com"),
        ("https://a:pw@h.example.com:8080/p?q=1", "h.example.com"),
        ("https://plain.example.com/p", "plain.example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = {r["url"]: r["host"] for r in with_host(df).collect()}
    for u, want in rows:
        assert got[u] == want, (u, got[u])
