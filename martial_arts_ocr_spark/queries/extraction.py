"""Extraction-pipeline queries for the driver harness.

The flagship surface: wraps each `documents` row into a deterministic HTML
page (same template the seeded fixture generator uses), then runs the full
extraction job (engine/job.py) over it — so the driver's smoke/rows checks
exercise the real kernel + mapInPandas path on driver-provided data.

``extract_roundtrip`` additionally has a DuckDB oracle: the synthesized
page's main content is exactly the document text, and the kernel's cleanup
chain is the identity on this clean corpus — so extracted n_blocks and text
length are SQL-predictable. That turns the whole parse→score→consensus→
assemble pipeline into an oracle-checked operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.job import run_extract, with_host

# Deterministic page template: nav + cookie chrome (must be stripped), one
# h1 = source, one p per 600-char chunk of text, footer (stripped).
_CHUNK = 600


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # JVM-side HTML synthesis: concat of literals — no Python
    chunks = F.regexp_replace(
        F.col("text"), "(.{" + str(_CHUNK) + "})", "$1</p><p>"
    )
    html_str = F.concat(
        F.lit('<html><head><meta charset="utf-8"><title>'),
        F.col("source"),
        F.lit("</title></head><body>"
              '<nav class="nav"><a href="/">Home</a> <a href="/a">About</a> '
              '<a href="/b">Contact</a> <a href="/c">Help</a></nav>'
              "<article><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        chunks,
        F.lit("</p></article>"
              '<footer class="footer">© 2024 Example. All rights reserved. | '
              '<a href="/p">Privacy Policy</a></footer></body></html>'),
    )
    return d.select(
        F.concat(F.lit("https://docs.example.com/"), F.col("doc_id"))
        .alias("url"),
        html_str.cast("binary").alias("html"),
        F.col("lang"),
        F.col("doc_id"),
    )


def q_extract_documents(spark, sf_dir):
    """Full extraction over synthesized pages; rows-only driver check."""
    pages = _pages_from_documents(spark, sf_dir)
    out = run_extract(pages.select("url", "html", "lang"), num_partitions=8)
    return out.select(
        "url", "status", "n_blocks", "n_rejected", "lang_detected",
        "quality", F.length("text").alias("text_len"),
    ).orderBy("url")


def q_extract_roundtrip(spark, sf_dir):
    """Oracle-checked extraction: page built from document text must
    extract back to (title + text), chrome stripped, block count = 1 (h1)
    + 1 (title) + ceil(len/600) paragraphs."""
    pages = _pages_from_documents(spark, sf_dir)
    out = run_extract(pages.select("url", "html", "lang"), num_partitions=8)
    return out.select(
        "url", "status",
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.col("n_rejected").cast("bigint").alias("n_rejected"),
    ).orderBy("url")


ORACLE_ROUNDTRIP = """
SELECT 'https://docs.example.com/' || CAST(doc_id AS VARCHAR) AS url,
       'completed' AS status,
       -- title + h1 + paragraphs (text split every 600 chars)
       CAST(2 + CAST(ceil(length(text) / 600.0) AS BIGINT) AS BIGINT) AS n_blocks,
       CAST(2 AS BIGINT) AS n_rejected   -- nav + footer
FROM documents ORDER BY url
"""


def q_extract_ja_segments(spark, sf_dir):
    """Japanese-script extraction demo over seeded fixture pages
    (generated in-memory; rows-only)."""
    from ..fixtures.gen_pages import pages_pandas

    pdf = pages_pandas(200)
    pages = with_host(spark.createDataFrame(pdf))
    out = run_extract(pages, num_partitions=8)
    return (
        out.where(F.col("ja_ratio") > 0)
        .select(
            "url", "lang_detected",
            F.round("ja_ratio", 4).alias("ja_ratio"),
            F.size("segments").alias("n_segments"),
            F.size("term_hits").alias("n_terms"),
            "romaji",
        )
        .orderBy("url")
    )


def q_extract_figures(spark, sf_dir):
    """Figure-region extraction over seeded fixture pages (rows-only)."""
    from ..fixtures.gen_pages import pages_pandas

    pdf = pages_pandas(200)
    pages = with_host(spark.createDataFrame(pdf))
    out = run_extract(pages, num_partitions=8)
    figs = out.select("url", F.explode("figures").alias("f"))
    return figs.select(
        "url",
        F.col("f.region_id").alias("region_id"),
        F.col("f.region_type").alias("region_type"),
        F.col("f.caption").alias("caption"),
        F.col("f.reading_order").alias("reading_order"),
    ).orderBy("url", "region_id")


def q_extract_macron_candidates(spark, sf_dir):
    """Macron-normalization candidates over seeded pages (rows-only)."""
    from ..fixtures.gen_pages import pages_pandas

    pdf = pages_pandas(200)
    pages = with_host(spark.createDataFrame(pdf))
    out = run_extract(pages, num_partitions=8)
    mc = out.select("url", F.explode("macron_candidates").alias("m"))
    return mc.select(
        "url",
        F.col("m.observed").alias("observed"),
        F.col("m.candidate").alias("candidate"),
        F.col("m.start").alias("start"),
        F.col("m.ambiguous").alias("ambiguous"),
    ).orderBy("url", "start", "candidate")


def q_host_profiles(spark, sf_dir):
    """Per-host extraction profile via groupBy().applyInPandas — the
    grouped-map UDF surface (SURVEY §2.13): median/p90 per group need
    within-group vectorized computation, not just built-in aggs.
    Rows-only (percentile semantics differ across engines)."""
    import pandas as pd

    from ..fixtures.gen_pages import pages_pandas

    pages = with_host(spark.createDataFrame(pages_pandas(200)))
    out = run_extract(pages, num_partitions=8)

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        lens = pdf["text"].str.len()
        return pd.DataFrame({
            "host": [pdf["host"].iloc[0]],
            "n_docs": [len(pdf)],
            "median_len": [float(lens.median())],
            "p90_len": [float(lens.quantile(0.9, interpolation="lower"))],
            "n_ja": [int((pdf["ja_ratio"] > 0).sum())],
        })

    return (
        out.select("host", "text", "ja_ratio")
        .groupBy("host")
        .applyInPandas(
            profile,
            "host string, n_docs long, median_len double, p90_len double, "
            "n_ja long",
        )
        .orderBy("host")
    )


QUERIES = {
    "extract_documents": q_extract_documents,
    "host_profiles": q_host_profiles,
    "extract_roundtrip": q_extract_roundtrip,
    "extract_ja_segments": q_extract_ja_segments,
    "extract_figures": q_extract_figures,
    "extract_macron_candidates": q_extract_macron_candidates,
}

ORACLES = {
    "extract_roundtrip": ORACLE_ROUNDTRIP,
}
