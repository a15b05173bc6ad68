"""The distributed extraction job: scan → gate → partition → mapInPandas.

Target lifecycle (SURVEY.md §3.4):

    read pages → prune columns → validity gate (P1) → host-hash repartition
    (+ salt for hot hosts) → mapInPandas(extract_batch) → extracted rows

Scale notes (the parts the 100 TB design hangs on):
* **Column pruning**: `html` (the giant binary column) is selected only into
  the UDF stage and dropped in its output — every downstream query reads
  extracted parquet without it.
* **Explicit hash partitioning on url-host** (north_rule): co-locates each
  host's pages so per-host skew is visible and addressable; hot hosts get a
  salt suffix so one host never pins one executor.
* **No driver-side loops**: host extraction, salting, and all per-doc logic
  are column expressions + one Arrow-batched UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernel.pipeline import extract_document
from .schema import EXTRACTED_SCHEMA

# case-insensitive scheme + optional userinfo ('HTTP://X/..' and
# 'http://alice@example.com/..' both yield the real host; a case-sensitive
# scheme match extracted '' for uppercase schemes — one shared partition
# key — and userinfo leaked into the host)
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

_OUT_COLS = [f.name for f in EXTRACTED_SCHEMA.fields]


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """host column via JVM-side regexp (no Python)."""
    return df.withColumn("host", F.regexp_extract(F.col(url_col), HOST_RE, 1))


def salted_key_col(
    hot_hosts: list[str] | dict[str, int] | None = None,
    salt_buckets: int = 8,
):
    """Column expression: host salted with a url-hash suffix for hot hosts.

    ``hot_hosts`` is either a list (every hot host gets ``salt_buckets``
    sub-keys) or a dict host→buckets (proportional salting, see
    ``proportional_salt_buckets``). Shared by the partitioning step and the
    resume bucketing so both always derive identical keys from (host, url).
    """
    host = F.col("host")
    if not hot_hosts:
        return host
    if isinstance(hot_hosts, dict):
        expr = None
        for h, k in sorted(hot_hosts.items()):
            salted = F.concat(
                host, F.lit("#"),
                F.pmod(F.xxhash64(F.col("url")), F.lit(int(k))).cast("string"),
            )
            expr = (F.when(host == h, salted) if expr is None
                    else expr.when(host == h, salted))
        return expr.otherwise(host)
    salted = F.concat(
        host, F.lit("#"),
        F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)).cast("string"),
    )
    return F.when(host.isin(hot_hosts), salted).otherwise(host)


def with_salted_key(
    df: DataFrame,
    hot_hosts: list[str] | dict[str, int] | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Partition key = host, salted for known-hot hosts (SURVEY §4.3).

    ``hot_hosts`` comes from a cheap sampled count upstream (see
    ``detect_hot_hosts``); at 10^12 docs that sample is a separate tiny job.
    """
    return df.withColumn("part_key", salted_key_col(hot_hosts, salt_buckets))


def detect_hot_hosts(
    df: DataFrame, threshold: float = 0.05, sample_fraction: float = 0.01
) -> list[str]:
    """Sampled per-host frequency; hosts above `threshold` of rows are hot.

    Deterministic seed so plans are reproducible run-to-run.
    """
    return sorted(detect_hot_host_shares(df, threshold, sample_fraction))


def detect_hot_host_shares(
    df: DataFrame, threshold: float = 0.05, sample_fraction: float = 0.01
) -> dict[str, float]:
    """Hot hosts with their sampled row share (for proportional salting)."""
    sample = df.select("host")
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=42)
    total = sample.count()
    if total == 0:
        return {}
    rows = (
        sample.groupBy("host").count()
        .where(F.col("count") > threshold * total)
        .orderBy("host")
        .collect()
    )
    return {r["host"]: r["count"] / total for r in rows}


def proportional_salt_buckets(
    shares: dict[str, float], target_share: float
) -> dict[str, int]:
    """Bucket count per hot host so each salted key carries ≈target_share
    of rows (e.g. 1/(4·cores)): buckets = ceil(share / target_share).

    The fixed-buckets scheme under-salts very hot hosts (their keys stay
    k× tail size) and over-salts mildly hot ones; proportional salting
    equalizes key sizes, which is what bounds the straggler partition.
    """
    import math

    return {
        h: max(1, math.ceil(s / target_share)) for h, s in sorted(shares.items())
    }


def kernel_rows(pdf):
    """THE per-row kernel call contract for a P1-gated pandas batch:
    yields ``(url, extract_document(url, html, lang or ""))`` in row
    order. Shared by the batch path (``extract_batch``) and the streaming
    path (``streaming.extract_stream``) so the call signature and
    lang-coalescing cannot silently diverge between them (review-found
    duplication)."""
    for url, html, lang in zip(pdf["url"], pdf["html"], pdf["lang"]):
        yield url, extract_document(url, html, lang or "")


def extract_batch(iterator):
    """mapInPandas worker: Arrow batch in → extracted batch out.

    Pure function of row content — batch boundaries and row order never
    affect any output value (byte-identity invariant).
    """
    for pdf in iterator:
        out = []
        for (url, row), host in zip(kernel_rows(pdf), pdf["host"]):
            row["host"] = host
            s = row.pop("stats")
            row["stats"] = (
                s["n_chars"], s["n_words"], s["n_lines"], s["n_paragraphs"],
                s["n_sentences"], s["avg_word_len"], s["reading_time_min"],
            )
            row["segments"] = [
                (d["text"], d["script_type"], d["start"], d["end"])
                for d in row["segments"]
            ]
            row["term_hits"] = [
                (d["term"], d["romaji"], d["translation"], d["category"],
                 d["pos"])
                for d in row["term_hits"]
            ]
            row["macron_candidates"] = [
                (d["observed"], d["candidate"], d["start"], d["end"],
                 d["ambiguous"])
                for d in row["macron_candidates"]
            ]
            row["figures"] = [
                (d["region_id"], d["region_type"], d["start"], d["end"],
                 d["caption"], d["confidence"], d["reading_order"])
                for d in row["figures"]
            ]
            c = row.pop("cleaning")
            row["cleaning"] = (
                c["original_chars"], c["cleaned_chars"], c["chars_removed"],
                c["words_before"], c["words_after"], c["compression_ratio"],
            )
            ly = row.pop("layout")
            row["layout"] = (
                ly["n_blocks_total"], ly["n_accepted"], ly["n_figure_blocks"],
                ly["content_coverage"], ly["figure_coverage"],
                ly["chrome_coverage"],
            )
            row["language_segments"] = [
                (d["lang"], d["start"], d["end"])
                for d in row["language_segments"]
            ]
            out.append(tuple(row[c] for c in _OUT_COLS))
        yield pd.DataFrame(out, columns=_OUT_COLS)


def run_extract(
    pages: DataFrame,
    num_partitions: int | None = None,
    hot_hosts: list[str] | dict[str, int] | None = None,
    salt_buckets: int = 8,
    pre_partitioned: bool = False,
) -> DataFrame:
    """pages DataFrame → extracted DataFrame (lazy; caller writes/collects).

    ``pre_partitioned=True`` means THE CALLER OWNS THE PARTITIONING and no
    shuffle is added here — the job runs scan → mapInPandas → sink. The
    kernel is a pure per-row function, so ANY caller-chosen layout is
    correct; the two layouts callers actually use are (a) the 100 TB fast
    path, input already hash-partitioned on url-host at ingest (Iceberg
    partition spec ``bucket(host)``; emulated by the catalog's
    ``part_bucket=`` layout — never re-shuffle 100 TB that storage
    already partitioned), and (b) the checkpointed runner's round-robin
    wave spread (resume.py), where host co-location already holds at
    bucket granularity and intra-wave balance wins. Nothing in this
    module may assume per-partition host locality under
    ``pre_partitioned=True``. ``pre_partitioned=False`` performs the
    explicit salted host-hash repartition for unpartitioned input.
    """
    df = pages.select("url", "html", "lang")          # column pruning: no warc_ts/text
    df = df.filter(F.col("html").isNotNull() & (F.length("html") > 0))  # P1
    df = with_host(df)
    if not pre_partitioned:
        df = with_salted_key(df, hot_hosts, salt_buckets)
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, F.col("part_key"))
    out = df.select("url", "host", "html", "lang").mapInPandas(
        extract_batch, schema=EXTRACTED_SCHEMA
    )
    return out
