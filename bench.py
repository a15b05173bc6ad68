#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "extraction": {...}}

The extraction block reports the north-star number (docs/sec through the
full kernel+mapInPandas pipeline). With ``SPARK_GRAFT_SCALING=1`` the
two-cluster-size measurement runs live (N=1×2 vs 4N=4×2 executor JVMs via
local-cluster, engine/scaling_bench.py); otherwise the last recorded
numbers are included, labeled, from BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median


def _median(xs):
    return round(median(xs), 3)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000"))

# headline queries (subset of __spark_entry__.queries(): the ones that
# exercise each operator family at sf0.1 scale)
HEADLINE = [
    "pricing_summary",
    "top_revenue_customers",
    "events_sessions",
    "doc_stats_by_lang",
    "dedup_survivors",
    "langid_heuristic",
    "ann_cosine_top10",
    "minhash_bands",
    "simhash",
    "cosine_neardup_pairs",
    "events_asof_purchase",
    "doc_length_percentiles",
    "gopher_line_flags",
    "extract_documents",
]


def _sf_label(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def time_query(fn, spark, sf_dir) -> float:
    """Wall time to fully EXECUTE the query, noop sink.

    Round-4 review fix: the old ``df.count()`` let Catalyst prune any
    column no aggregate/filter consumed — for projection-only queries
    (simhash, gopher_line_flags) the pandas UDF / column algebra never
    ran and the Window of events_asof_purchase was optimized out
    (verified empirically), so those bench entries measured little more
    than the scan. The noop sink materializes every output column and
    executes the final ORDER BY, without collect()'s driver transfer.
    Numbers from round 4 on are therefore HIGHER for those queries than
    earlier rounds — a measurement correction, not a regression
    (BASELINE.md round-4 note)."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return round(dt, 3)


def extraction_throughput(master: str, n_pages: int, parts: int) -> dict:
    """docs/sec through the full extraction pipeline on a fresh session.

    A small warmup extraction runs before the clock so one-time costs
    (Python worker spawn, codegen, shuffle service init) don't masquerade
    as per-doc work — the steady-state number is what scales to a cluster.
    Salt buckets scale with parallelism so the hot host spreads across the
    whole cluster (SURVEY §4.3).
    """
    from martial_arts_ocr_spark.engine.job import run_extract
    from martial_arts_ocr_spark.engine.session import build_session
    from martial_arts_ocr_spark.fixtures.gen_pages import pages_spark

    spark = build_session(master=master, shuffle_partitions=parts,
                          app_name=f"bench-extract-{master}")
    spark.sparkContext.setLogLevel("ERROR")
    # no with_host: run_extract derives host itself; the wrapper only
    # persisted a dead extra column (review fix)
    pages = pages_spark(spark, n_pages, partitions=parts)
    pages = pages.persist()
    pages.count()                       # materialize input outside the clock
    # full-size warmup: limit(n) would collapse to ONE partition and leave
    # all other Python workers cold inside the timed run
    run_extract(pages, num_partitions=parts,
                hot_hosts=["hot.example.com"], salt_buckets=parts).count()
    times, n = [], 0
    for _ in range(3):                  # best-of-3: this box is ±15% noisy
        t0 = time.perf_counter()
        out = run_extract(pages, num_partitions=parts,
                          hot_hosts=["hot.example.com"], salt_buckets=parts)
        n = out.count()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    spark.stop()
    return {"master": master, "n_docs": n, "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 2),
            "all_runs_sec": [round(t, 3) for t in times]}


def _scan_split_bytes(sf_dir: str, cpus: int) -> int:
    """Size spark.sql.files.maxPartitionBytes so the LARGEST table splits
    into ≈2·cpus scan partitions at this SF (the 'size partitions for the
    target scale' rule): the default 128 MB is right for warehouse-scale
    files but leaves a 10 MB bench table on 1-3 of 32 cores. Clamped to
    [2 MiB, 128 MB]; parquet row-group boundaries bound the real split."""
    biggest = max(
        (os.path.getsize(os.path.join(sf_dir, f))
         for f in os.listdir(sf_dir) if f.endswith(".parquet")),
        default=0,
    )
    return min(max(biggest // (2 * cpus), 2 << 20), 128 << 20)


def kernel_anchor(n_pages: int = 500, reps: int = 5) -> dict:
    """Single-process kernel docs/s, measured BEFORE any Spark work.

    Round-5 lesson (BASELINE.md): this box transiently degrades ~0.77×
    for ~40-minute windows; a load-independent single-proc anchor taken
    at session start is the only way to tell host drift from a code
    regression afterwards. Recording it IN the bench JSON (round-5
    VERDICT item 7) makes the driver-run-vs-builder-run delta
    machine-auditable: two runs whose anchors differ by X are expected
    to differ by ~X on every Spark number too, with zero code delta.
    """
    from martial_arts_ocr_spark.fixtures.gen_pages import pages_pandas
    from martial_arts_ocr_spark.kernel.pipeline import extract_document

    pdf = pages_pandas(n_pages)
    pairs = list(zip(pdf["url"], pdf["html"]))
    for url, html in pairs[:50]:        # warm code paths / allocator
        extract_document(url, html)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for url, html in pairs:
            extract_document(url, html)
        best = min(best, time.perf_counter() - t0)
    return {"docs_per_sec": round(n_pages / best, 1), "n_docs": n_pages,
            "best_of": reps,
            "r4_reference_docs_per_sec": 822.0,
            "method": "pure-Python kernel loop, one process, no Spark; "
                      "best-of-%d over the %d-page synthetic fixture, "
                      "measured before session start" % (reps, n_pages)}


def main() -> None:
    from martial_arts_ocr_spark.engine.session import build_session
    from martial_arts_ocr_spark.queries import ALL_QUERIES

    anchor = kernel_anchor()

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS,
                          app_name="bench", extra_conf={
                              "spark.sql.files.maxPartitionBytes":
                                  str(_scan_split_bytes(SF_DIR, CPUS)),
                          })
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM/codegen/parquet-footer costs land here, not in query 1
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    # spawn the Python UDF workers too (same steady-state rationale as the
    # extraction warmup): the first pandas-UDF query otherwise pays ~2 s of
    # one-time worker fork/import on all CPUS slots
    spark.range(CPUS * 8).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name] = time_query(ALL_QUERIES[name], spark, SF_DIR)
    spark.stop()

    result = {
        "metric": "headline query wall time at sf (extraction + relational "
                  "+ text + similarity operators)",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_label(SF_DIR),
        "host_anchor": anchor,
    }

    # north-star extraction throughput at the bench parallelism
    ext = extraction_throughput(f"local[{CPUS}]", N_PAGES, CPUS)
    result["extraction"] = ext

    # two-cluster-size scaling stand-in (north rule): N vs 4N executor JVMs
    if os.environ.get("SPARK_GRAFT_SCALING", "0") == "1":
        from martial_arts_ocr_spark.engine.scaling_bench import run_scaling

        result["scaling"] = run_scaling()
    else:
        # last measured numbers (see BASELINE.md "Measured" for provenance);
        # re-measure live with SPARK_GRAFT_SCALING=1
        # Outlier policy is SYMMETRIC (round-3 ADVICE): the median is
        # reported raw AND with both tails trimmed (drop min and max).
        # Round-5 numbers of record: 7 paired rounds on the RECOVERED box
        # (anchor 903 docs/s — the earlier degraded-window sample, median
        # 0.879 over [0.866, 0.664, 1.072, 0.958, 0.933, 0.850, 0.879],
        # is kept in BASELINE.md round 5 for the symmetric record).
        # Harness and measured code are byte-identical to round 4, whose
        # final-harness sample was
        # [0.844, 0.927, 0.959, 0.953, 0.900, 0.871, 0.802] median 0.900.
        # Round-6 numbers of record: INTERLEAVED lo/hi alternations
        # (run_scaling_interleaved — the kernel-A/B rule applied to the
        # scaling pair after sequential pairs proved host-window-
        # confounded on a cycling host; BASELINE.md round 6 has all four
        # samples, per-pair anchors, and the day-pooled 0.950 floor
        # estimate). r5 quiet-box sequential sample (code-identical):
        # median 0.926 over [0.926, 0.845, 0.939, 0.939, 0.891, 0.748,
        # 0.935], lo 1469.4 / hi 5443.7.
        # Round-7 numbers of record: 3 INTERLEAVED pairs, per-pair anchors
        # 600/886/739 (cycling host), median 0.936, day-pooled floor 1.00.
        # Round-8 numbers of record: 3 INTERLEAVED pairs, ALL at healthy
        # anchors (951/960/869 docs/s — the cleanest anchor set yet;
        # post-session anchor 726 shows the window closing right after).
        # Day-pooled best-per-side floor 0.844 (best lo 1538.0, best hi
        # 5192.6 over 9 draws/side). BASELINE.md round 8 has all samples.
        rounds_r8 = [0.993, 0.853, 0.810]
        result["scaling_recorded"] = {
            "method": "local-cluster 1x2 vs 4x2 executor JVMs, 32k docs, "
                      "uniform input files, best-of-3 per measurement, 3 "
                      "INTERLEAVED lo/hi alternations per pair with best "
                      "per side, 3 pairs, per-pair anchors 951/960/869 "
                      "docs/s single-proc (all healthy — the cleanest "
                      "sample across rounds); day-pooled best-per-side "
                      "floor 0.844 (best lo 1538.0, best hi 5192.6 over "
                      "9 draws/side); r7 interleaved median 0.936, r6 "
                      "0.863; symmetric outlier reporting per round-3 "
                      "ADVICE",
            "lo_docs_per_sec": 1521.2,     # the median pair's best side
            "hi_docs_per_sec": 5192.6,
            "efficiency": _median(rounds_r8),
            "efficiency_sym_trimmed": _median(sorted(rounds_r8)[1:-1]),
            "paired_rounds": rounds_r8,
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
