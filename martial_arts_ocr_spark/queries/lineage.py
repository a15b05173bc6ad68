"""Lineage-surface queries: the metrics/checkpoints tables written by the
checkpointed runner (engine/resume.py), exposed to the driver gate.

Reference analogue: per-document ``processing_time``/status persistence
(``/root/reference/src/martial_arts_ocr/db/models.py:136-137`` and the
orchestrator state machine ``pipeline/orchestrator.py:289-311``) — here the
lineage is per Iceberg-partition-bucket rows, and the driver verifies the
metrics totals against SQL computed from the input table.

Each registered query performs (once per process per sf_dir) a real
checkpointed extraction run over pages synthesized from ``documents`` into
a temp warehouse, then reads the lineage tables back. ``run_metrics`` has
an exact oracle: every count/byte/char total is template-predictable.
``run_checkpoints`` is ALSO oracle-exact: the probe corpus uses 7 known
hosts, so their ``pmod(xxhash64(host), P)`` bucket ids are baked into the
SQL as literals via the pure-Python XXH64 mirror (queries/xxh64.py) — the
same baked-literal technique as the LSH hyperplane oracle.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..engine import catalog, resume
from .extraction import TEMPLATE_CONST_BYTES, _pages_from_documents

_N_BUCKETS = 8
_RUN_ID = "lineage-gate"
_READY: dict[str, str] = {}          # sf_dir -> warehouse root (per process)


def _ensure_run(spark, sf_dir: str) -> str:
    root = _READY.get(sf_dir)
    if root and catalog.table_exists(root, resume.METRICS_TABLE):
        return root
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"mao_lineage_{os.getpid()}_{tag}"
    )
    shutil.rmtree(root, ignore_errors=True)
    # host_from_doc: hosts h0..h6 so the run spans several part_buckets
    # (a single shared host would collapse the lineage demo to one bucket)
    pages = _pages_from_documents(
        spark, sf_dir, host_from_doc=True
    ).select("url", "html", "lang")
    resume.run_checkpointed(
        spark, pages, root, run_id=_RUN_ID,
        n_buckets=_N_BUCKETS, batch_size=_N_BUCKETS,
    )
    _READY[sf_dir] = root
    return root


def q_run_metrics(spark, sf_dir):
    """Totals over the per-bucket metrics rows of a checkpointed run —
    oracle-exact: the probe pages make every metric SQL-predictable."""
    root = _ensure_run(spark, sf_dir)
    # read_metrics dedups (run_id, part_bucket): a crash between metrics
    # append and checkpoint commit re-runs the wave with identical rows
    m = resume.read_metrics(spark, root)
    return m.where(F.col("run_id") == _RUN_ID).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_completed").alias("n_completed"),
        F.sum("n_failed").alias("n_failed"),
        F.sum("n_bytes_in").alias("n_bytes_in"),
        F.sum("n_chars_out").alias("n_chars_out"),
    )


ORACLE_RUN_METRICS = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_completed,
       CAST(0 AS BIGINT) AS n_failed,
       -- '</p><p>' (7 bytes) is inserted after every FULL 600-char group:
       -- floor(len/600), NOT ceil-1 (they differ when len is an exact
       -- multiple of 600 — the trailing empty <p></p> still costs bytes
       -- even though it yields no block; round-2 ADVICE item)
       CAST(sum({TEMPLATE_CONST_BYTES} + 2 * length(source) + length(text)
            + 7 * (length(text) // 600))
            AS BIGINT) AS n_bytes_in,
       -- ceil(len/600)-1 is -1 for an EMPTY text (the kernel would emit
       -- title+h1 only, a different formula entirely); the corpus
       -- precondition test pins non-empty, newline-free, ASCII text at
       -- every SF, which is exactly the domain where this is exact
       CAST(sum(2 * length(source) + 4 + length(text)
            + 2 * (CAST(ceil(length(text) / 600.0) AS BIGINT) - 1))
            AS BIGINT) AS n_chars_out
FROM documents
"""


def q_run_checkpoints(spark, sf_dir):
    """Checkpoint rows of the same run: one completed row per processed
    bucket, each carrying the snapshot id of its committing wave. Bucket
    assignment is pmod(xxhash64(host), P) over 7 known hosts — baked into
    the oracle as literals (see module docstring)."""
    root = _ensure_run(spark, sf_dir)
    c = catalog.read_table(spark, root, resume.CHECKPOINT_TABLE)
    return (
        c.where(F.col("run_id") == _RUN_ID)
        .select(
            "run_id",
            F.col("part_bucket").cast("bigint").alias("part_bucket"),
            "status",
            (F.length("snapshot_id") == 12).alias("snapshot_id_ok"),
        )
        .orderBy("part_bucket")
    )


def _checkpoints_oracle() -> str:
    """Bucket ids of the 7 probe hosts baked as literals (xxh64 mirror is
    Spark-verified in tests/test_xxh64.py); occupancy derived from the
    documents table exactly like the Spark-side host synthesis."""
    from .xxh64 import spark_pmod_bucket

    rows = ", ".join(
        f"('h{i}.example.com', "
        f"{spark_pmod_bucket(f'h{i}.example.com', _N_BUCKETS)})"
        for i in range(7)
    )
    return f"""
WITH bucket_map(host, bucket) AS (VALUES {rows}),
hosts AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
         AS host
  FROM documents
)
SELECT '{_RUN_ID}' AS run_id,
       CAST(bucket AS BIGINT) AS part_bucket,
       'completed' AS status,
       true AS snapshot_id_ok
FROM (SELECT DISTINCT b.bucket
      FROM hosts h JOIN bucket_map b ON b.host = h.host)
ORDER BY part_bucket
"""


QUERIES = {
    "run_metrics": q_run_metrics,
    "run_checkpoints": q_run_checkpoints,
}

ORACLES = {
    "run_metrics": ORACLE_RUN_METRICS,
    # registered UNCALLED: materialized_oracles() resolves it on the
    # driver — executors import this package for the pandas UDFs and must
    # not pay (or depend on) import-time SQL baking (CLAUDE.md rule)
    "run_checkpoints": _checkpoints_oracle,
}
