#!/usr/bin/env python
"""Cluster entry point: resumable curation-and-pack over a documents
table (the training-data counterpart of run_extract.py).

Usage::

    sh scripts/make_pyfiles.sh
    spark-submit --driver-memory 8g --py-files engine.zip \
        scripts/run_curate.py \
        --docs-dir /path/holding/documents.parquet+embeddings.parquet \
        --warehouse /path/to/warehouse --run-id curate-2024-01 \
        [--batch-size 4] [--ctx-len 512] [--buckets 8]

Stage 1 materializes the seven-gate keep-set (curation_flags table);
stage 2 packs kept docs into fixed-length token sequences per content
bucket with per-bucket checkpoints. Reruns with the same --run-id resume
from the last committed bucket wave; semantic knobs are pinned per run
and a drifted resume is refused (engine/curate.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-dir", required=True,
                    help="dir with documents.parquet and embeddings.parquet")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--ctx-len", type=int, default=512)
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    from martial_arts_ocr_spark.engine.curate import run_curate
    from martial_arts_ocr_spark.engine.session import build_session

    spark = build_session(app_name=f"curate-{args.run_id}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        summary = run_curate(
            spark, args.docs_dir, args.warehouse, args.run_id,
            batch_size=args.batch_size, n_buckets=args.buckets,
            ctx_len=args.ctx_len,
        )
    finally:
        spark.stop()
    print(json.dumps(summary))
    return 0 if summary["complete"] else 1


if __name__ == "__main__":
    sys.exit(main())
