"""compact_table: rows preserved exactly, files reduced, snapshot logged,
and an interrupted-run resume still works over compacted data."""

import os

from martial_arts_ocr_spark.engine import catalog, resume
from martial_arts_ocr_spark.engine.job import with_host
from martial_arts_ocr_spark.fixtures.gen_pages import pages_pandas


def _n_files(root, table):
    n = 0
    for _p, _d, files in os.walk(catalog.table_path(root, table)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _rows(spark, root, table):
    df = catalog.read_table(spark, root, table)
    return sorted(tuple(r) for r in df.select("url", "text").collect())


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    root = str(tmp_path / "wh")
    pages = with_host(spark.createDataFrame(pages_pandas(120)))
    # files_per_bucket=3 → the write sub-salts each bucket into 3 files
    # (the 100 TB knob; the sandbox default of 1 would give the compacted
    # layout already and leave compaction nothing to prove)
    resume.run_checkpointed(spark, pages, root, run_id="c1",
                            n_buckets=8, batch_size=2, files_per_bucket=3)
    before_files = _n_files(root, resume.EXTRACTED_TABLE)
    before_rows = _rows(spark, root, resume.EXTRACTED_TABLE)
    assert before_files > 8          # more files than buckets

    meta = catalog.compact_table(spark, root, resume.EXTRACTED_TABLE,
                                 target_files_per_bucket=1)
    after_files = _n_files(root, resume.EXTRACTED_TABLE)
    assert after_files <= 8
    assert after_files < before_files
    assert meta["files_before"] == before_files
    assert meta["files_after"] == after_files
    assert _rows(spark, root, resume.EXTRACTED_TABLE) == before_rows

    snaps = catalog.read_snapshots(root, resume.EXTRACTED_TABLE)
    assert snaps[-1]["op"] == "compact"

    # a rerun over compacted data is a no-op resume (nothing reprocessed)
    processed = resume.run_checkpointed(spark, pages, root, run_id="c1",
                                        n_buckets=8, batch_size=2)
    assert processed == []
    assert _rows(spark, root, resume.EXTRACTED_TABLE) == before_rows
