"""Resume must reuse the first run's partitioning config even when the
caller passes a different hot-host list (re-derivation drift guard)."""

import pytest

from martial_arts_ocr_spark.engine import catalog
from martial_arts_ocr_spark.engine.resume import (
    EXTRACTED_TABLE,
    run_checkpointed,
)
from martial_arts_ocr_spark.fixtures.gen_pages import HOT_HOST, pages_pandas


def test_resume_ignores_drifted_hot_hosts(spark, tmp_path):
    root = str(tmp_path / "wh")
    pages = spark.createDataFrame(pages_pandas(50))

    with pytest.raises(RuntimeError):
        run_checkpointed(spark, pages, root, run_id="r1", n_buckets=8,
                         batch_size=2, hot_hosts=[HOT_HOST],
                         fail_after_waves=1)

    # resume with a DIFFERENT (drifted) hot-host list → pinned config wins
    run_checkpointed(spark, pages, root, run_id="r1", n_buckets=8,
                     batch_size=2,
                     hot_hosts=[HOT_HOST, "site00.example.org"])

    out = catalog.read_table(spark, root, EXTRACTED_TABLE)
    urls = [r.url for r in out.select("url").collect()]
    assert len(urls) == 50 and len(set(urls)) == 50
