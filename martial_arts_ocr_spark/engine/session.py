"""SparkSession builder with the engine's scale-oriented defaults.

Settings chosen for the 100 TB target (SURVEY.md §4.3) and applied
identically in tests/bench so measured plans are the shipped plans:

* AQE on (+ skew-join): runtime shuffle re-planning replaces hand-tuned
  partition counts at unknown scale;
* Arrow batch cap: extraction UDF memory ∝ batch_rows × html size — 256
  rows/batch keeps executor-side Python workers bounded with multi-MB pages;
* shuffle partitions default sized for local[32] testing; on a real cluster
  AQE coalesces, so over-provisioning is the safe direction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256


def build_session(
    app_name: str = "martial_arts_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
