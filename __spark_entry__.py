"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full extraction pipeline over pages
synthesized from the sf0.001 ``documents`` table (real kernel + mapInPandas
+ host-hash partitioning).

``queries()`` / ``oracle_sql()`` — operator surface from SURVEY.md §2 plus
the training-pipeline additions (dedup / similarity / text analysis); see
``martial_arts_ocr_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from martial_arts_ocr_spark.queries import (ALL_QUERIES,
                                            materialized_oracles)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from martial_arts_ocr_spark.queries.extraction import q_extract_documents

    return q_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/aliases)."""
    return materialized_oracles()
