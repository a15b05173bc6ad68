"""Physical-plan regression guards (the ".explain and iterate" mandate).

Locks in the plan properties that matter at 100 TB: predicate pushdown to
the parquet scan, column pruning, broadcast joins for dims, and top-k as
TakeOrderedAndProject (never a global sort)."""

import re

from martial_arts_ocr_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return (
        ALL_QUERIES[name](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )


def test_dim_joins_broadcast(spark):
    assert "BroadcastHashJoin" in _plan(spark, "top_revenue_customers")
    assert "BroadcastHashJoin" in _plan(spark, "region_balance")


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "fingerprints")
    assert "GreaterThan(n_chars,400)" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "fingerprints")
    m = re.search(r"ReadSchema: struct<([^>]+)>", plan)
    assert m, plan
    cols = m.group(1)
    assert "text" in cols and "doc_id" in cols
    assert "lang" not in cols and "source" not in cols


def test_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "ann_cosine_top10")
    assert "TakeOrderedAndProject" in _plan(spark, "top_revenue_customers")
