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


def test_lsh_pair_join_is_equi_not_cartesian(spark):
    """Bucketed near-dup joins must hash-partition on the bucket key —
    a cartesian/BNL join here would be the 100 TB scale-killer."""
    for q in ("cosine_neardup_pairs", "lsh_bucket_candidates"):
        plan = _plan(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_probe_queries_have_no_driver_side_rows(spark):
    """The extraction probe queries synthesize pages JVM-side from the
    documents scan — a LocalTableScan of materialized rows would mean
    driver-side generation sneaked back in."""
    for q in ("extract_ja_segments", "extract_figures",
              "extract_macron_candidates", "host_profiles"):
        plan = _plan(spark, q)
        assert "LocalTableScan" not in plan, q
        assert "Scan parquet" in plan or "FileScan parquet" in plan, q


def test_extraction_prunes_html_after_udf(spark):
    """html (the giant binary column) must not survive past mapInPandas:
    no output schema downstream of the UDF may carry it."""
    plan = _plan(spark, "extract_documents")
    seg = plan.split("MapInPandas")[0]      # operators ABOVE the UDF
    assert "html" not in seg, seg[:500]


def test_asof_join_is_single_window_no_join(spark):
    """The as-of join must compile to union-tag + ONE window over a single
    user_id shuffle — a range/theta join here would be the 100 TB
    scale-killer (O(clicks x purchases) intermediate)."""
    plan = _plan(spark, "events_asof_purchase")
    assert "Join" not in plan, plan[:800]
    assert plan.count("Window") == 1, plan[:800]
    # exactly one data shuffle (user_id hash) + one presentation range sort
    assert plan.count("Exchange") <= 2, plan[:800]


def test_hot_host_salt_key_in_exchange(spark):
    """Skew-stress query (SURVEY §7.4): the repartition Exchange must hash
    on part_key — the SALTED key — not on raw host, so the hot host's rows
    spread across partitions (round-2 verdict item 5)."""
    plan = _plan(spark, "extract_hot_host")
    # the explicit pre-UDF repartition (REPARTITION_BY_NUM) must key on the
    # salted part_key; the post-UDF groupBy('host') aggregation exchange is
    # a different, legitimate shuffle
    m = re.search(r"Exchange hashpartitioning\((\w+)#\d+, \d+\), "
                  r"REPARTITION_BY_NUM", plan)
    assert m, plan[:1200]
    assert m.group(1) == "part_key", m.group(0)


def test_corpus_curation_plan_shapes(spark):
    """Corpus-curation operators keep their scale shapes: the per-doc rule
    filters are map-only (single Exchange = the presentation sort, no
    join), decontamination broadcasts the benchmark gram set (never a
    sort-merge join), and quota sampling is one window over the
    source-partitioned shuffle."""
    for name in ("gopher_quality_flags", "train_val_split",
                 "gopher_line_flags"):
        plan = _plan(spark, name)
        # map-only contract, refined for the round-9 scale-adaptive
        # spread (queries/tables.py): RoundRobinPartitioning exchanges
        # are parallelism recovery on few-row-group inputs (absent at
        # warehouse scale where scan splits >= cores) and carry no
        # key semantics; every KEYED exchange but the presentation
        # sort is still forbidden — the original scale-shape pin.
        keyed = (plan.count("Exchange hashpartitioning")
                 + plan.count("Exchange rangepartitioning"))
        assert keyed <= 1, (name, plan[:800])
        non_spread = plan.count("Exchange") - plan.count(
            "Exchange RoundRobinPartitioning")
        assert non_spread <= 1, (name, plan[:800])
        assert "Join" not in plan, name
    contam = _plan(spark, "benchmark_contamination")
    # the corpus side must reach the benchmark probe set via broadcast —
    # and there are TWO broadcast joins now: probes×documents (builds the
    # external benchmark gram view) and grams×bench (the decontamination
    # semi-join shape itself)
    assert contam.count("BroadcastHashJoin") >= 2, contam[:1200]
    assert "SortMergeJoin" not in contam
    quota = _plan(spark, "source_quota_sample")
    assert "row_number" in quota
    assert "Join" not in quota


def test_round5_operator_plan_shapes(spark):
    """Round-5 additions keep their scale shapes: URL canonicalization is
    pure column algebra (no UDF, no join; one agg shuffle + presentation
    sort), LM scoring and BPE counting are single Arrow-batched UDFs with
    no join, and the incremental dedup probe is equi-join only (a
    cartesian/BNL here would be the 100 TB scale-killer)."""
    plan = _plan(spark, "url_canonical_dups")
    assert "Join" not in plan
    assert "Python" not in plan and "InPandas" not in plan
    # 3 = count-distinct's standard two-phase expansion (partial on
    # (canonical,url) then merge) + the presentation sort — all partial-
    # aggregated, nothing data-sized crosses un-combined
    assert plan.count("Exchange") <= 3, plan[:800]

    plan = _plan(spark, "lm_perplexity_buckets")
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1, plan[:800]

    plan = _plan(spark, "bpe_token_counts")
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan

    plan = _plan(spark, "incremental_snapshot_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_quality_scores_map_only_shape(spark):
    """The learned classifier is pure column algebra: weights are plan
    literals, scoring fuses into the embeddings scan — no UDF, no join,
    and the only exchange is the presentation sort."""
    plan = _plan(spark, "embedding_quality_scores")
    assert "Join" not in plan
    assert "Python" not in plan and "InPandas" not in plan
    assert plan.count("Exchange") <= 1, plan[:800]


def test_corpus_keep_set_single_pass_shape(spark):
    """The composed curation pipeline must stay one pass over the corpus:
    map-only gates fused into the scan, decontamination via broadcast
    joins, dedup survivorship as an equi join — never a cartesian, and
    exactly one Arrow UDF stage (the LM scorer). Both cluster-label
    gates (lexical + semantic) enter as pre-materialized pairs-sized
    RDD scans, so they add joins but no UDF/product to this plan."""
    plan = _plan(spark, "corpus_keep_set")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "BroadcastHashJoin" in plan


def test_semantic_pair_join_is_equi_not_cartesian(spark):
    """The SemDeDup gate's candidate pairs must come from the cluster-id
    equi-join only — never an all-pairs product. (The K-row centroid
    broadcast inside the assignment is the deliberate flat-in-K
    BroadcastNestedLoopJoin, same as _assign_broadcast — K rows, not
    data×data.)"""
    from martial_arts_ocr_spark.queries.neardup import (
        semantic_neardup_pairs,
    )

    plan = (semantic_neardup_pairs(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan[:1200]


def test_curation_funnel_and_epoch_order_shapes(spark):
    """The funnel adds one equi-join + a partial-agg groupBy on top of
    the keep-set plan (still cartesian-free, still one Arrow UDF); the
    epoch shuffle must contain NO single-partition window — the rank is
    per (epoch, bucket) shard, which is the whole 100 TB point."""
    plan = _plan(spark, "curation_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("ArrowEvalPython") == 1

    plan = _plan(spark, "packed_epoch_order")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every Window in the plan is partitioned (a global row_number would
    # show an empty partition spec / SinglePartition exchange)
    assert "SinglePartition" not in plan, plan[:1200]


def test_mixture_epoch_stream_shape(spark):
    """The quota-weighted epoch stream (exact-count diagnostic form):
    quotas are driver-collected O(K) control flow; each epoch ranks its
    OWN 1x-corpus frame (round-8: the corpus×N_EPOCHS explode through one
    Exchange is gone — one scan per epoch, unioned) -> broadcast n_target
    join -> one Arrow BPE stage over SAMPLED rows only. No
    single-partition window, no nested-loop join."""
    from martial_arts_ocr_spark.queries.corpus import _N_EPOCHS

    plan = _plan(spark, "mixture_epoch_stream")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan, plan[:1200]
    # formatted explain lists each node in tree + detail: 1 node == 2 hits
    assert plan.count("ArrowEvalPython") <= 2
    # one corpus scan PER EPOCH (each feeds its own rank), never more
    assert plan.count("Scan parquet") <= 2 * _N_EPOCHS
    assert "BroadcastHashJoin" in plan


def test_mixture_threshold_is_map_only_no_window(spark):
    """Round-8 lead fix (r7 VERDICT What's wrong #1): the deployment-scale
    mixture sampler must have NO rank window anywhere — the per-source
    single-task sort is what it exists to eliminate. Plan = per-epoch
    corpus scan with broadcast grid join + integer-compare filter fused in
    (map-only), one Arrow BPE stage on kept rows, partial-agg groupBy."""
    plan = _plan(spark, "mixture_epoch_stream_threshold")
    assert "Window" not in plan, plan[:1200]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan, plan[:1200]
    assert "BroadcastHashJoin" in plan


def test_packed_sequences_two_shuffle_shape(spark):
    """Tokenize-and-pack stays the claimed 100 TB shape: split filter
    pushed below the UDF, ONE ArrowEvalPython stage, ONE bucket exchange
    feeding both windows AND the (bucket, seq) aggregate (bucket is a
    co-location prefix, so partial+final agg run shuffle-free), and only
    the presentation sort adds a second exchange. No join anywhere."""
    plan = _plan(spark, "packed_sequences")
    assert "Join" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("Exchange") == 2, plan[:1200]
    assert "Generate" in plan          # the bounded per-doc seq explode
